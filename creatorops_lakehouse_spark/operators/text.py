"""Text analysis operators: tokenization, language id, quality scoring,
fingerprinting. All pure Column expressions (JVM-side, codegen-fused) — the
per-document cost is one projection pass, embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: word tokens: lowercase alnum runs (same regex used by the DuckDB oracles)
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """Lowercased word tokens, empties removed."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams of the normalized text (shingles for
    MinHash/Jaccard). Built with sequence+transform — no UDF."""
    norm = normalize_text(text)
    return F.filter(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.length(norm) - n, F.lit(0))),
                lambda i: norm.substr(i + 1, F.lit(n)),
            )
        ),
        lambda s: F.length(s) == n,
    )


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Distinct word n-grams (space-joined) — shingles for near-dup.

    Built from n shifted slices folded with zip_with (O(tokens) work, 3
    array allocations) instead of one slice per position (O(tokens²)
    allocations — measured ~2ms/doc, dominating every shingle-based
    operator). A document shorter than n yields its whole token sequence
    as one shingle.
    """
    toks = tokens(text)
    k = F.size(toks)
    cnt = k - (n - 1)  # number of n-grams when k >= n
    joined = F.slice(toks, 1, cnt)
    for i in range(1, n):
        joined = F.zip_with(
            joined,
            F.slice(toks, i + 1, cnt),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    short = F.array(F.array_join(toks, " "))
    return F.array_distinct(F.when(k < n, short).otherwise(joined))


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    strip non-alphanumerics (keeps single spaces)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(text), "[^a-z0-9\\s]", " "), "\\s+", " ")
    )


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: sha2 of the canonical form — detects
    duplicates that differ only in case/whitespace/punctuation."""
    return F.sha2(normalize_text(text), 256)


#: tiny per-language stopword profiles for the n-gram/stopword heuristic
#: language id (public-knowledge word lists, deliberately minimal)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con", "para", "es"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour", "que", "avec"),
}


def lang_scores(text: Column) -> Column:
    """MAP<lang, matched-stopword-count> over the token set."""
    toks = F.array_distinct(tokens(text))
    entries = []
    for lang, words in LANG_PROFILES.items():
        profile = F.array(*[F.lit(w) for w in words])
        entries.extend([F.lit(lang), F.size(F.array_intersect(toks, profile))])
    return F.create_map(*entries)


def lang_id(text: Column, min_hits: int = 1) -> Column:
    """Heuristic language id: the profile with the most stopword hits;
    null when no profile reaches ``min_hits`` (unknown)."""
    scores = lang_scores(text)
    langs = list(LANG_PROFILES)
    best = None
    best_score = None
    for lang in langs:
        s = scores[F.lit(lang)]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score >= min_hits, best)


def quality_features(text: Column) -> dict[str, Column]:
    """Raw quality signals (all exact integer/length-based, oracle-friendly)."""
    n_chars = F.length(text)
    toks = tokens(text)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_punct = n_chars - F.length(F.regexp_replace(text, "[^\\w\\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(text, "[0-9]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_distinct_tokens": n_distinct,
        "n_punct": n_punct,
        "n_digits": n_digit,
    }


#: the EN stopword profile doubles as the stopword-fraction signal list
STOPWORDS_EN: tuple[str, ...] = LANG_PROFILES["en"]


def repetition_features(text: Column) -> dict[str, Column]:
    """Gopher/C4-style intra-document repetition + noise signals.

    All values are scaled INTEGERS (basis points ×10000, mean word length
    ×100) computed with integer division, so per-doc values are exactly
    reproducible in any engine (the oracle-parity pattern for ratios) and
    aggregate exactly. Pure Column expressions — one codegen pass, no
    shuffle, embarrassingly parallel at 100 TB.

    - rep_bigram_bp:   10000 × (1 − distinct/total word bigrams); repeated
      phrasing (boilerplate, spam, degenerate generations) scores high.
    - dup_line_bp:     10000 × (1 − distinct/total non-empty lines).
    - mean_word_len_c: 100 × mean token length (centi-chars).
    - symbol_bp:       10000 × non-word-non-space chars / total chars.
    - stopword_bp:     10000 × EN-stopword tokens / tokens; natural prose
      sits well above machine-generated token soup.
    """
    toks = tokens(text)
    k = F.size(toks)
    bi_total = k - 1
    bi_distinct = F.size(word_ngrams(text, 2))
    rep_bigram = F.when(
        k >= 2, F.lit(10000) - _idiv(F.lit(10000) * bi_distinct, bi_total)
    ).otherwise(F.lit(0))
    lines = F.filter(F.split(text, "\n"), lambda x: x != F.lit(""))
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    dup_line = F.when(
        n_lines >= 1,
        F.lit(10000) - _idiv(F.lit(10000) * n_distinct_lines, n_lines),
    ).otherwise(F.lit(0))
    sum_tok_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_word_len = _idiv(F.lit(100) * sum_tok_len, F.greatest(k, F.lit(1)))
    n_chars = F.length(text)
    n_symbols = n_chars - F.length(F.regexp_replace(text, "[^\\w\\s]", ""))
    symbol = _idiv(F.lit(10000) * n_symbols, F.greatest(n_chars, F.lit(1)))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stopword = _idiv(F.lit(10000) * n_stop, F.greatest(k, F.lit(1)))
    return {
        "rep_bigram_bp": rep_bigram,
        "dup_line_bp": dup_line,
        "mean_word_len_c": mean_word_len,
        "symbol_bp": symbol,
        "stopword_bp": stopword,
    }


def _idiv(numer: Column, denom: Column) -> Column:
    """Integer division matching DuckDB's ``//`` for non-negative operands.

    floor(a / b) over doubles is exact here: operands stay far below 2^53,
    and when the true quotient is an integer q the IEEE division yields q
    exactly, so the floor never slips below it."""
    return F.floor(numer / denom).cast("long")


#: fixed public weights for the LINEAR quality classifier (the
#: fastText-style model-based filter of CCNet/LLaMA-class curation
#: pipelines, reduced to an auditable linear head over the exact-integer
#: signals above). Integer weights over integer features => the logit is
#: an exact integer, reproducible in any engine — no sigmoid needed for
#: the keep/drop decision (monotone), so the threshold is applied in
#: logit space. Signs follow the signals' documented semantics: natural
#: prose scores high on stopword fraction and length, low on repetition
#: and symbol noise; mean word length is penalized by distance from the
#: ~4.5-char English sweet spot.
QC_WEIGHTS = {
    "stopword_bp": 3,
    "rep_bigram_bp": -2,
    "dup_line_bp": -2,
    "symbol_bp": -3,
    "length_credit": 1,  # min(n_chars, 2000)
    "word_len_penalty": -1,  # |mean_word_len_c - 450|
}


def quality_classifier_logit(text: Column) -> Column:
    """Exact-integer logit of the linear quality classifier (weights
    :data:`QC_WEIGHTS`). Pure Column expressions — one codegen pass, no
    shuffle; at 100 TB the filter fuses into whatever scan reads the
    corpus, exactly like the heuristic gates."""
    r = repetition_features(text)
    n_chars = F.length(text)
    length_credit = F.least(n_chars, F.lit(2000)).cast("long")
    word_len_penalty = F.abs(r["mean_word_len_c"] - F.lit(450)).cast("long")
    return (
        F.lit(QC_WEIGHTS["stopword_bp"]) * r["stopword_bp"]
        + F.lit(QC_WEIGHTS["rep_bigram_bp"]) * r["rep_bigram_bp"]
        + F.lit(QC_WEIGHTS["dup_line_bp"]) * r["dup_line_bp"]
        + F.lit(QC_WEIGHTS["symbol_bp"]) * r["symbol_bp"]
        + F.lit(QC_WEIGHTS["length_credit"]) * length_credit
        + F.lit(QC_WEIGHTS["word_len_penalty"]) * word_len_penalty
    ).cast("long")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length sweet-spot, lexical diversity,
    low punctuation/digit noise. Weights are heuristic (documented, simple);
    the signal columns above are the auditable parts."""
    f = quality_features(text)
    n_chars = f["n_chars"].cast("double")
    n_tokens = f["n_tokens"].cast("double")
    length_ok = F.least(n_chars / F.lit(200.0), F.lit(1.0))  # saturates at 200 chars
    diversity = F.when(
        f["n_tokens"] > 0, f["n_distinct_tokens"] / n_tokens
    ).otherwise(F.lit(0.0))
    punct_noise = F.when(
        f["n_chars"] > 0, f["n_punct"].cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    digit_noise = F.when(
        f["n_chars"] > 0, f["n_digits"].cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    raw = (
        F.lit(0.4) * length_ok
        + F.lit(0.4) * diversity
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_noise + digit_noise, F.lit(1.0)))
    )
    return F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0))


def chunk_windows(
    df, text_col: str = "text", id_col: str = "doc_id", size: int = 32, stride: int = 16
):
    """Overlapping token windows per document — the chunking step for
    context-window-bounded training/embedding (RAG-style): windows of
    ``size`` tokens every ``stride`` tokens, last window truncated.

    One projection + one explode; no shuffle, no UDF (sequence/transform/
    slice expressions). Chunk grid: start positions 0, stride, 2·stride, …
    while start < n_tokens (a document shorter than ``size`` yields one
    truncated chunk; empty documents yield none).

    Returns (id_col, chunk_idx, n_chunk_tokens, chunk_text).
    """
    import pyspark.sql.functions as F

    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    n_chunks = F.expr(f"1 + (_n - 1) div {stride}")  # rows below filter _n > 0
    chunked = base.filter(F.col("_n") > 0).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(F.col("_toks"), i * stride + 1, size),
            )
        ).alias("chunk_idx", "_chunk"),
    )
    return chunked.select(
        id_col,
        "chunk_idx",
        F.size("_chunk").alias("n_chunk_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )


#: GPT-2-style pre-tokenizer pattern, restricted to the RE2 ∩ Java-regex
#: portable subset (no lookahead; ASCII classes to match the corpus and
#: the oracle tokenizer): contraction suffixes, space-prefixed letter
#: runs, space-prefixed digit runs, space-prefixed punctuation runs.
BPE_PRETOKEN_RE = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"


def bpe_pretokens(text: Column) -> Column:
    """BPE-ish pre-tokenization (the GPT-2 pattern family): the segment
    boundaries every byte-pair tokenizer respects — contraction suffixes
    split off, letter/digit/punctuation runs kept with their leading
    space. Counting these approximates post-BPE token counts far better
    than whitespace words (punctuation and digit runs become separate
    tokens), which is what context-budget packing actually needs.
    Pure expression (regexp_extract_all) — engine-portable because the
    pattern avoids lookahead (RE2) and sticks to ASCII classes."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_PRETOKEN_RE), 0)
