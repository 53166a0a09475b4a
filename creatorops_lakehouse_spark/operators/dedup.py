"""Deduplication operators for training-data pipelines.

Five families, all DataFrame-native (no Python in the hot path):

- exact:        sha2 over selected columns → hash-groupBy            O(n)
- fingerprint:  sha2 over normalized text (case/ws/punct-invariant)  O(n)
- jaccard:      token-set inverted-index self-join + exact Jaccard   bounded by token df-pruning
- MinHash+LSH:  k-permutation signatures → banded bucket join →
                exact-Jaccard verification of candidates             O(n·k) + bounded join
- SimHash:      64-bit sign-vote fingerprint → banded hamming join   O(n·64)

Scale notes (100 TB):
- The pairwise stages NEVER do an n² cross join: candidates come from
  inverted-index / band-bucket equi-joins, which shuffle on token/bucket
  keys. Stop-token pruning (``max_token_df``) bounds the fanout of hot
  tokens — the classic skew killer for inverted-index joins; AQE skew-join
  splitting handles the residue.
- MinHash signature computation is a single projection (xxhash64 per
  permutation seed, array_min over shingles) — no shuffle, no UDF.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from creatorops_lakehouse_spark.operators.cache import scoped_persist
from creatorops_lakehouse_spark.operators.text import (
    fingerprint,
    tokens,
    word_ngrams,
)


def exact_dedup(df: DataFrame, cols: list[str], keep_order_col: str | None = None) -> DataFrame:
    """Keep one row per exact (sha2-hashed) combination of ``cols``.

    Deterministic winner: lowest ``keep_order_col`` (defaults to first col).
    """
    order = keep_order_col or cols[0]
    key = F.sha2(
        F.concat_ws(
            "\x00", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
        ),
        256,
    )
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(order).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_clusters(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact-duplicate clusters by content hash: (content_hash, n_docs,
    min_doc_id as canonical representative)."""
    h = F.sha2(F.col(text_col), 256).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def fingerprint_clusters(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Near-exact clusters via normalized-text fingerprint (case/whitespace/
    punctuation-invariant)."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("doc_fingerprint"), F.col(id_col))
        .groupBy("doc_fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("canonical_id"))
    )


def _token_sets(df: DataFrame, text_col: str, id_col: str, ngram: int) -> DataFrame:
    tok = (
        F.array_distinct(word_ngrams(F.col(text_col), ngram))
        if ngram > 1
        else F.array_distinct(tokens(F.col(text_col)))
    )
    return df.select(F.col(id_col).alias("doc_id"), tok.alias("toks")).withColumn(
        "set_size", F.size("toks")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    ngram: int = 1,
    max_token_df: int | None = None,
    prefix_filter: bool = True,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact pairwise Jaccard ≥ threshold over token (or word-ngram) sets,
    via inverted-index self-join — no cross join.

    ``sets`` (optional): a prebuilt (doc_id, toks, set_size) table — pass
    the session's sticky corpus shingle cache (operators/cache.py::
    sticky_persist) when several queries share one corpus, so the shingle
    projection is computed once per session instead of once per query. The
    caller owns its lifetime; nothing here registers it for release.

    ``max_token_df`` drops tokens appearing in more than that many docs
    (stop-token pruning): at scale these dominate join fanout while adding
    almost no discriminative signal. Pairs are emitted once (a < b).

    ``prefix_filter`` (all-pairs / PPJoin prefix filtering): index only each
    document's first |X| − ⌈t·|X|⌉ + 1 shingles under a global
    rarest-first order — any pair with J ≥ t must still share an indexed
    shingle, so the candidate join shrinks by ~t while staying EXACT
    (candidates are verified against the full sets). This is the lever that
    keeps the self-join bounded at 100 TB; exactness vs the unpruned join
    is pinned in tests/test_operators_dedup.py.
    """
    if sets is None:
        sets = scoped_persist(  # reread for posting build + candidate verify
            _token_sets(df, text_col, id_col, ngram).filter(F.col("set_size") > 0)
        )
    else:
        sets = sets.filter(F.col("set_size") > 0)  # cache hit on the parent
    posts = sets.select("doc_id", "set_size", F.explode("toks").alias("tok"))
    if max_token_df is not None:
        hot = (
            posts.groupBy("tok")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_token_df)
            .select("tok")
        )
        posts = posts.join(F.broadcast(hot), on="tok", how="left_anti")
    if prefix_filter:
        tok_df = posts.groupBy("tok").agg(F.count("*").alias("df"))
        ranked = posts.join(tok_df, on="tok")
        w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("tok").asc())
        # ceil(t*n) in exact integer arithmetic: t scaled by 10^4.
        # (x + 9999) div 10000 is a true ceil for positive x — Spark's `div`
        # truncates toward zero, so the -(-x div d) identity computes floor,
        # not ceil, and would index one extra token per doc.
        ts = int(round(threshold * 10000))
        prefix_len = F.col("set_size") + 1 - F.expr(f"(({ts} * set_size) + 9999) div 10000")
        posts = (
            ranked.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= prefix_len)
            .select("doc_id", "set_size", "tok")
        )
    posts = scoped_persist(posts)  # both sides of the self-join read this subtree
    if not prefix_filter:
        # full postings → the inverted-index join ITSELF counts the
        # intersection (group the matches); no per-pair array intersection.
        # With dense posting lists the candidate set is far larger than the
        # output, so counting in the shuffle beats candidate+verify.
        a = posts.select(
            "tok", F.col("doc_id").alias("a_id"), F.col("set_size").alias("a_size")
        )
        b = posts.select(
            "tok", F.col("doc_id").alias("b_id"), F.col("set_size").alias("b_size")
        )
        common = (
            a.join(b, on="tok")
            .filter(F.col("a_id") < F.col("b_id"))
            .groupBy("a_id", "b_id", "a_size", "b_size")
            .agg(F.count("*").alias("n_common"))
        )
        jac = F.col("n_common") / (
            F.col("a_size") + F.col("b_size") - F.col("n_common")
        )
        return common.select(
            "a_id", "b_id", "n_common", jac.alias("jaccard")
        ).filter(jac >= threshold)
    # prefix postings are incomplete → candidates, then exact verification
    a = posts.select(F.col("tok"), F.col("doc_id").alias("a_id"))
    b = posts.select(F.col("tok"), F.col("doc_id").alias("b_id"))
    cands = (
        a.join(b, on="tok")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    sa = sets.select(
        F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"),
        F.col("set_size").alias("a_size"),
    )
    sb = sets.select(
        F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"),
        F.col("set_size").alias("b_size"),
    )
    verified = cands.join(sa, on="a_id").join(sb, on="b_id")
    n_common = F.size(F.array_intersect(F.col("a_toks"), F.col("b_toks")))
    jac = n_common / (F.col("a_size") + F.col("b_size") - n_common)
    return (
        verified.select(
            "a_id", "b_id", n_common.alias("n_common"), jac.alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def edit1_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    block_cols: list[str] | None = None,
    max_distance: int = 1,
) -> DataFrame:
    """Exact string pairs at Levenshtein distance ≤ 1 via symmetric-delete
    (SymSpell-style) candidate generation + exact verification.

    Candidate rule: two strings are within one unit edit only if their
    deletion neighborhoods {s} ∪ {s minus one char} intersect — a
    substitution at position p means deleting p from both yields the same
    string; an insert/delete means the shorter string itself is in the
    longer one's neighborhood. The intersection test admits false
    positives (e.g. transposed "ab"/"ba" share {a,b} at distance 2), so
    every candidate is verified with the real ``levenshtein`` before
    emission — the output is EXACT, identical to the quadratic
    block-scan.

    Scale shape: this replaces per-block O(n²) distance evaluations with
    an inverted-index equi-join on (block_cols, variant) — |s|+1 variant
    rows per string, so the index is linear in corpus size × string
    length, the same posting-join pattern as the shingle dedup tier. The
    quadratic blowup only reappears if many strings share a variant key,
    i.e. a genuine near-duplicate cluster — work proportional to true
    output, not to block size. Only max_distance=1 is supported: the
    symmetric-delete neighborhood at k grows as C(|s|,k), and k ≥ 2
    wants the PassJoin segment scheme instead — fail loud rather than
    silently approximate.

    Output: (a_id, b_id, *block_cols, edit_distance), pairs emitted once
    (a_id < b_id). Block columns are optional equi-keys (e.g. a nation /
    tenant id) that candidates must also share.
    """
    if max_distance != 1:
        raise ValueError(
            f"edit1_pairs supports max_distance=1 only (symmetric-delete "
            f"neighborhood); got {max_distance}"
        )
    block_cols = list(block_cols or [])
    variants = F.explode(
        F.array_union(
            F.array(F.col(name_col)),
            F.expr(
                f"transform(sequence(1, length({name_col})), i -> "
                f"concat(substring({name_col}, 1, i - 1), "
                f"substring({name_col}, i + 1, length({name_col}))))"
            ),
        )
    ).alias("_variant")
    posts = scoped_persist(
        df.select(id_col, name_col, *block_cols).select(
            "*", variants
        )
    )
    a = posts.select(
        *block_cols,
        F.col("_variant"),
        F.col(id_col).alias("a_id"),
        F.col(name_col).alias("_a_name"),
    )
    b = posts.select(
        *block_cols,
        F.col("_variant"),
        F.col(id_col).alias("b_id"),
        F.col(name_col).alias("_b_name"),
    )
    # Dedup on the FULL (pair, block) key: with only (a_id, b_id) the kept
    # block_cols values would be nondeterministic when the same id pair
    # matches under multiple block values (possible iff ids repeat across
    # blocks — ADVICE r6). Unique-id-per-block callers (the customer
    # query) see identical output; repeated-id callers get one
    # deterministic row per block the pair matched in.
    cands = (
        a.join(b, on=[*block_cols, "_variant"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", *block_cols, "_a_name", "_b_name")
        .dropDuplicates(["a_id", "b_id", *block_cols])
    )
    dist = F.levenshtein(F.col("_a_name"), F.col("_b_name")).cast("long")
    return (
        cands.withColumn("edit_distance", dist)
        .filter(F.col("edit_distance") <= max_distance)
        .select("a_id", "b_id", *block_cols, "edit_distance")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    ngram: int = 1,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact pairwise containment ≥ threshold over token (or word-ngram)
    sets: C(a,b) = |A ∩ B| / min(|A|, |B|).

    Containment is the asymmetric complement to Jaccard for corpus dedup: a
    short document fully embedded in a long one (quote pages, excerpt
    farms, boilerplate-wrapped reposts) has near-1.0 containment but
    arbitrarily low Jaccard, so a Jaccard-threshold pass never finds it.
    Curation pipelines (e.g. the suffix-array / containment passes described
    in Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better") run both metrics over the same shingle projection — which is
    exactly what this does: it accepts the same prebuilt ``sets`` table as
    ``jaccard_pairs`` so one corpus shingle cache feeds both.

    Plan shape (scale): identical to the unpruned ``jaccard_pairs`` path —
    inverted-index self-join on shingles where the join ITSELF counts the
    intersection (groupBy the matches), so there is no cross join and no
    per-pair array materialization. PPJoin prefix filtering is deliberately
    NOT offered here: its correctness bound is derived from the Jaccard
    overlap constraint and does not hold for min-denominator containment
    (a small set can be fully contained while sharing none of its indexed
    prefix under the rarest-first order), so pruning would silently drop
    true pairs.

    The threshold test runs in exact integer arithmetic
    (n_common · 10⁴ ≥ ⌊t·10⁴⌋ · min(|A|,|B|)) so the keep/drop decision is
    identical on any engine; the reported ``containment`` column is the
    int64/int64 IEEE division both Spark and DuckDB produce bit-identically.
    Pairs are emitted once (a_id < b_id).
    """
    if sets is None:
        sets = scoped_persist(
            _token_sets(df, text_col, id_col, ngram).filter(F.col("set_size") > 0)
        )
    else:
        sets = sets.filter(F.col("set_size") > 0)
    posts = scoped_persist(
        sets.select("doc_id", "set_size", F.explode("toks").alias("tok"))
    )
    a = posts.select(
        "tok", F.col("doc_id").alias("a_id"), F.col("set_size").alias("a_size")
    )
    b = posts.select(
        "tok", F.col("doc_id").alias("b_id"), F.col("set_size").alias("b_size")
    )
    common = (
        a.join(b, on="tok")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id", "a_size", "b_size")
        .agg(F.count("*").alias("n_common"))
    )
    ts = int(round(threshold * 10000))
    min_size = F.least("a_size", "b_size")
    keep = F.col("n_common") * 10000 >= F.lit(ts) * min_size
    return common.filter(keep).select(
        "a_id",
        "b_id",
        "n_common",
        (F.col("n_common") / min_size).alias("containment"),
    )


#: Mersenne prime 2^31-1: with a, b, h all < 2^31, a*h + b < 2^62 stays
#: inside int64 — no 128-bit modular multiplication needed.
_MERSENNE_31 = (1 << 31) - 1


def _perm_params(num_perm: int, seed: int = 1) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a_i * x + b_i) mod 2^31-1."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE_31), rng.randrange(0, _MERSENNE_31))
        for _ in range(num_perm)
    ]


def minhash_base(shingles: F.Column, hash_mode: str = "xxhash64") -> F.Column:
    """Per-shingle 31-bit base hashes (xxhash64 folded into [0, 2^31-1)).

    Materialize this as its OWN column before feeding it to
    :func:`minhash_signature` — if the hash expression is inlined, each of
    the num_perm permutation scans re-evaluates it and re-hashes every
    shingle STRING num_perm times (higher-order functions get no common-
    subexpression elimination). As an attribute reference it is hashed once.

    ``hash_mode="md5"``: ENGINE-SHARED lanes — the first 15 hex chars of
    md5 (60 bits, inside a signed long) folded mod 2^31−1. Spark, DuckDB,
    and Python hashlib compute identical md5, so a DuckDB oracle can
    replay the whole MinHash pipeline hash-for-hash (xxhash64 exists only
    in Spark). xxhash64 stays the prod default (JVM-native, no hex
    detour); md5 mode is what makes the registered query row
    oracle-checkable end-to-end.
    """
    if hash_mode == "md5":
        return F.transform(
            shingles,
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
            % F.lit(_MERSENNE_31),
        )
    return F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_31)))


def minhash_signature(base: F.Column, num_perm: int = 64) -> F.Column:
    """MinHash signature over precomputed base hashes (see minhash_base):
    num_perm affine permutations h_i(x) = (a_i·x + b_i) mod 2^31-1,
    array_min per permutation.

    The permutations stay UNROLLED (num_perm separate transform+array_min
    expressions): measured 2× faster than a nested transform over a literal
    (a, b) params array, which leaves the whole-stage-codegen fast path.
    a·x + b stays below 2^62 (Mersenne-31 operands), so plain ``%``
    suffices (operands are non-negative — no pmod branch needed). One
    projection, no shuffle."""

    def perm_min(a: int, b: int):
        return F.array_min(
            F.transform(base, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MERSENNE_31))
        )

    return F.array(*[perm_min(a, b) for a, b in _perm_params(num_perm)])


def _minhash_sigs_udf(num_perm: int):
    """Arrow-batched pandas UDF: all ``num_perm`` permutation minima per
    row in one numpy pass — the signature-computation twin of the audited
    LSH/PQ matmul seams (operators/similarity.py).

    Identical integer arithmetic to :func:`minhash_signature` — same
    deterministic ``_perm_params`` (a, b), same ``(a·h + b) % (2^31−1)``
    in int64 (operands < 2^31, so a·h+b < 2^62: no wraparound in either
    engine) — hence bit-equal signatures, buckets, and pair sets. The
    expression form costs ``num_perm`` separate array traversals
    (higher-order functions get no common-subexpression elimination and
    evaluate per element); here one (num_perm × len) vectorized matrix
    per document amortizes to a few ns per (perm, shingle) cell. Only the
    precomputed base-hash arrays cross the JVM→Python boundary — shingle
    STRINGS never do (guide §4: pass only the columns the function
    needs). An empty/NULL base array yields all-NULL minima, matching
    ``array_min`` over an empty array."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    params = _perm_params(num_perm)
    a_mat = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    b_mat = np.array([b for _, b in params], dtype=np.int64)[:, None]

    # r14 NOTE (VERDICT item 7 measured and REJECTED): whole-batch 2-D
    # folds were A/B'd against this per-row loop on the real corpus shape
    # (~20-90 shingles/doc) — np.minimum.reduceat over a concatenated
    # flat vector ran 7x SLOWER (1.13 s vs 0.16 s per 5000 docs) and a
    # padded (n x maxlen x 64) matrix 1.8x slower (0.29 s); the bench
    # regressed docs_minhash_lsh_pairs 1.46 -> 2.74 s before the revert.
    # Per-row numpy is already one vectorized (num_perm x len) pass; the
    # dispatch overhead the item assumed dominant is not, at >= ~20
    # shingles/doc. Kept from that attempt: NULL elements are skipped,
    # matching array_min (the previous loop raised TypeError on them —
    # ADVICE r13).
    def _sigs(col):  # no annotations: Spark 4 rejects string-annotated
        # signatures under `from __future__ import annotations`
        out = []
        for h in col:
            if h is None or len(h) == 0:
                out.append([None] * num_perm)
                continue
            hv = np.asarray(h)
            if hv.dtype == object:  # NULL elements: array_min skips them
                hv = np.asarray(
                    [x for x in h if x is not None], dtype=np.int64
                )
                if hv.size == 0:
                    out.append([None] * num_perm)
                    continue
            hv = hv.astype(np.int64, copy=False)[None, :]
            m = (a_mat * hv + b_mat) % _MERSENNE_31
            out.append(m.min(axis=1).tolist())
        return pd.Series(out)

    return pandas_udf(_sigs, "array<long>")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    ngram: int = 2,
    num_perm: int = 64,
    bands: int = 16,
    sets: DataFrame | None = None,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified with exact Jaccard.

    rows = num_perm // bands per band; a pair collides if any band's slice
    of the signature matches exactly. Candidates from the bucket join are
    then verified against the exact Jaccard of their shingle sets, so the
    output has no false positives (recall depends on the band geometry:
    P(collide) = 1 - (1 - j^rows)^bands).

    ``sets``: optional prebuilt (doc_id, toks, set_size) table (see
    :func:`jaccard_pairs`); caller owns its lifetime.

    ``hash_mode="md5"``: engine-shared lanes/buckets so a DuckDB oracle
    replays the identical pair set (see :func:`minhash_base`); the band
    geometry and recall contract are hash-function-independent.
    """
    if sets is None:
        sets = scoped_persist(  # reread for exact verify after the band join
            _token_sets(df, text_col, id_col, ngram)
        )
    cands = _lsh_candidates(sets, num_perm, bands, hash_mode)
    return _verify_jaccard(cands, sets, threshold)


def _lsh_candidates(
    sets: DataFrame, num_perm: int, bands: int, hash_mode: str = "xxhash64"
) -> DataFrame:
    """Deduplicated (a_id, b_id) candidate pairs from the banded MinHash
    bucket self-join — ids only; callers attach their own exact verify."""
    banded = _band_buckets(sets, num_perm, bands, hash_mode)
    banded = scoped_persist(banded)  # self-join reads it twice; avoids 2× signature compute
    left = banded.select("band", "bucket", F.col("doc_id").alias("a_id"))
    right = banded.select("band", "bucket", F.col("doc_id").alias("b_id"))
    return (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )


def containment_pairs_lsh(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_ratio: int = 4,
    ngram: int = 1,
    num_perm: int = 64,
    sets: DataFrame | None = None,
    max_candidates: int | None = 50_000_000,
) -> DataFrame:
    """Scale path for containment dedup at bounded size ratio: min-wise
    sampled candidate index + exact containment verification.

    Why a separate path: :func:`containment_pairs` is exact but linear in
    the full posting mass (measured 84.6× wall at 100× data — BENCH_NOTES),
    and plain MinHash-LSH banding can't be reused as-is because band
    collision probability tracks JACCARD: a containment-C pair with size
    ratio R = max/min has only J ≥ C/(R+1), far below any Jaccard-tuned
    band geometry. The fix here is the rows=1 degenerate geometry: every
    one of the ``num_perm`` signature slots is its own band, so a pair
    collides if ANY sampled min-hash matches — P(candidate) =
    1−(1−J)^num_perm, which at num_perm=64 is ≥ 96% even at J = 0.05
    (C = 0.8, R ≈ 15). Each document contributes exactly ``num_perm``
    posting rows REGARDLESS of length — the index is fixed-width per doc,
    unlike the full inverted index whose posting mass is the corpus token
    mass. Every candidate is verified with the exact intersection, so
    output precision is 1.0; recall is the band-collision bound above and
    is pinned by the docs_containment_lsh_verdict query.

    ``max_ratio`` bounds the size ratio of emitted pairs (integer-exact
    test: max_size ≤ max_ratio·min_size). Unbounded-ratio containment (a
    paragraph inside a book) is fundamentally out of reach of ANY
    whole-document sketch — that case belongs to the span-level pass
    (:func:`strip_duplicate_spans`), see BENCH_NOTES.

    REGIME GUARD (``max_candidates``): rows=1 sensitivity means every pair
    with ANY matching sampled min-hash becomes a candidate, and the verify
    join carries both shingle arrays per candidate. On a corpus whose
    SUB-threshold similarity is dense (the 100× clone-rehearsal corpus:
    every doc sits at J≈0.27 to 99 perturbed copies — above the J≈0.16
    recall floor the containment mapping needs, so no geometry can
    separate them), the candidate mass is the full J≥floor pair set
    (~10⁸·array payload = terabytes of shuffle; measured to exhaust local
    disk — BENCH_NOTES). Before the verify join this computes the
    bucket-collision pair count from the bucket histogram (Σ C(bucket,2)
    over one ids-only aggregation — cheap) and fails loud past the cap,
    naming the right tool for that regime: the exact posting-join
    :func:`containment_pairs`, which counts intersections IN the shuffle
    and never materializes pair payloads (84.6× wall at 100×, linear).
    Pass ``max_candidates=None`` on a cluster sized for the spill.

    The estimate is a CONSERVATIVE upper bound with known multiplicity:
    it counts each distinct pair once per colliding band, and a true
    near-duplicate collides in ~all ``num_perm`` bands — so on a
    clone-heavy corpus it overcounts distinct candidates by up to
    ``num_perm``× (ADVICE r6). That bias is the safe direction for a
    disk-exhaustion guard (it can only refuse early, never admit an
    over-cap corpus), but size ``max_candidates`` knowing the default
    50M cap can trip at ~800k distinct true-duplicate pairs; the verify
    join's actual shuffle cost scales with the same per-band collision
    mass the estimate counts, so the estimate tracks the COST being
    guarded even where it overcounts distinct pairs.

    EAGER: when ``max_candidates`` is set, the guard runs the signature
    computation as a real job at DataFrame-CONSTRUCTION time (one
    ids-only aggregate over the persisted banding; the result frame
    itself stays lazy). Callers building plans they may never execute
    should pass ``max_candidates=None`` to stay fully lazy.
    """
    if sets is None:
        sets = scoped_persist(
            _token_sets(df, text_col, id_col, ngram).filter(F.col("set_size") > 0)
        )
    else:
        sets = sets.filter(F.col("set_size") > 0)
    # rows=1 banding; persist once — the guard aggregate and both join
    # sides read the same signature computation
    banded = scoped_persist(_band_buckets(sets, num_perm, bands=num_perm))
    if max_candidates is not None:
        est = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.expr("n * (n - 1) div 2")).alias("c"))
            .collect()[0]["c"]
            or 0
        )
        if est > max_candidates:
            raise ValueError(
                f"containment_pairs_lsh: ~{est:,} bucket-collision pairs exceed "
                f"max_candidates={max_candidates:,} — the corpus's sub-threshold "
                f"similarity is denser than LSH can separate from the recall "
                f"floor; use the exact posting-join containment_pairs() (counts "
                f"in the shuffle, no pair payloads) or raise/disable the cap on "
                f"a cluster sized for the verify shuffle"
            )
    left = banded.select("band", "bucket", F.col("doc_id").alias("a_id"))
    right = banded.select("band", "bucket", F.col("doc_id").alias("b_id"))
    cands = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    sa = sets.select(
        F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"),
        F.col("set_size").alias("a_size"),
    )
    sb = sets.select(
        F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"),
        F.col("set_size").alias("b_size"),
    )
    verified = cands.join(sa, on="a_id").join(sb, on="b_id")
    n_common = F.size(F.array_intersect(F.col("a_toks"), F.col("b_toks")))
    min_size = F.least("a_size", "b_size")
    max_size = F.greatest("a_size", "b_size")
    ts = int(round(threshold * 10000))
    return (
        verified.withColumn("n_common", n_common)
        .filter(max_size <= F.lit(int(max_ratio)) * min_size)
        .filter(F.col("n_common") * 10000 >= F.lit(ts) * min_size)
        .select(
            "a_id",
            "b_id",
            "n_common",
            (F.col("n_common") / min_size).alias("containment"),
        )
    )


def _band_buckets(
    sets: DataFrame, num_perm: int, bands: int, hash_mode: str = "xxhash64"
) -> DataFrame:
    """(doc_id, band, bucket) — the ids-only LSH banding projection.

    Scale-critical: only (doc_id, band, bucket) enters the band explode and
    any downstream bucket join. An earlier formulation carried the full
    shingle array through both — replicating the corpus text ×bands into
    the shuffle and ×2 across the join sides (~32× the corpus at 16 bands).
    Ids-only banding shuffles 3 ints per (doc, band); shingle sets are
    joined back once per verified candidate side.

    The base hash array is materialized as its own column: Catalyst's
    CollapseProject keeps a multiply-referenced non-trivial expression out
    of the permutation transforms, so each shingle string is xxhash64'd
    once, not num_perm×.
    """
    assert num_perm % bands == 0
    rows = num_perm // bands

    def bucket_of(b: int) -> F.Column:
        slice_str = F.concat_ws(
            ",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)]
        )
        # md5 mode: the bucket is the md5 HEX STRING of the band slice —
        # engine-shared so a DuckDB oracle derives identical buckets
        # (strings shuffle 32 B vs 8 B longs; the replayable registry row
        # pays that, the xxhash64 prod default does not)
        return F.md5(slice_str) if hash_mode == "md5" else F.xxhash64(slice_str)

    sig = sets.withColumn(
        "_mh_base", minhash_base(F.col("toks"), hash_mode)
    ).withColumn("sig", _minhash_sigs_udf(num_perm)(F.col("_mh_base")))
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), bucket_of(b).alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_star_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    ngram: int = 2,
    num_perm: int = 64,
    bands: int = 16,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Hot-cluster-safe near-dup edges for CONNECTIVITY dedup: per
    (band, bucket) emit only (bucket_min, member) star edges instead of
    the all-pairs bucket self-join, then exact-Jaccard-verify each edge.

    Why this exists: :func:`minhash_lsh_pairs`'s bucket self-join is the
    correct PAIR-LISTING operator, but its cost is Σ occupancy² per
    bucket — a single 100k-member near-dup cluster (one viral document
    re-posted everywhere; the adversarial shape every web corpus
    contains) emits ~10^10 candidate pairs per band and kills the stage.
    Keep-one-per-cluster dedup doesn't need the pair list, only the
    components: a star per bucket carries the same connectivity at
    O(occupancy · bands) edges, so the giant cluster costs ~1.6M edges at
    16 bands, not 10^11. Measured on the skew rehearsal corpus (10% of
    docs in ONE near-dup cluster): identical CC clusters at a fraction of
    the candidate volume (tools/skew_adversarial.py; BENCH_NOTES round-9
    skew table).

    Recall semantics vs all-pairs: inside a CLIQUE-shaped near-dup
    cluster that collides into a bucket (every member pairwise-similar —
    the re-posted-document shape), min→member edges all verify, so
    connectivity is preserved. In a CHAIN-shaped cluster (A~B~C but A≁C;
    Jaccard is not transitive) the min→far-member edge can fail exact
    verification, and unless some band makes the intermediate a bucket
    min, the component may SPLIT where pair-listing would have kept it
    whole. Likewise in a MIXED bucket (hash-collision noise) a
    min→member edge can fail where some member↔member pair would have
    passed. Both usually recover via another band (same geometry as
    plain LSH recall), but the operative contract is strictly
    connectivity-recall ≤ pair-listing recall — use this for clustering,
    never for pair listing, and treat the skew-rehearsal-measured
    deviation as the working bound. Bucket mins aggregate with map-side combine
    (groupBy, not a window), so the hot bucket never single-partitions.
    """
    if sets is None:
        sets = scoped_persist(_token_sets(df, text_col, id_col, ngram))
    banded = _band_buckets(sets, num_perm, bands)
    mins = banded.groupBy("band", "bucket").agg(F.min("doc_id").alias("a_id"))
    stars = (
        banded.join(mins, on=["band", "bucket"])
        .filter(F.col("doc_id") != F.col("a_id"))
        .select("a_id", F.col("doc_id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    return _verify_jaccard(stars, sets, threshold)


def _verify_jaccard(cands: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of (a_id, b_id) candidates against the
    shingle-set table — eliminates every LSH false positive."""
    sa = sets.select(
        F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"),
        F.col("set_size").alias("a_size"),
    )
    sb = sets.select(
        F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"),
        F.col("set_size").alias("b_size"),
    )
    verified = cands.join(sa, on="a_id").join(sb, on="b_id")
    n_common = F.size(F.array_intersect(F.col("a_toks"), F.col("b_toks")))
    jac = n_common / (F.col("a_size") + F.col("b_size") - n_common)
    return verified.select(
        "a_id", "b_id", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def build_minhash_index(
    df: DataFrame,
    bands_spec,
    sets_spec,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 2,
    num_perm: int = 64,
    bands: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist the corpus's LSH state as two tables so future batches dedup
    INCREMENTALLY against it instead of recomputing the corpus:

    - ``bands_spec``: (doc_id, band, bucket) — the banding projection.
    - ``sets_spec``:  (doc_id, toks, set_size) — shingle sets for exact
      verification of probe candidates.

    ``mode="append"`` admits a verified batch into the index afterwards —
    the 100 TB operating loop is probe → dedup → append survivors.
    """
    from creatorops_lakehouse_spark.sources.tables import write_table

    sets = scoped_persist(_token_sets(df, text_col, id_col, ngram))
    write_table(_band_buckets(sets, num_perm, bands), bands_spec, mode=mode)
    write_table(sets, sets_spec, mode=mode)


def probe_minhash_index(
    spark,
    bands_spec,
    sets_spec,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    ngram: int = 2,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-dup pairs for a NEW batch against an indexed corpus — the
    incremental form of :func:`minhash_lsh_pairs`.

    Emits exact-verified pairs of both kinds: new↔indexed (the batch joins
    the persisted band index — cost scales with the BATCH, not the corpus)
    and new↔new (within-batch self-join). Candidate generation is identical
    to the full recompute — a pair collides iff some band matches,
    independent of which side is indexed — so
    probe(new) ∪ pairs(indexed) == pairs(indexed ∪ new) exactly
    (pinned by tests and the docs_incremental_dedup_verdict oracle row).

    ``bands_spec``/``sets_spec`` may be TableSpecs (plain-parquet index,
    read via read_table) or already-loaded DataFrames — e.g. snapshot-log
    tables pinned at a version by the caller.
    """
    from creatorops_lakehouse_spark.sources.tables import read_table

    # explicit projections: index tables may carry extra plumbing columns
    # (e.g. the streaming sink's p_batch partition key) — the probe only
    # ever needs the banding/verification columns, and unionByName with
    # the batch-side projections requires matching schemas.
    def _as_df(spec_or_df):
        if isinstance(spec_or_df, DataFrame):
            return spec_or_df
        return read_table(spark, spec_or_df)

    idx_bands = _as_df(bands_spec).select("doc_id", "band", "bucket")
    idx_sets = _as_df(sets_spec).select("doc_id", "toks", "set_size")
    new_sets = scoped_persist(_token_sets(new_df, text_col, id_col, ngram))
    new_bands = scoped_persist(_band_buckets(new_sets, num_perm, bands))

    n = new_bands.select("band", "bucket", F.col("doc_id").alias("a_id"))
    i = idx_bands.select("band", "bucket", F.col("doc_id").alias("b_id"))
    cross = (
        n.join(i, on=["band", "bucket"])
        .filter(F.col("a_id") != F.col("b_id"))  # re-ingested ids are not pairs
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    n2 = new_bands.select("band", "bucket", F.col("doc_id").alias("b_id"))
    within = (
        n.join(n2, on=["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    # Re-ingest hardening (a doc_id present in BOTH the index and the probe
    # batch): (a) canonicalize the candidate union — cross emits both
    # orientations for a re-ingested near-dup pair and within emits it a
    # third time; (b) the probe batch's shingle set wins over the indexed
    # copy in the verification join (it reflects the current text), so the
    # join never fans out. The anti join is ids-vs-small-batch → AQE
    # broadcasts it.
    cands = (
        cross.unionByName(within)
        .select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    all_sets = new_sets.unionByName(
        idx_sets.join(new_sets.select("doc_id"), on="doc_id", how="left_anti")
    )
    return _verify_jaccard(cands, all_sets, threshold)


def _simhash_votes_udf():
    """Arrow-batched pandas UDF: fold a document's 64-bit shingle hashes
    into its SimHash by per-bit majority vote in one numpy pass — the
    third audited matmul-style seam next to the LSH signature and PQ
    lookup folds.

    Bit-identical to the explode + 32-lane SUM formulation it replaced:
    numpy's ``>>`` on int64 is the same arithmetic shift as Spark's
    ``shiftright``, the per-bit one-count is an exact integer, and the
    majority test is the same strict ``2·ones > n``. An all-zero vote
    (every bit minority) yields sig 0, exactly as before."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(64, dtype=np.int64)

    # r14 NOTE (VERDICT item 7 measured and REJECTED): the whole-batch
    # np.add.reduceat fold over a concatenated flat vector ran 7x SLOWER
    # than this per-row loop at the real corpus shape (0.74 s vs 0.10 s
    # per 5000 docs of 20-90 shingles) — per-row numpy is already one
    # vectorized (len x 64) pass and the reduceat segment machinery costs
    # more than the dispatch it removes. Kept from that attempt: NULL
    # elements are skipped with the majority denominator shrunk to the
    # non-null count (the r13 loop raised TypeError on them — ADVICE
    # r13), matching the explode form which never emitted NULL rows.
    def _fold(col):  # no annotations (Spark 4 signature inference)
        out = []
        for h in col:
            hv = np.asarray(h)
            if hv.dtype == object:  # NULL elements: skipped, n shrinks
                hv = np.asarray(
                    [x for x in h if x is not None], dtype=np.int64
                )
            hv = hv.astype(np.int64, copy=False)
            if hv.size == 0:
                out.append(0)  # all-minority vote
                continue
            ones = ((hv[:, None] >> shifts) & np.int64(1)).sum(
                axis=0, dtype=np.int64
            )
            sig = 0
            for b in np.nonzero(2 * ones > len(hv))[0]:
                sig |= 1 << int(b)
            if sig >= 1 << 63:  # top bit set: wrap to signed int64
                sig -= 1 << 64
            out.append(sig)
        return pd.Series(out)

    return pandas_udf(_fold, "long")


def simhash_table(
    sets: DataFrame, n_bits: int = 64, hash_mode: str = "xxhash64"
) -> DataFrame:
    """(doc_id, simhash) — per-shingle 64-bit hashes in the JVM (one
    ``transform`` over the shingle array), sign-vote fold per document in
    an Arrow-batched numpy pass (:func:`_simhash_votes_udf`).

    SHUFFLE-FREE: the previous formulation exploded shingles and hash-
    aggregated 32 packed SUM lanes per document — one exchange over the
    corpus's full (doc, shingle-hash) mass and 64 shift/mask expressions
    per exploded row (measured 2.0–3.0 s warm at sf0.1, the dominant cost
    of every simhash query). Folding inside the document's own array rows
    needs no regrouping at all: the table is one narrow projection of the
    shingle-set table, and only (doc_id, hash-array) crosses the Python
    boundary — shingle strings never do. Documents with empty/NULL
    shingle sets are dropped, exactly as the explode form dropped them
    (explode of an empty array emits no rows).

    ``hash_mode="md5"``: engine-shared 64-bit shingle hash assembled from
    the first 16 md5 hex chars as two 32-bit halves (hi<<32 | lo; a direct
    64-bit hex parse could overflow a signed long when the top bit is
    set). DuckDB derives the identical bit pattern from the same halves,
    making the registered simhash row oracle-checkable; xxhash64 stays
    the prod default.
    """
    assert n_bits == 64
    if hash_mode == "md5":

        def h_of(s):
            hi = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
            lo = F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("long")
            return F.shiftleft(hi, 32).bitwiseOR(lo)

    else:

        def h_of(s):
            return F.xxhash64(s)

    nonempty = sets.filter(
        F.col("toks").isNotNull() & (F.size("toks") > 0)
    )
    return nonempty.select(
        "doc_id",
        _simhash_votes_udf()(F.transform(F.col("toks"), h_of)).alias(
            "simhash"
        ),
    )


def simhash_banded_pairs(
    sh: DataFrame, max_hamming: int = 7, n_chunks: int = 8, probe: int = 0
) -> DataFrame:
    """Banded hamming join over a precomputed (doc_id, simhash) table —
    see :func:`simhash_pairs` for the semantics.

    ``probe=0``: classic pigeonhole banding — candidates are pairs agreeing
    EXACTLY on ≥1 of the ``n_chunks`` chunks; recall guaranteed for
    max_hamming ≤ n_chunks − 1.

    ``probe=1``: 1-bit multiprobe — one join side additionally emits every
    single-bit flip of each chunk, so candidates are pairs within hamming 1
    on ≥1 chunk; recall guaranteed for max_hamming ≤ 2·n_chunks − 1
    (pigeonhole: floor(max_hamming / n_chunks) ≤ 1 errors land in some
    chunk). The scale win is geometric: fewer, WIDER chunks. At n_chunks=4
    the chunk value space is 2^16 and a random pair collides with
    probability ≈ 4·17/2^16 ≈ 1/960, vs ≈ 8/2^8 = 1/32 for the exact
    8-chunk geometry covering the same h≤7 — ~30× fewer accidental
    candidates for a 17× one-sided row inflation of 3-int rows. Probe rows
    never carry text or shingles, only (chunk, val, id, 64-bit hash).
    """
    assert 64 % n_chunks == 0
    assert probe in (0, 1)
    width = 64 // n_chunks
    mask = (1 << width) - 1

    def chunk_val(c: int):
        return F.shiftright(F.col("simhash"), c * width).bitwiseAND(F.lit(mask))

    sh = scoped_persist(sh)  # both join sides derive from it
    exact = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("chunk"), chunk_val(c).alias("val"))
                    for c in range(n_chunks)
                ]
            )
        ).alias("cv"),
    ).select("doc_id", "simhash", "cv.chunk", "cv.val")
    if probe == 0:
        a_side = exact
    else:
        flips = [0] + [1 << i for i in range(width)]
        a_side = sh.select(
            "doc_id",
            "simhash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("chunk"),
                            chunk_val(c).bitwiseXOR(F.lit(flip)).alias("val"),
                        )
                        for c in range(n_chunks)
                        for flip in flips
                    ]
                )
            ).alias("cv"),
        ).select("doc_id", "simhash", "cv.chunk", "cv.val")
    a = a_side.select(
        "chunk", "val", F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_sh")
    )
    b = exact.select(
        "chunk", "val", F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_sh")
    )
    hamming = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh")))
    return (
        a.join(b, on=["chunk", "val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_exact_pairs(sh: DataFrame, max_hamming: int = 7) -> DataFrame:
    """Exhaustive all-pairs hamming over a (doc_id, simhash) table — the
    O(n²/2) verification baseline for the banded path. Only (id, 64-bit
    hash) rows enter the product, so it is compact but still quadratic:
    a recall-audit tool, never the scale route (use simhash_banded_pairs)."""
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_sh"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_sh"))
    hamming = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh")))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 7,
    ngram: int = 2,
    n_chunks: int = 8,
    probe: int = 0,
    sets: DataFrame | None = None,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Banding: split the 64-bit hash into ``n_chunks`` equal chunks; by
    pigeonhole any pair with hamming < n_chunks·(probe+1) lands ≤ ``probe``
    errors in some chunk, so recall is GUARANTEED for
    max_hamming ≤ n_chunks·(probe+1) − 1 and probabilistic above (probe 0:
    exact-chunk equi-join; probe 1: 1-bit multiprobe, see
    :func:`simhash_banded_pairs` for the candidate-volume trade).
    Candidates come from equi-joins on chunk values, verified with exact
    bit_count.

    ``sets``: optional prebuilt (doc_id, toks, set_size) table (see
    :func:`jaccard_pairs`); caller owns its lifetime.
    """
    if sets is None:
        sets = _token_sets(df, text_col, id_col, ngram)
    return simhash_banded_pairs(
        simhash_table(sets, hash_mode=hash_mode), max_hamming, n_chunks, probe
    )


def _local_components(spark, edge_rows, id_type: str = "long") -> DataFrame:
    """Driver-side union-find over a small collected edge list — the exact
    min-label components the distributed rounds would produce (see
    connected_components' adaptive-local-solve note). ``id_type`` is the
    caller's id DataType simpleString, so string/int ids round-trip with
    the same schema the distributed path preserves."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        for v in (r.src, r.dst):
            if v not in parent:
                parent[v] = v
        ra, rb = find(r.src), find(r.dst)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = [(n, find(n)) for n in parent]
    return spark.createDataFrame(
        labels, f"node {id_type}, cluster_id {id_type}"
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iters: int = 20,
    double_from: int = 3,
    local_threshold: int = 100_000,
) -> DataFrame:
    """Connected components over a near-dup pair graph → (node, cluster_id),
    cluster_id = the component's minimum node id.

    The missing last step of every dedup pipeline: pairwise operators emit
    EDGES; keep-one-per-group needs the transitive CLUSTERS (a~b, b~c ⇒
    {a,b,c} together even if (a,c) was never emitted).

    Spark-first formulation: iterative min-label propagation — each round
    joins every node's current label against its neighbors' labels and
    keeps the minimum (one shuffle per round on the edge key; partial
    aggregation does the min map-side). Near-dup graphs are unions of
    near-cliques (diameter ≤ ~3), so the common case converges in 2–3
    cheap rounds. From round ``double_from`` on — i.e. only when the graph
    turns out deeper than a near-dup graph should be — each round ALSO
    applies POINTER DOUBLING (label ← label(label), the path-halving
    shortcut behind large-star/small-star in Kiveris et al., "Connected
    Components in MapReduce"), which makes the remaining label-chase
    distance halve per round: max_iters=20 then covers diameters up to
    ~2^17 instead of 20 — the silent-wrongness risk on adversarial chain
    graphs (crawl data can produce diameter > 20) is gone without taxing
    the common case. Doubling rounds truncate lineage with localCheckpoint
    (their plan references the previous labels 4×, growing 4^rounds
    otherwise); the per-round convergence check is an aggregate-only count
    (no row data to the driver).

    Raises RuntimeError if ``max_iters`` is exhausted before convergence —
    returning non-converged labels would silently split clusters.

    Adaptive local solve: a VERIFIED near-dup edge set is orders of
    magnitude smaller than the corpus it came from (dedup rates are
    percents, not multiples), and each distributed round costs a fixed
    multi-stage latency that dwarfs the data at audit/bench scale
    (measured: 5–20 s for a 101-edge graph, pure round overhead). Below
    ``local_threshold`` edges the exact same min-label components are
    computed by driver-side union-find on the collected (src, dst) ints —
    microseconds, identical output. The distributed path engages above the
    threshold (billions of edges at 100 TB) and is what the
    convergence/chain tests pin (they pass ``local_threshold=0``). Same
    adaptive shape as GraphFrames' broadcast-threshold switches.
    """
    if local_threshold > 0:
        # Probe the RAW pair list, not the symmetrized+distinct edge table:
        # union-find is direction- and duplicate-insensitive, so the local
        # path needs no distinct — collecting pairs directly skips a full
        # shuffle (measured ~1-2 s of fixed multi-stage latency per call
        # at audit scale, pure overhead for a 100-edge graph).
        head = (
            pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
            .limit(local_threshold + 1)
            .collect()
        )
        if len(head) <= local_threshold:
            id_type = pairs.schema[a_col].dataType.simpleString()
            return _local_components(pairs.sparkSession, head, id_type)
    edges = scoped_persist(
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = scoped_persist(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    # Convergence detection: labels move MONOTONICALLY downward (every
    # update takes a least()), so the label-sum strictly decreases iff any
    # node relabeled — one aggregate-only action per round, replacing the
    # earlier new-vs-old join+count (a full extra shuffle per round).
    # decimal(38,0) keeps the sum exact out to ~10^9 executors' worth of
    # int64 ids (n·2^63 < 10^38 for n < 3·10^18 nodes). Numeric ids only:
    # string ids (lexicographic min-label — valid) have no monotone sum, so
    # they fall back to a new-vs-old changed-count join per round (one
    # extra shuffle; correctness identical, documented cost).
    id_is_numeric = pairs.schema[a_col].dataType.typeName() in {
        "byte", "short", "integer", "long", "decimal", "float", "double",
    }
    label_sum = F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    prev_sum = labels.agg(label_sum).collect()[0].s if id_is_numeric else None
    converged = False
    for it in range(max_iters):
        neighbor_min = (
            edges.join(labels, on=edges.dst == labels.node)
            .select(F.col("src").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = labels.join(neighbor_min, on="node", how="left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        if it < double_from:
            new_labels = scoped_persist(prop)
        else:
            # pointer doubling: label ← label(label). Labels are always
            # node ids present in the label table (every label is the min
            # of a set of node ids), so the self-join is a total function
            # composition. localCheckpoint, not persist: a doubling
            # round's plan references the previous labels 4× (propagation
            # join + doubling self-join), so without lineage truncation
            # the logical plan grows 4^rounds and plan stringification
            # blows the JVM stack around round 6. (On a cluster with
            # executor churn, swap for reliable checkpoint(dir) here.)
            parent = prop.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            new_labels = (
                prop.join(parent, on=prop.label == parent.p_node, how="left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
        if id_is_numeric:
            new_sum = new_labels.agg(label_sum).collect()[0].s
            unchanged = new_sum == prev_sum
            prev_sum = new_sum
        else:
            old = labels.select("node", F.col("label").alias("_old"))
            unchanged = (
                new_labels.join(old, on="node")
                .filter(F.col("label") != F.col("_old"))
                .limit(1)
                .count()
                == 0
            )
        labels.unpersist()
        labels = new_labels
        if unchanged:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(the label sum was still decreasing). With pointer doubling "
            "this needs diameter > ~2^max_iters — check the pair graph for "
            "pathological structure or raise max_iters."
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    min_docs: int = 2,
) -> DataFrame:
    """Span-level exact deduplication (the operation in Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", public):
    find every ``window``-token span that occurs in >= ``min_docs``
    distinct documents, keep the occurrence in the minimum-id document,
    and REMOVE the covered tokens from every other document — then
    rebuild each document's text from its surviving tokens.

    Returns one row per input document:
    (id_col, n_tokens, n_removed, text_clean) — text_clean is the space
    re-join of uncovered tokens ('' when every token was covered).
    Document- and cluster-level dedup (exact_dedup_clusters,
    jaccard/minhash pairs → connected_components) drop whole documents;
    this drops the duplicated PASSAGES inside otherwise-distinct
    documents — boilerplate, licenses, templates — which document-level
    ops cannot reach.

    Spark-first shape (reference has no counterpart; its silver layer
    stops at row-level dedup, /root/reference/pipelines/silver/
    transform_local.py):
    - windows are md5-fingerprinted BEFORE the duplicate-detection
      shuffle, so the hash agg and the span join carry
      (16-byte hash, id, position) rows — never the window text. An md5
      collision would over-strip one span; at 2^64 windows the
      128-bit-space risk is ~2^-64 per pair, the standard fingerprint
      tradeoff every hash-dedup operator here already accepts.
    - tokens shuffle exactly once (the rebuild groupBy); covered
      positions arrive via an ids-only left-anti join.
    - stride is 1 (every position), the exact-recall setting; at 100 TB
      the window table is O(total tokens) rows of 3 narrow columns —
      the same order as the corpus token count, i.e. the cost every
      suffix-array formulation of this operator also pays. A coarser
      first pass (stride = window) with exact stride-1 refinement inside
      matched documents is the documented scale-down when even that is
      too much.
    """
    toks = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_l")
    ).withColumn("_n", F.size("_l"))
    toks = scoped_persist(toks)
    wins = toks.filter(F.col("_n") >= window).select(
        "_id",
        "_l",
        F.explode(F.expr(f"sequence(0, _n - {window})")).alias("_i"),
    ).select(
        "_id",
        "_i",
        F.md5(F.expr(f"array_join(slice(_l, _i + 1, {window}), ' ')")).alias("_wh"),
    )
    wins = scoped_persist(wins)
    dup = (
        wins.groupBy("_wh")
        .agg(
            F.min("_id").alias("_keeper"),
            F.count_distinct("_id").alias("_nd"),
        )
        .filter(F.col("_nd") >= min_docs)
        .select("_wh", "_keeper")
    )
    spans = (
        wins.join(dup, "_wh")
        .filter(F.col("_id") != F.col("_keeper"))
        .select("_id", "_i")
    )
    covered = spans.select(
        "_id", F.explode(F.expr(f"sequence(_i, _i + {window} - 1)")).alias("_idx")
    ).distinct()
    token_rows = toks.select("_id", F.posexplode("_l").alias("_idx", "_tok"))
    kept = token_rows.join(covered, ["_id", "_idx"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "_tok"))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("text_clean"),
    )
    return (
        toks.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_n").cast("long").alias("n_tokens"),
            (F.col("_n") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def build_jaccard_index(
    df: DataFrame,
    sets_spec,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    mode: str = "overwrite",
) -> None:
    """Persist the corpus's EXACT-Jaccard dedup state — one
    (doc_id, toks, set_size) shingle-set table — so future batches pair
    against it via :func:`probe_jaccard_index` instead of recomputing the
    corpus. The exact sibling of :func:`build_minhash_index`: no banding,
    no recall loss — the posting-join intersection count is a pure
    function of the two documents' shingle sets, so batched and one-shot
    pair generation agree EXACTLY. ``mode="append"`` admits a batch into
    the index afterwards."""
    from creatorops_lakehouse_spark.sources.tables import write_table

    sets = _token_sets(df, text_col, id_col, ngram).filter(
        F.col("set_size") > 0
    )
    write_table(sets, sets_spec, mode=mode)


def probe_jaccard_index(
    spark,
    sets_spec,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    ngram: int = 3,
) -> DataFrame:
    """Exact-Jaccard near-dup pairs for a NEW batch against an indexed
    corpus plus within-batch pairs — the incremental form of
    :func:`jaccard_pairs(prefix_filter=False)`.

    Returns (a_id, b_id, jaccard, b_is_new): ``a_id`` is always a NEW
    doc; ``b_id`` is an indexed doc (``b_is_new`` false) or another batch
    doc with a smaller id (``b_is_new`` true, matching jaccard_pairs'
    a < b emission).

    Exactness: the inverted-index join counts |A ∩ B| by grouping shared
    postings — a pure per-pair function, independent of which side is
    indexed — so probe(new) ∪ pairs(indexed) == pairs(indexed ∪ new)
    EXACTLY (no LSH recall loss; this is what lets the incremental
    curation pipeline equal its one-shot rerun field-for-field).

    Scale: the new batch's postings are the small side — Spark
    broadcast-joins them against one scan of the index's posting lists
    (no corpus shuffle); within-batch pairs self-join only the batch.
    At 100 TB the sets index lives bucketed by a shingle-hash prefix so
    the probe scan partition-prunes to the batch's posting buckets.

    ``sets_spec`` may be a TableSpec (plain-parquet index, read via
    read_table) or an already-loaded (doc_id, toks, set_size) DataFrame —
    e.g. a snapshot-log table pinned at a version by the caller."""
    new_sets = scoped_persist(
        _token_sets(new_df, text_col, id_col, ngram).filter(
            F.col("set_size") > 0
        )
    )
    if isinstance(sets_spec, DataFrame):
        idx_sets = sets_spec.select("doc_id", "toks", "set_size")
    else:
        from creatorops_lakehouse_spark.sources.tables import read_table

        idx_sets = read_table(spark, sets_spec).select(
            "doc_id", "toks", "set_size"
        )

    def posts(sets_df):
        return sets_df.select(
            "doc_id", "set_size", F.explode("toks").alias("tok")
        )

    a = posts(new_sets).select(
        "tok", F.col("doc_id").alias("a_id"), F.col("set_size").alias("a_size")
    )
    jac = F.col("n_common") / (
        F.col("a_size") + F.col("b_size") - F.col("n_common")
    )
    # new ↔ indexed: every shared shingle of (new doc, indexed doc)
    bi = posts(idx_sets).select(
        "tok", F.col("doc_id").alias("b_id"), F.col("set_size").alias("b_size")
    )
    cross = (
        a.join(bi, on="tok")
        # a re-ingested id (present in the index AND the batch) is not a
        # pair with itself — same hygiene as probe_minhash_index
        .filter(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id", "b_id", "a_size", "b_size")
        .agg(F.count("*").alias("n_common"))
        .select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .withColumn("b_is_new", F.lit(False))
    )
    # new ↔ new: jaccard_pairs' own a < b counting join over the batch
    bn = posts(new_sets).select(
        "tok", F.col("doc_id").alias("b_id"), F.col("set_size").alias("b_size")
    )
    within = (
        a.join(bn, on="tok")
        .filter(F.col("b_id") < F.col("a_id"))
        .groupBy("a_id", "b_id", "a_size", "b_size")
        .agg(F.count("*").alias("n_common"))
        .select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .withColumn("b_is_new", F.lit(True))
    )
    return cross.unionByName(within)
