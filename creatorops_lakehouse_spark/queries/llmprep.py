"""LLM training-data preparation queries: sequence packing, chunking,
PII scrub, vocabulary statistics — the curation steps downstream of
dedup/quality gates. All fully SQL-oracle-checked (exact integer/string
semantics; no floating aggregates).

The PII query SELF-SEEDS deterministic synthetic PII into the corpus text
inside the query (both engines build identical strings): the driver
documents fixture contains no digits at all, so scanning it raw would be
trivially green at zero — seeding makes the regex-parity check real.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from creatorops_lakehouse_spark.operators.packing import (
    pack_sequences,
    packing_summary,
)
from creatorops_lakehouse_spark.operators.pii import (
    pii_counts,
    pii_sql_exprs,
    redact,
    redact_sql,
)
from creatorops_lakehouse_spark.operators.text import chunk_windows
from creatorops_lakehouse_spark.queries import load, query
from creatorops_lakehouse_spark.queries.dedup import _SQL_TOKENS

PACK_BUDGET = 512
CHUNK_SIZE = 32
CHUNK_STRIDE = 16

_SQL_PACKED = f"""
    toks AS (
        SELECT doc_id, len({_SQL_TOKENS}) AS n_tokens FROM documents
    ),
    packed AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS start_offset
        FROM toks
    ),
    coords AS (
        SELECT doc_id, n_tokens, start_offset,
               start_offset // {PACK_BUDGET} AS first_seq,
               (start_offset + greatest(n_tokens - 1, 0)) // {PACK_BUDGET} AS last_seq
        FROM packed
    )
"""


@query(
    "docs_pack_sequences",
    oracle=f"""
    WITH {_SQL_PACKED}
    SELECT doc_id, n_tokens, start_offset, first_seq, last_seq FROM coords
    """,
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing coordinates at {PACK_BUDGET} tokens/seq.

    The Spark side computes the global exclusive prefix sum with the
    two-phase distributed scan (per-id-range bucket sums + broadcast
    offsets + per-bucket window — operators/packing.py), NEVER a global
    single-partition window; the oracle's plain global window verifies the
    two-phase sum is exactly the global one.
    """
    return pack_sequences(
        load(spark, sf_dir, "documents"), budget=PACK_BUDGET
    )


@query(
    "docs_packing_summary",
    oracle=f"""
    WITH {_SQL_PACKED}
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END) AS BIGINT)
               AS n_straddling,
           (CAST(SUM(n_tokens) AS BIGINT) + {PACK_BUDGET} - 1) // {PACK_BUDGET}
               AS n_seqs,
           CAST(CASE WHEN SUM(n_tokens) % {PACK_BUDGET} = 0 THEN 10000
                ELSE (10000 * (SUM(n_tokens) % {PACK_BUDGET})) // {PACK_BUDGET}
           END AS BIGINT) AS last_fill_bp
    FROM coords
    """,
)
def docs_packing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row packing audit (total tokens, sequence count, boundary-
    straddling docs, final-sequence fill in basis points) — exact
    integers, engine-portable."""
    packed = pack_sequences(load(spark, sf_dir, "documents"), budget=PACK_BUDGET)
    return packing_summary(packed, budget=PACK_BUDGET)


@query(
    "docs_chunk_windows",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS l FROM documents
    ),
    sized AS (SELECT doc_id, l, len(l) AS n FROM toks WHERE len(l) > 0),
    grid AS (
        SELECT doc_id, l,
               CAST(unnest(range(0, 1 + (n - 1) // {CHUNK_STRIDE})) AS INT)
                   AS chunk_idx
        FROM sized
    )
    SELECT doc_id, chunk_idx,
           len(l[chunk_idx * {CHUNK_STRIDE} + 1 :
                 chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}]) AS n_chunk_tokens,
           array_to_string(l[chunk_idx * {CHUNK_STRIDE} + 1 :
                             chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}], ' ')
               AS chunk_text
    FROM grid
    """,
)
def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping {CHUNK_SIZE}-token windows every {CHUNK_STRIDE} tokens
    per document (RAG/embedding chunking) — one explode, no shuffle; the
    oracle rebuilds every window with 1-based list slicing and compares
    the joined chunk TEXT, not just counts."""
    return chunk_windows(
        load(spark, sf_dir, "documents"), size=CHUNK_SIZE, stride=CHUNK_STRIDE
    )


def _seeded_text_sql() -> str:
    return (
        "text"
        " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.1' ELSE '' END"
        " || CASE WHEN doc_id % 13 = 0 THEN ' ref ' || lpad(CAST(doc_id AS VARCHAR), 10, '0')"
        " ELSE '' END"
        " || CASE WHEN doc_id % 17 = 0 THEN ' call +1 555-0' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " ELSE '' END"
    )


def _seeded_text_col() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(F.lit(" host 10.0."), (did % 256).cast("string"), F.lit(".1")),
        ).otherwise(F.lit("")),
        F.when(
            did % 13 == 0,
            F.concat(F.lit(" ref "), F.lpad(did.cast("string"), 10, "0")),
        ).otherwise(F.lit("")),
        F.when(
            did % 17 == 0,
            F.concat(
                F.lit(" call +1 555-0"), F.lpad((did % 10000).cast("string"), 4, "0")
            ),
        ).otherwise(F.lit("")),
    )


def _pii_oracle() -> str:
    c = pii_sql_exprs("seeded_text")
    redacted_counts = pii_sql_exprs(redact_sql("seeded_text"))
    residual = " + ".join(redacted_counts.values())
    return f"""
    WITH seeded AS (
        SELECT doc_id, source, {_seeded_text_sql()} AS seeded_text FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM({c['email']}) AS BIGINT) AS emails,
           CAST(SUM({c['ipv4']}) AS BIGINT) AS ipv4s,
           CAST(SUM({c['phone']}) AS BIGINT) AS phones,
           CAST(SUM({c['id_number']}) AS BIGINT) AS id_numbers,
           CAST(SUM(CASE WHEN {c['email']} + {c['ipv4']} + {c['phone']}
                        + {c['id_number']} > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS flagged_docs,
           CAST(SUM({residual}) AS BIGINT) AS residual_hits
    FROM seeded
    GROUP BY source
    """


@query("docs_pii_scan", oracle=_pii_oracle())
def docs_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII detection + redaction audit over the SELF-SEEDED
    corpus (deterministic synthetic emails/IPs/phones/id-numbers injected
    identically on both engines — the raw fixture has no digits, so raw
    scanning would be a vacuous oracle). residual_hits re-scans the
    REDACTED text and must sum to zero — a redaction-order or pattern
    regression flips it."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", _seeded_text_col().alias("seeded_text")
    )
    counts = pii_counts(F.col("seeded_text"))
    residual_counts = pii_counts(redact(F.col("seeded_text")))
    residual = None
    for col in residual_counts.values():
        residual = col if residual is None else residual + col
    flagged = None
    for col in counts.values():
        flagged = col if flagged is None else flagged + col
    scanned = docs.select(
        "source",
        counts["email"].alias("_email"),
        counts["ipv4"].alias("_ipv4"),
        counts["phone"].alias("_phone"),
        counts["id_number"].alias("_idnum"),
        F.when(flagged > 0, 1).otherwise(0).alias("_flagged"),
        residual.alias("_residual"),
    )
    return scanned.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_email").cast("long").alias("emails"),
        F.sum("_ipv4").cast("long").alias("ipv4s"),
        F.sum("_phone").cast("long").alias("phones"),
        F.sum("_idnum").cast("long").alias("id_numbers"),
        F.sum("_flagged").cast("long").alias("flagged_docs"),
        F.sum("_residual").cast("long").alias("residual_hits"),
    )


VOCAB_TOP_K = 30


@query(
    "docs_vocab_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    stats AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM toks GROUP BY tok
    )
    SELECT tok, tf, df FROM stats
    ORDER BY tf DESC, tok ASC LIMIT {VOCAB_TOP_K}
    """,
)
def docs_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-{VOCAB_TOP_K} tokens by term frequency
    with document frequency — the first statistic of BPE/vocab corpus
    prep. One explode + one hash aggregate + a driver-side top-k
    (ORDER BY tf DESC, tok for a deterministic cut at tie boundaries;
    tokens are ASCII [a-z0-9]+ so both engines sort identically)."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    )
    stats = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    return stats.orderBy(F.col("tf").desc(), F.col("tok").asc()).limit(VOCAB_TOP_K)


MIN_TOKENS = 30
MAX_REP_BP = 800

_SQL_FUNNEL = f"""
    base AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> t <> '') AS l
        FROM documents
    ),
    feat AS (
        SELECT doc_id, text, len(l) AS k,
               CASE WHEN len(l) >= 2
                    THEN 10000 - (10000 * len(list_distinct(list_transform(
                             range(0, greatest(len(l) - 2, 0) + 1),
                             i -> array_to_string(l[i + 1 : i + 2], ' ')))))
                         // (len(l) - 1)
                    ELSE 0 END AS rep_bp
        FROM base
    ),
    s3 AS (
        SELECT doc_id, text FROM feat
        WHERE k >= {MIN_TOKENS} AND rep_bp <= {MAX_REP_BP}
    ),
    s4 AS (SELECT MIN(doc_id) AS doc_id, text FROM s3 GROUP BY text),
    toks4 AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> t <> '') AS l
        FROM s4
    ),
    sets4 AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(0, greatest(len(l) - 3, 0) + 1),
                   i -> array_to_string(l[i + 1 : i + 3], ' '))) AS shingles
        FROM toks4
    ),
    sized4 AS (SELECT doc_id, len(shingles) AS set_size, shingles FROM sets4),
    posts4 AS (SELECT doc_id, set_size, unnest(shingles) AS tok FROM sized4),
    common4 AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               a.set_size AS a_size, b.set_size AS b_size, COUNT(*) AS n_common
        FROM posts4 a JOIN posts4 b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ),
    pairs4 AS (
        SELECT a_id, b_id FROM common4
        WHERE CAST(n_common AS DOUBLE) / (a_size + b_size - n_common) >= 0.6
    ),
    edges4 AS (
        SELECT a_id AS src, b_id AS dst FROM pairs4
        UNION SELECT b_id, a_id FROM pairs4
    ),
    reach4(src, dst) AS (
        SELECT src, dst FROM edges4
        UNION
        SELECT r.src, e.dst FROM reach4 r JOIN edges4 e ON r.dst = e.src
    ),
    clusters4 AS (
        SELECT src AS node, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach4 GROUP BY src
    )
"""


@query(
    "docs_curation_funnel",
    oracle=f"""
    WITH RECURSIVE {_SQL_FUNNEL}
    SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage, 'all' AS stage_name,
               (SELECT COUNT(*) FROM documents) AS n_docs
        UNION ALL
        SELECT 2, 'min_length',
               (SELECT COUNT(*) FROM feat WHERE k >= {MIN_TOKENS})
        UNION ALL
        SELECT 3, 'repetition', (SELECT COUNT(*) FROM s3)
        UNION ALL
        SELECT 4, 'exact_dedup', (SELECT COUNT(*) FROM s4)
        UNION ALL
        SELECT 5, 'neardup_dedup',
               (SELECT COUNT(*) FROM s4)
               - ((SELECT COUNT(*) FROM clusters4)
                  - (SELECT COUNT(DISTINCT cluster_id) FROM clusters4))
    )
    """,
)
def docs_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel — the composition every training-data
    pipeline runs, with per-stage retention counts: raw corpus → minimum
    token length → intra-doc repetition gate (Gopher-style bigram
    repetition ≤ {MAX_REP_BP} bp) → exact dedup keep-one → near-dup
    (trigram Jaccard ≥ 0.6, connected-components) keep-one-per-cluster.

    Spark side composes the first-class operators (text.repetition_features,
    groupBy-dedup, the corpus_trigram_pairs edge cache + connected_components); only
    per-stage AGGREGATE counts reach the driver (no row data). The oracle
    recomputes all five stages in SQL, near-dup closure via recursive CTE.
    Stage-5 arithmetic: every cluster of size m retires m−1 docs, and
    isolated docs never enter the pair graph, so retained = n4 −
    (nodes − clusters)."""
    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.operators.dedup import connected_components
    from creatorops_lakehouse_spark.operators.text import (
        repetition_features,
        token_count,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    rep = repetition_features(F.col("text"))
    feat = scoped_persist(
        docs.select(
            "doc_id",
            "text",
            token_count(F.col("text")).alias("k"),
            rep["rep_bigram_bp"].alias("rep_bp"),
        )
    )
    # Stages 1-3 are nested filters over the SAME persisted projection, so
    # their three retention counts fold into ONE aggregate pass
    # (conditional counts) instead of three sequential actions — the pass
    # that materializes the persist also delivers all three numbers.
    row = feat.agg(
        F.count(F.lit(1)).alias("n1"),
        F.count(F.when(F.col("k") >= MIN_TOKENS, 1)).alias("n2"),
        F.count(
            F.when(
                (F.col("k") >= MIN_TOKENS) & (F.col("rep_bp") <= MAX_REP_BP), 1
            )
        ).alias("n3"),
    ).collect()[0]
    n1, n2, n3 = row.n1, row.n2, row.n3
    s3 = feat.filter(
        (F.col("k") >= MIN_TOKENS) & (F.col("rep_bp") <= MAX_REP_BP)
    )
    s4 = scoped_persist(s3.groupBy("text").agg(F.min("doc_id").alias("doc_id")))
    n4 = s4.count()
    # Shingle sets are per-doc invariant, so the survivor pair graph is
    # EXACTLY the corpus pair graph restricted to pairs whose both
    # endpoints survived exact dedup — a double semi-join against the
    # session's sticky verified-pair cache (queries/dedup.py::
    # corpus_trigram_pairs) instead of re-running the inverted-index
    # self-join over the survivor table.
    from creatorops_lakehouse_spark.queries.dedup import corpus_trigram_pairs

    survivors = s4.select("doc_id")
    pairs = (
        corpus_trigram_pairs(spark, sf_dir)
        .join(survivors.withColumnRenamed("doc_id", "a_id"), on="a_id", how="left_semi")
        .join(survivors.withColumnRenamed("doc_id", "b_id"), on="b_id", how="left_semi")
        .select("a_id", "b_id")
    )
    cc = connected_components(pairs)
    row = cc.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    ).collect()[0]
    n5 = n4 - (row.n_nodes - row.n_clusters)
    return spark.createDataFrame(
        [
            (1, "all", n1),
            (2, "min_length", n2),
            (3, "repetition", n3),
            (4, "exact_dedup", n4),
            (5, "neardup_dedup", n5),
        ],
        "stage long, stage_name string, n_docs long",
    )


SPAN_WINDOW = 16


@query(
    "docs_strip_duplicate_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS l FROM documents),
    wins AS (
        SELECT doc_id, u.i AS i,
               md5(array_to_string(
                   list_slice(l, u.i + 1, u.i + {SPAN_WINDOW}), ' ')) AS wh
        FROM toks, unnest(range(0, len(l) - {SPAN_WINDOW} + 1)) AS u(i)
    ),
    dup AS (
        SELECT wh, min(doc_id) AS keeper FROM wins
        GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    spans AS (
        SELECT w.doc_id, w.i FROM wins w JOIN dup d USING (wh)
        WHERE w.doc_id <> d.keeper
    ),
    covered AS (
        SELECT DISTINCT doc_id, u.idx
        FROM spans, unnest(range(i, i + {SPAN_WINDOW})) AS u(idx)
    ),
    tok_rows AS (
        SELECT doc_id, u.idx AS idx, l[u.idx + 1] AS tok
        FROM toks, unnest(range(0, len(l))) AS u(idx)
    ),
    kept AS (
        SELECT t.doc_id, t.idx, t.tok FROM tok_rows t
        WHERE NOT EXISTS (SELECT 1 FROM covered c
                          WHERE c.doc_id = t.doc_id AND c.idx = t.idx)
    ),
    reb AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(tok, ' ' ORDER BY idx) AS text_clean
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tokens,
           CAST(len(t.l) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(r.text_clean, '') AS text_clean
    FROM toks t LEFT JOIN reb r USING (doc_id)
    """,
)
def docs_strip_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup (Lee et al. 2022): every {SPAN_WINDOW}-token
    window occurring in >= 2 distinct documents keeps its min-doc_id
    occurrence and is stripped from every other document; each document's
    text is rebuilt from its surviving tokens. Hash-checks the FULL
    rebuilt strings, per-doc token counts, and removal counts against the
    oracle's recomputation — exercising window fingerprinting, span-union
    coverage, and order-preserving reassembly end-to-end."""
    from creatorops_lakehouse_spark.operators.dedup import strip_duplicate_spans

    docs = load(spark, sf_dir, "documents")
    return strip_duplicate_spans(docs, window=SPAN_WINDOW)


DSIR_BUCKETS = 4096
DSIR_SCALE = 10000
_SQL_DSIR_BUCKET = (
    f"CAST('0x' || substr(sha256(g), 1, 8) AS BIGINT) % {DSIR_BUCKETS}"
)
_SQL_DOC_ACCEPT = (
    f"CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
    f" % {DSIR_SCALE}"
)


@query(
    "docs_dsir_importance_resample",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, {_SQL_TOKENS} AS l FROM documents),
    bg AS (
        SELECT doc_id, lang, l[u.i] || ' ' || l[u.i + 1] AS g
        FROM toks, unnest(range(1, len(l))) AS u(i)
    ),
    f AS (SELECT doc_id, lang, {_SQL_DSIR_BUCKET} AS b FROM bg),
    bc AS (
        SELECT b, COUNT(*) AS raw_n,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_n
        FROM f GROUP BY b
    ),
    r AS (SELECT b, ({DSIR_SCALE} * (tgt_n + 1)) // (raw_n + 1) AS rb FROM bc),
    ds AS (
        SELECT f.doc_id, COUNT(*) AS nb, SUM(rb) AS s
        FROM f JOIN r USING (b) GROUP BY f.doc_id
    ),
    sc AS (
        SELECT d.doc_id,
               CAST(COALESCE(ds.nb, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(ds.s // ds.nb, 0) AS BIGINT) AS score_scaled
        FROM documents d LEFT JOIN ds USING (doc_id)
    )
    SELECT doc_id, n_bigrams, score_scaled,
           {_SQL_DOC_ACCEPT} < least(score_scaled, {DSIR_SCALE}) AS accepted
    FROM sc
    """,
)
def docs_dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023) in exact integers:
    hashed-bigram bucket distributions for the lang='en' target slice vs
    the raw corpus give every document a scaled importance score
    (Laplace-smoothed truncating-division ratio, mean over bigram
    occurrences); a sha256(doc_id) draw accepts each document with
    probability proportional to its score. Hash-checks per-doc feature
    counts, scores, and the accept/reject verdicts — the full selection
    pipeline — against the oracle's recomputation."""
    from creatorops_lakehouse_spark.operators.dsir import (
        importance_resample,
        importance_scores,
    )

    docs = load(spark, sf_dir, "documents")
    scores = importance_scores(
        docs,
        is_target=F.col("lang") == "en",
        n_buckets=DSIR_BUCKETS,
        scale=DSIR_SCALE,
    )
    return importance_resample(scores, scale=DSIR_SCALE)


@query(
    "docs_temperature_mixture",
    oracle="""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n
        FROM documents
        GROUP BY 1
    ),
    weighted AS (
        SELECT lang, n, CAST(FLOOR(SQRT(n)) AS BIGINT) AS w
        FROM counts
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS sw FROM weighted)
    SELECT w.lang, w.n AS n_docs, w.w AS weight_isqrt,
           CAST((2 * w.w * 1000000 + t.sw) // (2 * t.sw) AS BIGINT)
               AS share_ppm,
           CAST((2 * w.w * 10000 + t.sw) // (2 * t.sw) AS BIGINT)
               AS sampled_per_10k
    FROM weighted w, tot t
    ORDER BY w.lang
    """,
)
def docs_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture reweighting (alpha = 0.5): sampling
    shares proportional to sqrt(corpus size) — the standard multilingual
    rebalancing that up-samples low-resource languages relative to raw
    proportions (XLM-R-style alpha-sampling, here with integer-exact
    floor-sqrt weights).

    floor(sqrt(n)) is bit-stable across engines for n far below 2^52
    (IEEE sqrt is correctly rounded; the floor can only disagree within
    half an ulp of an integer boundary, impossible at corpus-count
    magnitudes). Shares and per-10k budgets round half-away-from-zero in
    pure integer arithmetic. One tiny aggregate + one-row scalar cross
    join — nothing touches the corpus twice.
    """
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    weighted = counts.select(
        "lang", "n", F.floor(F.sqrt(F.col("n"))).cast("long").alias("w")
    )
    tot = weighted.agg(F.sum("w").cast("long").alias("sw"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            F.col("w").alias("weight_isqrt"),
            # w = floor(sqrt(n)) >= 1 always, so no sign handling —
            # plain half-up integer rounding of the positive ratio
            F.expr(
                "CAST((2 * w * 1000000 + sw) div (2 * sw) AS BIGINT)"
            ).alias("share_ppm"),
            F.expr("CAST((2 * w * 10000 + sw) div (2 * sw) AS BIGINT)").alias(
                "sampled_per_10k"
            ),
        )
        .orderBy("lang")
    )


@query(
    "docs_interleave_curriculum",
    oracle="""
    WITH src AS (
        SELECT source, ROW_NUMBER() OVER (ORDER BY source) - 1 AS sidx
        FROM (SELECT DISTINCT source FROM documents)
    ),
    n AS (SELECT COUNT(*) AS n_sources FROM src),
    ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1
                   AS rank_in_source
        FROM documents
    )
    SELECT r.doc_id, r.source,
           CAST(r.rank_in_source AS BIGINT) AS rank_in_source,
           CAST(r.rank_in_source * n.n_sources + s.sidx AS BIGINT)
               AS interleave_pos
    FROM ranked r JOIN src s USING (source) CROSS JOIN n
    """,
)
def docs_interleave_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-interleaved data-loader order: reading the
    corpus by ascending ``interleave_pos`` round-robins across sources,
    each source in stable doc_id order — the third loader-order primitive
    next to docs_epoch_shuffle (seeded random permutation) and
    docs_mixture_resample (weighted sampling). Training runs use this when
    the mixture must be locally uniform from step 0 (no burn-in window
    dominated by whichever source a shuffle front-loaded).

    Scale shape: the per-source rank is a PARTITIONED window (source is the
    partition key — no single-partition global window; a skewed giant
    source is the data's own skew, the same row set any loader must order).
    The source index comes from a driver-side sort of the DISTINCT source
    list — a bounded-cardinality metadata collect (sources are a dimension,
    like the k-row centroid pulls PLAN_AUDIT sanctions), broadcast back as
    a literal map. interleave_pos = rank·n_sources + sidx is collision-free
    by construction; exhausted sources leave gaps, which a priority order
    tolerates (consumers sort, they don't index)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    raw_sources = [r[0] for r in docs.select("source").distinct().collect()]
    # A NULL source would crash the driver-side sorted() (TypeError) and,
    # worse, silently yield a null interleave_pos via element_at while the
    # oracle's join still emits the row — fail loud instead (ADVICE r6).
    if any(s is None for s in raw_sources):
        raise ValueError(
            "docs_interleave_curriculum: NULL source value in documents; "
            "coalesce sources to a sentinel before interleaving"
        )
    sources = sorted(raw_sources)
    n_sources = len(sources)
    sidx = F.element_at(
        F.create_map(
            *[F.lit(x) for pair in zip(sources, range(n_sources)) for x in pair]
        ),
        F.col("source"),
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    return docs.select(
        "doc_id",
        "source",
        (F.row_number().over(w) - 1).cast("long").alias("rank_in_source"),
    ).withColumn(
        "interleave_pos",
        (F.col("rank_in_source") * n_sources + sidx).cast("long"),
    )


N_SHARDS = 8


@query(
    "docs_shard_manifest",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, CAST(len({_SQL_TOKENS}) AS BIGINT) AS w FROM documents
    ),
    r AS (
        SELECT w, ROW_NUMBER() OVER (ORDER BY w DESC, doc_id) - 1 AS r0
        FROM toks
    ),
    s AS (
        SELECT w,
               CAST(CASE WHEN (r0 // {N_SHARDS}) % 2 = 0
                    THEN r0 % {N_SHARDS}
                    ELSE {N_SHARDS} - 1 - (r0 % {N_SHARDS}) END AS INT)
                   AS shard_id
        FROM r
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS sum_tokens,
           CAST(MAX(w) AS BIGINT) AS max_doc_tokens,
           CAST(MIN(w) AS BIGINT) AS min_doc_tokens
    FROM s GROUP BY shard_id
    """,
)
def docs_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: deal every document into {N_SHARDS} output
    shards by snake placement over the (token count DESC, doc_id) rank
    (operators/packing.py::shard_snake) and report each shard's document
    count and token budget. The hash check against the oracle's
    ROW_NUMBER replay pins the PLACEMENT itself — every document provably
    lands in the same shard in both engines — while the sum_tokens spread
    across the 8 rows exhibits the balance property the layout exists for
    (the slowest data-loader shard gates every training step).

    Scale shape: distributed_global_rank (range shuffle, no global
    window) + one hash aggregate on shard_id.
    """
    from creatorops_lakehouse_spark.operators.packing import shard_snake
    from creatorops_lakehouse_spark.operators.text import token_count

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("w")
    )
    return (
        shard_snake(docs, "w", "doc_id", N_SHARDS)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("sum_tokens"),
            F.max("w").cast("long").alias("max_doc_tokens"),
            F.min("w").cast("long").alias("min_doc_tokens"),
        )
    )
