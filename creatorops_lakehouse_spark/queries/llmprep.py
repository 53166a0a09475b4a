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
from pyspark.sql import DataFrame, SparkSession

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
