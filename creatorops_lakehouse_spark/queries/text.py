"""Text-analysis queries over the driver ``documents`` table.

Token counting, quality signals, language stats, multimodal byte metadata —
all native-function projections (SURVEY.md §7.4 extension surface). Oracle
parity: token regexes are written identically for Spark and DuckDB; ratios
round through exact integer arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from creatorops_lakehouse_spark.operators.multimodal import to_asset_table
from creatorops_lakehouse_spark.operators.text import quality_features, token_count
from creatorops_lakehouse_spark.queries import exact_avg_expr, exact_avg_sql, load, query

#: identical token regex on both engines
_SQL_TOKENS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"


@query(
    "docs_token_stats_by_lang",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_SQL_TOKENS})) AS BIGINT) AS total_tokens,
           {exact_avg_sql("CAST(SUM(len(" + _SQL_TOKENS + ")) AS BIGINT)", "COUNT(*)", 4)}
               AS avg_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {exact_avg_sql("CAST(SUM(n_chars) AS BIGINT)", "COUNT(*)", 4)} AS avg_chars
    FROM documents
    GROUP BY 1
    """,
)
def docs_token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting aggregated by language (whitespace+regex tokenizer)."""
    docs = load(spark, sf_dir, "documents").select(
        "lang", "n_chars", token_count(F.col("text")).alias("n_tokens")
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            exact_avg_expr("total_tokens", "n_docs", 4).alias("avg_tokens"),
            "total_chars",
            exact_avg_expr("total_chars", "n_docs", 4).alias("avg_chars"),
        )
    )


@query(
    "docs_quality_signals",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN len({_SQL_TOKENS}) >= 40 THEN 1 ELSE 0 END) AS BIGINT)
               AS long_docs,
           CAST(SUM(len(list_distinct({_SQL_TOKENS}))) AS BIGINT) AS total_distinct_tokens,
           {exact_avg_sql(
               "CAST(SUM(10000 * len(list_distinct(" + _SQL_TOKENS + "))"
               " // GREATEST(len(" + _SQL_TOKENS + "), 1)) AS BIGINT)",
               "10000 * COUNT(*)",
               4,
           )} AS avg_diversity
    FROM documents
    GROUP BY 1
    """,
)
def docs_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals per source: doc length classes + lexical diversity.

    Diversity per doc is computed in scaled-integer space (x10000 integer
    division) so the per-doc value is integral and both engines sum exact
    ints — the oracle-parity pattern for ratios of ratios.
    """
    feats = quality_features(F.col("text"))
    docs = load(spark, sf_dir, "documents").select(
        "source",
        feats["n_tokens"].alias("n_tokens"),
        feats["n_distinct_tokens"].alias("n_distinct"),
    )
    diversity_scaled = F.expr("10000 * n_distinct div greatest(n_tokens, 1)")
    per_doc = docs.withColumn("div_scaled", diversity_scaled)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("n_tokens") >= 40, 1).otherwise(0)).alias("long_docs"),
            F.sum("n_distinct").alias("total_distinct_tokens"),
            F.sum("div_scaled").alias("_div_sum"),
        )
        .select(
            "source",
            "n_docs",
            "long_docs",
            "total_distinct_tokens",
            exact_avg_expr("_div_sum", "10000 * n_docs", 4).alias("avg_diversity"),
        )
    )


@query(
    "docs_multimodal_bytes",
    oracle="""
    SELECT source,
           COUNT(*) AS n_assets,
           CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
           MIN(sha256(text)) AS min_sha
    FROM documents
    GROUP BY 1
    """,
)
def docs_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal asset-table plumbing: text payloads as opaque BINARY with
    byte-length + sha256 metadata (operators/multimodal.to_asset_table) —
    metadata-only aggregation never touches the payload bytes at scan time
    (column pruning)."""
    docs = load(spark, sf_dir, "documents")
    assets = to_asset_table(docs, "doc_id", "text", "image").join(
        docs.select(F.col("doc_id").alias("asset_id"), "source"), on="asset_id"
    )
    return assets.groupBy("source").agg(
        F.count("*").alias("n_assets"),
        F.sum("content_length").alias("total_bytes"),
        F.min("content_sha256").alias("min_sha"),
    )
