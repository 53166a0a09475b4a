"""Text-analysis queries over the driver ``documents`` table.

Token counting, quality signals, language stats, multimodal byte metadata —
all native-function projections (SURVEY.md §7.4 extension surface). Oracle
parity: token regexes are written identically for Spark and DuckDB; ratios
round through exact integer arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from creatorops_lakehouse_spark.operators.multimodal import to_asset_table
from creatorops_lakehouse_spark.operators.text import (
    quality_features,
    token_count,
    tokens,
)
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


#: DuckDB per-doc expressions mirroring operators/text.py::repetition_features
#: (scaled-integer signals; integer division // on both engines)
_SQL_REP_DOC = """
    doc_sig AS (
        SELECT lang,
               len(l) AS k,
               CASE WHEN len(l) >= 2
                    THEN 10000 - (10000 * len(list_distinct(list_transform(
                             range(0, greatest(len(l) - 2, 0) + 1),
                             i -> array_to_string(l[i + 1 : i + 2], ' ')))))
                         // (len(l) - 1)
                    ELSE 0 END AS rep_bigram_bp,
               CASE WHEN len(lines) >= 1
                    THEN 10000 - (10000 * len(list_distinct(lines))) // len(lines)
                    ELSE 0 END AS dup_line_bp,
               (100 * COALESCE(CAST(list_sum(list_transform(l, t -> len(t)))
                                    AS BIGINT), 0))
                   // greatest(len(l), 1) AS mean_word_len_c,
               (10000 * (len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g'))))
                   // greatest(len(text), 1) AS symbol_bp,
               (10000 * len(list_filter(l, t -> list_contains(
                    ['the','and','of','to','in','is','that','it','for','with'], t))))
                   // greatest(len(l), 1) AS stopword_bp
        FROM (
            SELECT lang, text,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               t -> t <> '') AS l,
                   list_filter(string_split(text, chr(10)), x -> x <> '') AS lines
            FROM documents
        )
    )
"""


@query(
    "docs_repetition_signals",
    oracle=f"""
    WITH {_SQL_REP_DOC}
    SELECT lang,
           COUNT(*) AS n_docs,
           {exact_avg_sql("CAST(SUM(rep_bigram_bp) AS BIGINT)", "COUNT(*)", 2)}
               AS avg_rep_bigram_bp,
           {exact_avg_sql("CAST(SUM(dup_line_bp) AS BIGINT)", "COUNT(*)", 2)}
               AS avg_dup_line_bp,
           {exact_avg_sql("CAST(SUM(mean_word_len_c) AS BIGINT)", "COUNT(*)", 2)}
               AS avg_word_len_c,
           {exact_avg_sql("CAST(SUM(symbol_bp) AS BIGINT)", "COUNT(*)", 2)}
               AS avg_symbol_bp,
           {exact_avg_sql("CAST(SUM(stopword_bp) AS BIGINT)", "COUNT(*)", 2)}
               AS avg_stopword_bp,
           CAST(MAX(rep_bigram_bp) AS BIGINT) AS max_rep_bigram_bp
    FROM doc_sig
    GROUP BY 1
    """,
)
def docs_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition + noise filters aggregated by language:
    repeated-bigram fraction, duplicate-line fraction, mean word length,
    symbol ratio, stopword fraction — the standard pre-training corpus
    quality gates. Per-doc values are scaled integers (basis points), so
    both engines aggregate exactly; one projection + one hash aggregate."""
    from creatorops_lakehouse_spark.operators.text import repetition_features

    sig = repetition_features(F.col("text"))
    docs = load(spark, sf_dir, "documents").select(
        "lang", *[expr.alias(name) for name, expr in sig.items()]
    )
    agg = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("rep_bigram_bp").alias("_s_rep"),
        F.sum("dup_line_bp").alias("_s_dup"),
        F.sum("mean_word_len_c").alias("_s_mwl"),
        F.sum("symbol_bp").alias("_s_sym"),
        F.sum("stopword_bp").alias("_s_stop"),
        F.max("rep_bigram_bp").alias("max_rep_bigram_bp"),
    )
    return agg.select(
        "lang",
        "n_docs",
        exact_avg_expr("_s_rep", "n_docs", 2).alias("avg_rep_bigram_bp"),
        exact_avg_expr("_s_dup", "n_docs", 2).alias("avg_dup_line_bp"),
        exact_avg_expr("_s_mwl", "n_docs", 2).alias("avg_word_len_c"),
        exact_avg_expr("_s_sym", "n_docs", 2).alias("avg_symbol_bp"),
        exact_avg_expr("_s_stop", "n_docs", 2).alias("avg_stopword_bp"),
        "max_rep_bigram_bp",
    )


#: DuckDB per-doc mirror of operators/text.py::quality_classifier_logit —
#: the same scaled-integer signals as _SQL_REP_DOC keyed by (source,
#: doc_id), folded through the fixed QC_WEIGHTS linear head
_SQL_QC_DOC = """
    clf AS (
        SELECT source, doc_id,
               3 * ((10000 * len(list_filter(l, t -> list_contains(
                        ['the','and','of','to','in','is','that','it','for','with'],
                        t)))) // greatest(len(l), 1))
               - 2 * (CASE WHEN len(l) >= 2
                      THEN 10000 - (10000 * len(list_distinct(list_transform(
                               range(0, greatest(len(l) - 2, 0) + 1),
                               i -> array_to_string(l[i + 1 : i + 2], ' ')))))
                           // (len(l) - 1)
                      ELSE 0 END)
               - 2 * (CASE WHEN len(lines) >= 1
                      THEN 10000 - (10000 * len(list_distinct(lines)))
                           // len(lines)
                      ELSE 0 END)
               - 3 * ((10000 * (len(text)
                        - len(regexp_replace(text, '[^\\w\\s]', '', 'g'))))
                   // greatest(len(text), 1))
               + LEAST(len(text), 2000)
               - ABS((100 * COALESCE(CAST(list_sum(list_transform(
                          l, t -> len(t))) AS BIGINT), 0))
                     // greatest(len(l), 1) - 450)
                   AS logit
        FROM (
            SELECT source, doc_id, text,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               t -> t <> '') AS l,
                   list_filter(string_split(text, chr(10)), x -> x <> '') AS lines
            FROM documents
        )
    )
"""


@query(
    "docs_quality_classifier",
    oracle=f"""
    WITH {_SQL_QC_DOC}
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN logit >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           (10000 * CAST(SUM(CASE WHEN logit >= 0 THEN 1 ELSE 0 END) AS BIGINT))
               // COUNT(*) AS keep_bp,
           CAST(SUM(logit) AS BIGINT) AS sum_logit,
           CAST(SUM(CASE WHEN logit >= 0 THEN doc_id ELSE 0 END) AS BIGINT)
               AS sum_kept_doc_id
    FROM clf
    GROUP BY 1
    """,
)
def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the fastText-classifier stage of
    CCNet/LLaMA-class curation, reduced to an auditable linear head): a
    fixed-weight integer logit over the exact-integer repetition/noise
    signals, thresholded at 0 (≈78% keep on this corpus — the C4-scale
    acceptance band). Distinct from the heuristic docs_quality_signals
    gates: this is ONE trained-model-shaped score, so re-weighting (a
    real trained head's coefficients) slots in without touching the
    pipeline. Per-source keep rates in exact basis points plus the exact
    kept-membership pin (sum of kept doc_ids) — a wrong sign, a wrong
    weight, or a threshold slip flips the hash.

    100 TB: pure Column expressions, no shuffle before the per-source
    aggregate; the filter fuses into the corpus scan exactly like the
    heuristic gates (one codegen pass, embarrassingly parallel)."""
    from creatorops_lakehouse_spark.operators.text import quality_classifier_logit

    docs = load(spark, sf_dir, "documents").select(
        "source", "doc_id", quality_classifier_logit(F.col("text")).alias("logit")
    )
    keep = F.when(F.col("logit") >= 0, 1).otherwise(0)
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(keep).alias("n_keep"),
            F.sum("logit").alias("sum_logit"),
            F.sum(F.when(F.col("logit") >= 0, F.col("doc_id")).otherwise(0)).alias(
                "sum_kept_doc_id"
            ),
        )
        .select(
            "source",
            "n_docs",
            "n_keep",
            F.expr("10000 * n_keep div n_docs").alias("keep_bp"),
            "sum_logit",
            "sum_kept_doc_id",
        )
    )


#: DuckDB mirror of operators/sampling.py::hash_bucket — bit-identical
_SQL_BUCKET = (
    "CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000"
)


@query(
    "docs_train_eval_split",
    oracle=f"""
    WITH assigned AS (
        SELECT lang,
               CASE WHEN {_SQL_BUCKET} < 9000 THEN 'train'
                    WHEN {_SQL_BUCKET} < 9500 THEN 'eval'
                    ELSE 'test' END AS split,
               doc_id
        FROM documents
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM assigned
    GROUP BY 1, 2
    """,
)
def docs_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/eval/test split, stratifiable by any
    column downstream: assignment is sha256(doc_id)-bucketed, so it is
    reproducible across engines and STABLE under corpus growth (a doc's
    split never changes when other docs arrive — unlike randomSplit, which
    is partition-order-dependent). sum_doc_id pins the exact membership,
    not just the counts."""
    from creatorops_lakehouse_spark.operators.sampling import stratified_split

    docs = stratified_split(
        load(spark, sf_dir, "documents"),
        "doc_id",
        {"train": 0.90, "eval": 0.05, "test": 0.05},
    )
    return docs.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


@query(
    "docs_balanced_lang_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {_SQL_BUCKET} ASC, doc_id ASC
               ) AS rn
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_sampled,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           MIN(doc_id) AS min_doc_id
    FROM ranked
    WHERE rn <= 25
    GROUP BY 1
    """,
)
def docs_balanced_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25-docs-per-language sample (balanced eval-set
    curation): rank by (sha-bucket, id) inside each language, keep the
    first 25. Reproducible in any engine; sum/min of sampled ids pin the
    exact membership."""
    from creatorops_lakehouse_spark.operators.sampling import per_group_sample

    sample = per_group_sample(
        load(spark, sf_dir, "documents"), "lang", "doc_id", k=25
    )
    return sample.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.min("doc_id").alias("min_doc_id"),
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


@query(
    "docs_decontaminate_eval",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS l FROM documents
    ),
    grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(0, greatest(len(l) - 5, 0) + 1),
                   i -> array_to_string(l[i + 1 : i + 5], ' '))) AS grams
        FROM toks
    ),
    assigned AS (
        SELECT doc_id, grams,
               CASE WHEN {_SQL_BUCKET} < 9000 THEN 'train'
                    WHEN {_SQL_BUCKET} < 9500 THEN 'eval'
                    ELSE 'test' END AS split
        FROM grams
    ),
    ev AS (
        SELECT DISTINCT unnest(grams) AS gram FROM assigned WHERE split = 'eval'
    ),
    tr AS (
        SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
               unnest(grams) AS gram
        FROM assigned WHERE split = 'train'
    )
    SELECT tr.doc_id, tr.n_grams,
           COUNT(*) AS n_hit,
           (10000 * COUNT(*)) // tr.n_grams AS hit_bp
    FROM tr JOIN ev USING (gram)
    GROUP BY 1, 2
    """,
)
def docs_decontaminate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train-split documents sharing a word
    5-gram with the eval split (GPT-3-style n-gram overlap). The eval
    n-gram set is broadcast — the corpus side never shuffles text; only
    matching (doc_id, count) pairs reach the aggregation. Exact integer
    stats (hit count + basis points) keep it oracle-checkable."""
    from creatorops_lakehouse_spark.operators.decontam import ngram_contamination
    from creatorops_lakehouse_spark.operators.sampling import stratified_split

    docs = stratified_split(
        load(spark, sf_dir, "documents"),
        "doc_id",
        {"train": 0.90, "eval": 0.05, "test": 0.05},
    )
    return ngram_contamination(
        docs.filter(F.col("split") == "train"),
        docs.filter(F.col("split") == "eval"),
        n=5,
    )


@query(
    "docs_token_rarity_by_source",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    docset AS (SELECT DISTINCT doc_id, tok FROM toks),
    vocab AS (SELECT tok, 1000000 // COUNT(*) AS w FROM docset GROUP BY tok),
    scored AS (
        SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(v.w) AS BIGINT) AS rarity_sum
        FROM toks t JOIN vocab v USING (tok) GROUP BY t.doc_id
    ),
    means AS (
        SELECT doc_id, k, rarity_sum, rarity_sum // k AS mean_c FROM scored
    ),
    tot AS (SELECT COUNT(*) AS n_total, SUM(mean_c) AS sum_mean FROM means)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(m.k) AS BIGINT) AS n_tokens,
           CAST(SUM(m.rarity_sum) AS BIGINT) AS rarity_sum,
           CAST(SUM(CASE WHEN m.mean_c * t.n_total >= 2 * t.sum_mean
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
           CAST(SUM(CASE WHEN m.mean_c * t.n_total <= t.sum_mean
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_head
    FROM means m CROSS JOIN tot t JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
)
def docs_token_rarity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style token-rarity quality proxy, aggregated per source:
    per-occurrence surprisal weight = 1e6 // document-frequency, per-doc
    mean compared against corpus-relative head/tail bounds as
    cross-multiplied integers (operators/rarity.py) — every value exact
    integer arithmetic, every boundary doc engine-portable. The vocabulary
    is broadcast, so the corpus text never shuffles; the per-doc aggregate
    combines map-side into one row per document."""
    from creatorops_lakehouse_spark.operators.rarity import (
        rarity_buckets,
        rarity_scores,
    )

    docs = load(spark, sf_dir, "documents")
    buckets = rarity_buckets(rarity_scores(docs.select("doc_id", "text")))
    joined = buckets.join(docs.select("doc_id", "source"), "doc_id")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("rarity_sum").cast("long").alias("rarity_sum"),
        F.sum(F.when(F.col("bucket") == "tail", 1).otherwise(0))
        .cast("long")
        .alias("n_tail"),
        F.sum(F.when(F.col("bucket") == "head", 1).otherwise(0))
        .cast("long")
        .alias("n_head"),
    )


#: target language mixture (basis points; must sum to 10000)
MIX_WEIGHTS = {"en": 4000, "de": 1500, "es": 1500, "fr": 1500, "zh": 1500}

_SQL_MIX_VALUES = ", ".join(f"('{g}', {w})" for g, w in MIX_WEIGHTS.items())


@query(
    "docs_mixture_resample",
    oracle=f"""
    WITH w(lang, wbp) AS (VALUES {_SQL_MIX_VALUES}),
    counts AS (
        SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_avail
        FROM documents d JOIN w ON d.lang = w.lang GROUP BY d.lang
    ),
    t AS (SELECT MIN(c.n_avail * 10000 // w.wbp) AS t
          FROM counts c JOIN w ON c.lang = w.lang),
    targets AS (
        SELECT w.lang, CAST(w.wbp * t.t // 10000 AS BIGINT) AS k_target
        FROM w CROSS JOIN t
    ),
    ranked AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {_SQL_BUCKET} ASC, doc_id ASC
               ) AS rn
        FROM documents
    ),
    kept AS (
        SELECT r.lang, r.doc_id
        FROM ranked r JOIN targets tg ON r.lang = tg.lang AND r.rn <= tg.k_target
    )
    SELECT c.lang, c.n_avail, tg.k_target,
           CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
           CAST(SUM(k.doc_id) AS BIGINT) AS sum_doc_id
    FROM counts c
    JOIN targets tg ON c.lang = tg.lang
    LEFT JOIN kept k ON k.lang = c.lang
    GROUP BY 1, 2, 3
    """,
)
def docs_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixture reweighting (the data-mixing step between curation
    and packing): subsample to a target language mixture — en 40%, the
    rest 15% each — at the largest total the binding group can supply
    (T = min n_g·1e4//w_g; exact basis-point integer arithmetic), with
    per-group membership chosen by the sha256 hash-rank primitive
    (operators/mixing.py). n_avail/k_target expose the computed plan;
    n_kept + sum_doc_id pin the exact selected membership."""
    from creatorops_lakehouse_spark.operators.mixing import (
        mixture_sample,
        mixture_targets,
    )

    docs = load(spark, sf_dir, "documents")
    counts = {
        r[0]: r[1]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1))).collect()
        if r[0] in MIX_WEIGHTS
    }
    targets = mixture_targets(counts, MIX_WEIGHTS)
    plan = spark.createDataFrame(
        [(g, counts[g], targets[g]) for g in sorted(MIX_WEIGHTS)],
        "lang string, n_avail long, k_target long",
    )
    kept = mixture_sample(docs, "lang", "doc_id", MIX_WEIGHTS)
    agg = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_doc_id"),
    )
    return plan.join(agg, "lang", "left").select(
        "lang",
        "n_avail",
        "k_target",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        "sum_doc_id",
    )


_SQL_BPE_RE = "''s|''t|''re|''ve|''m|''ll|''d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s'']+"

#: deterministic punctuation/digit/contraction seeding: the driver corpus
#: is pure lowercase words (no digits, no punctuation — see docs_pii_scan's
#: note), so raw pre-token counts equal whitespace counts and the query
#: would be a vacuous distinction. Both engines append the identical
#: suffix, built from doc_id.
_SQL_BPE_SEED = (
    "text || CASE WHEN doc_id % 3 = 0"
    " THEN ' it''s v' || CAST(doc_id % 100 AS VARCHAR) || '.2, (beta)!' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' we''re 100% done...' ELSE '' END"
)


def _bpe_seed_col() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" it's v"), (did % 100).cast("string"), F.lit(".2, (beta)!")
            ),
        ).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit(" we're 100% done...")).otherwise(F.lit("")),
    )


@query(
    "docs_bpe_pretoken_stats",
    oracle=f"""
    WITH seeded AS (
        SELECT lang, {_SQL_BPE_SEED} AS text FROM documents
    ),
    toks AS (
        SELECT lang,
               len(regexp_extract_all(lower(text), '{_SQL_BPE_RE}')) AS n_pre,
               len({_SQL_TOKENS}) AS n_ws
        FROM seeded
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_pre) AS BIGINT) AS total_pre_tokens,
           CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
           {exact_avg_sql("CAST(SUM(n_pre) AS BIGINT)", "COUNT(*)", 4)}
               AS avg_pre_tokens
    FROM toks
    GROUP BY 1
    """,
)
def docs_bpe_pretoken_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer counts vs whitespace-word counts per language
    (operators/text.py::bpe_pretokens — the GPT-2 pattern family in the
    RE2 ∩ Java portable subset): punctuation/digit runs and contraction
    suffixes count as their own tokens, the approximation context-budget
    packing actually needs. Runs over SELF-SEEDED text (deterministic
    contractions/version strings/punctuation appended identically on both
    engines — the raw fixture is pure lowercase words, where the two
    tokenizers coincide and the comparison would be vacuous). One
    projection + one hash aggregate; both engines run the literally
    identical pattern."""
    from creatorops_lakehouse_spark.operators.text import (
        bpe_pretokens,
        token_count,
    )

    docs = load(spark, sf_dir, "documents").select(
        "lang",
        F.size(bpe_pretokens(_bpe_seed_col())).alias("n_pre"),
        token_count(_bpe_seed_col()).alias("n_ws"),
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pre").cast("long").alias("total_pre_tokens"),
            F.sum("n_ws").cast("long").alias("total_ws_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "total_pre_tokens",
            "total_ws_tokens",
            exact_avg_expr("total_pre_tokens", "n_docs", 4).alias("avg_pre_tokens"),
        )
    )


N_EPOCHS = 2


@query(
    "docs_epoch_shuffle",
    oracle=f"""
    WITH e AS (SELECT unnest(range(0, {N_EPOCHS})) AS epoch),
    h AS (
        SELECT e.epoch, d.doc_id,
               CAST('0x' || substr(sha256(
                   'e' || e.epoch || ':' || CAST(d.doc_id AS VARCHAR)
               ), 1, 8) AS BIGINT) % 4294967296 AS hb
        FROM documents d CROSS JOIN e
    )
    SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY epoch ORDER BY hb, doc_id
           ) - 1 AS BIGINT) AS epoch_pos
    FROM h
    """,
)
def docs_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training order (operators/sampling.py::
    epoch_order): each epoch permutes the corpus under the salted
    sha256('e<epoch>:' || doc_id) hash — uniform-pseudorandom per epoch,
    bit-reproducible across engines and runs (checkpoint-resumable
    ablations). Hash-checks the COMPLETE position assignment of
    {N_EPOCHS} epochs against the oracle's recomputation."""
    from creatorops_lakehouse_spark.operators.sampling import epoch_orders

    docs = load(spark, sf_dir, "documents").select("doc_id")
    # all epochs in ONE two-phase pass (one counts collect + one ranking
    # window instead of one of each per epoch); per-epoch positions are
    # bit-identical to the per-epoch operator
    return epoch_orders(docs, "doc_id", list(range(N_EPOCHS))).select(
        "epoch", "doc_id", "epoch_pos"
    )


#: composite quality gate thresholds (symbol cap in basis points; length
#: and repetition reuse the funnel constants — single source of truth)
MAX_SYMBOL_BP = 3000

from creatorops_lakehouse_spark.queries.dedup import (  # noqa: E402
    _SQL_TOKENS as _SQL_GATE_TOKENS,
)
from creatorops_lakehouse_spark.queries.llmprep import (  # noqa: E402
    MAX_REP_BP as _GATE_MAX_REP,
    MIN_TOKENS as _GATE_MIN_TOKENS,
)


@query(
    "docs_quality_gate",
    oracle=f"""
    WITH base AS (SELECT doc_id, text, {_SQL_GATE_TOKENS} AS l FROM documents),
    feat AS (
        SELECT doc_id, text, len(l) AS k,
               CASE WHEN len(l) >= 2
                    THEN 10000 - (10000 * len(list_distinct(list_transform(
                             range(0, greatest(len(l) - 2, 0) + 1),
                             i -> array_to_string(l[i + 1 : i + 2], ' ')))))
                         // (len(l) - 1)
                    ELSE 0 END AS rep_bp,
               (10000 * (len(text) -
                         len(regexp_replace(text, '[^\\w\\s]', '', 'g'))))
                   // greatest(len(text), 1) AS sym_bp
        FROM base
    ),
    keepers AS (
        SELECT text, MIN(doc_id) AS keeper FROM feat
        WHERE k >= {_GATE_MIN_TOKENS} AND rep_bp <= {_GATE_MAX_REP}
              AND sym_bp <= {MAX_SYMBOL_BP}
        GROUP BY text
    ),
    verdict AS (
        SELECT f.doc_id, f.k,
               CASE WHEN f.k < {_GATE_MIN_TOKENS} THEN 'too_short'
                    WHEN f.rep_bp > {_GATE_MAX_REP} THEN 'repetitive'
                    WHEN f.sym_bp > {MAX_SYMBOL_BP} THEN 'symbol_heavy'
                    WHEN f.doc_id <> kp.keeper THEN 'exact_dup'
                    ELSE 'ok' END AS reason
        FROM feat f LEFT JOIN keepers kp USING (text)
    )
    SELECT doc_id, CAST(k AS BIGINT) AS n_tokens, reason,
           reason = 'ok' AS keep
    FROM verdict
    """,
)
def docs_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level curation verdicts with reason codes — the document
    analogue of the events contract's quarantine taxonomy (clq/contract.py
    D5): every document gets keep=TRUE or its FIRST failing reason in
    fixed priority order (too_short → repetitive → symbol_heavy →
    exact_dup → ok). Dedup keepers are chosen among quality-PASSING
    documents (funnel semantics: dedup runs after the quality stages), so
    a duplicate of a rejected doc is judged on its own text. Same
    thresholds as docs_curation_funnel — the funnel reports stage COUNTS,
    this reports the per-document audit trail."""
    from creatorops_lakehouse_spark.operators.text import (
        repetition_features,
        token_count,
    )
    from creatorops_lakehouse_spark.queries.llmprep import (
        MAX_REP_BP,
        MIN_TOKENS,
    )

    docs = load(spark, sf_dir, "documents")
    rep = repetition_features(F.col("text"))
    feat = docs.select(
        "doc_id",
        "text",
        token_count(F.col("text")).alias("k"),
        rep["rep_bigram_bp"].alias("rep_bp"),
        rep["symbol_bp"].alias("sym_bp"),
    )
    qp = (
        (F.col("k") >= MIN_TOKENS)
        & (F.col("rep_bp") <= MAX_REP_BP)
        & (F.col("sym_bp") <= MAX_SYMBOL_BP)
    )
    keepers = (
        feat.filter(qp).groupBy("text").agg(F.min("doc_id").alias("_keeper"))
    )
    reason = (
        F.when(F.col("k") < MIN_TOKENS, "too_short")
        .when(F.col("rep_bp") > MAX_REP_BP, "repetitive")
        .when(F.col("sym_bp") > MAX_SYMBOL_BP, "symbol_heavy")
        .when(F.col("doc_id") != F.col("_keeper"), "exact_dup")
        .otherwise("ok")
    )
    return (
        feat.join(keepers, "text", "left")
        .select(
            "doc_id",
            F.col("k").cast("long").alias("n_tokens"),
            reason.alias("reason"),
        )
        .withColumn("keep", F.col("reason") == "ok")
    )


FRAME_BYTES = 64
FRAME_STRIDE = 2


@query(
    "docs_frame_sample",
    oracle=f"""
    WITH a AS (
        SELECT doc_id AS asset_id, text, len(text) AS L
        FROM documents WHERE len(text) > 0
    ),
    f AS (
        SELECT asset_id, u.i AS frame_idx,
               substr(text, u.i * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS fr
        FROM a, unnest(range(0, (L + {FRAME_BYTES - 1}) // {FRAME_BYTES},
                             {FRAME_STRIDE})) AS u(i)
    )
    SELECT asset_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(octet_length(CAST(fr AS BLOB)) AS BIGINT) AS frame_len,
           sha256(fr) AS frame_sha256
    FROM f
    """,
)
def docs_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plumbing (operators/multimodal.py::
    sample_frames): every {FRAME_STRIDE}ᵗʰ {FRAME_BYTES}-byte block of
    each asset's binary payload with per-frame length + sha256 — the
    demux-and-sample grid with the decoder stubbed (no media lib in this
    environment). Pure expressions, no UDF. The oracle mirrors the byte
    slicing on the text payload (the fixture is ASCII, so character and
    byte offsets coincide; real binary assets exercise the same Spark
    expressions) and hash-checks every sampled frame's digest."""
    docs = load(spark, sf_dir, "documents")
    from creatorops_lakehouse_spark.operators.multimodal import sample_frames

    assets = to_asset_table(docs, "doc_id", "text", "video")
    return sample_frames(
        assets, frame_bytes=FRAME_BYTES, stride=FRAME_STRIDE
    ).drop("frame")


@query(
    "docs_bpe_top_merges",
    oracle=f"""
    WITH seeded AS (
        SELECT {_SQL_BPE_SEED} AS text FROM documents
    ),
    pre AS (
        SELECT u.w AS w
        FROM seeded, unnest(regexp_extract_all(lower(text), '{_SQL_BPE_RE}'))
             AS u(w)
    ),
    pairs AS (
        SELECT substr(w, v.i, 2) AS pair
        FROM pre, unnest(range(1, len(w))) AS v(i)
        WHERE len(w) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM pairs GROUP BY 1
    ORDER BY n_occurrences DESC, pair ASC
    LIMIT 10
    """,
)
def docs_bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE training inner loop, first iteration: count every adjacent
    character pair inside every pre-token occurrence (occurrence-weighted,
    exactly what the merge-selection step of byte-pair encoding computes)
    and return the top-10 merge candidates under a total deterministic
    order (count desc, pair asc). Explode + hash aggregate — one shuffle
    carrying (2-char pair) rows; at 100 TB the pair alphabet is tiny so
    partial aggregation collapses the map side to ~|alphabet|² rows per
    task. Runs over the same self-seeded text as docs_bpe_pretoken_stats
    (the raw fixture is pure lowercase words — seeding makes punctuation/
    contraction pairs real)."""
    from creatorops_lakehouse_spark.operators.text import bpe_pretokens

    docs = load(spark, sf_dir, "documents")
    pre = docs.select(
        F.explode(bpe_pretokens(_bpe_seed_col())).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = pre.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(10)
    )


def _lang_oracle() -> str:
    """Build the lang-id confusion oracle from LANG_PROFILES so the SQL
    stopword lists can never drift from the operator's."""
    from creatorops_lakehouse_spark.operators.text import LANG_PROFILES

    score_cols = ",\n               ".join(
        f"len(list_intersect(t, [{', '.join(repr(w) for w in words)}])) AS s_{lang}"
        for lang, words in LANG_PROFILES.items()
    )
    langs = list(LANG_PROFILES)  # tie-break: first-listed wins
    # first lang attaining the running strict max == iterative argmax chain
    arms = []
    for i, lang in enumerate(langs):
        rest = langs[i + 1 :]
        if rest:
            cond = " AND ".join(f"s_{lang} >= s_{r}" for r in rest)
            arms.append(f"WHEN {cond} THEN '{lang}'")
        else:
            arms.append(f"ELSE '{lang}'")
    all_scores = ", ".join(f"s_{lang}" for lang in langs)
    return f"""
    WITH toks AS (
        SELECT lang AS labeled_lang,
               list_distinct({_SQL_TOKENS}) AS t
        FROM documents
    ),
    scores AS (
        SELECT labeled_lang,
               {score_cols}
        FROM toks
    )
    SELECT labeled_lang,
           CASE WHEN greatest({all_scores}) < 1 THEN 'und'
                {' '.join(arms)}
           END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM scores
    GROUP BY 1, 2
    ORDER BY 1, 2
    """


@query("docs_lang_id_confusion", oracle=_lang_oracle())
def docs_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled lang vs the stopword-profile
    heuristic's prediction (operators/text.py::lang_id).

    Pure Column expressions (array_intersect over the distinct token set) —
    one codegen-fused projection pass, no shuffle beyond the tiny 
    (labeled x predicted) aggregate. Documents in languages without a
    profile (e.g. zh) predict 'und' — the confusion matrix shows exactly
    where the heuristic's coverage ends, which is the honest statement of
    a stopword lang-id at corpus scale.
    """
    from creatorops_lakehouse_spark.operators.text import lang_id

    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            F.coalesce(lang_id(F.col("text")), F.lit("und")).alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("labeled_lang", "predicted_lang")
    )


#: BM25 demo query terms (mid-frequency words in the driver corpus)
_BM25_TERMS = ("vector", "window", "stream", "merge")
#: rational BM25 constants: k1 = 12/10, b = 3/4, idf scale 10^4
_BM25_IDF_SCALE = 10_000


def _bm25_oracle() -> str:
    terms = ", ".join(repr(t) for t in _BM25_TERMS)
    return f"""
    WITH doc_tokens AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS w
        FROM documents
    ),
    dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM doc_tokens GROUP BY 1
    ),
    globals AS (
        SELECT CAST(SUM(dl) AS BIGINT) AS total, COUNT(*) AS n FROM dl
    ),
    df AS (
        SELECT w, COUNT(DISTINCT doc_id) AS df
        FROM doc_tokens WHERE w IN ({terms})
        GROUP BY 1
    ),
    tf AS (
        SELECT doc_id, w, COUNT(*) AS tf
        FROM doc_tokens WHERE w IN ({terms})
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT tf.doc_id,
               CAST((((g.n - df.df + 1) * {_BM25_IDF_SCALE}) // (df.df + 1))
                    * tf.tf * 22 * g.total AS BIGINT)
               // CAST(10 * g.total * tf.tf + 3 * g.total + 9 * dl.dl * g.n
                       AS BIGINT) AS s_units
        FROM tf
        JOIN dl ON dl.doc_id = tf.doc_id
        JOIN df ON df.w = tf.w
        CROSS JOIN globals g
    )
    SELECT doc_id, CAST(SUM(s_units) AS BIGINT) AS score_units,
           COUNT(*) AS n_terms_hit
    FROM scored
    GROUP BY doc_id
    ORDER BY score_units DESC, doc_id
    LIMIT 10
    """


@query("docs_bm25_search", oracle=_bm25_oracle())
def docs_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-shape relevance ranking (top-10 docs for a 4-term query) in
    exact integer arithmetic.

    The classic BM25 idf is a log — transcendental, so not bit-stable to
    re-derive on two engines. This variant substitutes a rational idf
    (``(N - df + 1) * 10^4 // (df + 1)``, same monotone-in-df ordering)
    and clears k1 = 12/10, b = 3/4 denominators by cross-multiplication,
    making the entire score one BIGINT expression:

        s = idf_units * tf * 22 * total // (10*total*tf + 3*total + 9*dl*N)

    Scale: one explode+groupBy over the corpus (tf is filtered to the
    query terms BEFORE the shuffle, so the aggregate moves only matching
    tokens); df and the N/total scalars are tiny broadcast joins. The
    integer formula bounds: idf <= N*10^4, so the numerator stays under
    int64 for corpora up to ~10^6 docs x 10^9 tokens — past that, drop
    the idf scale a decade.
    """
    from creatorops_lakehouse_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    globals_df = dl.agg(
        F.sum("dl").cast("long").alias("total"), F.count(F.lit(1)).alias("n")
    )
    hits = toks.filter(F.col("w").isin(*_BM25_TERMS))
    df_t = hits.groupBy("w").agg(F.count_distinct("doc_id").alias("df"))
    tf = hits.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_t), "w")
        .crossJoin(F.broadcast(globals_df))
        .select(
            "doc_id",
            F.expr(
                f"(((n - df + 1) * {_BM25_IDF_SCALE}) div (df + 1))"
                " * tf * 22 * total"
                " div (10 * total * tf + 3 * total + 9 * dl * n)"
            ).alias("s_units"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("s_units").cast("long").alias("score_units"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("score_units"), F.asc("doc_id"))
        .limit(10)
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


@query(
    "docs_profile_columns",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT '{c}' AS "column", COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN(length(CAST({c} AS VARCHAR))) AS BIGINT) AS min_len,
           CAST(MAX(length(CAST({c} AS VARCHAR))) AS BIGINT) AS max_len
    FROM documents
    """
        for c in _PROFILE_COLS
    ),
)
def docs_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of the documents corpus
    (operators/profile.py::profile_columns): per column the null count,
    exact distinct count, and string-rendering length extrema — the
    data-quality triage that precedes dedup-key choice and contract
    drafting. All six statistics for all five columns ride ONE
    aggregation over one scan (count_distinct expands the shuffle 5-way;
    the oracle recomputes per column and unions)."""
    from creatorops_lakehouse_spark.operators.profile import profile_columns

    return profile_columns(
        load(spark, sf_dir, "documents"), cols=list(_PROFILE_COLS)
    )


@query(
    "docs_vocab_coverage_curve",
    oracle=f"""
    WITH toks AS (
        SELECT unnest({_SQL_TOKENS}) AS w FROM documents
    ),
    freq AS (SELECT w, COUNT(*) AS n FROM toks GROUP BY 1),
    ranked AS (
        SELECT w, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank,
               SUM(n) OVER (ORDER BY n DESC, w
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM freq
    )
    SELECT CAST(rank AS BIGINT) AS rank, w AS token, CAST(n AS BIGINT) AS n,
           CAST((1000000 * cum) // (SELECT SUM(n) FROM freq) AS BIGINT)
               AS cum_coverage_ppm
    FROM ranked WHERE rank <= 50
    """,
)
def docs_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve (tokenizer-budget planning: how much of
    the token stream the top-k vocabulary entries cover): corpus token
    frequencies ranked desc with a cumulative-share prefix sum in exact
    ppm, top 50. Scale shape: the top-50 cut happens FIRST via
    orderBy().limit() — Spark's distributed TakeOrdered (per-partition
    heaps + merge, O(n log k), never a global sort or single-partition
    shuffle) — and the rank/prefix-sum window then runs over those 50
    rows only. The cumulative share of rank k needs exactly the masses
    of ranks 1..k, all inside the cut, so the bounded frame is
    mathematically sufficient at ANY vocabulary size; the corpus total
    comes from a separate scalar aggregate. Rank and prefix sum over the
    cut run as a bounded triangular self-join (see inline note) rather
    than an unpartitioned window."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("w"))
    )
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n"))
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    freq = scoped_persist(freq)
    total = freq.agg(F.sum("n").alias("_tot"))
    top = scoped_persist(freq.orderBy(F.desc("n"), F.asc("w")).limit(50))
    # rank + prefix sum WITHOUT a window: over the 50-row cut they are a
    # triangular self-join (≤ C(50,2) comparisons, broadcast both sides).
    # An unpartitioned window here would be just as bounded, but every
    # constant partition key (lit, isNull-of-non-nullable) gets
    # constant-folded out of the partitionSpec and WindowExec then logs
    # the single-partition warning plan reviews grep for — the join form
    # states the boundedness in the plan itself.
    b = top.select(F.col("w").alias("_bw"), F.col("n").alias("_bn"))
    before = (F.col("_bn") > F.col("n")) | (
        (F.col("_bn") == F.col("n")) & (F.col("_bw") <= F.col("w"))
    )
    return (
        top.join(F.broadcast(b), on=before)
        .groupBy("w", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("rank"),
            F.sum("_bn").alias("cum"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            F.col("w").alias("token"),
            "n",
            F.expr("(1000000 * cum) div _tot").cast("long").alias(
                "cum_coverage_ppm"
            ),
        )
    )


TOKEN_BUDGET = 100_000


@query(
    "docs_mixture_token_budget",
    oracle=f"""
    WITH t AS (
        SELECT source,
               CAST(SUM(length({_SQL_TOKENS})) AS BIGINT) AS tokens_available
        FROM documents GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources FROM t)
    SELECT t.source, t.tokens_available,
           CAST({TOKEN_BUDGET} // n.n_sources AS BIGINT) AS target_tokens,
           CAST(LEAST(1000000,
                (({TOKEN_BUDGET} // n.n_sources) * 1000000)
                    // t.tokens_available) AS BIGINT) AS sampling_rate_ppm,
           CAST((({TOKEN_BUDGET} // n.n_sources) * 1000)
                // t.tokens_available AS BIGINT) AS epochs_milli
    FROM t, n
    """,
)
def docs_mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture budget planner: given a total token budget split
    uniformly across sources, report each source's available whitespace
    tokens, its target allocation, the deterministic sampling rate to hit
    it (capped at 10^6 ppm — you cannot subsample more than everything),
    and epochs_milli (>1000 ⇒ the source must repeat to meet its target —
    the upsampling signal mixture schedulers act on). All integer
    arithmetic; the source token masses are one hash aggregate over the
    corpus and the planner math is a broadcast scalar."""
    toks = load(spark, sf_dir, "documents").select(
        "source", F.size(tokens(F.col("text"))).cast("long").alias("nt")
    )
    t = toks.groupBy("source").agg(
        F.sum("nt").cast("long").alias("tokens_available")
    )
    n = t.agg(F.count(F.lit(1)).cast("long").alias("n_sources"))
    return t.crossJoin(F.broadcast(n)).select(
        "source",
        "tokens_available",
        F.expr(f"{TOKEN_BUDGET} div n_sources").cast("long").alias("target_tokens"),
        F.expr(
            f"least(1000000, (({TOKEN_BUDGET} div n_sources) * 1000000)"
            f" div tokens_available)"
        )
        .cast("long")
        .alias("sampling_rate_ppm"),
        F.expr(
            f"(({TOKEN_BUDGET} div n_sources) * 1000) div tokens_available"
        )
        .cast("long")
        .alias("epochs_milli"),
    )


@query(
    "docs_snapshot_cdf_verdict",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_even,
           TRUE AS travel_ok, TRUE AS cdf_ok, TRUE AS rollback_ok
    FROM documents
    """,
)
def docs_snapshot_cdf_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked contract for the native snapshot log
    (sources/snapshots.py): commit the even-doc_id half as v0, overwrite
    with the full corpus as v1, and pin three facts — time travel (v0
    re-reads exactly the even half while v1 is current), the change-data
    feed (diff v0→v1 is precisely the odd half as inserts, zero
    deletes), and rollback (restoring v0 commits a NEW version whose
    content equals v0 while v1 stays readable). n_docs/n_even are
    SQL-recomputed by the oracle; booleans pin against literal TRUE."""
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.sources.snapshots import (
        rollback,
        snapshot_diff,
        snapshot_read,
        snapshot_write,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    docs = scoped_persist(load(spark, sf_dir, "documents").select("doc_id", "text"))
    spec = TableSpec("t.docsnap", _tempfile.mkdtemp(prefix="snap_cdf_") + "/t")
    snapshot_write(docs.filter(F.col("doc_id") % 2 == 0), spec)
    snapshot_write(docs, spec, mode="overwrite")

    even = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    odd = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id")

    def ids_equal(a, b):
        return (
            a.withColumn("_a", F.lit(1))
            .join(b.withColumn("_b", F.lit(1)), "doc_id", "full_outer")
            .agg(
                F.sum(
                    F.when(F.col("_a").isNull() | F.col("_b").isNull(), 1).otherwise(0)
                ).alias("m")
            )
            .select((F.coalesce(F.col("m"), F.lit(0)) == 0).alias("ok"))
        )

    travel = ids_equal(snapshot_read(spark, spec, version=0).select("doc_id"), even)
    diff = scoped_persist(snapshot_diff(spark, spec, 0, 1, keys=["doc_id"]))
    cdf_inserts = ids_equal(
        diff.filter(F.col("_change_type") == "insert").select("doc_id"), odd
    )
    n_deletes = diff.filter(F.col("_change_type") == "delete").agg(
        (F.count(F.lit(1)) == 0).alias("no_del")
    )
    v2 = rollback(spec, 0)
    rb = ids_equal(snapshot_read(spark, spec, version=v2).select("doc_id"), even)
    v1_alive = snapshot_read(spark, spec, version=1).agg(
        F.count(F.lit(1)).cast("long").alias("_n_v1")
    )
    totals = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_even"),
    )
    return (
        totals.crossJoin(F.broadcast(travel.withColumnRenamed("ok", "travel_ok")))
        .crossJoin(F.broadcast(cdf_inserts.withColumnRenamed("ok", "_ins_ok")))
        .crossJoin(F.broadcast(n_deletes))
        .crossJoin(F.broadcast(rb.withColumnRenamed("ok", "_rb_ok")))
        .crossJoin(F.broadcast(v1_alive))
        .select(
            "n_docs",
            "n_even",
            "travel_ok",
            (F.col("_ins_ok") & F.col("no_del")).alias("cdf_ok"),
            (F.col("_rb_ok") & (F.col("_n_v1") == F.col("n_docs"))).alias(
                "rollback_ok"
            ),
        )
    )


@query(
    "docs_lang_source_contingency",
    oracle="""
    WITH o AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
        FROM documents GROUP BY 1, 2
    ),
    rt AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS r FROM o GROUP BY 1),
    ct AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS c FROM o GROUP BY 1),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o)
    SELECT o.lang, o.source, o.obs,
           CAST((rt.r * ct.c * 1000) // n.n AS BIGINT) AS expected_milli,
           CAST(n.n * o.obs - rt.r * ct.c AS BIGINT) AS dev_units
    FROM o JOIN rt ON rt.lang = o.lang
           JOIN ct ON ct.source = o.source
           CROSS JOIN n
    """,
)
def docs_lang_source_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language x source contingency table with exact independence
    deviations: observed counts, the independence expectation in
    milli-units (row_total x col_total x 1000 div N), and
    dev_units = N*obs − row_total*col_total — the exact-integer signed
    numerator of the chi-square cell statistic (positive ⇒ the pair is
    over-represented vs independence; the corpus-balance diagnostic
    mixture planning consumes). One hash aggregate + two marginal
    aggregates broadcast back; int64 holds through N*obs ≈ 9e18
    (N ≈ 3e9 docs at these marginals — beyond that, lift to DECIMAL(38)
    as in events_value_outliers_3sigma)."""
    o = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
    )
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    o = scoped_persist(o)
    rt = o.groupBy("lang").agg(F.sum("obs").cast("long").alias("r"))
    ct = o.groupBy("source").agg(F.sum("obs").cast("long").alias("c"))
    n = o.agg(F.sum("obs").cast("long").alias("n"))
    return (
        o.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            "obs",
            F.expr("(r * c * 1000) div n").cast("long").alias("expected_milli"),
            (F.col("n") * F.col("obs") - F.col("r") * F.col("c"))
            .cast("long")
            .alias("dev_units"),
        )
    )


K_ANON = 20


@query(
    "docs_k_anonymity_report",
    oracle=f"""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           COUNT(*) >= {K_ANON} AS k_anonymous
    FROM documents
    GROUP BY 1, 2
    """,
)
def docs_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier columns (lang, source):
    every equivalence class with its size and whether it meets k={K_ANON}
    — classes below k are re-identification risks that a release
    pipeline must suppress or generalize (the data-governance gate that
    complements the PII scan's direct-identifier redaction). One hash
    aggregate; at 100 TB the class table is quasi-identifier-cardinality,
    not row-cardinality."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
        .select(
            "lang",
            "source",
            "class_size",
            (F.col("class_size") >= K_ANON).alias("k_anonymous"),
        )
    )


@query(
    "docs_token_cooccurrence_lift",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, list_distinct({_SQL_TOKENS}) AS l FROM documents
    ),
    posts AS (SELECT doc_id, unnest(l) AS tok FROM toks),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM posts GROUP BY 1),
    top AS (SELECT tok, df FROM dfreq ORDER BY df DESC, tok ASC LIMIT 40),
    fposts AS (SELECT p.doc_id, p.tok, t.df FROM posts p JOIN top t USING (tok)),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    pairs AS (
        SELECT a.tok AS a_tok, b.tok AS b_tok,
               a.df AS a_df, b.df AS b_df, COUNT(*) AS n_both
        FROM fposts a
        JOIN fposts b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2, 3, 4
    )
    SELECT a_tok, b_tok,
           CAST(a_df AS BIGINT) AS a_df,
           CAST(b_df AS BIGINT) AS b_df,
           CAST(n_both AS BIGINT) AS n_both,
           CAST((n_both * n.n_docs * 1000000) // (a_df * b_df) AS BIGINT)
               AS lift_ppm
    FROM pairs CROSS JOIN n
    """,
)
def docs_token_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level token co-occurrence lift over the 40 highest-df
    tokens: lift = P(a,b) / (P(a)·P(b)) in exact integer ppm — the
    collocation/association-mining signal (PMI's argument) that phrase
    detection and tokenizer-merge audits read, with no logarithm so both
    engines agree bit-for-bit.

    Scale shape: the pair space is capped by the top-k vocabulary cut
    (40·39/2 = 780 pairs max), not by corpus size — the top-k itself is a
    distributed TakeOrdered (orderBy+limit over the token-cardinality df
    table, the same cut docs_vocab_topk uses), the filtered posting table
    is a broadcast semi-join of the tiny top-k list against postings, and
    the per-doc pair expansion is ≤ C(40,2) per document. Deterministic:
    ties in the top-k cut break on (df DESC, tok ASC) and tok is unique.
    int64 bound: n_both·N·10⁶ needs N ≲ 3·10⁶ docs per partition-of-truth;
    past that, run the lift division in DECIMAL(38,0) on both engines
    (swap the two CASTs), the same escape hatch as events_cusum_changepoint.
    """
    from creatorops_lakehouse_spark.queries.dedup import corpus_sets

    sets = corpus_sets(spark, sf_dir, 1).select(
        "doc_id", F.array_distinct("toks").alias("l")
    )
    posts = sets.select("doc_id", F.explode("l").alias("tok"))
    dfreq = posts.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    top = dfreq.orderBy(F.col("df").desc(), F.col("tok").asc()).limit(40)
    fposts = posts.join(F.broadcast(top), on="tok")
    n = sets.agg(F.count(F.lit(1)).alias("n_docs"))
    a = fposts.select(
        "doc_id", F.col("tok").alias("a_tok"), F.col("df").alias("a_df")
    )
    b = fposts.select(
        "doc_id", F.col("tok").alias("b_tok"), F.col("df").alias("b_df")
    )
    pairs = (
        a.join(b, on="doc_id")
        .filter(F.col("a_tok") < F.col("b_tok"))
        .groupBy("a_tok", "b_tok", "a_df", "b_df")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return pairs.crossJoin(F.broadcast(n)).select(
        "a_tok",
        "b_tok",
        F.col("a_df").cast("long").alias("a_df"),
        F.col("b_df").cast("long").alias("b_df"),
        F.col("n_both").cast("long").alias("n_both"),
        F.expr("CAST((n_both * n_docs * 1000000) div (a_df * b_df) AS BIGINT)")
            .alias("lift_ppm"),
    )


@query(
    "docs_bigram_lm_score",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents
    ),
    bi AS (
        SELECT doc_id, ts[i] AS a, ts[i + 1] AS b
        FROM toks, UNNEST(range(1, len(ts))) AS r(i)
    ),
    cab AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bi GROUP BY 1, 2),
    ca AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS c_a FROM bi GROUP BY 1),
    per AS (
        SELECT doc_id, a, b, CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM bi GROUP BY 1, 2, 3
    )
    SELECT doc_id,
           CAST(SUM(n_occ) AS BIGINT) AS n_bigrams,
           CAST(SUM(n_occ * ((1000000 * c_ab) // c_a)) // SUM(n_occ) AS BIGINT)
               AS score_ppm
    FROM per JOIN cab USING (a, b) JOIN ca USING (a)
    GROUP BY doc_id
    """,
)
def docs_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model quality score per document —
    the KenLM-style fluency gate of training-data pipelines, in EXACT
    integer arithmetic so the driver can hash it: a document's score is
    the mean (ppm, floor-divided) of floor(1e6 · c(a,b) / c(a)) over its
    bigram multiset, where the counts are maximum-likelihood estimates
    trained on the whole corpus's bigram table. Low scores mark documents
    whose token transitions are rare in-corpus (boilerplate soup, shuffled
    text); no float log-prob, so there is no cross-engine libm hazard —
    every division is scaled integer floor.

    Scale shape: the bigram table is one lead()-window over tokens
    partitioned BY DOCUMENT (no global window); model training is two
    hash aggregates (c_ab, c_a); scoring joins each doc's distinct
    bigrams to the model — three shuffles total, all key-partitioned,
    same plan at 10^9 documents. Single-token documents have no bigrams
    and drop out on both engines.
    """
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )
    # adjacent pairs IN-ROW: zip the token array against itself shifted by
    # one (two slices) — the posexplode + per-doc lead() window this
    # replaces shuffled and sorted the corpus's whole token mass just to
    # look one element ahead inside an array it already had. Same pairs in
    # the same order; single-token docs still drop out (empty slices).
    n1 = F.greatest(F.size("ts") - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(F.col("ts"), 1, n1).alias("a"),
        F.slice(F.col("ts"), 2, n1).alias("b"),
    )
    bi = (
        load(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("ts"))
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    bi = scoped_persist(bi)
    cab = bi.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    ca = bi.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("c_a"))
    per = bi.groupBy("doc_id", "a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ")
    )
    return (
        per.join(cab, ["a", "b"])
        .join(ca, ["a"])
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("long").alias("n_bigrams"),
            F.expr(
                "sum(n_occ * ((1000000 * c_ab) div c_a)) div sum(n_occ)"
            )
            .cast("long")
            .alias("score_ppm"),
        )
    )


N_BPE_MERGES = 12
#: docs_bpe_train_verdict collects the (vocab-sized) word-frequency table
#: to run the single-node reference trainer; refuse above this rather
#: than OOM the driver on an unexpectedly huge vocabulary.
MAX_REF_VOCAB = 1_000_000


@query(
    "docs_bpe_train_verdict",
    oracle=f"""
    WITH seeded AS (
        SELECT {_SQL_BPE_SEED} AS text FROM documents
    ),
    pre AS (
        SELECT u.w AS w
        FROM seeded, unnest(regexp_extract_all(lower(text), '{_SQL_BPE_RE}'))
             AS u(w)
    ),
    wf AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pre WHERE len(w) > 0 GROUP BY 1
    ),
    pairs AS (
        SELECT substr(w, v.i, 2) AS pair, cnt
        FROM wf, unnest(range(1, len(w))) AS v(i)
        WHERE len(w) >= 2
    ),
    top AS (
        SELECT pair FROM (
            SELECT pair, SUM(cnt) AS n FROM pairs GROUP BY 1
        ) ORDER BY n DESC, pair ASC LIMIT 1
    )
    SELECT CAST((SELECT COUNT(*) FROM wf) AS BIGINT) AS n_words,
           CAST((SELECT SUM(cnt) FROM wf) AS BIGINT) AS total_occurrences,
           CAST({N_BPE_MERGES} AS BIGINT) AS n_merges,
           (SELECT substr(pair, 1, 1) FROM top) AS first_a,
           (SELECT substr(pair, 2, 1) FROM top) AS first_b,
           TRUE AS matches_sequential
    """,
)
def docs_bpe_train_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL distributed BPE training loop under the driver's hash gate
    (operators/bpe.py::train_bpe — the multi-merge trainer, vs
    docs_bpe_top_merges' single iteration). The scale architecture is the
    claim being verified: one corpus-sized aggregation to a word-frequency
    table, then {N_BPE_MERGES} merge iterations that touch ONLY that
    dimension-sized table (weighted pair count → one argmax row to the
    driver → pure-expression greedy fuse, no UDF anywhere).

    Hash-pinned facts: the pre-token vocabulary size and total occurrence
    mass (oracle recomputes both from the seeded text), the trained merge
    COUNT, the FIRST merge pair (SQL-recomputable — it is the argmax of
    the single-character pair counts), and matches_sequential — the
    in-engine assertion that all {N_BPE_MERGES} distributed merges equal
    the classic single-node trainer run on the collected frequency table
    (collection is vocab-sized, the sanctioned verdict-staging pattern)."""
    from creatorops_lakehouse_spark.operators.bpe import train_bpe_sequential

    merges, wf, _vocab = _bpe_trained_for(spark, sf_dir)
    # verdict-staging collect: the single-node reference trainer needs the
    # word-frequency table on the driver. It is vocab-sized (not
    # corpus-sized), but refuse an unexpectedly huge vocabulary rather
    # than OOM the driver (cosine_topk guard pattern, similarity.py).
    n_words = wf.count()
    if n_words > MAX_REF_VOCAB:
        raise ValueError(
            f"docs_bpe_train_verdict collects the word-frequency table to "
            f"run the single-node reference trainer and refuses tables "
            f"above {MAX_REF_VOCAB:,} distinct words (got {n_words:,}); "
            "it is a correctness AUDIT — train with operators/bpe.py "
            "train_bpe (distributed) at scale"
        )
    ref = train_bpe_sequential(
        {r.word: r.cnt for r in wf.collect()}, N_BPE_MERGES, min_count=2
    )
    stats = wf.filter(F.length("word") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("cnt").cast("long").alias("total_occurrences"),
    )
    first = merges[0] if merges else ("", "")
    return stats.select(
        "n_words",
        "total_occurrences",
        F.lit(len(merges)).cast("long").alias("n_merges"),
        F.lit(first[0]).alias("first_a"),
        F.lit(first[1]).alias("first_b"),
        F.lit(merges == ref).alias("matches_sequential"),
    )


#: sf_dir → (merges, persisted trained-vocab DataFrame) — BPE training is
#: build-once/probe-many across the train and encode verdicts (same policy
#: as the IVF/PQ index caches; fresh process per bench/driver run).
_BPE_CACHE: dict[str, tuple] = {}


def _bpe_trained_for(spark: SparkSession, sf_dir: str):
    from creatorops_lakehouse_spark.operators.bpe import (
        train_bpe,
        word_frequencies,
    )

    if sf_dir not in _BPE_CACHE:
        docs = load(spark, sf_dir, "documents")
        wf = word_frequencies(docs, pretoken=_bpe_seed_col()).persist()
        wf.count()
        merges, vocab = train_bpe(wf, n_merges=N_BPE_MERGES, min_count=2)
        vocab = vocab.persist()
        vocab.count()  # pin: the scoped caches inside train_bpe get
        # released when the NEXT registry query runs; without this pin the
        # cached frame would lazily replay all 12 fold iterations
        _BPE_CACHE[sf_dir] = (merges, wf, vocab)
    return _BPE_CACHE[sf_dir]


@query(
    "docs_bpe_encode_verdict",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id, {_SQL_BPE_SEED} AS text FROM documents
    ),
    pre AS (
        SELECT doc_id, u.w AS w
        FROM seeded, unnest(regexp_extract_all(lower(text), '{_SQL_BPE_RE}'))
             AS u(w)
        WHERE len(u.w) > 0
    )
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS total_pretokens,
           CAST(SUM(len(w)) AS BIGINT) AS total_chars,
           TRUE AS mass_match,
           TRUE AS tokens_bounded
    FROM pre
    """,
)
def docs_bpe_encode_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-sized APPLY half of BPE (operators/bpe.py::bpe_encode):
    every pre-token occurrence broadcast-joins the trained vocab's
    segmentation — the corpus never shuffles, because BPE segmentation is
    a pure function of the word. Hash-pinned facts: document/pre-token/
    char mass (oracle recomputes all three from the seeded text);
    mass_match — the join-based corpus encode's total token count equals
    sum(cnt × |symbols|) over the frequency table, i.e. the two
    independent routes to "how many tokens does the corpus have" agree
    exactly; tokens_bounded — per-doc token counts land in
    [n_pretokens, n_chars] (a merge can only shrink, never grow)."""
    from creatorops_lakehouse_spark.operators.bpe import bpe_encode
    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    docs = load(spark, sf_dir, "documents")
    _merges, wf, vocab = _bpe_trained_for(spark, sf_dir)
    enc = scoped_persist(
        bpe_encode(docs, vocab, id_col="doc_id", pretoken=_bpe_seed_col())
    )
    totals = enc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_pretokens").cast("long").alias("total_pretokens"),
        F.sum("n_tokens").cast("long").alias("_total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(
            F.when(
                (F.col("n_tokens") >= F.col("n_pretokens"))
                & (F.col("n_tokens") <= F.col("n_chars")),
                0,
            ).otherwise(1)
        ).alias("_oob"),
    )
    vocab_mass = vocab.agg(
        F.sum(F.col("cnt") * F.size("symbols")).cast("long").alias("_mass")
    )
    return totals.crossJoin(F.broadcast(vocab_mass)).select(
        "n_docs",
        "total_pretokens",
        "total_chars",
        (F.col("_total_tokens") == F.col("_mass")).alias("mass_match"),
        (F.col("_oob") == 0).alias("tokens_bounded"),
    )
