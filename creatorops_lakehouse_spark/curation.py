"""Public end-to-end curation API — the pipeline a training-data team
actually calls, parameterized by one config object (VERDICT r10 item 6:
``curation_e2e_row`` proves the composition under a driver hash, but it
is registry-shaped; this is the same chain as a documented entry point
returning the per-stage TABLES, not just their counts).

    from creatorops_lakehouse_spark.curation import CurationConfig, run

    result = run(spark, docs_df)                       # defaults
    result = run(spark, docs_df, CurationConfig(
        neardup="lsh",                 # banded scale path for 100 TB
        mixture_weights={"en": 5200, "de": 1600, ...},  # basis points
        pack_budget=2048, n_shards=16,
    ))
    result.mixture            # the final training set (doc_id, text, k)
    result.packed             # packed sequences (seq_id, …)
    result.shards             # snake-balanced shard manifest
    result.stage_counts()     # {'ingest': n, 'quality': n, ...}
    result.manifest(spark)    # one-row DataFrame, the verdict-row shape

Stages (each the registered operator's own scale path — see
queries/curation.py module docstring for the 100 TB rationale):
raw corpus → quality gate (token count + bigram repetition + symbol
ratio) → exact dedup keep-one → near-dup connected-components keep-one
(exact trigram-Jaccard audit path, or MinHash star edges at scale) →
stratified split → n-gram eval decontamination → language-mixture
resampling → sequence packing → snake shard manifest.

Everything is LAZY: ``run`` builds the DataFrame DAG and returns; no
count, collect, or write happens until the caller acts on a stage table.
The config-driven default reproduces ``docs_curation_e2e_verdict``'s
hash-checked numbers exactly (tests/test_curation_api.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _default_mix() -> dict[str, int]:
    from creatorops_lakehouse_spark.queries.text import MIX_WEIGHTS

    return dict(MIX_WEIGHTS)


def _default_split() -> dict[str, float]:
    return {"train": 0.90, "eval": 0.05, "test": 0.05}


@dataclass(frozen=True)
class CurationConfig:
    """Knobs for :func:`run`. Defaults match the registry's hash-checked
    ``docs_curation_e2e_verdict`` configuration (single source of truth:
    the same constants those queries import)."""

    #: quality gate: minimum whitespace-ish token count
    min_tokens: int | None = None
    #: quality gate: max duplicate-bigram basis points
    max_rep_bp: int | None = None
    #: quality gate: max symbol-character basis points
    max_symbol_bp: int | None = None
    #: near-dup pair source: "exact" (trigram-Jaccard inverted index —
    #: the audit path) or "lsh" (MinHash star edges — the 100 TB path)
    neardup: str = "exact"
    #: near-dup Jaccard threshold
    neardup_threshold: float = 0.6
    #: shingle order for near-dup
    neardup_ngram: int = 3
    #: split name -> fraction (must sum to 1)
    split_weights: dict[str, float] = field(default_factory=_default_split)
    #: decontamination n-gram order
    decontam_ngram: int = 5
    #: drop a train doc sharing ≥ this many basis points of its distinct
    #: n-grams with the eval split
    decontam_bp: int | None = None
    #: language -> weight in basis points (None = registry MIX_WEIGHTS)
    mixture_weights: dict[str, int] | None = None
    #: tokens per packed sequence
    pack_budget: int | None = None
    #: shard count for the snake manifest
    n_shards: int | None = None

    def resolved(self) -> "CurationConfig":
        """Fill None fields from the registry constants (deferred so the
        dataclass stays import-light)."""
        from creatorops_lakehouse_spark.queries.curation import E2E_DECONTAM_BP
        from creatorops_lakehouse_spark.queries.llmprep import (
            MAX_REP_BP,
            MIN_TOKENS,
            N_SHARDS,
            PACK_BUDGET,
        )
        from creatorops_lakehouse_spark.queries.text import MAX_SYMBOL_BP

        def pick(v, d):
            return d if v is None else v

        return CurationConfig(
            min_tokens=pick(self.min_tokens, MIN_TOKENS),
            max_rep_bp=pick(self.max_rep_bp, MAX_REP_BP),
            max_symbol_bp=pick(self.max_symbol_bp, MAX_SYMBOL_BP),
            neardup=self.neardup,
            neardup_threshold=self.neardup_threshold,
            neardup_ngram=self.neardup_ngram,
            split_weights=dict(self.split_weights),
            decontam_ngram=self.decontam_ngram,
            decontam_bp=pick(self.decontam_bp, E2E_DECONTAM_BP),
            mixture_weights=pick(self.mixture_weights, _default_mix()),
            pack_budget=pick(self.pack_budget, PACK_BUDGET),
            n_shards=pick(self.n_shards, N_SHARDS),
        )


@dataclass
class CurationResult:
    """Per-stage tables of one :func:`run`. All lazy DataFrames."""

    config: CurationConfig
    #: input ∪ computed quality features (doc_id, text, lang, k, rep_bp, sym_bp)
    features: DataFrame
    #: quality-gate survivors
    quality: DataFrame
    #: exact-dedup survivors
    exact_deduped: DataFrame
    #: near-dup CC survivors
    deduped: DataFrame
    #: survivors + split column (train/eval/test …)
    split: DataFrame
    #: train docs flagged contaminated (doc_id)
    contaminated: DataFrame
    #: decontaminated train set
    clean_train: DataFrame
    #: mixture-resampled final training set (doc_id, text, k)
    mixture: DataFrame
    #: packed sequences (pack_sequences output over the mixture)
    packed: DataFrame
    #: snake shard manifest (doc_id, w, shard_id)
    shards: DataFrame

    def stage_counts(self) -> dict[str, int]:
        """Materialize the per-stage retention counts (one count job per
        stage — the only eager method besides manifest)."""
        return {
            "ingest": self.features.count(),
            "quality": self.quality.count(),
            "exact_dedup": self.exact_deduped.count(),
            "neardup_cc": self.deduped.count(),
            "train": self.split.filter(F.col("split") == "train").count(),
            "clean": self.clean_train.count(),
            "mixture": self.mixture.count(),
        }

    def manifest(self, spark: SparkSession) -> DataFrame:
        """One-row audit DataFrame in the verdict-row shape: stage
        counts + packing audit + shard balance + the two cross-operator
        conservation booleans."""
        from creatorops_lakehouse_spark.operators.packing import (
            packing_summary,
        )

        counts = self.stage_counts()
        n_train = counts["train"]
        n_clean = counts["clean"]
        summary = packing_summary(
            self.packed, budget=self.config.pack_budget
        ).select(
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.col("n_docs").cast("long").alias("pk_docs"),
            F.col("n_straddling").cast("long").alias("n_straddling"),
            F.col("n_seqs").cast("long").alias("n_seqs"),
            F.col("last_fill_bp").cast("long").alias("last_fill_bp"),
        )
        shstat = (
            self.shards.groupBy("shard_id")
            .agg(F.sum("w").alias("st"))
            .agg(
                F.max("st").cast("long").alias("shard_max_tokens"),
                F.min("st").cast("long").alias("shard_min_tokens"),
                F.sum("st").cast("long").alias("shard_sum_tokens"),
            )
        )
        stages = spark.createDataFrame(
            [
                (
                    counts["ingest"],
                    counts["quality"],
                    counts["exact_dedup"],
                    counts["neardup_cc"],
                    n_train,
                    n_train - n_clean,
                    n_clean,
                    counts["mixture"],
                )
            ],
            "n_all long, n_quality long, n_exact long, n_neardup long, "
            "n_train long, n_contaminated long, n_clean long, n_mixture long",
        )
        return (
            stages.crossJoin(F.broadcast(summary))
            .crossJoin(F.broadcast(shstat))
            .select(
                "n_all", "n_quality", "n_exact", "n_neardup", "n_train",
                "n_contaminated", "n_clean", "n_mixture", "total_tokens",
                "n_straddling", "n_seqs", "last_fill_bp",
                "shard_max_tokens", "shard_min_tokens",
                (F.col("shard_sum_tokens") == F.col("total_tokens")).alias(
                    "shards_conserve"
                ),
                (F.col("pk_docs") == F.col("n_mixture")).alias(
                    "pack_counts_ok"
                ),
            )
        )


#: stages :meth:`CurationResult.write` persists, in pipeline order
_WRITE_STAGES = (
    "quality",
    "deduped",
    "split",
    "clean_train",
    "mixture",
    "packed",
    "shards",
)


def write_result(
    spark: SparkSession, result: CurationResult, root: str
) -> dict[str, "object"]:
    """Persist the curation run durably: each stage table becomes a
    snapshot-log table under ``root/<stage>`` (time travel, CDF, vacuum
    for free) and the one-row audit manifest lands at ``root/manifest``.
    Returns ``{stage: TableSpec}``. Each write is one commit; a re-run
    into the same root overwrites (the curation run is derived data —
    the source of truth is the input corpus + config)."""
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_write
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    specs: dict[str, TableSpec] = {}
    for stage in _WRITE_STAGES:
        spec = TableSpec(f"curation.{stage}", f"{root}/{stage}")
        snapshot_write(getattr(result, stage), spec, mode="overwrite")
        specs[stage] = spec
    mspec = TableSpec("curation.manifest", f"{root}/manifest")
    snapshot_write(result.manifest(spark), mspec, mode="overwrite")
    specs["manifest"] = mspec
    return specs


def run(
    spark: SparkSession,
    docs: DataFrame,
    config: CurationConfig | None = None,
) -> CurationResult:
    """Build the full curation DAG over ``docs`` (needs columns
    ``doc_id``, ``text``, ``lang``) and return every stage table.
    Lazy — nothing executes until a stage is acted on. See module
    docstring for the stage list and CurationConfig for the knobs."""
    from creatorops_lakehouse_spark.operators.decontam import (
        ngram_contamination,
    )
    from creatorops_lakehouse_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
        minhash_star_edges,
    )
    from creatorops_lakehouse_spark.operators.mixing import mixture_sample
    from creatorops_lakehouse_spark.operators.packing import (
        pack_sequences,
        shard_snake,
    )
    from creatorops_lakehouse_spark.operators.sampling import stratified_split
    from creatorops_lakehouse_spark.operators.text import (
        repetition_features,
        token_count,
    )

    cfg = (config or CurationConfig()).resolved()
    if cfg.neardup not in ("exact", "lsh"):
        raise ValueError(f"neardup must be 'exact' or 'lsh', got {cfg.neardup!r}")

    rep = repetition_features(F.col("text"))
    features = docs.select(
        "doc_id",
        "text",
        "lang",
        token_count(F.col("text")).alias("k"),
        rep["rep_bigram_bp"].alias("rep_bp"),
        rep["symbol_bp"].alias("sym_bp"),
    )

    quality = features.filter(
        (F.col("k") >= cfg.min_tokens)
        & (F.col("rep_bp") <= cfg.max_rep_bp)
        & (F.col("sym_bp") <= cfg.max_symbol_bp)
    ).select("doc_id", "text", "lang", "k")

    exact_deduped = quality.join(
        quality.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    if cfg.neardup == "exact":
        # prefix_filter=False for trigram-order shingles: posting lists
        # are already sparse, the PPJoin ranking costs more than it
        # saves (same call shape as queries/dedup.py::corpus_trigram_pairs)
        pairs = jaccard_pairs(
            exact_deduped,
            text_col="text",
            id_col="doc_id",
            threshold=cfg.neardup_threshold,
            ngram=cfg.neardup_ngram,
            prefix_filter=False,
        ).select("a_id", "b_id")
    else:
        pairs = minhash_star_edges(
            exact_deduped.select("doc_id", "text"),
            threshold=cfg.neardup_threshold,
            ngram=cfg.neardup_ngram,
        ).select("a_id", "b_id")
    losers = (
        connected_components(pairs)
        .filter(F.col("node") != F.col("cluster_id"))
        .select(F.col("node").alias("doc_id"))
    )
    deduped = exact_deduped.join(losers, "doc_id", "left_anti")

    split = stratified_split(deduped, "doc_id", cfg.split_weights)
    train = split.filter(F.col("split") == "train")
    contaminated = (
        ngram_contamination(
            train, split.filter(F.col("split") == "eval"), n=cfg.decontam_ngram
        )
        .filter(F.col("hit_bp") >= cfg.decontam_bp)
        .select("doc_id")
    )
    clean_train = train.join(contaminated, "doc_id", "left_anti")

    mixture = mixture_sample(
        clean_train, "lang", "doc_id", cfg.mixture_weights
    ).select("doc_id", "text", F.col("k").cast("long").alias("k"))

    packed = pack_sequences(
        mixture.select("doc_id", "text", F.col("k").alias("w")),
        budget=cfg.pack_budget,
    )
    shards = shard_snake(
        mixture.select("doc_id", F.col("k").alias("w")),
        "w",
        "doc_id",
        cfg.n_shards,
    )

    return CurationResult(
        config=cfg,
        features=features,
        quality=quality,
        exact_deduped=exact_deduped,
        deduped=deduped,
        split=split,
        contaminated=contaminated,
        clean_train=clean_train,
        mixture=mixture,
        packed=packed,
        shards=shards,
    )
