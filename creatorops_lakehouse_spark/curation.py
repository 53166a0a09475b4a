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

    cfg = (config or CurationConfig()).resolved()
    if cfg.neardup not in ("exact", "lsh"):
        raise ValueError(f"neardup must be 'exact' or 'lsh', got {cfg.neardup!r}")

    features, quality = _quality_stage(docs, cfg)

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


# ---------------------------------------------------------------------------
# Incremental (rolling) curation — VERDICT r11 item 4
# ---------------------------------------------------------------------------

#: per-table exactly-once app id for increment admission (the snapshot
#: log's txn map — the same mechanism as the matview watermark and the
#: streaming sink)
_INC_APP = "curation-increment"

#: MinHash band geometry for neardup='lsh' roots — must stay constant
#: for the life of a root (the probe and the admitted bands must share
#: it; recreate the root to change it)
_LSH_NUM_PERM, _LSH_BANDS = 64, 16


def _inc_specs(root: str) -> dict:
    """The rolling state under ``root`` — every table a snapshot-log
    table (atomic commits, CDF, time travel, and the txn map that makes
    batch admission exactly-once per table)."""
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    return {
        # (doc_id, toks, set_size) shingle sets of every doc that entered
        # near-dup — keepers AND losers, so later batches chain through
        # dropped docs exactly like a one-shot CC would
        "sets": TableSpec("curation.inc_sets", f"{root}/inc_sets"),
        # (doc_id, band, bucket) MinHash band index — written only by
        # neardup='lsh' roots (its presence marks the root's mode)
        "bands": TableSpec("curation.inc_bands", f"{root}/inc_bands"),
        # (text) distinct quality-surviving texts seen so far —
        # first-seen-wins exact dedup across batches
        "texts": TableSpec("curation.inc_texts", f"{root}/inc_texts"),
        # (doc_id, text, lang, k) eval-split docs accumulated so far
        "eval_docs": TableSpec("curation.inc_eval", f"{root}/inc_eval"),
        # the growing training set (append-only)
        "clean_train": TableSpec(
            "curation.inc_clean_train", f"{root}/inc_clean_train"
        ),
        # (doc_id) tombstones: clean_train docs retro-contaminated by
        # eval docs that arrived in a LATER batch (merge-on-read — the
        # set is append-only; readers anti-join it)
        "tombstones": TableSpec(
            "curation.inc_tombstones", f"{root}/inc_tombstones"
        ),
        # (batch_id, stage counts) — one row per admitted increment
        "increments": TableSpec(
            "curation.inc_manifest", f"{root}/inc_manifest"
        ),
    }


def _quality_stage(docs: DataFrame, cfg: CurationConfig):
    """(features, quality) — the row-local head of the pipeline, shared
    verbatim by :func:`run` and :func:`curate_increment` so the two can
    never drift."""
    from creatorops_lakehouse_spark.operators.text import (
        repetition_features,
        token_count,
    )

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
    return features, quality


def incremental_clean_train(spark: SparkSession, root: str) -> DataFrame:
    """The rolling training set: clean_train minus retro-contamination
    tombstones (merge-on-read). Equal, field for field, to a one-shot
    :func:`curate_increment` over the concatenated batches — and to
    :func:`run`'s ``clean_train`` whenever no near-dup cluster straddles
    batches via a BRIDGE doc (see curate_increment's contract)."""
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_read

    specs = _inc_specs(root)
    ct = snapshot_read(spark, specs["clean_train"])
    from creatorops_lakehouse_spark.sources.snapshots import current_version

    if current_version(specs["tombstones"]) is not None:
        tomb = snapshot_read(spark, specs["tombstones"]).select("doc_id")
        ct = ct.join(tomb, "doc_id", "left_anti")
    return ct


def increment_manifest(spark: SparkSession, root: str) -> DataFrame:
    """Per-increment stage counts, one row per admitted batch."""
    from creatorops_lakehouse_spark.sources.snapshots import snapshot_read

    return snapshot_read(spark, _inc_specs(root)["increments"])


def curate_increment(
    spark: SparkSession,
    new_docs: DataFrame,
    root: str,
    config: CurationConfig | None = None,
    batch_id: int | None = None,
) -> dict:
    """Admit ONE batch of new documents into a rolling curation corpus —
    the incremental form of :func:`run` (VERDICT r11 item 4): only the
    new docs flow through quality → exact-dedup probe → near-dup probe →
    split → decontamination; ``clean_train`` grows append-only (plus a
    tombstone set for retro-contamination); the manifest records
    per-increment counts. The first call on an empty ``root``
    initializes the state.

    Stage semantics against the accumulated state (first-seen-wins):

    - exact dedup: a new doc whose text was already seen drops; within
      the batch the smallest doc_id wins (with monotone ingestion ids
      this IS the one-shot MIN-id keeper).
    - near-dup: pairs come from :func:`probe_jaccard_index` — the EXACT
      posting-join math of the one-shot pipeline, so batched and
      one-shot pair sets agree with no LSH recall loss. New components
      are closed over within-batch edges (connected_components); any
      component touching ANY indexed doc — keeper or loser — drops
      entirely (the indexed side's cluster already has a smaller-id
      keeper), matching the one-shot CC through dropped docs. The ONE
      documented divergence from a one-shot rerun: a new BRIDGE doc
      whose edges would merge two previously-separate old clusters —
      one-shot would retroactively drop one old keeper; incrementally
      both stand and the bridge drops (prior decisions are immutable).
    - decontamination: new train docs check against the FULL eval set
      (accumulated ∪ this batch's); eval docs arriving in THIS batch
      also retro-check the EXISTING clean_train, and newly-contaminated
      old docs land in the tombstone set (merge-on-read delete) — so
      :func:`incremental_clean_train` equals the one-shot rerun even
      when contamination straddles batches.
    - mixture/packing/sharding are TRAINING-CUT steps, not corpus
      state — run them over ``incremental_clean_train`` when cutting a
      set (they are global resamples; maintaining them per-increment
      would churn the whole output for every batch).

    Exactly-once: every state-table append commits through the snapshot
    log's txn map under ``(_INC_APP, batch_id)`` — a replayed batch
    (crash between table appends, at-least-once scheduler) skips the
    tables it already reached and completes the rest, converging to the
    same state. ``batch_id`` defaults to the manifest's next id; pass it
    explicitly when replaying.

    Scale: the batch is the small side everywhere — quality is
    row-local on new docs; the exact-dedup probe anti-joins the texts
    index; the near-dup probe broadcast-joins batch postings against
    one scan of the sets index; decontam broadcasts eval grams. No
    state table is ever rewritten; appends are O(batch).

    Returns the increment's stage counts (the manifest row as a dict).
    """
    from creatorops_lakehouse_spark.operators.dedup import (
        _band_buckets,
        _token_sets,
        connected_components,
        jaccard_pairs,
        minhash_lsh_pairs,
        probe_jaccard_index,
        probe_minhash_index,
    )
    from creatorops_lakehouse_spark.operators.decontam import (
        ngram_contamination,
    )
    from creatorops_lakehouse_spark.operators.sampling import stratified_split
    from creatorops_lakehouse_spark.sources.snapshots import (
        current_version,
        last_txn_version,
        snapshot_read,
        snapshot_write_txn,
    )

    cfg = (config or CurationConfig()).resolved()
    specs = _inc_specs(root)
    if batch_id is None:
        # Default from the max txn across ALL state tables, refusing on
        # disagreement (r12 ADVICE): deriving from the increments
        # manifest alone is unsafe — it is the LAST table admitted, so a
        # batch that crashed mid-admission leaves texts/sets/eval/
        # clean_train stamped at txn N with no manifest row, and a
        # defaulted next call would reuse N for DIFFERENT docs: the
        # already-stamped tables silently skip the new batch while the
        # rest admit it — mixed, divergent state with no error. Only an
        # explicit batch_id replay of the SAME batch may complete it.
        core = ["texts", "sets", "eval_docs", "clean_train", "increments"]
        if current_version(specs["bands"]) is not None:
            core.append("bands")  # lsh roots stamp bands every batch
        # tombstones legitimately lag (written only when retro-decontam
        # hits), so they never participate in the consistency check
        seen = {
            k: last_txn_version(specs[k], _INC_APP)
            for k in core
            if current_version(specs[k]) is not None
        }
        vals = {int(t) for t in seen.values() if t is not None}
        if not vals:
            batch_id = 0
        else:
            mx = max(vals)
            stragglers = sorted(
                k for k in core
                if seen.get(k) is None or int(seen[k]) != mx
            )
            if stragglers:
                raise ValueError(
                    f"curate_increment({root}): state tables disagree on "
                    f"the last admitted batch (max txn {mx}; "
                    f"{stragglers} are behind or missing) — a previous "
                    f"admission crashed mid-batch. Replay it explicitly "
                    f"with batch_id={mx} (same docs) before admitting "
                    "new data."
                )
            batch_id = mx + 1

    def pre_batch(key):
        """The state table as of BEFORE this batch — None if absent.
        Replay safety: a crashed increment may have admitted some tables
        already; recomputing the stages against those would see the
        batch's own partial writes and diverge. The pre-batch version is
        found by walking manifests backwards to the last version whose
        txn map records this app BELOW batch_id (maintenance commits —
        OPTIMIZE — may sit between the batch's commit and the head, so
        "head minus one" is not enough); the replay then recomputes the
        SAME stage outputs and the remaining admits complete the batch."""
        spec = specs[key]
        v = current_version(spec)
        if v is None:
            return None
        seen_txn = last_txn_version(spec, _INC_APP)
        if seen_txn is not None and seen_txn >= batch_id:
            if seen_txn > batch_id:
                raise ValueError(
                    f"curate_increment({root}): batch {batch_id} is older "
                    f"than the state's latest admitted batch {seen_txn} — "
                    "increments must be admitted in order"
                )
            from creatorops_lakehouse_spark.sources.snapshots import (
                _read_manifest,
            )

            while v >= 0:
                try:
                    m = _read_manifest(spec, v)
                except ValueError:
                    raise ValueError(
                        f"curate_increment({root}): replay of batch "
                        f"{batch_id} needs {spec.name}'s pre-batch "
                        f"version, but vacuum reclaimed it — the replay "
                        "window is gone; admit the next batch instead"
                    ) from None
                t = m.get("txns", {}).get(_INC_APP)
                if t is None or int(t) < batch_id:
                    break
                v -= 1
            if v < 0:
                return None
        return snapshot_read(spark, spec, version=v)

    def admit(df, key):
        snapshot_write_txn(
            df, specs[key], app_id=_INC_APP, txn_version=batch_id,
            mode="append",
        )

    if cfg.neardup not in ("exact", "lsh"):
        raise ValueError(
            f"neardup must be 'exact' or 'lsh', got {cfg.neardup!r}"
        )
    seen_texts = pre_batch("texts")
    idx_sets = pre_batch("sets")
    idx_bands = pre_batch("bands")
    eval_old = pre_batch("eval_docs")
    if idx_sets is not None:
        # a root's near-dup mode is fixed at init (the band index exists
        # iff the root is LSH): mixing generators across batches would
        # silently change which pairs exist
        root_is_lsh = idx_bands is not None
        if root_is_lsh != (cfg.neardup == "lsh"):
            raise ValueError(
                f"curate_increment({root}): this root was initialized with "
                f"neardup={'lsh' if root_is_lsh else 'exact'!r} — batches "
                "must keep the mode (recreate the root to switch)"
            )

    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    _, quality = _quality_stage(new_docs, cfg)

    # exact dedup: within-batch keep-one, then first-seen-wins vs index.
    # batch_keep is read by the index anti-joins, the probe, the sets
    # state, and the counts — persist it (and every stage output below)
    # so the ~14 downstream actions replay cached batch-sized partitions
    # instead of recomputing the whole lineage per action (r12 ADVICE:
    # the recompute was what undercut the documented O(batch) admission)
    batch_keep = scoped_persist(
        quality.join(
            quality.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )
    if seen_texts is not None:
        # HASH-PREFILTERED anti-join (VERDICT r12 item 2): a plain
        # anti-join against the texts index shuffles the INDEX side —
        # O(corpus) per batch. Semi-filtering the index by the batch's
        # broadcast text-hashes first turns that into one shuffle-free,
        # column-pruned index scan; the exact anti-join then runs over
        # the (batch-bounded) survivors. Hash collisions only ADD
        # survivors, never remove one, so exactness is untouched.
        batch_hashes = batch_keep.select(
            F.xxhash64("text").alias("_th")
        ).distinct()
        seen_small = seen_texts.select("text").join(
            F.broadcast(batch_hashes),
            F.xxhash64("text") == F.col("_th"),
            "left_semi",
        )
        exact_new = batch_keep.join(seen_small, "text", "left_anti")
    else:
        exact_new = batch_keep
    exact_new = scoped_persist(exact_new)

    # near-dup probe against the persisted state: 'exact' = the
    # posting-join math (zero recall loss vs one-shot), 'lsh' = the
    # banded MinHash index (the 100 TB path — batched == one-shot holds
    # by the band-collision decomposition, the same invariant
    # docs_incremental_dedup_verdict pins)
    if idx_sets is not None and cfg.neardup == "exact":
        pairs = probe_jaccard_index(
            spark, idx_sets, exact_new,
            threshold=cfg.neardup_threshold, ngram=cfg.neardup_ngram,
        )
        old_touch = pairs.filter(~F.col("b_is_new")).select(
            F.col("a_id").alias("node")
        ).distinct()
        edges = pairs.filter(F.col("b_is_new")).select("a_id", "b_id")
    elif idx_sets is not None:
        # probe emits CANONICAL (least, greatest) pairs — tag each
        # endpoint against the batch id-set to find the new side
        raw = probe_minhash_index(
            spark, idx_bands, idx_sets, exact_new,
            threshold=cfg.neardup_threshold, ngram=cfg.neardup_ngram,
            num_perm=_LSH_NUM_PERM, bands=_LSH_BANDS,
        )
        nid = exact_new.select("doc_id")
        tagged = raw.join(
            nid.select(F.col("doc_id").alias("a_id"))
            .withColumn("_a_new", F.lit(True)),
            "a_id", "left",
        ).join(
            nid.select(F.col("doc_id").alias("b_id"))
            .withColumn("_b_new", F.lit(True)),
            "b_id", "left",
        )
        a_new = F.col("_a_new").isNotNull()
        b_new = F.col("_b_new").isNotNull()
        edges = tagged.filter(a_new & b_new).select("a_id", "b_id")
        old_touch = (
            tagged.filter(a_new != b_new)
            .select(
                F.when(a_new, F.col("a_id"))
                .otherwise(F.col("b_id"))
                .alias("node")
            )
            .distinct()
        )
    elif cfg.neardup == "exact":
        old_touch = None
        edges = jaccard_pairs(
            exact_new, text_col="text", id_col="doc_id",
            threshold=cfg.neardup_threshold, ngram=cfg.neardup_ngram,
            prefix_filter=False,
        ).select("a_id", "b_id")
    else:
        old_touch = None
        edges = minhash_lsh_pairs(
            exact_new, text_col="text", id_col="doc_id",
            threshold=cfg.neardup_threshold, ngram=cfg.neardup_ngram,
            num_perm=_LSH_NUM_PERM, bands=_LSH_BANDS,
        ).select("a_id", "b_id")

    cc = connected_components(edges)
    losers = cc.filter(F.col("node") != F.col("cluster_id")).select("node")
    if idx_sets is not None:
        # a component touching the index drops ENTIRELY: its indexed
        # neighbor's cluster already holds a smaller-id keeper
        tainted_clusters = cc.join(old_touch, "node").select(
            "cluster_id"
        ).distinct()
        tainted_members = cc.join(tainted_clusters, "cluster_id").select(
            "node"
        )
        losers = (
            losers.unionByName(tainted_members)
            .unionByName(old_touch)
            .distinct()
        )
    deduped_new = scoped_persist(
        exact_new.join(
            losers.withColumnRenamed("node", "doc_id"), "doc_id", "left_anti"
        )
    )

    # split + decontam against the FULL eval corpus
    split_new = scoped_persist(
        stratified_split(deduped_new, "doc_id", cfg.split_weights)
    )
    train_new = split_new.filter(F.col("split") == "train")
    eval_new = split_new.filter(F.col("split") == "eval").select(
        "doc_id", "text", "lang", "k"
    )
    if eval_old is not None:
        eval_all = eval_old.select(
            "doc_id", "text", "lang", "k"
        ).unionByName(eval_new)
    else:
        eval_all = eval_new
    contaminated = scoped_persist(
        # broadcast_eval=False: the accumulated eval corpus GROWS with
        # the root — broadcasting it per batch is an O(corpus) driver
        # build. The batch's exploded grams are the small side; AQE
        # broadcasts them, and the eval-gram side scans shuffle-free.
        ngram_contamination(
            train_new, eval_all, n=cfg.decontam_ngram, broadcast_eval=False
        )
        .filter(F.col("hit_bp") >= cfg.decontam_bp)
        .select("doc_id")
    )
    clean_new = scoped_persist(
        train_new.join(contaminated, "doc_id", "left_anti").select(
            "doc_id", "text", "lang", "k"
        )
    )

    # retro-decontam: THIS batch's eval docs against the EXISTING
    # clean_train — late-arriving eval contamination tombstones old docs
    retro = None
    old_ct = pre_batch("clean_train")
    if old_ct is not None:
        old_tomb = pre_batch("tombstones")
        if old_tomb is not None:
            old_ct = old_ct.join(
                old_tomb.select("doc_id"), "doc_id", "left_anti"
            )
        retro = scoped_persist(
            ngram_contamination(old_ct, eval_new, n=cfg.decontam_ngram)
            .filter(F.col("hit_bp") >= cfg.decontam_bp)
            .select("doc_id")
        )

    # counts BEFORE the state writes (the manifest row)
    counts = {
        "batch_id": batch_id,
        "n_in": new_docs.count(),
        "n_quality": quality.count(),
        "n_exact": exact_new.count(),
        "n_neardup": deduped_new.count(),
        "n_train": train_new.count(),
        "n_contaminated": contaminated.count(),
        "n_clean": clean_new.count(),
        "n_retro_tombstoned": retro.count() if retro is not None else 0,
    }
    n_retro = counts["n_retro_tombstoned"]

    # state appends — each exactly-once under (app, batch_id)
    new_texts = batch_keep.select("text").distinct()
    if seen_texts is not None:
        # exact_new's keepers already passed the hash-prefiltered
        # anti-join above; reuse those survivors (seen_small) instead of
        # re-shuffling the whole texts index a second time
        new_texts = new_texts.join(seen_small, "text", "left_anti")
    admit(new_texts, "texts")
    new_sets_state = _token_sets(
        exact_new, "text", "doc_id", cfg.neardup_ngram
    ).filter(F.col("set_size") > 0)
    admit(new_sets_state, "sets")
    if cfg.neardup == "lsh":
        admit(
            _band_buckets(new_sets_state, _LSH_NUM_PERM, _LSH_BANDS),
            "bands",
        )
    admit(eval_new, "eval_docs")
    admit(clean_new, "clean_train")
    if n_retro:
        admit(retro, "tombstones")
    admit(
        spark.createDataFrame(
            [tuple(counts.values())],
            "batch_id long, n_in long, n_quality long, n_exact long, "
            "n_neardup long, n_train long, n_contaminated long, "
            "n_clean long, n_retro_tombstoned long",
        ),
        "increments",
    )
    return counts


def optimize_curation_state(
    spark: SparkSession, root: str, max_dirs: int = 16
) -> dict[str, int | None]:
    """Maintenance for the rolling state: every admitted batch appends
    one commit dir per state table, so after N batches the probe scans
    plan N dirs. Bin-pack each table whose head references more than
    ``max_dirs`` dirs (OPTIMIZE — content-noop, the txn map survives the
    rewrite) and fold its manifest log (checkpoint), so index reads stay
    O(1 dir) and log opens O(tail) no matter how many batches have been
    admitted. Admission semantics are unaffected: batch ids come from
    the txn map, which rewrites carry verbatim, and a replayed batch's
    pre-batch pin walks the txn map rather than assuming head-minus-one.
    Returns {table: new_version | None} (None = skipped under max_dirs).

    Run it between batches (not concurrently with an admission — same
    single-maintainer discipline as the matview refresher loop). Vacuum
    separately and AFTER the replay window you care about has passed: a
    vacuumed pre-batch version makes that batch's exact replay refuse
    loudly."""
    from creatorops_lakehouse_spark.sources.snapshots import (
        checkpoint_manifest,
        current_version,
        optimize_snapshots,
    )

    out: dict[str, int | None] = {}
    for key, spec in _inc_specs(root).items():
        if current_version(spec) is None:
            out[key] = None
            continue
        v = optimize_snapshots(spark, spec, max_dirs=max_dirs)
        if v is not None:
            checkpoint_manifest(spec)
        out[key] = v
    return out
