"""End-to-end curation dress rehearsal — the ONE pipeline a 100 TB
training-data user actually runs, composed from the first-class operators
and pinned under a single oracle hash (VERDICT r8 item 1).

The per-query gates verify each operator in isolation;
``docs_curation_e2e_verdict`` verifies their COMPOSITION: every stage
consumes the previous stage's real output (not a fresh read of the raw
corpus), so cross-operator contracts — column handoff, dedup-before-
decontam ordering, token-count consistency between packing and sharding —
are all under the hash. The DuckDB oracle recomputes the entire chain
from scratch (recursive CTE for the connected-components closure), so any
drift anywhere in the composition breaks the value hash.

Pipeline (constants shared with the per-stage queries — single source of
truth): raw corpus → quality gate (min tokens + bigram repetition +
symbol ratio; queries/text.py::docs_quality_gate thresholds) → exact
dedup keep-one → trigram-Jaccard(≥0.6) near-dup connected-components
keep-one → train/eval/test stratified split + 5-gram eval
decontamination (drop train docs with hit_bp ≥ {E2E_DECONTAM_BP}) →
language-mixture resampling (queries/text.py::MIX_WEIGHTS) → sequence
packing at {PACK_BUDGET} tokens → snake-balanced shard manifest.

Reference scope note: the reference lakehouse curates event/document
tables (/root/reference/pipelines/silver/transform_local.py quality
rules; no multi-stage corpus pipeline exists there) — this composition is
part of the LLM-pipeline extension mandate.

Scale notes (100 TB): every stage is the registered operator's own scale
path — one-shuffle groupBy dedup, inverted-index pair join restricted by
semi-join against the survivor set, min-label-propagation CC, broadcast
eval-gram decontam (corpus text never shuffles), hash-rank mixture
sampling, two-phase distributed prefix-sum packing,
distributed_global_rank snake sharding. Only per-stage COUNTS reach the
driver (the medallion-verdict staging pattern).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from creatorops_lakehouse_spark.queries import load, query
from creatorops_lakehouse_spark.queries.dedup import (
    _SQL_TOKENS,
    corpus_trigram_pairs,
)
from creatorops_lakehouse_spark.queries.llmprep import (
    MAX_REP_BP,
    MIN_TOKENS,
    N_SHARDS,
    PACK_BUDGET,
)
from creatorops_lakehouse_spark.queries.text import (
    _SQL_BUCKET,
    _SQL_MIX_VALUES,
    MAX_SYMBOL_BP,
    MIX_WEIGHTS,
)

#: a train doc sharing ≥ this fraction (basis points) of its distinct
#: 5-grams with the eval split is dropped as contaminated
E2E_DECONTAM_BP = 500

_SQL_E2E = f"""
    base AS (
        SELECT doc_id, text, lang, {_SQL_TOKENS} AS l FROM documents
    ),
    feat AS (
        SELECT doc_id, text, lang, l, len(l) AS k,
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
    q AS (
        SELECT doc_id, text, lang, l, k FROM feat
        WHERE k >= {MIN_TOKENS} AND rep_bp <= {MAX_REP_BP}
              AND sym_bp <= {MAX_SYMBOL_BP}
    ),
    e AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text),
    e2 AS (SELECT q.doc_id, q.lang, q.l, q.k FROM q JOIN e USING (doc_id)),
    sets AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(0, greatest(len(l) - 3, 0) + 1),
                   i -> array_to_string(l[i + 1 : i + 3], ' '))) AS sh
        FROM e2
    ),
    sized AS (SELECT doc_id, len(sh) AS set_size, sh FROM sets),
    posts AS (SELECT doc_id, set_size, unnest(sh) AS tok FROM sized),
    common AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               a.set_size AS a_size, b.set_size AS b_size, COUNT(*) AS n_common
        FROM posts a JOIN posts b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ),
    prs AS (
        SELECT a_id, b_id FROM common
        WHERE CAST(n_common AS DOUBLE) / (a_size + b_size - n_common) >= 0.6
    ),
    edges AS (
        SELECT a_id AS src, b_id AS dst FROM prs
        UNION SELECT b_id, a_id FROM prs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, x.dst FROM reach r JOIN edges x ON r.dst = x.src
    ),
    clusters AS (
        SELECT src AS node, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src
    ),
    d AS (
        SELECT * FROM e2
        WHERE doc_id NOT IN (SELECT node FROM clusters WHERE node <> cluster_id)
    ),
    assigned AS (
        SELECT *, CASE WHEN {_SQL_BUCKET} < 9000 THEN 'train'
                       WHEN {_SQL_BUCKET} < 9500 THEN 'eval'
                       ELSE 'test' END AS split
        FROM d
    ),
    grams AS (
        SELECT doc_id, split, lang, k,
               list_distinct(list_transform(
                   range(0, greatest(len(l) - 5, 0) + 1),
                   i -> array_to_string(l[i + 1 : i + 5], ' '))) AS g5
        FROM assigned
    ),
    ev AS (SELECT DISTINCT unnest(g5) AS gram FROM grams WHERE split = 'eval'),
    tr AS (
        SELECT doc_id, CAST(len(g5) AS BIGINT) AS n_g, unnest(g5) AS gram
        FROM grams WHERE split = 'train'
    ),
    contaminated AS (
        SELECT tr.doc_id FROM tr JOIN ev USING (gram)
        GROUP BY tr.doc_id, tr.n_g
        HAVING (10000 * COUNT(*)) // tr.n_g >= {E2E_DECONTAM_BP}
    ),
    c AS (
        SELECT doc_id, lang, k FROM assigned
        WHERE split = 'train'
              AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    w(lang, wbp) AS (VALUES {_SQL_MIX_VALUES}),
    cnts AS (
        SELECT c.lang, CAST(COUNT(*) AS BIGINT) AS n_avail
        FROM c JOIN w USING (lang) GROUP BY c.lang
    ),
    t AS (SELECT MIN(cnts.n_avail * 10000 // w.wbp) AS t
          FROM cnts JOIN w USING (lang)),
    targets AS (
        SELECT w.lang, CAST(w.wbp * t.t // 10000 AS BIGINT) AS k_target
        FROM w CROSS JOIN t
    ),
    ranked AS (
        SELECT lang, doc_id, k,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY {_SQL_BUCKET} ASC, doc_id ASC
               ) AS rn
        FROM c
    ),
    m AS (
        SELECT r.doc_id, CAST(r.k AS BIGINT) AS n_tokens
        FROM ranked r JOIN targets tg ON r.lang = tg.lang AND r.rn <= tg.k_target
    ),
    coords AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS start_offset
        FROM m
    ),
    packsum AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS pk_docs,
               CAST(SUM(CASE WHEN (start_offset + greatest(n_tokens - 1, 0))
                                  // {PACK_BUDGET}
                             > start_offset // {PACK_BUDGET}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
               (CAST(SUM(n_tokens) AS BIGINT) + {PACK_BUDGET} - 1)
                   // {PACK_BUDGET} AS n_seqs,
               CAST(CASE WHEN SUM(n_tokens) % {PACK_BUDGET} = 0 THEN 10000
                    ELSE (10000 * (SUM(n_tokens) % {PACK_BUDGET}))
                         // {PACK_BUDGET} END AS BIGINT) AS last_fill_bp
        FROM coords
    ),
    shr AS (
        SELECT n_tokens,
               ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS r0
        FROM m
    ),
    shrd AS (
        SELECT n_tokens,
               CASE WHEN (r0 // {N_SHARDS}) % 2 = 0 THEN r0 % {N_SHARDS}
                    ELSE {N_SHARDS} - 1 - (r0 % {N_SHARDS}) END AS shard_id
        FROM shr
    ),
    shagg AS (SELECT shard_id, SUM(n_tokens) AS st FROM shrd GROUP BY shard_id),
    shstat AS (
        SELECT CAST(MAX(st) AS BIGINT) AS shard_max_tokens,
               CAST(MIN(st) AS BIGINT) AS shard_min_tokens,
               CAST(SUM(st) AS BIGINT) AS shard_sum_tokens
        FROM shagg
    ),
    stages AS (
        SELECT (SELECT COUNT(*) FROM documents) AS n_all,
               (SELECT COUNT(*) FROM q) AS n_quality,
               (SELECT COUNT(*) FROM e) AS n_exact,
               (SELECT COUNT(*) FROM d) AS n_neardup,
               (SELECT COUNT(*) FROM assigned WHERE split = 'train') AS n_train,
               (SELECT COUNT(*) FROM contaminated) AS n_contaminated,
               (SELECT COUNT(*) FROM c) AS n_clean,
               (SELECT COUNT(*) FROM m) AS n_mixture
    )
"""


@query(
    "docs_curation_e2e_verdict",
    oracle=f"""
    WITH RECURSIVE {_SQL_E2E}
    SELECT stages.*, p.total_tokens, p.n_straddling, p.n_seqs, p.last_fill_bp,
           s.shard_max_tokens, s.shard_min_tokens,
           s.shard_sum_tokens = p.total_tokens AS shards_conserve,
           p.pk_docs = stages.n_mixture AS pack_counts_ok
    FROM stages, packsum p, shstat s
    """,
)
def docs_curation_e2e_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed end-to-end curation pipeline under one hash — see module
    docstring. One output row: per-stage retention counts, the packing
    audit of the FINAL training set, the shard balance envelope, and two
    cross-operator conservation facts (shard token mass == packed token
    mass; packing row count == mixture row count) computed through
    DIFFERENT operator paths on the Spark side and recomputed once by the
    oracle."""
    return curation_e2e_row(spark, sf_dir)


def curation_e2e_row(
    spark: SparkSession,
    sf_dir: str,
    stage_walls: dict | None = None,
    neardup: str = "exact",
) -> DataFrame:
    """The e2e pipeline body; ``stage_walls`` (optional dict) collects
    {stage_name: wall_sec} for each materialization barrier — the scale
    rehearsal's per-stage instrument (tools/curation_e2e_rehearsal.py).

    ``neardup`` picks the stage-3 pair source:
    - "exact" (default, what the oracle replays): trigram-Jaccard
      inverted-index pairs. Exact, but its cost is Σ df² over posting
      lists — the 100× rehearsal measured it 157.8× at 100× data
      (shared shingles across near-dup copies inflate df quadratically).
      This is the AUDIT path.
    - "lsh": MinHash star edges (operators/dedup.py::minhash_star_edges,
      threshold 0.6, trigram shingles) + the same CC keep-one. Banded
      candidates, O(n·bands) edges even through a giant cluster — the
      100 TB path; the rehearsal pins its growth and its retention
      deviation vs exact (LSH recall < 1 ⇒ slightly more survivors)."""
    import time as _time

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.operators.decontam import ngram_contamination
    from creatorops_lakehouse_spark.operators.dedup import connected_components
    from creatorops_lakehouse_spark.operators.mixing import mixture_sample
    from creatorops_lakehouse_spark.operators.packing import (
        pack_sequences,
        packing_summary,
        shard_snake,
    )
    from creatorops_lakehouse_spark.operators.sampling import stratified_split
    from creatorops_lakehouse_spark.operators.text import (
        repetition_features,
        token_count,
    )

    # stage walls are BOUNDARY-to-boundary: everything since the previous
    # stage's count lands in this stage's wall, so eager operator-internal
    # jobs (CC supersteps, mixture/packing driver collects) are attributed
    # to the stage that ran them, not a catch-all tail
    mark = [_time.time()]

    def _t(name, thunk):
        v = thunk()
        now = _time.time()
        if stage_walls is not None:
            stage_walls[name] = round(now - mark[0], 2)
        mark[0] = now
        return v

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    rep = repetition_features(F.col("text"))
    feat = scoped_persist(
        docs.select(
            "doc_id",
            "text",
            "lang",
            token_count(F.col("text")).alias("k"),
            rep["rep_bigram_bp"].alias("rep_bp"),
            rep["symbol_bp"].alias("sym_bp"),
        )
    )
    n_all = _t('ingest_features', feat.count)

    # stage 1: quality gate (same thresholds as docs_quality_gate)
    q = scoped_persist(
        feat.filter(
            (F.col("k") >= MIN_TOKENS)
            & (F.col("rep_bp") <= MAX_REP_BP)
            & (F.col("sym_bp") <= MAX_SYMBOL_BP)
        ).select("doc_id", "text", "lang", "k")
    )
    n_quality = _t('quality_gate', q.count)

    # stage 2: exact dedup keep-one (min doc_id per text, one shuffle)
    e = scoped_persist(
        q.join(
            q.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )
    n_exact = _t('exact_dedup', e.count)

    # stage 3: near-dup CC keep-one. Shingle sets are per-doc invariant,
    # so the survivor pair graph == the corpus pair graph restricted to
    # surviving endpoints (double semi-join against the session's sticky
    # verified-pair cache — same reuse as docs_curation_funnel).
    surv = e.select("doc_id")
    if neardup == "exact":
        pairs = (
            corpus_trigram_pairs(spark, sf_dir)
            .join(surv.withColumnRenamed("doc_id", "a_id"), "a_id", "left_semi")
            .join(surv.withColumnRenamed("doc_id", "b_id"), "b_id", "left_semi")
            .select("a_id", "b_id")
        )
    else:  # "lsh": the banded scale path (see docstring)
        from creatorops_lakehouse_spark.operators.dedup import (
            minhash_star_edges,
        )

        pairs = minhash_star_edges(
            e.select("doc_id", "text"), threshold=0.6, ngram=3
        ).select("a_id", "b_id")
    losers = (
        connected_components(pairs)
        .filter(F.col("node") != F.col("cluster_id"))
        .select(F.col("node").alias("doc_id"))
    )
    d = scoped_persist(e.join(losers, "doc_id", "left_anti"))
    n_neardup = _t('neardup_cc', d.count)

    # stage 4: stratified split + 5-gram eval decontamination. The eval
    # gram set is broadcast; the train corpus text never shuffles.
    split = stratified_split(d, "doc_id", {"train": 0.90, "eval": 0.05, "test": 0.05})
    train = scoped_persist(split.filter(F.col("split") == "train"))
    n_train = _t('split', train.count)
    contaminated = (
        ngram_contamination(
            train, split.filter(F.col("split") == "eval"), n=5
        )
        .filter(F.col("hit_bp") >= E2E_DECONTAM_BP)
        .select("doc_id")
    )
    c = scoped_persist(train.join(contaminated, "doc_id", "left_anti"))
    n_clean = _t('decontam', c.count)
    n_contaminated = n_train - n_clean

    # stage 5: language-mixture resampling (hash-rank membership)
    m = scoped_persist(
        mixture_sample(c, "lang", "doc_id", MIX_WEIGHTS).select(
            "doc_id", "text", F.col("k").cast("long").alias("w")
        )
    )
    n_mixture = _t('mixture', m.count)

    # stage 6: packing audit of the final training set (two-phase
    # distributed prefix sum inside pack_sequences)
    summary = packing_summary(
        pack_sequences(m, budget=PACK_BUDGET), budget=PACK_BUDGET
    ).select(
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("n_docs").cast("long").alias("pk_docs"),
        F.col("n_straddling").cast("long").alias("n_straddling"),
        F.col("n_seqs").cast("long").alias("n_seqs"),
        F.col("last_fill_bp").cast("long").alias("last_fill_bp"),
    )

    # stage 7: snake shard manifest over the SAME final set, through the
    # separate distributed_global_rank path — shard mass must equal the
    # packing mass (cross-operator conservation)
    shstat = (
        shard_snake(m.select("doc_id", "w"), "w", "doc_id", N_SHARDS)
        .groupBy("shard_id")
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
                n_all,
                n_quality,
                n_exact,
                n_neardup,
                n_train,
                n_contaminated,
                n_clean,
                n_mixture,
            )
        ],
        "n_all long, n_quality long, n_exact long, n_neardup long, "
        "n_train long, n_contaminated long, n_clean long, n_mixture long",
    )
    return (
        stages.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(shstat))
        .select(
            "n_all",
            "n_quality",
            "n_exact",
            "n_neardup",
            "n_train",
            "n_contaminated",
            "n_clean",
            "n_mixture",
            "total_tokens",
            "n_straddling",
            "n_seqs",
            "last_fill_bp",
            "shard_max_tokens",
            "shard_min_tokens",
            (F.col("shard_sum_tokens") == F.col("total_tokens")).alias(
                "shards_conserve"
            ),
            (F.col("pk_docs") == F.col("n_mixture")).alias("pack_counts_ok"),
        )
    )


@query(
    "docs_curation_incremental_verdict",
    oracle=f"""
    WITH RECURSIVE {_SQL_E2E}
    SELECT n_all, n_quality, n_exact, n_neardup, n_train,
           n_contaminated, n_clean,
           TRUE AS equals_oneshot, TRUE AS equals_full_run,
           TRUE AS replay_noop_ok
    FROM stages
    """,
)
def docs_curation_incremental_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ROLLING curation under one hash (VERDICT r11 item 4,
    curation.py::curate_increment): the corpus arrives as two
    monotone-id batches; only the new docs flow through quality →
    exact-dedup probe (first-seen texts index) → near-dup probe
    (:func:`probe_jaccard_index` — the EXACT posting-join math, no LSH
    recall loss) → split → decontamination against the accumulated eval
    corpus, with late-arriving eval contamination TOMBSTONING earlier
    train docs (merge-on-read); ``clean_train`` grows append-only and
    each state append is exactly-once under the snapshot log's txn map.

    The output row is the incremental run's summed per-batch manifest:
    n_* columns are the per-increment counts summed (quality is
    row-local, exact/near-dup probes partition the one-shot decision by
    batch, splits are hash-deterministic — so the sums must equal the
    ONE-SHOT pipeline's stage counts, which is exactly what the oracle
    recomputes from raw ``documents`` with the e2e pipeline's recursive
    CTE; n_contaminated folds the retro tombstones in). In-engine
    booleans: equals_oneshot (incremental clean_train ==
    curate_increment over the whole corpus in one batch, set equality),
    equals_full_run (== run()'s clean_train — the hash-checked e2e
    pipeline), replay_noop_ok (re-admitting batch 2 under its batch_id
    changes nothing — the txn map skips every table). A drifted probe,
    a double-folded replay, or a missed retro tombstone flips the hash
    at any SF. Eager verdict harness (excluded from bench); scratch
    trees deleted before returning."""
    import shutil as _shutil
    import tempfile as _tempfile

    from creatorops_lakehouse_spark.curation import (
        curate_increment,
        increment_manifest,
        incremental_clean_train,
        run,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    cut = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    root = _tempfile.mkdtemp(prefix="snap_cur_inc_")
    one_root = _tempfile.mkdtemp(prefix="snap_cur_one_")
    try:
        b2 = docs.filter(F.col("doc_id") > cut)
        c1 = curate_increment(
            spark, docs.filter(F.col("doc_id") <= cut), root
        )
        c2 = curate_increment(spark, b2, root)
        got = incremental_clean_train(spark, root).select(
            "doc_id", "text", "lang", "k"
        )

        c2r = curate_increment(spark, b2, root, batch_id=c2["batch_id"])
        after_replay = incremental_clean_train(spark, root).select(
            "doc_id", "text", "lang", "k"
        )
        replay_noop_ok = (
            c2r == c2
            and after_replay.join(got, ["doc_id"], "left_anti").count() == 0
            and got.join(after_replay, ["doc_id"], "left_anti").count() == 0
        )

        curate_increment(spark, docs, one_root)
        oneshot = incremental_clean_train(spark, one_root).select(
            "doc_id", "text", "lang", "k"
        )
        cols = ["doc_id", "text", "lang", "k"]
        equals_oneshot = (
            got.join(oneshot, cols, "left_anti").count() == 0
            and oneshot.join(got, cols, "left_anti").count() == 0
        )
        full_ct = run(spark, docs).clean_train.select(*cols)
        equals_full_run = (
            got.join(full_ct, cols, "left_anti").count() == 0
            and full_ct.join(got, cols, "left_anti").count() == 0
        )

        man = {
            r.batch_id: r.asDict()
            for r in increment_manifest(spark, root).collect()
        }
        s = {
            k: man[0][k] + man[1][k]
            for k in (
                "n_in", "n_quality", "n_exact", "n_neardup", "n_train",
                "n_contaminated", "n_retro_tombstoned",
            )
        }
        row = (
            s["n_in"], s["n_quality"], s["n_exact"], s["n_neardup"],
            s["n_train"], s["n_contaminated"] + s["n_retro_tombstoned"],
            got.count(),
            bool(equals_oneshot), bool(equals_full_run),
            bool(replay_noop_ok),
        )
    finally:
        _shutil.rmtree(root, ignore_errors=True)
        _shutil.rmtree(one_root, ignore_errors=True)

    return spark.createDataFrame(
        [row],
        "n_all long, n_quality long, n_exact long, n_neardup long, "
        "n_train long, n_contaminated long, n_clean long, "
        "equals_oneshot boolean, equals_full_run boolean, "
        "replay_noop_ok boolean",
    )
