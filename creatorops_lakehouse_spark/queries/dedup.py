"""Deduplication queries over the driver ``documents`` table.

Every query here is oracle-checked in SQL, including MinHash-LSH and
SimHash since r10: the registered rows run hash_mode="md5" (the one
64-bit-quality hash Spark, DuckDB, and Python share), so the full
pipelines — lanes, permutations, band buckets, candidate joins, exact
verify / bit votes — replay in DuckDB hash-for-hash. xxhash64 stays the
operator prod default, its correctness pinned by the recall verdicts
and pytest (LSH/SimHash candidates ⊇ high-similarity Jaccard pairs, no
false positives after verification; tests/test_operators_dedup.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from creatorops_lakehouse_spark.operators.dedup import (
    duplicate_clusters,
    fingerprint_clusters,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from creatorops_lakehouse_spark.queries import load, query

_SQL_TOKENS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

#: docs_streaming_admission_verdict stages micro-batch files via a driver
#: collect (the operator under test is distributed; the collect is test
#: staging). Refuse a corpus above this rather than OOM the driver.
MAX_STAGE_DOCS = 200_000


def corpus_sets(spark: SparkSession, sf_dir: str, ngram: int) -> DataFrame:
    """Session-lifetime shingle-set table for the driver ``documents``
    corpus — (doc_id, toks, set_size) at the given n-gram order.

    Jaccard, MinHash-LSH, SimHash, the CC clustering query, and the
    curation funnel all start from this same projection; building it once
    per (corpus, ngram) and holding it in a bounded keyed cache
    (operators/cache.py::sticky_persist) removes the dominant repeated cost
    of the dedup query tier (measured 2–4 s per query at sf0.1). At 100 TB
    the equivalent move is materializing the shingle table once per corpus
    snapshot — same build-once/probe-many shape as the persisted MinHash
    index."""
    from creatorops_lakehouse_spark.operators.cache import sticky_persist
    from creatorops_lakehouse_spark.operators.dedup import _token_sets

    return sticky_persist(
        f"docs_sets:{sf_dir}:{ngram}",
        lambda: _token_sets(
            load(spark, sf_dir, "documents").select("doc_id", "text"),
            "text",
            "doc_id",
            ngram,
        ),
    )

def corpus_trigram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-lifetime VERIFIED trigram-Jaccard pair table (≥0.6) for the
    driver ``documents`` corpus — (a_id, b_id, n_common, jaccard).

    Three queries consume the identical pair graph: the pair listing
    (docs_jaccard_neardup_pairs), transitive clustering
    (docs_dedup_clusters_cc), and the curation funnel's keep-one stage
    (which needs exactly the corpus pairs whose BOTH endpoints survive
    exact dedup — shingle sets are per-doc invariant, so subset pairs are a
    semi-join, not a recompute). The inverted-index self-join is the
    dominant cost of the tier (~4 s per query at sf0.1); building the pair
    table once per corpus and holding it in the bounded keyed cache is the
    same materialize-once shape as the shingle cache one level up. At
    100 TB this is a persisted near-dup edge table refreshed per corpus
    snapshot — every downstream consumer (clustering, funnel audits,
    retention analytics) reads it instead of re-joining."""
    from creatorops_lakehouse_spark.operators.cache import sticky_persist

    return sticky_persist(
        f"docs_pairs:{sf_dir}:3:0.6",
        lambda: jaccard_pairs(
            load(spark, sf_dir, "documents"),
            text_col="text",
            id_col="doc_id",
            threshold=0.6,
            ngram=3,
            prefix_filter=False,
            sets=corpus_sets(spark, sf_dir, 3),
        ),
    )


#: shared CTE chain producing exact word-trigram Jaccard stats per doc pair
#: (mirrors operators/dedup.py::jaccard_pairs(ngram=3) — see
#: docs_jaccard_neardup_pairs for the semantics notes)
_SQL_TRIGRAM_COMMON = f"""
    toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS l FROM documents
    ),
    sets AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(0, greatest(len(l) - 3, 0) + 1),
                   i -> array_to_string(l[i + 1 : i + 3], ' '))) AS shingles
        FROM toks
    ),
    sized AS (SELECT doc_id, shingles, len(shingles) AS set_size FROM sets),
    posts AS (SELECT doc_id, set_size, unnest(shingles) AS tok FROM sized),
    common AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               a.set_size AS a_size, b.set_size AS b_size,
               COUNT(*) AS n_common
        FROM posts a JOIN posts b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )
"""


@query(
    "docs_exact_dedup_clusters",
    oracle="""
    SELECT content_hash, n_docs, canonical_id
    FROM (
        SELECT sha256(text) AS content_hash,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS canonical_id
        FROM documents
        GROUP BY 1
    )
    WHERE n_docs > 1
    """,
)
def docs_exact_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate clusters: content-hash groupBy (scale: one shuffle
    on the 256-bit hash; no pairwise work at all)."""
    return duplicate_clusters(
        load(spark, sf_dir, "documents"), "text", "doc_id"
    ).filter(F.col("n_docs") > 1)


@query(
    "docs_fingerprint_dedup",
    oracle="""
    SELECT doc_fingerprint, n_docs, canonical_id
    FROM (
        SELECT sha256(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS doc_fingerprint,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS canonical_id
        FROM documents
        GROUP BY 1
    )
    WHERE n_docs > 1
    """,
)
def docs_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint clusters (case/whitespace/punct-
    invariant near-exact dedup)."""
    return fingerprint_clusters(
        load(spark, sf_dir, "documents"), "text", "doc_id"
    ).filter(F.col("n_docs") > 1)


@query(
    "docs_jaccard_neardup_pairs",
    oracle=f"""
    WITH {_SQL_TRIGRAM_COMMON}
    SELECT a_id, b_id, n_common,
           CAST(n_common AS DOUBLE) / (a_size + b_size - n_common) AS jaccard
    FROM common
    WHERE CAST(n_common AS DOUBLE) / (a_size + b_size - n_common) >= 0.6
    """,
)
def docs_jaccard_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard near-dup pairs (≥0.6) via inverted-index
    self-join — the verification layer under MinHash-LSH.

    Trigram shingles (not unigrams): with a small vocabulary, unigram
    posting lists approach |docs| and the self-join degenerates toward n² —
    higher-order shingles keep document frequency per shingle low, which is
    what bounds the join at scale. The ratio is an exact small-integer
    division — identical doubles on both engines.

    prefix_filter=False here: trigram posting lists are already sparse, so
    the filter's df-ranking overhead exceeds its candidate savings at this
    density (measured at sf0.1). Enable it for dense shingle spaces
    (unigrams / short n-grams), where it is the all-pairs bound.
    """
    return corpus_trigram_pairs(spark, sf_dir)


@query(
    "docs_containment_neardup_pairs",
    oracle=f"""
    WITH {_SQL_TRIGRAM_COMMON}
    SELECT a_id, b_id, n_common,
           CAST(n_common AS DOUBLE) / least(a_size, b_size) AS containment
    FROM common
    WHERE n_common * 10000 >= 8000 * least(a_size, b_size)
    """,
)
def docs_containment_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram containment pairs (C = |A∩B|/min(|A|,|B|) ≥ 0.8):
    the asymmetric dedup metric that catches a short document embedded in a
    long one — quote pages, excerpt reposts, boilerplate-wrapped copies —
    which Jaccard misses because the union denominator dilutes them.

    Same inverted-index plan and the same session shingle cache as
    docs_jaccard_neardup_pairs (one corpus projection feeds both metrics);
    the keep/drop decision runs in exact scaled-integer arithmetic on both
    engines (operators/dedup.py::containment_pairs for the prefix-filter
    caveat: PPJoin pruning is Jaccard-only and would drop true containment
    pairs, so this path never prunes).
    """
    from creatorops_lakehouse_spark.operators.dedup import containment_pairs

    return containment_pairs(
        load(spark, sf_dir, "documents"),
        text_col="text",
        id_col="doc_id",
        threshold=0.8,
        ngram=3,
        sets=corpus_sets(spark, sf_dir, 3),
    )


@query(
    "docs_dedup_clusters_cc",
    oracle=f"""
    WITH RECURSIVE {_SQL_TRIGRAM_COMMON},
    pairs AS (
        SELECT a_id, b_id FROM common
        WHERE CAST(n_common AS DOUBLE) / (a_size + b_size - n_common) >= 0.6
    ),
    edges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION
        SELECT b_id, a_id FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
    FROM reach
    GROUP BY src
    """,
)
def docs_dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: exact trigram-Jaccard pairs (≥0.6) →
    connected components → (doc_id, cluster_id = component min id).

    The keep-one-per-cluster step every dedup pipeline ends with: pairwise
    operators emit edges, but a~b, b~c must retire {a,b,c} together even
    when (a,c) was never emitted. Spark side is iterative min-label
    propagation (operators/dedup.py::connected_components); the oracle is
    an exact recursive-CTE transitive closure.
    """
    from creatorops_lakehouse_spark.operators.dedup import connected_components

    pairs = corpus_trigram_pairs(spark, sf_dir).select("a_id", "b_id")
    cc = connected_components(pairs)
    return cc.select(F.col("node").alias("doc_id"), "cluster_id")


#: the bigram shingle CTE chain shared by the replayable MinHash/SimHash
#: oracles (mirrors operators/text.py tokens + word_ngrams(2) exactly —
#: the same chain docs_minhash_recall_verdict has been hash-green on)
_SQL_BIGRAM_SETS = f"""
    toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS l FROM documents
    ),
    sets AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(0, greatest(len(l) - 2, 0) + 1),
                   i -> array_to_string(l[i + 1 : i + 2], ' '))) AS shingles
        FROM toks
    ),
    sized AS (SELECT doc_id, shingles, len(shingles) AS set_size FROM sets)
"""


def _sql_minhash_lsh_pairs(
    threshold: float = 0.5, num_perm: int = 64, bands: int = 16
) -> str:
    """DuckDB replay of the FULL md5-mode MinHash+LSH pipeline: md5 lanes
    (first 15 hex chars → 60-bit int, mod 2^31−1 — verified identical to
    Spark's conv(substr(md5,1,15),16,10)), the same 64 affine permutation
    constants (random.Random(1), embedded as literals in both engines),
    md5-hex band buckets, candidate self-join, exact-Jaccard verify."""
    from creatorops_lakehouse_spark.operators.dedup import (
        _MERSENNE_31,
        _perm_params,
    )

    rows = num_perm // bands
    params = _perm_params(num_perm)
    lane = (
        "CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % " + str(_MERSENNE_31)
    )
    sig_cols = ",\n               ".join(
        f"list_min(list_transform(base, h -> ({a} * h + {b}) % {_MERSENNE_31}))"
        f" AS s{i}"
        for i, (a, b) in enumerate(params)
    )
    band_selects = "\n        UNION ALL\n        ".join(
        "SELECT doc_id, {b} AS band, md5({cat}) AS bucket FROM sigs".format(
            b=b,
            cat=" || ',' || ".join(
                f"CAST(s{b * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    return f"""
    WITH {_SQL_BIGRAM_SETS},
    lanes AS (
        SELECT doc_id, list_transform(shingles, s -> {lane}) AS base
        FROM sized WHERE set_size > 0
    ),
    sigs AS (
        SELECT doc_id,
               {sig_cols}
        FROM lanes
    ),
    bands AS (
        {band_selects}
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    verified AS (
        SELECT a_id, b_id,
               CAST(n_common AS DOUBLE) / (a_size + b_size - n_common)
                   AS jaccard
        FROM (
            SELECT c.a_id, c.b_id,
                   len(list_intersect(sa.shingles, sb.shingles)) AS n_common,
                   sa.set_size AS a_size, sb.set_size AS b_size
            FROM cands c
            JOIN sized sa ON sa.doc_id = c.a_id
            JOIN sized sb ON sb.doc_id = c.b_id
        )
    )
    SELECT a_id, b_id, jaccard FROM verified WHERE jaccard >= {threshold}
    """


@query("docs_minhash_lsh_pairs", oracle=_sql_minhash_lsh_pairs())
def docs_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64 perms) + 16-band LSH candidates, exact-Jaccard-verified
    at ≥0.5 over word bigrams. The scale path for near-dedup: signature is
    one projection; candidate generation is an equi-join on band buckets.

    hash_mode="md5" (VERDICT r9 item 2): the registered row derives lanes
    and buckets from md5 — the one 64-bit-quality hash Spark, DuckDB, and
    Python share — so the ENTIRE pipeline (lanes → permutations → bands →
    candidate join → exact verify) is hash-checked against the DuckDB
    oracle, not just row counts. xxhash64 stays the operator's prod
    default (JVM-native; same band geometry) and keeps its own recall
    gate via docs_minhash_recall_verdict."""
    return minhash_lsh_pairs(
        load(spark, sf_dir, "documents"),
        threshold=0.5,
        ngram=2,
        num_perm=64,
        bands=16,
        sets=corpus_sets(spark, sf_dir, 2),
        hash_mode="md5",
    )


#: the ONE SimHash geometry this repo ships: hamming ≤ 7 over 64-bit
#: simhash, candidates from 4×16-bit chunks with 1-bit multiprobe.
#: Recall guarantee: floor(7/4) = 1 ≤ probe, so every qualifying pair lands
#: ≤1 bit error in some chunk and is emitted (pigeonhole) — see
#: operators/dedup.py::simhash_banded_pairs for the candidate-volume math.
#: The registered query, the recall verdict, and the 10× rehearsal all run
#: exactly this config.
SIMHASH_GEOMETRY = {"max_hamming": 7, "n_chunks": 4, "probe": 1}


def _sql_simhash_pairs(max_hamming: int = 7) -> str:
    """DuckDB replay of md5-mode SimHash: per-shingle 64-bit hash from two
    md5 hex halves (hi = chars 1-8, lo = chars 9-16 — Spark assembles
    hi<<32|lo), per-bit sign votes, then EXHAUSTIVE hamming ≤ 7. The
    exhaustive form is exactly the banded operator's output because the
    registered geometry (4×16-bit chunks, 1-bit multiprobe) has
    pigeonhole-GUARANTEED recall at hamming ≤ 2·4−1 = 7 and the operator
    exact-verifies every candidate — the same equivalence
    docs_simhash_recall_verdict hash-checks for the xxhash64 table."""
    vote_cols = []
    for b in range(64):
        half, off = ("lo", b) if b < 32 else ("hi", b - 32)
        vote_cols.append(f"SUM(({half} >> {off}) & 1) AS v{b}")
    lo_bits = " + ".join(f"(CASE WHEN 2 * v{b} > n THEN {1 << b} ELSE 0 END)"
                         for b in range(32))
    hi_bits = " + ".join(f"(CASE WHEN 2 * v{b + 32} > n THEN {1 << b} ELSE 0 END)"
                         for b in range(32))
    return f"""
    WITH {_SQL_BIGRAM_SETS},
    hl AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS hi,
               CAST(('0x' || substr(md5(s), 9, 8)) AS BIGINT) AS lo
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sized)
    ),
    votes AS (
        SELECT doc_id, COUNT(*) AS n, {', '.join(vote_cols)}
        FROM hl GROUP BY doc_id
    ),
    sig AS (
        SELECT doc_id,
               CAST({lo_bits} AS BIGINT) AS slo,
               CAST({hi_bits} AS BIGINT) AS shi
        FROM votes
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.slo, b.slo))
                + bit_count(xor(a.shi, b.shi)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.slo, b.slo)) + bit_count(xor(a.shi, b.shi))
          <= {max_hamming}
    """


@query("docs_simhash_pairs", oracle=_sql_simhash_pairs())
def docs_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs at hamming ≤ 7 over word bigrams,
    candidates from 16-bit-chunk 1-bit-multiprobe collisions — recall
    GUARANTEED at the registered threshold (hamming ≤ 2·n_chunks − 1 = 7),
    verified pair-for-pair against the exhaustive hamming join by
    docs_simhash_recall_verdict at this same geometry.

    hash_mode="md5" (VERDICT r9 item 2): shingle hashes come from md5's
    first 16 hex chars, identical in Spark and DuckDB, so the row is
    hash-checked end-to-end (votes → signature → pairs); the pigeonhole
    recall guarantee lets the oracle use the exhaustive hamming join as
    the exact expected output. xxhash64 stays the operator prod default
    with its own hash-green recall verdict."""
    return simhash_pairs(
        load(spark, sf_dir, "documents"), ngram=2,
        sets=corpus_sets(spark, sf_dir, 2), hash_mode="md5",
        **SIMHASH_GEOMETRY,
    )


@query(
    "docs_minhash_lsh_pairs_prod",
    oracle=f"""
    WITH {_SQL_BIGRAM_SETS},
    posts AS (SELECT doc_id, set_size, unnest(shingles) AS tok FROM sized),
    common AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               a.set_size AS a_size, b.set_size AS b_size,
               COUNT(*) AS n_common
        FROM posts a JOIN posts b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )
    SELECT a_id, b_id,
           CAST(n_common AS DOUBLE) / (a_size + b_size - n_common) AS jaccard
    FROM common
    WHERE CAST(n_common AS DOUBLE) / (a_size + b_size - n_common) >= 0.5
    """,
)
def docs_minhash_lsh_pairs_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION MinHash-LSH path (xxhash64 lanes + 64-bit-long band
    buckets — 8 B bucket shuffle vs the md5 twin's 32 B hex strings),
    registered as a BENCHED row so BENCH_r11+ times what production would
    actually run (VERDICT r10 item 1b: the md5 twin's cost had silently
    become the benched number).

    The oracle is the EXACT all-pairs bigram-Jaccard set at the same
    threshold — STRICTER than the md5 twin's LSH replay: a hash match
    requires LSH recall = 1.0 on this corpus, so any lost band, broken
    bucket join, or verify asymmetry flips the gate. That equality is an
    empirical property of the fixed driver corpus (measured exact at
    sf0.001/0.01/0.1; min true-pair jaccard 0.82 → per-pair miss
    probability ≤ 7e-5 under the band geometry P(collide) =
    1−(1−j^4)^16), and both the corpus and xxhash64 are deterministic, so
    the gate is stable — it is NOT a general recall guarantee; the
    declared floor lives in docs_minhash_recall_verdict."""
    return minhash_lsh_pairs(
        load(spark, sf_dir, "documents"),
        threshold=0.5,
        ngram=2,
        num_perm=64,
        bands=16,
        sets=corpus_sets(spark, sf_dir, 2),
    )


@query("docs_simhash_pairs_prod")
def docs_simhash_pairs_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION SimHash path (xxhash64 shingle hashes), registered
    as a BENCHED row (VERDICT r10 item 1b). Rows-only by necessity: the
    64-bit signatures — and therefore the borderline-hamming pair set —
    are a function of the shingle hash family, and DuckDB has no xxhash64
    to replay (measured: md5 and xxhash64 tables agree on ~86-89% IoU of
    pairs at hamming ≤ 7, diverging only at the 6-8 boundary). Its
    correctness instruments are both hash-green: the banded-vs-exhaustive
    recall contract at THIS hash (docs_simhash_recall_verdict) and the
    cross-hash pair-set parity floor (docs_simhash_prod_parity_verdict)."""
    return simhash_pairs(
        load(spark, sf_dir, "documents"), ngram=2,
        sets=corpus_sets(spark, sf_dir, 2),
        **SIMHASH_GEOMETRY,
    )


@query(
    "docs_simhash_prod_parity_verdict",
    oracle=f"""
    WITH {_SQL_BIGRAM_SETS},
    hl AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS hi,
               CAST(('0x' || substr(md5(s), 9, 8)) AS BIGINT) AS lo
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sized)
    ),
    votes AS (
        SELECT doc_id, COUNT(*) AS n,
               {', '.join(
                   f"SUM(({'lo' if b < 32 else 'hi'} >> {b % 32}) & 1) AS v{b}"
                   for b in range(64)
               )}
        FROM hl GROUP BY doc_id
    ),
    sig AS (
        SELECT doc_id,
               CAST({' + '.join(f"(CASE WHEN 2 * v{b} > n THEN {1 << b} ELSE 0 END)" for b in range(32))} AS BIGINT) AS slo,
               CAST({' + '.join(f"(CASE WHEN 2 * v{b + 32} > n THEN {1 << b} ELSE 0 END)" for b in range(32))} AS BIGINT) AS shi
        FROM votes
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_md5_pairs,
           TRUE AS parity_ok
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.slo, b.slo)) + bit_count(xor(a.shi, b.shi)) <= 7
    """,
)
def docs_simhash_prod_parity_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-hash pair-set parity for the benched SimHash prod row
    (VERDICT r10 item 1b): the xxhash64 production pair set and the
    md5 replayable twin's pair set must agree to IoU ≥ 0.6 — two hash
    families estimating the same bigram-vote similarity may flip
    borderline pairs at the hamming 6-8 boundary (measured IoU 0.83-0.89
    across sf0.001/0.01/0.1) but collapse of the overlap means the prod
    path's banding or signature broke. The oracle recomputes the md5
    twin's EXHAUSTIVE pair count in SQL (valid as the banded twin's
    expected output by the pigeonhole recall guarantee at h ≤ 7) and pins
    parity_ok; a drifted prod path flips the hash-checked boolean."""
    sets = corpus_sets(spark, sf_dir, 2)
    docs = load(spark, sf_dir, "documents")
    prod = simhash_pairs(
        docs, ngram=2, sets=sets, **SIMHASH_GEOMETRY
    ).select("a_id", "b_id", F.lit(1).alias("_p"))
    twin = simhash_pairs(
        docs, ngram=2, sets=sets, hash_mode="md5", **SIMHASH_GEOMETRY
    ).select("a_id", "b_id", F.lit(1).alias("_t"))
    merged = prod.join(twin, on=["a_id", "b_id"], how="full_outer")
    agg = merged.agg(
        F.count("_t").alias("_n_twin"),
        F.count(F.lit(1)).alias("_n_union"),
        F.count(F.when(F.col("_p").isNotNull() & F.col("_t").isNotNull(), 1)).alias(
            "_n_both"
        ),
    )
    return agg.select(
        F.col("_n_twin").cast("long").alias("n_md5_pairs"),
        ((F.col("_n_both") * 10) >= (F.col("_n_union") * 6)).alias("parity_ok"),
    )


@query(
    "docs_minhash_recall_verdict",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKENS} AS l FROM documents
    ),
    sets AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(0, greatest(len(l) - 2, 0) + 1),
                   i -> array_to_string(l[i + 1 : i + 2], ' '))) AS shingles
        FROM toks
    ),
    sized AS (SELECT doc_id, shingles, len(shingles) AS set_size FROM sets),
    posts AS (SELECT doc_id, set_size, unnest(shingles) AS tok FROM sized),
    common AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               a.set_size AS a_size, b.set_size AS b_size,
               COUNT(*) AS n_common
        FROM posts a JOIN posts b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    ),
    exact AS (
        SELECT a_id, b_id FROM common
        WHERE CAST(n_common AS DOUBLE) / (a_size + b_size - n_common) >= 0.5
    )
    SELECT COUNT(*) AS n_exact_pairs,
           CAST(0 AS BIGINT) AS n_false_positives,
           TRUE AS recall_ok
    FROM exact
    """,
)
def docs_minhash_recall_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable MinHash-LSH recall contract: compare the LSH pairs
    against the in-engine EXACT bigram Jaccard pairs at the same threshold.

    The DuckDB oracle recomputes the exact pair set in SQL and asserts the
    two engine-checkable facts — n_exact_pairs matches, zero false
    positives (LSH output is exact-verified, so it is a subset of the exact
    set by construction) — plus the recall verdict as a literal TRUE: if
    band-geometry recall ever drops below the declared floor (0.8), the
    Spark side emits FALSE and the driver's value hash flags it.
    """
    docs = load(spark, sf_dir, "documents")
    exact = jaccard_pairs(
        docs, text_col="text", id_col="doc_id", threshold=0.5, ngram=2,
        prefix_filter=True, sets=corpus_sets(spark, sf_dir, 2),
    ).select("a_id", "b_id", F.lit(1).alias("_e"))
    lsh = minhash_lsh_pairs(
        docs, threshold=0.5, ngram=2, num_perm=64, bands=16,
        sets=corpus_sets(spark, sf_dir, 2),
    ).select("a_id", "b_id", F.lit(1).alias("_l"))
    merged = exact.join(lsh, on=["a_id", "b_id"], how="full_outer")
    summary = merged.agg(
        F.count("_e").alias("n_exact_pairs"),
        F.count(F.when(F.col("_e").isNull(), 1)).alias("n_false_positives"),
        F.count(F.when(F.col("_e").isNotNull() & F.col("_l").isNotNull(), 1)).alias(
            "_n_hits"
        ),
    )
    return summary.select(
        "n_exact_pairs",
        "n_false_positives",
        (
            (F.col("n_exact_pairs") == 0)
            | (F.col("_n_hits") / F.col("n_exact_pairs") >= 0.8)
        ).alias("recall_ok"),
    )


@query(
    "docs_incremental_dedup_verdict",
    oracle="SELECT TRUE AS incremental_matches_full, CAST(0 AS BIGINT) AS n_diff",
)
def docs_incremental_dedup_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable incremental-dedup contract: splitting the corpus
    into an indexed 80% and a probed 20% batch must reproduce EXACTLY the
    pairs of a full recompute — probe(new vs index) ∪ within(new) ∪
    pairs(indexed) == pairs(all). Candidate generation is band-collision
    based on both paths, so the equality is exact, not approximate; any
    drift (a lost band, a verification asymmetry) flips the hash-checked
    verdict. The index lives in a per-run temp dir (cost scales with the
    batch at probe time — the 100 TB operating loop)."""
    import tempfile

    from creatorops_lakehouse_spark.operators.dedup import (
        build_minhash_index,
        minhash_lsh_pairs,
        probe_minhash_index,
    )
    from creatorops_lakehouse_spark.sources.tables import TableSpec

    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    docs = scoped_persist(load(spark, sf_dir, "documents"))
    indexed = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    root = tempfile.mkdtemp(prefix="mh_index_")
    bands_spec = TableSpec("mh.bands", f"{root}/bands")
    sets_spec = TableSpec("mh.sets", f"{root}/sets")
    build_minhash_index(indexed, bands_spec, sets_spec)

    pair_key = ["a_id", "b_id"]
    norm = lambda df: df.select(  # noqa: E731 — orient pairs canonically
        F.least("a_id", "b_id").alias("a_id"),
        F.greatest("a_id", "b_id").alias("b_id"),
    )
    incremental = (
        norm(probe_minhash_index(spark, bands_spec, sets_spec, batch))
        .unionByName(norm(minhash_lsh_pairs(indexed)))
        .dropDuplicates(pair_key)
    )
    full = norm(minhash_lsh_pairs(docs)).dropDuplicates(pair_key)
    merged = incremental.withColumn("_i", F.lit(1)).join(
        full.withColumn("_f", F.lit(1)), on=pair_key, how="full_outer"
    )
    summary = merged.agg(
        F.count(F.when(F.col("_i").isNull() | F.col("_f").isNull(), 1)).alias("n_diff")
    )
    return summary.select(
        (F.col("n_diff") == 0).alias("incremental_matches_full"), "n_diff"
    )


@query(
    "docs_simhash_recall_verdict",
    oracle="SELECT TRUE AS recall_complete, TRUE AS no_false_positives",
)
def docs_simhash_recall_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable SimHash banding contract AT THE REGISTERED
    GEOMETRY (SIMHASH_GEOMETRY — the exact config docs_simhash_pairs
    ships): at max_hamming ≤ n_chunks·(probe+1) − 1 the pigeonhole
    guarantee makes the multiprobe banded join's output EQUAL the
    exhaustive all-pairs hamming join. Both sides are computed in-engine
    from ONE persisted simhash table; the oracle pins the two booleans, so
    any banding regression (missed chunk, wrong mask, dropped probe flip)
    flips a hash-checked value. The exhaustive side is the O(n²/2) audit
    baseline — compact (64-bit hashes only) but quadratic, never the scale
    route.
    """
    from creatorops_lakehouse_spark.operators.dedup import (
        _token_sets,
        simhash_banded_pairs,
        simhash_exact_pairs,
        simhash_table,
    )

    from creatorops_lakehouse_spark.operators.cache import scoped_persist

    docs = load(spark, sf_dir, "documents")
    sh = scoped_persist(simhash_table(corpus_sets(spark, sf_dir, 2)))
    banded = simhash_banded_pairs(sh, **SIMHASH_GEOMETRY).select(
        "a_id", "b_id", F.lit(1).alias("_b")
    )
    exact = simhash_exact_pairs(sh, max_hamming=SIMHASH_GEOMETRY["max_hamming"]).select(
        "a_id", "b_id", F.lit(1).alias("_x")
    )
    merged = exact.join(banded, on=["a_id", "b_id"], how="full_outer")
    summary = merged.agg(
        F.count(F.when(F.col("_x").isNotNull() & F.col("_b").isNull(), 1)).alias(
            "_n_missed"
        ),
        F.count(F.when(F.col("_x").isNull(), 1)).alias("_n_fp"),
    )
    return summary.select(
        (F.col("_n_missed") == 0).alias("recall_complete"),
        (F.col("_n_fp") == 0).alias("no_false_positives"),
    )


@query(
    "docs_streaming_admission_verdict",
    oracle="""
    SELECT TRUE AS stream_matches_sequential,
           TRUE AS no_residual_pairs,
           TRUE AS replay_idempotent
    """,
)
def docs_streaming_admission_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable batch-replay contract for the STREAMING near-dup
    admission path (streaming/dedup.py): split the corpus into 2
    micro-batches and pin three facts, each a hash-checked boolean —

    1. stream_matches_sequential: running the REAL Structured Streaming
       machinery (readStream json → maxFilesPerTrigger=1 → foreachBatch →
       checkpoint, one micro-batch per staged file in mtime order) admits
       EXACTLY the docs that calling the foreachBatch body (admit_batch)
       sequentially admits — the streaming plumbing adds/loses nothing
       over batch semantics.
    2. no_residual_pairs: the admitted corpus contains ZERO verified
       near-dup pairs at the admission threshold — the global invariant
       the greedy loop exists to establish (band buckets are deterministic
       per doc, so any colliding admitted pair would have been found when
       its later member was probed).
    3. replay_idempotent: re-running a NON-FINAL batch (foreachBatch is
       at-least-once) after later batches have landed leaves the admitted
       table bit-identical — the p_batch dynamic-overwrite discipline.

    The JSON staging collects the sf0.01 corpus to the driver — bounded
    harness plumbing to CREATE a stream source, not an operator pattern;
    all three comparisons run in-engine. Two batches, not more: each
    admit_batch/micro-batch costs ~10 s of fixed multi-stage latency at
    harness scale regardless of rows, and every contract above needs only
    batch count ≥ 2 (cross-batch probe, non-final replay, multi-file
    stream).
    """
    import json
    import os
    import tempfile
    import time as _time

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.operators.dedup import minhash_lsh_pairs
    from creatorops_lakehouse_spark.sources.tables import TableSpec
    from creatorops_lakehouse_spark.streaming.dedup import (
        accepted_corpus,
        admit_batch,
        dedup_ingest_stream,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # verdict-staging collect: the operator under test (streaming
    # admission) is distributed; this collect only stages micro-batch
    # FILES for it. Corpus-bounded at test SFs but refuse a big corpus
    # outright (the cosine_topk guard pattern, similarity.py) rather
    # than OOM the driver if someone points the verdict at real data.
    n_docs = docs.count()
    if n_docs > MAX_STAGE_DOCS:
        raise ValueError(
            f"docs_streaming_admission_verdict stages micro-batches via a "
            f"driver collect and refuses corpora above {MAX_STAGE_DOCS:,} "
            f"docs (got {n_docs:,}); it is a correctness AUDIT for small "
            "SFs — run streaming/dedup.py operators directly at scale"
        )
    rows = docs.collect()
    batches: list[list] = [[], []]
    for r in rows:
        batches[r.doc_id % 2].append((r.doc_id, r.text))

    root = tempfile.mkdtemp(prefix="stream_admission_")

    def specs(tag: str):
        return (
            TableSpec(f"sd_{tag}.bands", f"{root}/{tag}/bands", partition_by=("p_batch",)),
            TableSpec(f"sd_{tag}.sets", f"{root}/{tag}/sets", partition_by=("p_batch",)),
            TableSpec(
                f"sd_{tag}.accepted", f"{root}/{tag}/accepted", partition_by=("p_batch",)
            ),
        )

    schema = "doc_id long, text string"

    # --- sequential path: the foreachBatch body called directly, in order
    sb, ss, sa = specs("seq")
    for i, batch in enumerate(batches):
        admit_batch(spark, spark.createDataFrame(batch, schema), i, sb, ss, sa)
    seq_ids = scoped_persist(accepted_corpus(spark, sa).select("doc_id"))
    seq_ids.count()  # materialize BEFORE the replay mutates the tables
    # replay a NON-FINAL batch (at-least-once delivery) — state must not move
    admit_batch(spark, spark.createDataFrame(batches[0], schema), 0, sb, ss, sa)
    replay_ids = accepted_corpus(spark, sa).select("doc_id")

    # --- streaming path: real readStream/foreachBatch/checkpoint, one
    # micro-batch per file (mtime-ordered to match the sequential order)
    tb, ts, ta = specs("stream")
    src = f"{root}/src"
    os.makedirs(src)
    t0 = _time.time() - 1000
    for i, batch in enumerate(batches):
        p = f"{src}/b{i}.json"
        with open(p, "w") as fh:
            for doc_id, text in batch:
                fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.utime(p, (t0 + i * 10, t0 + i * 10))
    q = dedup_ingest_stream(
        spark, src, schema, tb, ts, ta,
        checkpoint_dir=f"{root}/ckpt", max_files_per_trigger=1,
    )
    # availableNow triggers terminate on their own; the timeout is only a
    # hang backstop. awaitTermination(timeout) returns False instead of
    # raising on expiry — proceeding then would read a partially-written
    # accepted table and report a spurious semantics MISMATCH, so fail
    # loud as the infrastructure error it actually is.
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "streaming admission verdict: stream did not terminate within "
            "300s (host contention or checkpoint I/O stall)"
        )
    stream_admitted = scoped_persist(accepted_corpus(spark, ta))
    stream_ids = stream_admitted.select("doc_id")

    n_stream_diff = (
        seq_ids.withColumn("_s", F.lit(1))
        .join(stream_ids.withColumn("_t", F.lit(1)), "doc_id", "full_outer")
        .filter(F.col("_s").isNull() | F.col("_t").isNull())
        .count()
    )
    n_replay_diff = (
        seq_ids.withColumn("_s", F.lit(1))
        .join(replay_ids.withColumn("_r", F.lit(1)), "doc_id", "full_outer")
        .filter(F.col("_s").isNull() | F.col("_r").isNull())
        .count()
    )
    n_residual = minhash_lsh_pairs(stream_admitted, threshold=0.5).count()
    return spark.createDataFrame(
        [(n_stream_diff == 0, n_residual == 0, n_replay_diff == 0)],
        "stream_matches_sequential boolean, no_residual_pairs boolean, "
        "replay_idempotent boolean",
    )


@query(
    "docs_dedup_cc_keep_best",
    oracle=f"""
    WITH RECURSIVE {_SQL_TRIGRAM_COMMON},
    pairs AS (
        SELECT a_id, b_id FROM common
        WHERE CAST(n_common AS DOUBLE) / (a_size + b_size - n_common) >= 0.6
    ),
    edges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION
        SELECT b_id, a_id FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    cl AS (
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src
    ),
    m AS (
        SELECT cl.cluster_id, cl.doc_id, d.n_chars,
               ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
                                  ORDER BY d.n_chars DESC, cl.doc_id) AS rn
        FROM cl JOIN documents d USING (doc_id)
    )
    SELECT cluster_id,
           CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
               AS kept_doc_id,
           CAST(MAX(n_chars) AS BIGINT) AS kept_n_chars,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM m GROUP BY 1
    """,
)
def docs_dedup_cc_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster representative selection: the keep-ONE policy
    every dedup pipeline ends with, but keeping the BEST document (argmax
    n_chars, min-doc_id tiebreak) instead of the arbitrary min-id — the
    policy production corpora actually want (retire the truncated copies,
    keep the longest). Reuses the sticky corpus pair table and the same
    connected components as docs_dedup_clusters_cc; the representative is
    one max_by struct aggregate per cluster (clusters are tiny relative
    to the corpus, so this tier costs one hash aggregate)."""
    from creatorops_lakehouse_spark.operators.dedup import connected_components

    pairs = corpus_trigram_pairs(spark, sf_dir).select("a_id", "b_id")
    cc = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    m = cc.join(docs, "doc_id")
    return m.groupBy("cluster_id").agg(
        F.max_by(
            "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("_t"))
        )
        .cast("long")
        .alias("kept_doc_id"),
        F.max("n_chars").cast("long").alias("kept_n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


@query(
    "docs_split_leakage_report",
    oracle=f"""
    WITH RECURSIVE {_SQL_TRIGRAM_COMMON},
    pairs AS (
        SELECT a_id, b_id FROM common
        WHERE CAST(n_common AS DOUBLE) / (a_size + b_size - n_common) >= 0.6
    ),
    edges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION
        SELECT b_id, a_id FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    cl AS (
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src
    ),
    split AS (
        SELECT cl.doc_id, cl.cluster_id,
               CASE WHEN CAST('0x' || substr(sha256(CAST(cl.doc_id AS VARCHAR)),
                                             1, 8) AS BIGINT) % 10000 < 9000
                    THEN 'train' ELSE 'test' END AS naive_split,
               CASE WHEN CAST('0x' || substr(sha256(CAST(cl.cluster_id AS VARCHAR)),
                                             1, 8) AS BIGINT) % 10000 < 9000
                    THEN 'train' ELSE 'test' END AS safe_split
        FROM cl
    ),
    by_cluster AS (
        SELECT cluster_id,
               COUNT(DISTINCT naive_split) AS n_naive,
               COUNT(DISTINCT safe_split) AS n_safe
        FROM split GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(CASE WHEN n_naive > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaky_naive,
           CAST(SUM(CASE WHEN n_safe > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaky_cluster_split
    FROM by_cluster
    """,
)
def docs_split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit across near-dup clusters — the integrity
    check every training-data split needs: a per-DOCUMENT hash split
    (stratified_split on doc_id, 90/10) scatters members of the same
    near-dup cluster across train and test (counted as n_leaky_naive —
    eval contamination by construction), while the cluster-aware split
    (same hash recipe keyed on cluster_id) provably never splits a
    cluster (n_leaky_cluster_split == 0 for ANY corpus — every member
    hashes the same key). Clusters from the same sticky pair table /
    connected components as docs_dedup_clusters_cc; split assignment is
    the engine-portable sha bucket, so the whole report is SQL-exact."""
    from creatorops_lakehouse_spark.operators.dedup import connected_components
    from creatorops_lakehouse_spark.operators.sampling import split_column

    pairs = corpus_trigram_pairs(spark, sf_dir).select("a_id", "b_id")
    cc = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    splits = {"train": 0.9, "test": 0.1}
    assigned = cc.select(
        "cluster_id",
        split_column(F.col("doc_id"), splits).alias("naive_split"),
        split_column(F.col("cluster_id"), splits).alias("safe_split"),
    )
    by_cluster = assigned.groupBy("cluster_id").agg(
        F.count_distinct("naive_split").alias("n_naive"),
        F.count_distinct("safe_split").alias("n_safe"),
    )
    return by_cluster.agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum(F.when(F.col("n_naive") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_leaky_naive"),
        F.sum(F.when(F.col("n_safe") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_leaky_cluster_split"),
    )


@query(
    "docs_fingerprint_dedup_seeded",
    oracle="""
    WITH seeded AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000, text
        FROM documents WHERE doc_id % 97 = 0
        UNION ALL
        SELECT doc_id + 2000000000, upper(text) || '  !!'
        FROM documents WHERE doc_id % 101 = 0
    )
    SELECT doc_fingerprint, n_docs, canonical_id
    FROM (
        SELECT sha256(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS doc_fingerprint,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS canonical_id
        FROM seeded
        GROUP BY 1
    )
    WHERE n_docs > 1
    """,
)
def docs_fingerprint_dedup_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-vacuous companion to docs_exact_dedup_clusters /
    docs_fingerprint_dedup: the current driver corpus generation contains
    no duplicates at all, so those two honest corpus reports are
    hash-green AT ZERO ROWS — proving the plumbing but not the cluster
    semantics. This query SELF-SEEDS deterministic duplicates inside the
    query (the docs_pii_scan pattern — both engines construct identical
    rows): every 97th doc gets a byte-exact copy (id + 1e9) and every
    101st a formatting variant (uppercased, trailing punctuation,
    id + 2e9) that only the normalize-then-hash fingerprint can unify.
    The clusters found must then be exactly the seeded ones, canonical id
    = the original — a hash-checked end-to-end pin of both the exact and
    the normalization legs of the dedup hasher on driver data."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    exact_copies = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
    )
    fmt_copies = docs.filter(F.col("doc_id") % 101 == 0).select(
        (F.col("doc_id") + 2_000_000_000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  !!")).alias("text"),
    )
    seeded = docs.unionByName(exact_copies).unionByName(fmt_copies)
    return fingerprint_clusters(seeded, "text", "doc_id").filter(
        F.col("n_docs") > 1
    )


@query(
    "docs_containment_lsh_verdict",
    oracle=f"""
    WITH {_SQL_TRIGRAM_COMMON},
    exact AS (
        SELECT a_id, b_id FROM common
        WHERE n_common * 10000 >= 8000 * least(a_size, b_size)
          AND greatest(a_size, b_size) <= 4 * least(a_size, b_size)
    )
    SELECT COUNT(*) AS n_exact_pairs,
           CAST(0 AS BIGINT) AS n_false_positives,
           TRUE AS recall_ok
    FROM exact
    """,
)
def docs_containment_lsh_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision contract for the containment SCALE path
    (operators/dedup.py::containment_pairs_lsh — min-wise sampled
    candidate index, fixed num_perm postings per doc) against the exact
    posting-join containment pairs at the same threshold, restricted to
    the size-ratio bound (≤4) the sketch guarantees coverage for.

    The DuckDB oracle recomputes the ratio-bounded exact pair set in SQL
    and asserts the engine-checkable facts: n_exact_pairs matches, zero
    false positives (the LSH path exact-verifies every candidate, so it
    is a subset by construction), and the recall verdict as literal TRUE —
    at rows=1/num_perm=64 geometry the collision bound at C=0.8, R≤4 is
    1−(1−0.16)^64 ≈ 1−1.4e-5, so the 0.9 floor flags any geometry
    regression via the driver's value hash."""
    from creatorops_lakehouse_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_lsh,
    )

    docs = load(spark, sf_dir, "documents")
    sets = corpus_sets(spark, sf_dir, 3)
    sizes = sets.select("doc_id", "set_size")
    exact = (
        containment_pairs(docs, threshold=0.8, ngram=3, sets=sets)
        .join(
            sizes.select(
                F.col("doc_id").alias("a_id"), F.col("set_size").alias("a_size")
            ),
            on="a_id",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("b_id"), F.col("set_size").alias("b_size")
            ),
            on="b_id",
        )
        .filter(
            F.greatest("a_size", "b_size") <= 4 * F.least("a_size", "b_size")
        )
        .select("a_id", "b_id", F.lit(1).alias("_e"))
    )
    lsh = containment_pairs_lsh(
        docs, threshold=0.8, max_ratio=4, ngram=3, num_perm=64, sets=sets
    ).select("a_id", "b_id", F.lit(1).alias("_l"))
    merged = exact.join(lsh, on=["a_id", "b_id"], how="full_outer")
    summary = merged.agg(
        F.count("_e").alias("n_exact_pairs"),
        F.count(F.when(F.col("_e").isNull(), 1)).alias("n_false_positives"),
        F.count(
            F.when(F.col("_e").isNotNull() & F.col("_l").isNotNull(), 1)
        ).alias("_n_hits"),
    )
    return summary.select(
        "n_exact_pairs",
        "n_false_positives",
        (
            (F.col("n_exact_pairs") == 0)
            | (F.col("_n_hits") / F.col("n_exact_pairs") >= 0.9)
        ).alias("recall_ok"),
    )
