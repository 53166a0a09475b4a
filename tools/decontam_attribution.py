"""Attribute the decontam stage's 100x growth (VERDICT r9 item 6).

The composed curation rehearsal measured the split+decontam stage at
18.7x wall for 100x data — sub-linear, but the pipeline's second-biggest
stage on the lsh path. This harness isolates the stage's three cost
components at 1x and 100x so the growth has an owner:

  1. eval-gram BUILD: explode the eval split to 5-grams + distinct
     (in the rehearsal the eval split is 5% of the corpus, so unlike a
     real fixed benchmark suite it GROWS 100x with the data);
  2. BROADCAST probe: the full operator as composed (eval grams
     broadcast; corpus text never shuffles);
  3. SHUFFLE probe: broadcast_eval=False — the documented fallback for
     when the eval side outgrows broadcast.

plus the data-volume counters that separate compute growth from match
growth: n_eval_grams, n_corpus_gram_rows, n_match_rows.

Usage: python tools/decontam_attribution.py [--copies=100]
(The Nx corpus under .scale<N> is reused if tools/scale_rehearsal.py or
tools/curation_e2e_rehearsal.py already synthesized it.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_scale(spark, sf_dir: str, label: str) -> dict:
    import pyspark.sql.functions as F

    from creatorops_lakehouse_spark.operators.cache import scoped_persist
    from creatorops_lakehouse_spark.operators.decontam import (
        eval_ngram_set,
        ngram_contamination,
    )
    from creatorops_lakehouse_spark.operators.sampling import stratified_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    split = stratified_split(
        docs, "doc_id", {"train": 0.90, "eval": 0.05, "test": 0.05}
    )
    train = scoped_persist(split.filter(F.col("split") == "train"))
    ev = scoped_persist(split.filter(F.col("split") == "eval"))
    n_train, n_eval = train.count(), ev.count()

    out = {"label": label, "n_train": n_train, "n_eval": n_eval}

    def timed(name, thunk):
        t0 = time.time()
        v = thunk()
        out[name] = round(time.time() - t0, 2)
        return v

    grams = scoped_persist(eval_ngram_set(ev, n=5))
    out["n_eval_grams"] = timed("t_eval_gram_build", grams.count)

    from creatorops_lakehouse_spark.operators.text import word_ngrams

    exploded = train.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), 5)).alias("gram")
    )
    out["n_corpus_gram_rows"] = timed("t_corpus_explode", exploded.count)
    out["n_match_rows"] = timed(
        "t_match_volume",
        lambda: exploded.join(F.broadcast(grams), "gram").count(),
    )
    out["n_contaminated_bcast"] = timed(
        "t_probe_broadcast",
        lambda: ngram_contamination(train, ev, n=5).count(),
    )
    out["n_contaminated_shuffle"] = timed(
        "t_probe_shuffle",
        lambda: ngram_contamination(
            train, ev, n=5, broadcast_eval=False
        ).count(),
    )
    assert out["n_contaminated_bcast"] == out["n_contaminated_shuffle"]
    print(f"  {label}: {out}")
    return out


def main() -> int:
    copies = 100
    for a in sys.argv:
        if a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
    import scale_rehearsal as sr

    from creatorops_lakehouse_spark.session import build_spark

    spark = build_spark("decontam-attribution")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = sr.scale_dir(copies)
    if not os.path.exists(os.path.join(out_dir, "documents.parquet", "_SUCCESS")):
        print(f"synthesizing {copies}x corpus under {out_dir} ...")
        sr.synthesize(spark, copies)

    run_scale(spark, sr.SF_DIR, "warm-up (untimed)")
    base = run_scale(spark, sr.SF_DIR, "1x")
    big = run_scale(spark, out_dir, f"{copies}x")

    print(f"\nattribution at {copies}x (linear would be <= ~{copies}x):")
    for k in (
        "t_eval_gram_build", "t_corpus_explode", "t_match_volume",
        "t_probe_broadcast", "t_probe_shuffle",
        "n_eval_grams", "n_corpus_gram_rows", "n_match_rows",
    ):
        b, g = base[k], big[k]
        r = g / b if b else float("nan")
        print(f"  {k:>22}: {b:>12} -> {g:>14}  ({r:6.1f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
