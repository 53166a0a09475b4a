"""Physical-plan audit: for every registered query, record the plan
properties the 100 TB design depends on — pushed filters, scan schema
width, join strategies, exchange count, whole-stage-codegen coverage,
Python-UDF presence.

    python tools/explain_audit.py [sf_dir] > PLAN_AUDIT.md
"""

from __future__ import annotations

import re
import sys


def audit_plan(plan: str) -> dict:
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schema = re.findall(r"ReadSchema: struct<([^>]*)>", plan)

    def nodes(op: str) -> int:
        # formatted mode: each physical node appears once as "(N) <Op>"
        return len(re.findall(rf"\(\d+\) {op}", plan))

    return {
        "exchanges": nodes("Exchange"),
        "broadcast_joins": nodes("BroadcastHashJoin"),
        "sortmerge_joins": nodes("SortMergeJoin"),
        "bnl_joins": nodes("BroadcastNestedLoopJoin"),
        "cartesian": nodes("CartesianProduct"),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "python_eval": nodes("BatchEvalPython")
        + nodes("ArrowEvalPython")
        + nodes("MapInPandas"),
        "pushed_nonempty": sum(1 for p in pushed if p.strip()),
        "scan_cols": [len(s.split(",")) for s in read_schema],
    }


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from creatorops_lakehouse_spark.queries import all_queries
    from creatorops_lakehouse_spark.session import build_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"# PLAN AUDIT ({sf_dir})\n")
    print("| query | exch | bcast | smj | bnlj/cart | codegen | pyUDF | pushed | scan cols |")
    print("|---|---|---|---|---|---|---|---|---|")
    flagged: list[str] = []
    for name, fn in all_queries().items():
        try:
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            print(f"| {name} | ERROR: {str(e)[:60]} | | | | | | | |")
            continue
        a = audit_plan(plan)
        # sanctioned quadratic plans: the explicit brute-force baseline and
        # the *_verdict audit queries (exhaustive baseline vs fast operator)
        quadratic_ok = (
            "cosine_topk" in name or "bruteforce" in name or name.endswith("_verdict")
        )
        # a BroadcastNestedLoopJoin against a ONE-ROW corpus aggregate is a
        # scalar broadcast (O(n) work) — the shape rarity bucketing and the
        # funnel summary's cross-joined one-row aggregates use
        scalar_bnlj_ok = name in (
            "docs_token_rarity_by_source",
            "events_funnel_conversion",
            "events_funnel_4stage",
            "events_funnel_windowed",
            # one-row corpus aggregates cross-joined for exact integer
            # threshold/score arithmetic (the plan Catalyst builds for an
            # uncorrelated scalar subquery):
            "docs_bm25_search",  # N/total-token scalars
            "tpch_q11_important_parts",  # slice total for HAVING share
            "tpch_q15_top_supplier",  # max-revenue scalar (ties kept)
            "tpch_q22_idle_rich_customers",  # avg-balance threshold pair
            "docs_temperature_mixture",  # total-isqrt-weight scalar
            "graph_triangles_copurchase",  # one-row stats x one-row triangle count
            "docs_vocab_coverage_curve",  # corpus-total scalar onto 50 rows
            "docs_mixture_token_budget",  # n_sources scalar onto source rows
            "docs_lang_source_contingency",  # corpus-total scalar onto cells
            "events_negative_samples",  # n_users scalar onto label rows
            "events_hll_distinct_events",  # 1-row estimate x 1-row exact count
            # 8-query broadcast exact rerank — same sanctioned shape as
            # emb_cosine_topk_bruteforce (ANN is the scale path, see
            # docstring)
            "emb_hard_negatives",
            # grid materialization: entities x broadcast day-spine — the
            # cross join IS the output (|entities| * |days| rows, both
            # sides dimension-sized; the fact table never crosses)
            "events_daily_fill_forward",
            # corpus x broadcast N_EPOCHS-row epoch spine (epoch_orders
            # fuses all epochs into one two-phase pass; the cross join IS
            # the per-epoch output multiplicity)
            "docs_epoch_shuffle",
            # one-row n_docs scalar cross-joined for the exact integer
            # lift division; pair space already capped at C(40,2)
            "docs_token_cooccurrence_lift",
            # rank/prefix-sum over the TakeOrdered top-50 cut as a
            # triangular self-join of two 50-row broadcast sides (the
            # windowless form of a bounded cumulative sum)
            "docs_vocab_coverage_curve",
        )
        bad = (
            a["cartesian"] > 0 or a["bnl_joins"] > 0
        ) and not (quadratic_ok or scalar_bnlj_ok)
        if a["python_eval"] > 0 and not any(
            s in name
            for s in (
                "multimodal",
                "ivf",
                "lsh",
                "neardup",
                "emb_decontaminate",
                "semantic",
                "_pq_",
                # r13 optimization round: MinHash signatures and SimHash
                # sign-vote folds moved into Arrow-batched numpy seams
                # (operators/dedup.py::_minhash_sigs_udf /
                # _simhash_votes_udf) — every consumer of the banding or
                # simhash-table projection now carries one ArrowEvalPython
                "minhash",
                "simhash",
                "admission",  # streaming admission probes the MinHash index
                "curation",  # curation near-dup probe (lsh mode) ditto
                "dedup_verdict",  # incremental-dedup index probe ditto
            )
        ):
            # the sanctioned Arrow-batched Python seams: multimodal decode,
            # IVF centroid assignment, LSH signature matmul
            # (operators/similarity.py::_lsh_buckets_udf), the
            # eval-matrix contamination matmul
            # (operators/decontam.py::embedding_contamination), the
            # SemDeDup per-cell verify + pair-cosine audit
            # (operators/similarity.py::semantic_dedup_pairs/_pair_cosine_udf),
            # and the PQ encode + ADC lookup-table scan
            # (operators/similarity.py::_pq_encode_udf/pq_topk)
            bad = True
        if bad:
            flagged.append(name)
        print(
            f"| {name}{' ⚠' if bad else ''} | {a['exchanges']} | {a['broadcast_joins']} "
            f"| {a['sortmerge_joins']} | {a['bnl_joins']}/{a['cartesian']} "
            f"| {a['codegen_spans']} | {a['python_eval']} | {a['pushed_nonempty']} "
            f"| {a['scan_cols']} |"
        )
    print()
    if flagged:
        print(f"FLAGGED: {flagged}")
    else:
        print(
            "No cartesian products or nested-loop joins outside the sanctioned "
            "exact baselines (cosine brute force, *_verdict audits) and the "
            "one-row scalar broadcast in rarity bucketing. The only Python "
            "evals are the Arrow-batched numpy-matmul seams: multimodal "
            "feature extraction (operators/multimodal.py), IVF centroid "
            "assignment (operators/similarity.py::_nearest_cells_udf), "
            "multi-table LSH signatures (similarity.py::_lsh_buckets_udf), "
            "pair-cosine verification (similarity.py::_pair_cosine_udf), and "
            "eval-matrix contamination scoring "
            "(operators/decontam.py::embedding_contamination — expression-"
            "level fold dots are interpreted per element and cost orders "
            "more than one matmul per batch), the PQ encode + ADC "
            "lookup-table scan (similarity.py::_pq_encode_udf/pq_topk), "
            "and the r13 MinHash-signature / SimHash sign-vote folds "
            "(operators/dedup.py::_minhash_sigs_udf/_simhash_votes_udf — "
            "one numpy pass replaces 64 interpreted array traversals, "
            "resp. the explode+32-lane-SUM shuffle)."
        )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
