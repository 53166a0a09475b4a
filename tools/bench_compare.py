"""Compare two BENCH_DETAIL.json files per query (VERDICT r7 item 1).

Usage: python tools/bench_compare.py A.json B.json [--normalize] [--top N]

Prints, over the queries common to both files, the distribution of
B/A ratios of the headline per-query number (min of warm reps), the
worst movers in each direction, and the calib_sec-normalized totals.
``--normalize`` divides B's times by (B.calib_sec / A.calib_sec) first —
the host-drift correction cross-round comparisons must apply.

Stability criterion (same code, same host, back-to-back runs): no
query's ratio outside [1/1.3, 1.3].
"""

from __future__ import annotations

import json
import sys


def _mins(d: dict) -> dict[str, float]:
    if "queries_min" in d:
        return {k: v for k, v in d["queries_min"].items() if v >= 0}
    return {k: v for k, v in d["queries"].items() if v >= 0}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    normalize = "--normalize" in sys.argv
    top = 8
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1])
    window = "--normalize=window" in sys.argv
    a = json.load(open(args[0]))
    b = json.load(open(args[1]))
    ma, mb = _mins(a), _mins(b)
    scale = 1.0
    scales: dict[str, float] = {}
    if window and "calib_timeline" in a and "calib_timeline" in b:
        ta, tb = a["calib_timeline"], b["calib_timeline"]
        wa, wb = a["queries_window"], b["queries_window"]
        for q in set(ma) & set(mb):
            scales[q] = tb[wb[q]] / ta[wa[q]]
        print(
            f"window-normalizing: calib A {min(ta)}..{max(ta)} "
            f"B {min(tb)}..{max(tb)}"
        )
    elif normalize:
        scale = b.get("calib_sec", 1.0) / a.get("calib_sec", 1.0)
        print(
            f"calib A={a.get('calib_sec')} B={b.get('calib_sec')} "
            f"-> dividing B by {scale:.3f}"
        )
    conv_a = a.get("queries_converged", {})
    conv_b = b.get("queries_converged", {})
    common = sorted(set(ma) & set(mb))
    ratios = []
    for q in common:
        if ma[q] <= 0:
            continue
        s = scales.get(q, scale)
        ratios.append((mb[q] / s / max(ma[q], 1e-4), q))
    ratios.sort()
    # bench.py's PINNED jitter-bound list: non-convergence there is the
    # expected instrument property (Arrow/BLAS batch noise), reported
    # separately so it never reads as a new low-confidence finding
    jitter = set(a.get("jitter_bound", [])) | set(b.get("jitter_bound", []))
    unconverged = sorted(
        q
        for q in common
        if q not in jitter
        and not (conv_a.get(q, True) and conv_b.get(q, True))
    )
    if unconverged:
        print(
            f"unconverged in either run (low-confidence numbers, "
            f"re-measure before calling a regression): {unconverged}"
        )
    jb_unconv = sorted(
        q for q in jitter & set(common)
        if not (conv_a.get(q, True) and conv_b.get(q, True))
    )
    if jb_unconv:
        print(
            f"jitter-bound (pinned in bench.py; non-convergence expected): "
            f"{jb_unconv}"
        )
    n = len(ratios)
    if not n:
        print("no common queries")
        return 1
    med = ratios[n // 2][0]
    worst_up = [r for r in ratios if r[0] > 1.3]
    worst_dn = [r for r in ratios if r[0] < 1 / 1.3]
    print(
        f"common={n} onlyA={len(set(ma) - set(mb))} onlyB={len(set(mb) - set(ma))}"
    )
    print(
        f"ratio B/A: min={ratios[0][0]:.3f} median={med:.3f} "
        f"max={ratios[-1][0]:.3f}"
    )
    print(f"outside [1/1.3, 1.3]: up={len(worst_up)} down={len(worst_dn)}")
    print("slowest movers up:")
    for r, q in ratios[-top:][::-1]:
        print(
            f"  {r:6.3f}x  {q}  "
            f"({ma[q]:.3f}s -> {mb[q] / scales.get(q, scale):.3f}s)"
        )
    print("slowest movers down:")
    for r, q in ratios[:top]:
        print(
            f"  {r:6.3f}x  {q}  "
            f"({ma[q]:.3f}s -> {mb[q] / scales.get(q, scale):.3f}s)"
        )
    ta = sum(ma[q] for _, q in ratios)
    tb = sum(mb[q] / scales.get(q, scale) for _, q in ratios)
    print(f"total over common: {ta:.1f}s -> {tb:.1f}s ({tb / ta:.3f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
