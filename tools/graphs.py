"""Speedup/efficiency report from bench output — the engine's analogue of
the reference's graphs.py (pandas groupby mean + speedup = seq/exec, bar
plots; graphs.py:9-54,136-159). The sandbox has no matplotlib, so the
charts are ASCII bars written to BENCH/speedup.md alongside the numbers.

Usage: python tools/graphs.py [BENCH/bench_detail.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def bar(value: float, vmax: float, width: int = 40) -> str:
    n = 0 if vmax <= 0 else max(0, min(width, round(value / vmax * width)))
    return "█" * n + "·" * (width - n)


def main(path: str) -> None:
    with open(path) as f:
        d = json.load(f)
    levels = d["streaming"]["levels"]
    lines = ["# Scaling report", ""]
    lines.append(f"input rows: {d['streaming']['input_rows']}; "
                 f"protocol: {d['streaming']['protocol']}")
    lines.append("")

    # per-level trial stats (groupby mean + best, like graphs.py:17-21)
    stats = {}
    for lv, trials in levels.items():
        tps = [t["tokens_per_sec"] for t in trials]
        btps = [t["best_batch_tokens_per_sec"] for t in trials]
        stats[int(lv)] = {
            "mean_tps": sum(tps) / len(tps),
            "best_tps": max(tps),
            "best_batch_tps": max(btps),
            "mean_eff_par": sum(t["effective_parallelism"] for t in trials) / len(trials),
            "steal": max(t.get("host_steal_sec", 0.0) for t in trials),
        }
    base = min(stats)
    lines.append("| level | best tokens/s | mean tokens/s | best batch tokens/s | "
                 "speedup (best) | eff vs ideal | cpu/wall | host steal s |")
    lines.append("|---|---|---|---|---|---|---|---|")
    for lv in sorted(stats):
        s = stats[lv]
        sp = s["best_tps"] / stats[base]["best_tps"]
        eff = sp / (lv / base)
        lines.append(
            f"| local[{lv}] | {s['best_tps']:,.0f} | {s['mean_tps']:,.0f} | "
            f"{s['best_batch_tps']:,.0f} | {sp:.2f}x | {eff:.2f} | "
            f"{s['mean_eff_par']:.2f} | {s['steal']:.0f} |"
        )
    lines.append("")

    vmax = max(s["best_tps"] for s in stats.values())
    lines.append("```")
    lines.append("best tokens/s by parallelism")
    for lv in sorted(stats):
        lines.append(f"local[{lv:>2}] {bar(stats[lv]['best_tps'], vmax)} "
                     f"{stats[lv]['best_tps']:,.0f}")
    lines.append("")
    lines.append("best steady-state batch tokens/s")
    vmax_b = max(s["best_batch_tps"] for s in stats.values())
    for lv in sorted(stats):
        lines.append(f"local[{lv:>2}] {bar(stats[lv]['best_batch_tps'], vmax_b)} "
                     f"{stats[lv]['best_batch_tps']:,.0f}")
    lines.append("```")
    lines.append("")
    for k in ("scaling_efficiency_wall", "scaling_efficiency_wall_paired",
              "scaling_efficiency_steady_state_batch",
              "scaling_efficiency_effective_parallelism"):
        if k in d:
            lines.append(f"- {k}: **{d[k]}**")

    if "queries" in d:
        lines.append("")
        lines.append("```")
        lines.append("headline batch queries (sec)")
        qs = d["queries"]
        qmax = max(qs.values())
        for name, sec in sorted(qs.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:>32} {bar(sec, qmax, 30)} {sec:.2f}s")
        lines.append("```")

    out_path = os.path.join(REPO, "BENCH", "speedup.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwritten: {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH", "bench_detail.json"))
