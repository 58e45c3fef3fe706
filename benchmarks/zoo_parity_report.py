#!/usr/bin/env python
"""Summarize benchmarks/results/zoo_parity_cpu.json across seeds: per-model
ref/ours mean±std of best-valid AUC and a gap verdict.

    python benchmarks/zoo_parity_report.py [path]

Verdict rule: a model "matches" when |mean gap| <= max(0.01, 2 * combined
seed std) — i.e. the deficit must be both practically small and outside
what per-seed scatter explains before we call it a real convergence gap.
Single-seed rows get a provisional verdict (no std available).
"""

import json
import math
import os
import sys


def main(path):
    rows = json.load(open(path))["rows"]
    by_model = {}
    for r in rows:
        if r.get("ref_valid") is None or r.get("ours_valid") is None:
            continue
        key = (r["model"] + ("@" + r["dataset"] if r.get("dataset")
               else ""))
        by_model.setdefault(key, []).append(r)

    def stats(vals):
        m = sum(vals) / len(vals)
        if len(vals) < 2:
            return m, None
        var = sum((v - m) ** 2 for v in vals) / (len(vals) - 1)
        return m, math.sqrt(var)

    print(f"{'model':16s} {'n':>2s} {'ref valid':>16s} {'ours valid':>16s} "
          f"{'gap':>8s}  verdict")
    for model in sorted(by_model):
        rs = by_model[model]
        ref_m, ref_s = stats([r["ref_valid"] for r in rs])
        our_m, our_s = stats([r["ours_valid"] for r in rs])
        gap = our_m - ref_m
        if ref_s is None:
            verdict = ("match" if abs(gap) <= 0.01
                       else "GAP? (single seed)")
            fmt = lambda m, s: f"{m:.4f}          "
        else:
            combined = math.sqrt(ref_s ** 2 + our_s ** 2)
            verdict = ("match" if abs(gap) <= max(0.01, 2 * combined)
                       else f"GAP (>{max(0.01, 2 * combined):.4f})")
            fmt = lambda m, s: f"{m:.4f} ± {s:.4f}"
        print(f"{model:16s} {len(rs):2d} {fmt(ref_m, ref_s):>16s} "
              f"{fmt(our_m, our_s):>16s} {gap:+8.4f}  {verdict}")

    timeouts = sorted({r["model"] for r in rows
                       if r.get("ref_valid") is None
                       or r.get("ours_valid") is None})
    if timeouts:
        print(f"\nincomplete (a side timed out): {', '.join(timeouts)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "results", "zoo_parity_cpu.json"))
