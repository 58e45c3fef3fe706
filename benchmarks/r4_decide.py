#!/usr/bin/env python
"""Decision table from an r3_campaign.log: every pending A/B reduced to
winner/loser rows with the numbers beside them.

    python benchmarks/r4_decide.py [benchmarks/results/r3_campaign.log]

Parses the stage markers (`=== [name] ...` / `=== [name] rc=N ...`) and
the JSON lines each stage emits (bench.py single-line metric, recipes.py
per-recipe rows, tablegrad_prep_bench's `name  X.XX ms` lines,
train.py's 'Total running time'), then prints:

  * step-level A/Bs vs stage 01 baseline (02 fmajor / 03 v5 / 04 both /
    05e v6) with the flip-the-default verdict,
  * the kernel_flat ms table across 05a/b/c/d (v4 vs v5 vs v5-sweep vs
    v6-G-sweep) with the argmin,
  * multi-head honest before/after (07pre vs 07) per recipe,
  * entmax solver table (08a newton vs 08b/08c fastpow budgets),
  * prefetch A/B wall-clock (11a vs 11b),
  * the bf16 3-seed AUC lines (stage 12).
"""

import json
import re
import sys


def parse(path):
    stages = {}      # name -> {"rc": int, "json": [...], "ms": {...},
                     #          "lines": [...]}
    cur = None
    for raw in open(path, errors="replace"):
        line = raw.strip()
        m = re.match(r"=== \[(\S+)\] rc=(\d+)", line)
        if m:
            if m.group(1) in stages:
                stages[m.group(1)]["rc"] = int(m.group(2))
            cur = None
            continue
        m = re.match(r"=== \[(\S+)\]", line)
        if m:
            cur = stages.setdefault(
                m.group(1), {"rc": None, "json": [], "ms": {}, "lines": []})
            continue
        if cur is None:
            continue
        if line.startswith("{"):
            try:
                cur["json"].append(json.loads(line))
            except ValueError:
                pass
        m = re.match(r"(\w+)\s+([\d.]+) ms$", line)
        if m:
            cur["ms"][m.group(1)] = float(m.group(2))
        if "Total running time" in line or "repeat summary" in line \
                or "valid mean" in line:
            cur["lines"].append(line)
    return stages


def step_exs(st):
    """examples/s from a bench.py stage."""
    if not st:
        return None
    for obj in st["json"]:
        if obj.get("metric", "").endswith("examples_per_sec"):
            return obj["value"]
    return None


def recipe_rows(st):
    if not st:
        return {}
    return {o["recipe"]: o for o in st["json"] if "recipe" in o}


def main(path):
    stages = parse(path)

    def g(name):
        return stages.get(name)

    print("== step-level A/Bs (bench.py, armnet_1h Criteo) ==")
    base = step_exs(g("01_base"))
    print(f"  01 baseline (v4, current defaults): {base} ex/s")
    for name, label, knob in (
            ("02_fmajor", "ARM1H fields-major", "ARMNET_ARM1H_LAYOUT=fmajor"),
            ("03_v5", "table-grad v5", "ARMNET_SCATTER=v5"),
            ("04_fmajor_v5", "fmajor + v5", "both"),
            ("05e_v6_step", "table-grad v6", "ARMNET_SCATTER=v6")):
        v = step_exs(g(name))
        if v is None or base is None:
            print(f"  {name} ({label}): NO DATA")
            continue
        d = (v - base) / base * 100
        verdict = "ADOPT" if d > 1.0 else ("revert/keep-off" if d < -1.0
                                           else "neutral")
        print(f"  {name} ({label}): {v} ex/s ({d:+.1f}% vs base) -> {verdict}")

    print("\n== kernel_flat table-grad ms (05a/b/c/d) ==")
    best = (None, 1e9)
    for name, st in sorted(stages.items()):
        if not name.startswith("05") or name == "05e_v6_step":
            continue
        ms = st["ms"].get("kernel_flat")
        if ms is None:
            continue
        print(f"  {name:28s} {ms:7.2f} ms")
        if ms < best[1]:
            best = (name, ms)
    if best[0]:
        print(f"  BEST: {best[0]} at {best[1]:.2f} ms "
              f"(algo floor ~0.6 ms, v4 r3 measured 5.15 ms in-step)")

    print("\n== multi-head honest before/after (07pre vs 07) ==")
    pre, post = recipe_rows(g("07pre_mh_old_layout")), recipe_rows(g("07_mh_recipes"))
    for r in sorted(set(pre) | set(post)):
        a = pre.get(r, {}).get("examples_per_sec")
        b = post.get(r, {}).get("examples_per_sec")
        if a and b:
            d = (b - a) / a * 100
            verdict = "keep fields-major" if d > 1.0 else (
                "REVERT fields-major" if d < -1.0 else "neutral")
            print(f"  {r}: old {a} -> new {b} ex/s ({d:+.1f}%) -> {verdict}")
        else:
            print(f"  {r}: old {a} new {b} (incomplete)")

    print("\n== entmax solver (alpha=1.7 recipe) ==")
    for name in sorted(stages):
        if name.startswith("08"):
            for r, o in recipe_rows(g(name)).items():
                print(f"  {name:24s} {o['ms_per_step']:7.2f} ms "
                      f"{o['examples_per_sec']:>9} ex/s")

    print("\n== loader prefetch thread (real frappe training) ==")
    for name in ("11a_train_noprefetch", "11b_train_prefetch"):
        st = g(name)
        tail = [l for l in (st["lines"] if st else [])
                if "Total running time" in l]
        print(f"  {name}: {tail[-1] if tail else 'NO DATA'}")

    print("\n== bf16 3-seed AUC (stage 12; f32 anchor 0.9474+-0.0004 / "
          "0.9438+-0.0009) ==")
    st = g("12_bf16_3seed")
    for l in (st["lines"] if st else ["NO DATA"]):
        print(f"  {l}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "benchmarks/results/r3_campaign.log")
