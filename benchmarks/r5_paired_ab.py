#!/usr/bin/env python
"""Paired A/B throughput comparison that survives tunnel drift.

The tunneled TPU backend's throughput drifts +-5-9% on a timescale of
minutes-to-hours (r5 A/A: 274-301K ex/s across one hour at IDENTICAL code).
Single-shot A-vs-B comparisons (one bench.py run each, as in the campaign
stages) cannot resolve deltas below that. This tool alternates A,B,A,B,...
so each pair is adjacent in time; drift moves both sides of a pair together
and the PER-PAIR ratio is clean. The decision statistic is the median
per-pair ratio across N pairs.

    python benchmarks/r5_paired_ab.py --pairs 3 \
        --a "" --b "ARMNET_ARM1H_LAYOUT=fmajor" [--cmd "python bench.py"]

Prints one JSON line: {"a_env", "b_env", "pairs": [[a,b],...],
"ratios": [...], "median_ratio": r}  (r > 1 means B is faster).
"""

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_env(s):
    env = {}
    for kv in s.split():
        k, _, v = kv.partition("=")
        env[k] = v
    return env


def run_once(extra_env, cmd, timeout):
    env = dict(os.environ, **extra_env)
    r = subprocess.run(cmd, shell=True, cwd=ROOT, env=env,
                       capture_output=True, text=True, timeout=timeout)
    # last JSON line with a "value" field wins (bench.py contract)
    val = None
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if "value" in obj:
                val = float(obj["value"])
    if val is None:
        print(f"paired_ab: no value parsed (rc={r.returncode}); stderr tail: "
              f"{(r.stderr.strip().splitlines() or ['<none>'])[-1]}",
              file=sys.stderr, flush=True)
    return val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", type=str, default="", help="env for arm A, e.g. ''")
    ap.add_argument("--b", type=str, required=True,
                    help="env for arm B, e.g. 'ARMNET_SCATTER=v5'")
    ap.add_argument("--cmd", type=str, default="python bench.py")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=1200)
    args = ap.parse_args()

    a_env, b_env = parse_env(args.a), parse_env(args.b)
    pairs, ratios = [], []
    for i in range(args.pairs):
        a = run_once(a_env, args.cmd, args.timeout)
        b = run_once(b_env, args.cmd, args.timeout)
        pairs.append([a, b])
        if a and b:
            ratios.append(round(b / a, 4))
        print(f"pair {i + 1}/{args.pairs}: A={a} B={b}", file=sys.stderr,
              flush=True)
    ratios_sorted = sorted(ratios)
    median = (ratios_sorted[len(ratios) // 2] if len(ratios) % 2
              else round((ratios_sorted[len(ratios) // 2 - 1]
                          + ratios_sorted[len(ratios) // 2]) / 2, 4)
              ) if ratios else None
    print(json.dumps({"a_env": args.a, "b_env": args.b, "cmd": args.cmd,
                      "pairs": pairs, "ratios": ratios,
                      "median_ratio": median}))


if __name__ == "__main__":
    main()
