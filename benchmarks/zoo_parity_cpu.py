#!/usr/bin/env python
"""Zoo-wide CONVERGENCE parity: train the torch reference and this
framework on the identical bundled Frappe split, same hyperparameters,
and compare best-valid/test AUC per model.

Weight-transplant tests (tests/test_models.py) prove forward parity;
this proves the TRAINING TRAJECTORY lands in the same place — inits,
optimizer semantics, BN behavior and early stopping all have to agree.
CPU-only (torch has no GPU here; .cuda() is monkeypatched to a no-op),
so the armnet family (50-iter entmax bisection, ~14 s/torch step) is
excluded — its parity anchor is the r1/r2 3-seed study in BENCH_NOTES.

    python benchmarks/zoo_parity_cpu.py [--epochs 10] [--models lr,fm,...]

Writes one JSON line per model and a final table to
benchmarks/results/zoo_parity_cpu.json.
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# frappe-feasible zoo minus the entmax family (torch-CPU-intractable)
MODELS = ["lr", "fm", "dnn", "wd", "ipnn", "kpnn", "nfm", "dfm", "dcn",
          "dcn+", "cin", "xdfm", "afm", "hofm", "gcn", "gat", "afn",
          "sa_glu"]

REF_HARNESS = r"""
import sys, torch
torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.backends.cudnn.benchmark = False
sys.path.insert(0, "/root/reference")
sys.argv = ["train.py"] + sys.argv[1:]
exec(open("/root/reference/train.py").read())
"""


def best_line(out):
    best = None
    for line in out.splitlines():
        if "best valid auc" in line:
            best = line
    if best is None:
        return None
    # "... best valid auc: valid 0.9242, test 0.9203"
    try:
        v = float(best.split("valid ")[-1].split(",")[0])
        t = float(best.split("test ")[-1])
        return v, t
    except ValueError:
        return None


def run_one(side, model, epochs, seed, timeout, dataset="frappe",
            extra_flags=()):
    flags = ["--model", model, "--dataset", dataset,
             "--data_dir", os.path.join(ROOT, "data") + "/",
             "--epoch", str(epochs), "--patience", str(epochs),
             "--seed", str(seed),
             "--exp_name", f"zoopar_{side}_{model}"] + list(extra_flags)
    if side == "ref":
        cmd = [sys.executable, "-c", REF_HARNESS] + flags
        cwd = "/tmp"
    else:
        cmd = [sys.executable, os.path.join(ROOT, "train.py")] + flags
        cwd = ROOT
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    try:
        out = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                             text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return None
    return best_line(out.stdout + out.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--seed", type=int, default=2025)
    ap.add_argument("--models", type=str, default=",".join(MODELS))
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--dataset", type=str, default="frappe",
                    help="any bundled libsvm trio (frappe, uci_diabetes)")
    ap.add_argument("--flags", type=str, default="",
                    help="extra CLI flags passed verbatim to BOTH sides, "
                         "e.g. '--nfield 43 --nfeat 369 --h 1'")
    args = ap.parse_args()
    extra = args.flags.split() if args.flags else []

    rows = []
    for m in args.models.split(","):
        ref = run_one("ref", m, args.epochs, args.seed, args.timeout,
                      args.dataset, extra)
        ours = run_one("ours", m, args.epochs, args.seed, args.timeout,
                       args.dataset, extra)
        row = {"model": m, "seed": args.seed, "epochs": args.epochs,
               "ref_valid": ref and ref[0], "ref_test": ref and ref[1],
               "ours_valid": ours and ours[0], "ours_test": ours and ours[1]}
        if args.dataset != "frappe":
            row["dataset"] = args.dataset
        if extra:
            row["flags"] = args.flags
        if ref and ours:
            row["delta_valid"] = round(ours[0] - ref[0], 4)
        print(json.dumps(row), flush=True)
        rows.append(row)

    path = os.path.join(ROOT, "benchmarks", "results",
                        "zoo_parity_cpu.json")
    # MERGE into the existing table keyed on (model, seed, epochs): sweeps
    # run in installments (timed-out-model reruns, extra seeds) and a plain
    # overwrite would throw away every earlier installment's rows
    def key(r):
        return (r["model"], r.get("seed", 2025), r.get("epochs", 20),
                r.get("dataset", "frappe"), r.get("flags", ""))

    existing, order = {}, []
    if os.path.exists(path):
        try:
            for r in json.load(open(path)).get("rows", []):
                existing[key(r)] = r
                order.append(key(r))
        except ValueError:
            pass
    for r in rows:
        if key(r) not in existing:
            order.append(key(r))
        existing[key(r)] = r
    json.dump({"what": "frappe convergence parity, torch reference (CPU) vs "
                       "this framework (CPU), identical data/recipe; one row "
                       "per (model, seed, epochs), merged across "
                       "invocations; null = side exceeded the CPU timeout",
               "rows": [existing[k] for k in order]},
              open(path, "w"), indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
