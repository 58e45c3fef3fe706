#!/usr/bin/env python
"""armnet_tpu training entry point — flag-compatible with the reference CLI
(`python train.py --model armnet_1h --dataset frappe ...`), driver semantics
per SURVEY.md §3.1: load data once, then per seed in [seed, seed+repeat):
re-seed, fresh logger/model/optimizer, epoch loop with early stopping."""

import os

from armnet_tpu.data import make_dataloaders
from armnet_tpu.train.checkpoint import load_checkpoint
from armnet_tpu.train.loop import Trainer
from armnet_tpu.utils.config import get_args
from armnet_tpu.utils.logging import get_logger, remove_logger, seed_everything


def main():
    args = get_args()

    import jax
    # this image's sitecustomize registers the tunneled TPU regardless of
    # JAX_PLATFORMS; honor an explicit cpu request (virtual-mesh runs)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # multi-host bring-up BEFORE any device use: a coordinator address in the
    # environment means we're one process of a pod run — join it, then shard
    # the data pipeline per-process below
    from armnet_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()
    from armnet_tpu.kernels.config import (set_compute_dtype,
                                            set_kernel_backend)
    set_kernel_backend(args.kernels)
    if args.bf16:
        set_compute_dtype("bfloat16")
    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    # persistent compilation cache: repeated runs skip the multi-minute
    # first-compile over the tunneled chip
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # dataset routing: libsvm (tr*/va*/te* convention) is the CTR path;
    # a folder holding .arff files is the UCI multi-class path
    # (reference data_loader.py:57-73 vs :104-180)
    import glob as _glob
    base = os.path.join(args.data_dir, args.dataset)
    if _glob.glob(os.path.join(base, "*.arff")):
        from armnet_tpu.data import uci_loader
        train_loader, val_loader, test_loader = uci_loader(
            base, args.batch_size, valid_perc=args.valid_perc, seed=args.seed)
        # every UCI dataset (including binary, nclass == 2) routes to the
        # softmax-CE + accuracy head — reference parity: its UCI pipeline
        # never uses the BCE/AUC CTR path (data_loader.py:104-180)
        if train_loader.nclass >= 2 and args.noutput <= 1:
            args.noutput = train_loader.nclass
        args.nfield = train_loader.ds.nfield
        args.nfeat = max(args.nfeat, train_loader.ds.nfield)
    else:
        # multi-process runs parse disjoint byte-range shards per host
        # (replacing the reference's per-host whole-file load,
        # data_loader.py:25-47) and assemble global batches from local rows
        shard = ((jax.process_index(), jax.process_count())
                 if jax.process_count() > 1 else None)
        train_loader, val_loader, test_loader = make_dataloaders(
            args.dataset, args.data_dir, args.nfield, args.batch_size,
            seed=args.seed, shard=shard)

    base_exp_name = args.exp_name
    results = []
    for seed in range(args.seed, args.seed + args.repeat):
        seed_everything(seed)
        exp_name = f"{base_exp_name}_{seed}"
        # pod runs share log_dir on a networked fs: give each process its
        # own log file (process 0 keeps the reference's stdout.log name)
        log_name = ("stdout.log" if jax.process_index() == 0
                    else f"stdout.p{jax.process_index()}.log")
        logger = get_logger(os.path.join(args.log_dir, exp_name, log_name),
                            to_stdout=True, name=f"armnet_tpu.{exp_name}")
        logger.info(f"=> creating model {args.model}")
        logger.info(str(vars(args)))

        train_loader.seed = seed  # reshuffle schedule follows the active seed
        # reset the epoch counter too: the shuffle permutation is
        # RandomState(seed + epoch), so without this a repeat's data order
        # would depend on how many epochs EARLIER repeats ran (not
        # reproducible standalone)
        train_loader.epoch = 0
        ckpt_dir = (os.path.join(args.ckpt_dir, exp_name)
                    if args.ckpt_dir else None)
        # machine-readable per-epoch rows next to stdout.log (process 0 only:
        # every process computes identical global metrics under SPMD)
        metrics_path = (os.path.join(args.log_dir, exp_name, "metrics.jsonl")
                        if jax.process_index() == 0 else None)
        trainer = Trainer(args, train_loader, val_loader, test_loader, logger,
                          seed=seed, ckpt_dir=ckpt_dir,
                          metrics_path=metrics_path)
        if args.resume:
            trainer.state, extra = load_checkpoint(args.resume, trainer.state)
            logger.info(f"resumed from {args.resume}: {extra}")

        best_valid, best_test = trainer.fit(
            epochs=args.epoch, patience=args.patience,
            eval_freq=args.eval_freq, report_freq=args.report_freq)
        results.append((seed, best_valid, best_test))
        remove_logger(logger)

    if len(results) > 1 and jax.process_index() == 0:
        import numpy as np
        valids = np.array([r[1] for r in results])
        tests = np.array([r[2] for r in results])
        summary = (f"repeat summary over seeds "
                   f"[{args.seed}, {args.seed + args.repeat}): "
                   f"valid mean {valids.mean():.4f} std {valids.std():.4f} | "
                   f"test mean {tests.mean():.4f} std {tests.std():.4f}")
        print(summary)
        # the reference reports mean/std tables (README.md:92-97); persist
        # the summary next to the per-seed logs, not just on stdout
        with open(os.path.join(args.log_dir,
                               f"{base_exp_name}.repeat_summary.log"),
                  "a") as f:
            for seed, bv, bt in results:
                f.write(f"seed {seed}: valid {bv:.4f} test {bt:.4f}\n")
            f.write(summary + "\n")
    return results


if __name__ == "__main__":
    main()
