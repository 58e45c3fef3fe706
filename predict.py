#!/usr/bin/env python
"""armnet_tpu batch inference: load a trained checkpoint and score a libsvm
file, one probability per input row, in input order.

The reference repo has no inference entry point at all (its checkpoint
helpers at utils/utils.py:109-121 are never even called by train.py); this
is the serving half the framework adds. The model architecture is rebuilt
from the checkpoint's metadata sidecar (written by Trainer.fit), so the
minimal invocation is just checkpoint + input:

    python predict.py --ckpt ./ckpt/myexp_2025 --input data/frappe/test.libsvm

Flags mirror train.py (same parser); any model flag passed explicitly
overrides the checkpoint metadata. `--tag best|last` picks the snapshot.
Output: `--output` path (default `<input>.scores`) with one line per row —
sigmoid probability for binary models, space-separated class probabilities
for multi-class (`noutput > 1`) heads. If the input file carries labels, the
matching quality metric (ROC-AUC / top-1 accuracy) is computed on device and
reported in the one-line JSON summary printed to stdout.
"""

import dataclasses
import glob
import json
import os
import sys

from armnet_tpu.models.config import ModelConfig
from armnet_tpu.utils.config import ExperimentConfig, build_arg_parser


def _resolve_input(cfg, explicit):
    if explicit:
        return explicit
    # same canonical pattern as make_dataloaders' pick() — NO trailing
    # wildcard, or stale '<input>.scores' outputs from earlier predict runs
    # would match and be parsed as libsvm
    pattern = os.path.join(cfg.data_dir, cfg.dataset, "te*libsvm")
    hits = sorted(glob.glob(pattern))
    if not hits:
        raise FileNotFoundError(
            f"--input not given and no test split matches {pattern}")
    return hits[0]


def _typed_dests(parser, argv):
    """Dests of the options the user actually typed, resolving argparse
    prefix abbreviations (--nout must count as an explicit --noutput)."""
    typed = set()
    for a in (argv if argv is not None else sys.argv[1:]):
        if not a.startswith("--"):
            continue
        opt = a.split("=")[0]
        action = parser._option_string_actions.get(opt)
        if action is not None:
            typed.add(action.dest)
            continue
        matches = {act.dest for s, act in parser._option_string_actions.items()
                   if s.startswith(opt)}
        typed |= matches
    return typed


# numerics flags restored alongside the architecture: a bf16-trained model
# should score with the dtype/backend it trained with unless overridden
_RESTORED_EXTRAS = ("bf16", "kernels")


def _restore_model_config(cfg, meta, parser, argv):
    """Fill model hyperparameters (+ numerics flags) from the checkpoint's
    metadata.

    Precedence: a flag the user typed on THIS command line wins; everything
    else comes from the checkpoint's recorded training config (so the
    architecture always matches the restored params)."""
    saved = meta.get("config") or {}
    if not saved:
        return cfg
    typed = _typed_dests(parser, argv)
    names = [f.name for f in dataclasses.fields(ModelConfig)]
    names += list(_RESTORED_EXTRAS)
    for name in names:
        if name in saved and name not in typed:
            cfg = cfg.replace(**{name: saved[name]})
    return cfg


def main(argv=None):
    p = build_arg_parser()
    p.add_argument("--ckpt", required=True,
                   help="checkpoint root (containing best/ and last/) or a "
                        "tag directory itself")
    p.add_argument("--tag", default="best", choices=["best", "last"],
                   help="which snapshot to score with")
    p.add_argument("--input", default=None,
                   help="libsvm file to score (default: the te* split of "
                        "--dataset under --data_dir)")
    p.add_argument("--output", default=None,
                   help="scores file (default: <input>.scores; '-' = stdout)")
    ns = vars(p.parse_args(argv))
    ckpt, tag = ns.pop("ckpt"), ns.pop("tag")
    inp, outp = ns.pop("input"), ns.pop("output")
    cfg = ExperimentConfig(**ns)

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from armnet_tpu.data.libsvm import BatchIterator, LibsvmDataset
    from armnet_tpu.kernels.config import set_compute_dtype, set_kernel_backend
    from armnet_tpu.models import create_model
    from armnet_tpu.train.checkpoint import load_checkpoint
    from armnet_tpu.train.metrics import masked_accuracy, masked_roc_auc
    from armnet_tpu.train.step import create_train_state

    # peek at the metadata sidecar first: the architecture/numerics flags
    # must be final BEFORE the model/state template is built for Orbax to
    # restore into. Tag-dir detection mirrors load_checkpoint's guard
    # (checkpoint.py:86-92): only treat a best/last basename as the tag when
    # the path does NOT itself contain a tag subdir (a root legitimately
    # named 'last' stays a root), and never override an explicitly typed
    # --tag.
    meta_root = os.path.abspath(ckpt)
    base = os.path.basename(meta_root)
    if base in ("best", "last") and not os.path.isdir(
            os.path.join(meta_root, tag)) and os.path.isdir(meta_root):
        if "tag" not in _typed_dests(p, argv):
            tag = base
        meta_root = os.path.dirname(meta_root)
    meta_path = os.path.join(meta_root, f"{tag}.meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    cfg = _restore_model_config(cfg, meta, p, argv)

    set_kernel_backend(cfg.kernels)
    if cfg.bf16:
        set_compute_dtype("bfloat16")

    inp = _resolve_input(cfg, inp)
    ds = LibsvmDataset(inp, cfg.nfield)
    loader = BatchIterator(ds, cfg.batch_size, shuffle=False)

    model = create_model(cfg)
    first = next(iter(loader))
    # NOTE: the restore template is a full TrainState, so Adam's mu/nu are
    # restored too (~2x the param bytes) even though scoring never reads
    # them — acceptable at these model sizes; a params-only restore needs a
    # partial-template path in checkpoint.py if it ever matters
    state = create_train_state(model, first, lr=cfg.lr, seed=cfg.seed)
    # pass the RESOLVED root + tag: giving load_checkpoint the raw tag-dir
    # spelling would re-run its own basename inference and discard an
    # explicit --tag
    state, _ = load_checkpoint(meta_root, state, tag=tag)

    multiclass = cfg.noutput > 1

    @jax.jit
    def predict_step(state, batch):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            {"id": batch["id"], "value": batch["value"]}, train=False)
        probs = (jax.nn.softmax(logits, axis=-1) if multiclass
                 else jax.nn.sigmoid(logits))
        return logits, probs

    all_logits, all_probs, all_labels, all_masks = [], [], [], []
    for batch in loader:
        logits, probs = predict_step(state, batch)
        all_logits.append(logits)
        all_probs.append(probs)
        all_labels.append(batch["y"])
        all_masks.append(batch["mask"])

    logits = jnp.concatenate(all_logits)
    probs = np.asarray(jnp.concatenate(all_probs))
    labels = jnp.concatenate(all_labels)
    masks = jnp.concatenate(all_masks)
    real = np.asarray(masks) > 0
    probs = probs[real]

    if outp is None:
        outp = inp + ".scores"
    lines = ([" ".join(f"{v:.6f}" for v in row) for row in probs]
             if multiclass else [f"{v:.6f}" for v in probs])
    if outp == "-":
        sys.stdout.write("\n".join(lines) + "\n")
    else:
        with open(outp, "w") as f:
            f.write("\n".join(lines) + "\n")

    summary = {"input": inp, "rows": int(real.sum()),
               "checkpoint": os.path.abspath(ckpt), "tag": tag,
               "model": cfg.model,
               "output": outp}
    # labels are part of the libsvm schema; report quality when they're
    # informative (binary needs both classes for a defined AUC)
    y = np.asarray(labels)[real]
    if multiclass:
        summary["accuracy"] = round(float(masked_accuracy(
            logits, labels, masks)), 6)
    elif len(np.unique(y)) > 1:
        summary["auc"] = round(float(masked_roc_auc(
            logits, labels, masks)), 6)
    # with '-' the scores own stdout; the summary moves to stderr so piped
    # consumers see exactly one line per row
    print(json.dumps(summary),
          file=sys.stderr if outp == "-" else sys.stdout)
    return summary


if __name__ == "__main__":
    main()
