"""Training driver: epoch loop with eval-capped passes, patience-based early
stopping on validation AUC, per-seed repeats, and wired checkpointing.

Semantics preserved from the reference driver (train.py:53-136):
  * one run() pass per split per epoch; train/eval mode by optimizer presence;
  * per-batch loss/AUC AverageMeters, periodic report every `report_freq`;
  * every split's loop breaks once batch_idx >= eval_freq;
  * early stop: valid_auc >= best keeps the LATEST tie as best, records the
    test AUC at the best-valid epoch, stops after `patience` non-improving
    epochs;
  * per-seed repeat: seeds [seed, seed+repeat), fresh model+optimizer each.

TPU redesign vs the reference run(): metrics stay on device (one scalar D2H
per batch), batches are prefetched, and the whole step is one jitted program.
"""

import time

import jax

from armnet_tpu.models import create_model, param_count
from armnet_tpu.train.checkpoint import save_checkpoint
from armnet_tpu.train.step import (create_train_state, init_meters,
                                   make_eval_step, make_train_step, task_fns)
from armnet_tpu.utils.logging import AverageMeter, time_since

__all__ = ["Trainer", "run_epoch"]


def run_epoch(epoch, state, loader, logger, *, train_step=None, eval_step=None,
              rng=None, namespace="train", report_freq=30, eval_freq=10000,
              total_epochs=0, metric_name="AUC"):
    """One pass over a loader; returns (state, mean AUC).

    Metrics live on device; the host fetches them only every `report_freq`
    batches and once at epoch end — the step stream never blocks on a
    per-batch device->host sync (the reference pays one sklearn round trip
    per batch; SURVEY.md §3.2 flags it as the throughput killer)."""
    is_train = train_step is not None
    meters = init_meters()
    time_avg = AverageMeter()
    timestamp = time.time()
    nbatch = len(loader)

    for batch_idx, batch in enumerate(loader):
        if is_train:
            state, meters = train_step(state, meters, batch, rng)
        else:
            meters = eval_step(state, meters, batch)

        time_avg.update(time.time() - timestamp)
        timestamp = time.time()

        if batch_idx % report_freq == 0:
            fetched = jax.device_get(meters)  # amortized sync point
            w = max(fetched["weight"], 1.0)
            logger.info(
                f"Epoch [{epoch:3d}/{total_epochs:3d}][{batch_idx:3d}/{nbatch}]\t"
                f"{time_avg.val:.3f} ({time_avg.avg:.3f}) "
                f"{metric_name} {fetched['auc_last']:4f} "
                f"({fetched['auc_sum'] / w:4f}) "
                f"Loss {fetched['loss_last']:8.4f} ({fetched['loss_sum'] / w:8.4f})")
            timestamp = time.time()
        # truncation parity with the reference (train.py:132): break AFTER
        # processing the batch at 0-based index eval_freq, i.e. exactly
        # eval_freq + 1 batches per split per epoch
        if batch_idx >= eval_freq:
            break

    fetched = jax.device_get(meters)
    w = max(fetched["weight"], 1.0)
    mean_auc = fetched["auc_sum"] / w
    logger.info(f"{namespace}\tTime {time_since(s=time_avg.sum):>12s} "
                f"{metric_name} {mean_auc:8.4f} "
                f"Loss {fetched['loss_sum'] / w:8.4f}")
    if fetched.get("overflow_sum", 0.0) > 0:
        logger.warning(
            f"{namespace}\ta2a embedding exchange dropped "
            f"{fetched['overflow_sum']:.0f} requests to zero rows this epoch "
            f"(capacity overflow) — raise --embedding_capacity_factor or "
            f"switch --embedding_exchange psum")
    return state, float(mean_auc)


class Trainer:
    """Owns model/state construction and the epoch/early-stop loop."""

    def __init__(self, config, train_loader, val_loader, test_loader, logger,
                 seed=2025, ckpt_dir=None, mesh=None, metrics_path=None):
        self.cfg = config
        self.loaders = (train_loader, val_loader, test_loader)
        self.logger = logger
        self.seed = seed
        self.ckpt_dir = ckpt_dir
        # structured per-epoch metrics (JSONL, SURVEY.md §5): the reference
        # only has grep-able text logs; machine-readable rows make the
        # benchmark/AUC tables reproducible without log scraping
        self.metrics_path = metrics_path
        self.profile_dir = getattr(config, "profile_dir", None)
        self.overflow_fn = None
        if getattr(config, "debug_nans", False):
            jax.config.update("jax_debug_nans", True)
            logger.info("jax_debug_nans enabled")

        # device mesh: explicit arg > config spec > single-device (no mesh).
        # A multi-process run ALWAYS needs a mesh (global batches are
        # assembled from per-process row shards via
        # make_array_from_process_local_data, which requires shardings), so
        # default to all devices on 'data' when no spec is given.
        mesh_spec = getattr(config, "mesh", "")
        shard_emb = bool(getattr(config, "shard_embedding", False))
        if mesh is None and (mesh_spec or jax.process_count() > 1):
            from armnet_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(mesh_spec)
        self.mesh = mesh

        self.model = create_model(config)
        first = next(iter(train_loader))
        self.state = create_train_state(
            self.model, first, lr=config.lr, seed=seed, clip=config.clip)
        logger.info(f"=> created model {config.model} | parameters: "
                    f"{param_count(self.state.params)}")

        shardings = None
        lookup_cm = None
        if mesh is not None:
            import functools

            from jax.sharding import NamedSharding, PartitionSpec as P

            from armnet_tpu.ops.embedding import sharded_lookup_context
            from armnet_tpu.parallel.sharding import (batch_sharding,
                                                      state_shardings)

            state_sh = state_shardings(self.state, mesh, config.nfeat,
                                       shard_emb)
            self.state = jax.device_put(self.state, state_sh)
            batch_sh = batch_sharding(mesh)
            meters_sh = jax.tree.map(
                lambda _: NamedSharding(mesh, P()), init_meters())
            shardings = (state_sh, meters_sh, batch_sh)
            for loader in self.loaders:
                loader.sharding = batch_sh
            if shard_emb:
                impl = getattr(config, "embedding_exchange", "psum")
                cap = float(getattr(config, "embedding_capacity_factor", 2.0))
                if impl == "a2a" and cap <= 0:
                    # AUTO capacity: host pre-pass over the first few train
                    # batches sizes the per-shard buckets so skewed
                    # (power-law) real ids drop nothing without hand-tuning
                    from armnet_tpu.parallel.embedding_parallel import (
                        required_capacity_factor)
                    ds = getattr(train_loader, "ds", None)
                    if ds is not None and len(ds) > 0:
                        bsz = train_loader.bsz
                        nb = min(8, max(len(ds) // bsz, 1))
                        sample = [ds.ids[i * bsz:(i + 1) * bsz]
                                  for i in range(nb)]
                        cap = required_capacity_factor(
                            sample, config.nfeat, mesh)
                    else:       # no host dataset handle: safe static default
                        cap = 4.0
                    if jax.process_count() > 1:
                        # every process sized its factor from its OWN shard's
                        # ids (and a ds-less process falls back to 4.0); cap
                        # fixes static bucket shapes inside the jitted
                        # shard_map, so all processes must agree or the SPMD
                        # programs diverge (hang) — take the global max
                        import numpy as np
                        from jax.experimental import multihost_utils
                        caps = multihost_utils.process_allgather(
                            np.asarray(cap, np.float32))
                        cap = float(np.max(caps))
                    logger.info(
                        f"a2a capacity factor auto-sized to {cap:.2f} "
                        f"(pre-pass over the first batches' id histogram"
                        f"{', global max across processes' if jax.process_count() > 1 else ''})")
                lookup_cm = functools.partial(sharded_lookup_context, mesh,
                                              impl, capacity_factor=cap)
                nshards = mesh.shape.get("model", 1)
                if impl == "a2a" and nshards > 1 \
                        and config.nfeat % nshards == 0:
                    # (nfeat not divisible -> the lookup falls back to the
                    # replicated path and nothing is ever dropped; counting
                    # would report phantom overflow)
                    from armnet_tpu.parallel.embedding_parallel import (
                        a2a_overflow_count)
                    from armnet_tpu.parallel.sharding import (_leaf_name,
                                                              leaf_spec)

                    # every sharded gather-table lookup (embedding tables,
                    # FeaturesLinear weight, deep-ensemble tables) drops the
                    # same over-capacity requests independently — scale the
                    # per-batch count by the number of such tables
                    ntables = sum(
                        1 for path, leaf in jax.tree_util
                        .tree_flatten_with_path(self.state.params)[0]
                        if leaf_spec(leaf, config.nfeat, mesh, True,
                                     name=_leaf_name(path)) != P())
                    count = functools.partial(
                        a2a_overflow_count, nfeat=config.nfeat, mesh=mesh,
                        capacity_factor=cap)
                    self.overflow_fn = (
                        lambda ids, mask: count(ids, mask=mask)
                        * max(ntables, 1))
            if shard_emb and mesh.shape.get("model", 1) <= 1:
                logger.warning(
                    "--shard_embedding requested but the mesh has no 'model' "
                    "axis > 1 — every table stays REPLICATED; pass e.g. "
                    "--mesh data:-1,model:2 to actually shard")
            logger.info(f"mesh {dict(mesh.shape)} | sharded embedding: "
                        f"{shard_emb}")

        # task: noutput > 1 means a multi-class (UCI) head — softmax CE +
        # accuracy; otherwise the binary CTR path (BCE + ROC-AUC)
        self.task = ("multiclass" if getattr(config, "noutput", 1) > 1
                     else "binary")
        _, _, self.metric_name = task_fns(self.task)
        from armnet_tpu.models import param_transform_for
        self.param_transform = param_transform_for(config.model)
        self.train_step = make_train_step(shardings=shardings,
                                          lookup_cm=lookup_cm, task=self.task,
                                          overflow_fn=self.overflow_fn,
                                          param_transform=self.param_transform)
        # eval applies the param mutation ONCE per evaluation pass (params
        # are constant across it), not per jitted batch step — at Criteo
        # scale the per-batch abs+max would re-touch an 84 MB table for
        # every eval batch
        self.eval_step = make_eval_step(shardings=shardings,
                                        lookup_cm=lookup_cm, task=self.task,
                                        overflow_fn=self.overflow_fn)
        self.rng = jax.random.key(seed + 7)

    def fit(self, epochs, patience=1, eval_freq=10000, report_freq=30):
        train_loader, val_loader, test_loader = self.loaders
        best_valid, best_test, patience_cnt = 0.0, 0.0, 0
        start = time.time()
        if self.metrics_path:
            # one fit = one file: a crash-and-retry of the same exp_name
            # must not interleave duplicate epoch rows from the stale run
            open(self.metrics_path, "w").close()

        for epoch in range(epochs):
            self.logger.info(f"Epoch [{epoch:3d}/{epochs:3d}]")
            # profile the steady-state epoch (epoch 1: past epoch-0 compiles)
            # or epoch 0 on single-epoch runs; one trace per fit
            profiling = self.profile_dir and epoch == min(1, epochs - 1)
            if profiling:
                jax.profiler.start_trace(self.profile_dir)
            epoch_start = time.time()
            self.state, train_auc = run_epoch(
                epoch, self.state, train_loader, self.logger,
                train_step=self.train_step, rng=self.rng,
                report_freq=report_freq, eval_freq=eval_freq,
                total_epochs=epochs, metric_name=self.metric_name)
            if profiling:
                jax.tree.map(lambda x: x.block_until_ready(),
                             self.state.params)
                jax.profiler.stop_trace()
                self.logger.info(f"profiler trace written to "
                                 f"{self.profile_dir}")
            eval_state = (self.state.replace(
                params=self.param_transform(self.state.params))
                if self.param_transform else self.state)
            _, valid_auc = run_epoch(
                epoch, eval_state, val_loader, self.logger,
                eval_step=self.eval_step, namespace="val",
                report_freq=report_freq, eval_freq=eval_freq,
                total_epochs=epochs, metric_name=self.metric_name)
            _, test_auc = run_epoch(
                epoch, eval_state, test_loader, self.logger,
                eval_step=self.eval_step, namespace="test",
                report_freq=report_freq, eval_freq=eval_freq,
                total_epochs=epochs, metric_name=self.metric_name)

            if valid_auc >= best_valid:
                patience_cnt = 0
                best_valid, best_test = valid_auc, test_auc
                self.logger.info(
                    f"best valid auc: valid {valid_auc:.4f}, test {test_auc:.4f}")
                if self.ckpt_dir:
                    import dataclasses
                    # the model config rides in the metadata so inference
                    # (predict.py) can rebuild the exact architecture from
                    # the checkpoint alone — the reference's save_checkpoint
                    # (utils/utils.py:109-121) stores only tensors, forcing
                    # the caller to re-supply every hyperparameter
                    cfg_dict = (dataclasses.asdict(self.cfg)
                                if dataclasses.is_dataclass(self.cfg) else {})
                    save_checkpoint(
                        self.ckpt_dir, self.state,
                        extra={"epoch": epoch, "valid_auc": float(valid_auc),
                               "test_auc": float(test_auc),
                               "seed": self.seed, "config": cfg_dict},
                        is_best=True)
            else:
                patience_cnt += 1
                self.logger.info(f"valid {valid_auc:.4f}, test {test_auc:.4f}")
                self.logger.info(
                    f"Early stopped, {patience_cnt}-th best auc at epoch "
                    f"{epoch - patience_cnt}")
            if self.metrics_path:
                import json
                row = {"epoch": epoch, "seed": self.seed,
                       "train": round(float(train_auc), 6),
                       "valid": round(float(valid_auc), 6),
                       "test": round(float(test_auc), 6),
                       "metric": self.metric_name,
                       "best_valid": round(float(best_valid), 6),
                       "is_best": patience_cnt == 0,
                       "time_s": round(time.time() - epoch_start, 3)}
                with open(self.metrics_path, "a") as f:
                    f.write(json.dumps(row) + "\n")

            if patience_cnt >= patience:
                self.logger.info(
                    f"Final best valid auc {best_valid:.4f}, "
                    f"with test auc {best_test:.4f}")
                break

        self.logger.info(f"Total running time: {time_since(since=start)}")
        return best_valid, best_test
