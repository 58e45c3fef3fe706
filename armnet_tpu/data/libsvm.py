"""libsvm data pipeline, TPU-first.

Keeps the reference's external contract (batch schema {'id','value','y'},
`tr*|va*|te*libsvm` glob convention: data_loader.py:20-23,57-61) but replaces
its eager line-by-line Python parse + torch DataLoader workers with:

  * a C++ mmap parser (csrc/libsvm_parser.cc via ctypes) with a vectorized
    numpy fallback — both tolerate malformed lines by skipping with a warning
    (parity with data_loader.py:37-44);
  * a binary row cache (parse once, mmap thereafter);
  * fixed-shape [B, F] batches (static shapes for XLA) with a `mask` marking
    real rows in the final partial batch;
  * host->device prefetch: the next batch is transferred while the current
    step runs (JAX dispatch is async).
"""

import glob
import hashlib
import os
import warnings

import numpy as np

__all__ = ["parse_libsvm", "LibsvmDataset", "BatchIterator", "make_dataloaders"]

_CACHE_DIR = os.environ.get(
    "ARMNET_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".cache"))


def _cache_key(path, nfield):
    st = os.stat(path)
    raw = f"{os.path.abspath(path)}:{st.st_size}:{int(st.st_mtime)}:{nfield}:v1"
    return hashlib.sha1(raw.encode()).hexdigest()[:16]


def _parse_native(path, nfield):
    """C++ fast parser via ctypes; returns None if the .so is unavailable."""
    try:
        from armnet_tpu.data.native import parse_file
    except Exception:
        return None
    try:
        return parse_file(path, nfield)
    except Exception as e:  # pragma: no cover - corrupted .so etc.
        warnings.warn(f"native libsvm parser failed ({e}); using numpy fallback")
        return None


def _parse_numpy_fast(path, nfield):
    """Vectorized parse: works when every line is well-formed with exactly
    `nfield` id:value pairs. Returns None if the file doesn't fit the fast
    path (then the robust line parser takes over)."""
    with open(path, "rb") as f:
        data = f.read()
    if not data:
        return (np.zeros((0, nfield), np.int32), np.zeros((0, nfield), np.float32),
                np.zeros((0,), np.float32))
    flat = np.frombuffer(
        data.replace(b":", b" "), dtype=np.uint8)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # unmatched-trailing-data notice
            arr = np.fromstring(flat.tobytes().decode("ascii"), sep=" ")  # noqa: NPY201
    except Exception:
        arr = np.array([])
    ncol = 1 + 2 * nfield
    if arr.size == 0 or arr.size % ncol != 0:
        return None
    arr = arr.reshape(-1, ncol)
    labels = arr[:, 0].astype(np.float32)
    ids = arr[:, 1::2].astype(np.int32)
    values = arr[:, 2::2].astype(np.float32)
    return ids, values, labels


def _parse_numpy_robust(path, nfield):
    """Line-by-line parse skipping malformed lines with a warning."""
    ids_rows, val_rows, labels = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                cols = line.split(" ")
                pairs = [c.split(":") for c in cols[1:]]
                row_ids = [int(p[0]) for p in pairs]
                row_vals = [float(p[1]) for p in pairs]
                if len(row_ids) != nfield:
                    raise ValueError("field count mismatch")
                labels.append(float(cols[0]))
                ids_rows.append(row_ids)
                val_rows.append(row_vals)
            except Exception:
                print(f'incorrect data format line "{line}" !')
    return (np.asarray(ids_rows, np.int32).reshape(-1, nfield),
            np.asarray(val_rows, np.float32).reshape(-1, nfield),
            np.asarray(labels, np.float32))


def parse_libsvm(path, nfield, use_cache=True):
    """Parse a libsvm file into (ids [N,F] i32, values [N,F] f32, y [N] f32).

    Tries (1) binary cache, (2) C++ parser, (3) vectorized numpy, (4) robust
    line-by-line with malformed-line skipping."""
    # Cache layout: three raw .npy files (ids/values/labels) so Criteo-scale
    # datasets reload via mmap without a decompress/copy pass.
    MMAP_BYTES = 512 * 1024 * 1024

    if use_cache:
        key = _cache_key(path, nfield)
        base = os.path.join(_CACHE_DIR, f"libsvm_{key}")
        names = [f"{base}.{k}.npy" for k in ("ids", "values", "labels")]
        if all(os.path.exists(n) for n in names):
            total = sum(os.path.getsize(n) for n in names)
            mode = "r" if total > MMAP_BYTES else None
            return tuple(np.load(n, mmap_mode=mode) for n in names)

    out = _parse_native(path, nfield)
    if out is None:
        out = _parse_numpy_fast(path, nfield)
    if out is None:
        out = _parse_numpy_robust(path, nfield)
    ids, values, labels = out

    if use_cache:
        try:
            os.makedirs(_CACHE_DIR, exist_ok=True)
            for name, arr in zip(names, (ids, values, labels)):
                np.save(name, arr)
        except OSError:
            pass
    return ids, values, labels


class LibsvmDataset:
    """In-memory (or mmapped-cache) dataset of parsed libsvm rows."""

    def __init__(self, path, nfield, use_cache=True):
        self.ids, self.values, self.labels = parse_libsvm(path, nfield, use_cache)
        self.nfield = nfield
        self.path = path

    def __len__(self):
        return self.labels.shape[0]


def _process_local_rows(global_batch):
    """[lo, hi) rows of the global batch owned by this process.

    make_array_from_process_local_data splits the sharded leading axis
    evenly across processes in process-index order; the global batch size
    must divide process_count (enforced by the caller's batch geometry)."""
    import jax

    nproc = jax.process_count()
    per, rem = divmod(global_batch, nproc)
    if rem:
        raise ValueError(
            f"process count {nproc} must divide the global batch size "
            f"{global_batch} (each process contributes an equal row slice)")
    pid = jax.process_index()
    return pid * per, (pid + 1) * per


class BatchIterator:
    """Fixed-shape batches with device prefetch.

    Yields dicts {'id': [B,F] i32, 'value': [B,F] f32, 'y': [B] f32,
    'mask': [B] f32} where mask marks real rows (the final partial batch is
    padded to B so XLA sees a single static shape)."""

    def __init__(self, dataset, batch_size, shuffle, seed=0, device_put=True,
                 drop_last=False, sharding=None):
        self.ds = dataset
        self.bsz = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.device_put = device_put
        self.drop_last = drop_last
        self.sharding = sharding  # optional dict of NamedShardings per key

    def __len__(self):
        n = len(self.ds)
        return n // self.bsz if self.drop_last else (n + self.bsz - 1) // self.bsz

    def _order(self):
        n = len(self.ds)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            return rng.permutation(n)
        return np.arange(n)

    def _rows(self, idx, lo, hi):
        """Materialize rows [lo, hi) of the padded fixed-shape batch whose
        real rows are idx (padding rows are zeros with mask 0)."""
        take = idx[lo:min(hi, idx.shape[0])]
        n = take.shape[0]
        size = hi - lo
        ids = self.ds.ids[take]
        values = self.ds.values[take]
        y = self.ds.labels[take]
        mask = np.ones((size,), np.float32)
        if n < size:
            pad = size - n
            ids = np.concatenate(
                [ids, np.zeros((pad, self.ds.nfield), np.int32)])
            values = np.concatenate(
                [values, np.zeros((pad, self.ds.nfield), np.float32)])
            y = np.concatenate([y, np.zeros((pad,), np.float32)])
            mask[n:] = 0.0
        return {"id": ids, "value": values, "y": y, "mask": mask}

    def _make(self, idx):
        import jax

        if self.device_put and self.sharding is not None:
            # Multi-host-correct assembly (SURVEY.md §3.5 streaming sharded
            # host loader): each process materializes ONLY the batch rows
            # its addressable devices own and assembles the global array
            # with make_array_from_process_local_data — a plain device_put
            # of the global batch would need every row on every host (and
            # is invalid for non-addressable shards). Single-process meshes
            # take the same path (local slice == whole batch), so every
            # mesh test exercises it.
            lo, hi = _process_local_rows(self.bsz)
            local = self._rows(idx, lo, hi)
            return {
                k: jax.make_array_from_process_local_data(
                    self.sharding[k], v)
                for k, v in local.items()}
        batch = self._rows(idx, 0, self.bsz)
        if self.device_put:
            batch = jax.device_put(batch, self.sharding)
        return batch

    def __iter__(self):
        order = self._order()
        self.epoch += 1
        n = len(order)
        nb = len(self)
        # one-batch lookahead: device_put of batch k+1 overlaps step k
        pending = None
        for b in range(nb):
            idx = order[b * self.bsz:(b + 1) * self.bsz]
            nxt = self._make(idx)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending


def make_dataloaders(dataset, data_dir, nfield, batch_size, seed=0,
                     use_cache=True):
    """Resolve {data_dir}/{dataset}/tr*|va*|te*libsvm and build iterators
    (train shuffled; val/test not — parity with data_loader.py:63-71)."""
    base = os.path.join(data_dir, dataset)

    def pick(prefix):
        matches = sorted(glob.glob(os.path.join(base, f"{prefix}*libsvm")))
        if not matches:
            raise FileNotFoundError(
                f"no {prefix}*libsvm under {base} (expected the reference "
                f"tr/va/te naming convention)")
        return matches[0]

    train = LibsvmDataset(pick("tr"), nfield, use_cache)
    val = LibsvmDataset(pick("va"), nfield, use_cache)
    test = LibsvmDataset(pick("te"), nfield, use_cache)
    return (BatchIterator(train, batch_size, True, seed),
            BatchIterator(val, batch_size, False, seed),
            BatchIterator(test, batch_size, False, seed))
