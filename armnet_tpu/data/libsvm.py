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


def _cache_key(path, nfield, byte_range=None):
    st = os.stat(path)
    rng = f":{byte_range[0]}-{byte_range[1]}" if byte_range else ""
    raw = (f"{os.path.abspath(path)}:{st.st_size}:{int(st.st_mtime)}"
           f":{nfield}:v1{rng}")
    return hashlib.sha1(raw.encode()).hexdigest()[:16]


def _shard_bytes(path, lo, hi):
    """The bytes of the rows owned by byte range [lo, hi): a row belongs to
    the shard containing its FIRST byte (shard 0 starts at 0; others skip
    forward to the first line start >= lo; the final row may extend past hi).
    Mirrors csrc/libsvm_parser.cc shard_range so the numpy fallback
    partitions rows identically to the native parser."""
    size = os.path.getsize(path)
    lo, hi = max(lo, 0), min(hi, size)
    with open(path, "rb") as f:
        if lo > 0:
            f.seek(lo - 1)
            # if byte lo-1 is '\n', the line starting AT lo is ours
            chunk = f.read(1)
            if chunk != b"\n":
                while True:
                    c = f.read(1 << 16)
                    if not c:
                        return b""
                    nl = c.find(b"\n")
                    if nl >= 0:
                        f.seek(f.tell() - len(c) + nl + 1)
                        break
        start = f.tell()
        if start >= hi:
            return b""
        data = f.read(hi - start)
        # extend the final (possibly cut) line to its newline
        if data and not data.endswith(b"\n"):
            while True:
                c = f.read(1 << 16)
                if not c:
                    break
                nl = c.find(b"\n")
                if nl >= 0:
                    data += c[:nl + 1]
                    break
                data += c
    return data


def _parse_native(path, nfield, byte_range=None):
    """C++ fast parser via ctypes; returns None if the .so is unavailable."""
    try:
        from armnet_tpu.data.native import parse_file, parse_file_range
    except Exception:
        return None
    try:
        if byte_range is not None:
            return parse_file_range(path, nfield, *byte_range)
        return parse_file(path, nfield)
    except Exception as e:  # pragma: no cover - corrupted .so etc.
        warnings.warn(f"native libsvm parser failed ({e}); using numpy fallback")
        return None


def _parse_numpy_fast(path, nfield, byte_range=None):
    """Vectorized parse: works when every line is well-formed with exactly
    `nfield` id:value pairs. Returns None if the file doesn't fit the fast
    path (then the robust line parser takes over)."""
    if byte_range is not None:
        data = _shard_bytes(path, *byte_range)
    else:
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
    # divisibility alone is not enough: malformed lines whose missing/extra
    # pairs compensate (3 pairs + 1 pair at nfield=2) still pass it, and the
    # reshape would silently shift the label/id/value alignment of every
    # row in between. The exact per-line check: after the b":"->b" "
    # replacement a well-formed line has exactly 2*nfield separator spaces —
    # verify it for every line (vectorized), else hand off to the robust
    # parser (which skips exactly the bad lines with a warning).
    sp = np.cumsum(flat == ord(" "))
    ends = np.flatnonzero(flat == ord("\n"))
    if flat.size and flat[-1] != ord("\n"):
        ends = np.append(ends, flat.size - 1)
    per_line = np.diff(np.concatenate([[0], sp[ends]]))
    if per_line.size != arr.size // ncol or not np.all(per_line == 2 * nfield):
        return None
    arr = arr.reshape(-1, ncol)
    labels = arr[:, 0].astype(np.float32)
    ids = arr[:, 1::2].astype(np.int32)
    values = arr[:, 2::2].astype(np.float32)
    return ids, values, labels


def _iter_lines(path, byte_range):
    if byte_range is not None:
        yield from _shard_bytes(path, *byte_range).decode().splitlines()
    else:
        with open(path) as f:
            yield from f


def _parse_numpy_robust(path, nfield, byte_range=None):
    """Line-by-line parse skipping malformed lines with a warning."""
    ids_rows, val_rows, labels = [], [], []
    for line in _iter_lines(path, byte_range):
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


def shard_byte_range(path, shard_idx, num_shards):
    """Even byte-range split of a file for per-host sharded parsing."""
    size = os.path.getsize(path)
    lo = shard_idx * size // num_shards
    hi = (shard_idx + 1) * size // num_shards
    return (lo, hi)


def parse_libsvm(path, nfield, use_cache=True, byte_range=None):
    """Parse a libsvm file into (ids [N,F] i32, values [N,F] f32, y [N] f32).

    Tries (1) binary cache, (2) C++ parser, (3) vectorized numpy, (4) robust
    line-by-line with malformed-line skipping.

    byte_range=(lo, hi): parse only the rows whose first byte lies in the
    range — the per-host shard (SURVEY.md §3.5). Row ownership matches the
    native parser's shard_range (csrc/libsvm_parser.cc), so splitting
    [0, filesize) into disjoint ranges partitions the rows exactly."""
    # Cache layout: three raw .npy files (ids/values/labels) so Criteo-scale
    # datasets reload via mmap without a decompress/copy pass.
    MMAP_BYTES = 512 * 1024 * 1024

    if use_cache:
        key = _cache_key(path, nfield, byte_range)
        base = os.path.join(_CACHE_DIR, f"libsvm_{key}")
        names = [f"{base}.{k}.npy" for k in ("ids", "values", "labels")]
        if all(os.path.exists(n) for n in names):
            total = sum(os.path.getsize(n) for n in names)
            mode = "r" if total > MMAP_BYTES else None
            try:
                return tuple(np.load(n, mmap_mode=mode) for n in names)
            except Exception as e:   # truncated/corrupt cache: reparse
                warnings.warn(f"libsvm cache unreadable ({e}); reparsing")

    out = _parse_native(path, nfield, byte_range)
    if out is None:
        out = _parse_numpy_fast(path, nfield, byte_range)
    if out is None:
        out = _parse_numpy_robust(path, nfield, byte_range)
    ids, values, labels = out

    if use_cache:
        # atomic publish: write to a pid-suffixed temp then rename, so a
        # concurrent run of the same dataset never loads a half-written
        # .npy (rename is atomic within the cache dir)
        try:
            os.makedirs(_CACHE_DIR, exist_ok=True)
            for name, arr in zip(names, (ids, values, labels)):
                tmp = f"{name}.{os.getpid()}.tmp"
                with open(tmp, "wb") as f:
                    np.save(f, arr)
                os.replace(tmp, name)
        except OSError:
            pass
    return ids, values, labels


class LibsvmDataset:
    """In-memory (or mmapped-cache) dataset of parsed libsvm rows.

    shard=(i, P): parse/hold only the i-th of P byte-range shards — each
    host does ~1/P of the parse work and holds ~1/P of the rows (replaces
    the reference's eager whole-file load, data_loader.py:25-47, which a
    multi-host run would otherwise repeat P times)."""

    def __init__(self, path, nfield, use_cache=True, shard=None):
        byte_range = None
        if shard is not None:
            byte_range = shard_byte_range(path, *shard)
        self.ids, self.values, self.labels = parse_libsvm(
            path, nfield, use_cache, byte_range)
        self.nfield = nfield
        self.path = path
        self.shard = shard

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
                 drop_last=False, sharding=None, local_shard_total=None):
        self.ds = dataset
        self.bsz = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.device_put = device_put
        self.drop_last = drop_last
        self.sharding = sharding  # optional dict of NamedShardings per key
        # local_shard_total: the dataset holds ONLY this process's row shard
        # (per-host sharded parse); the value is the GLOBAL row count, so
        # every process derives the same number of global batches even when
        # byte-range shards differ by a few rows. Each process then draws
        # its bsz/process_count batch rows from its local shard (padding
        # with mask-0 rows if its shard runs out first).
        self.local_shard_total = local_shard_total

    def __len__(self):
        n = self.local_shard_total if self.local_shard_total else len(self.ds)
        return n // self.bsz if self.drop_last else (n + self.bsz - 1) // self.bsz

    def _order(self):
        n = len(self.ds)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            return rng.permutation(n)
        return np.arange(n)

    def _rows(self, idx, lo, hi):
        """Materialize rows [lo, hi) of the padded fixed-shape batch whose
        real rows are idx (padding rows: id 0, value 1.0, mask 0).

        Pad VALUES are 1.0, not 0.0, so a pad row embeds to a real table
        row and every downstream activation stays in-distribution and
        bounded — with value 0 the models that clamp values to [1e-3, 1]
        (armnet/afn/gc_arm/sa_glu) turn each pad element into a log-space
        outlier (log(W*1e-3) ~ -6.9), which is exactly the class of junk
        the r5 masked-BN fix keeps out of batch statistics, and an
        unbounded pad activation could overflow to inf and NaN-poison
        gradients (inf * 0 cotangent). Pad rows still contribute nothing:
        mask 0 excludes them from loss/metrics/BN stats."""
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
                [values, np.ones((pad, self.ds.nfield), np.float32)])
            y = np.concatenate([y, np.zeros((pad,), np.float32)])
            mask[n:] = 0.0
        return {"id": ids, "value": values, "y": y, "mask": mask}

    def _make_local(self, idx):
        """Assemble a global batch from process-LOCAL shard rows: idx indexes
        this process's local dataset; the local slice is exactly the rows its
        addressable devices own (make_array_from_process_local_data)."""
        import jax

        if self.sharding is not None:
            lo, hi = _process_local_rows(self.bsz)
            local = self._rows(idx, 0, hi - lo)
            return {k: jax.make_array_from_process_local_data(
                        self.sharding[k], v)
                    for k, v in local.items()}
        batch = self._rows(idx, 0, self.bsz)
        if self.device_put:
            batch = jax.device_put(batch)
        return batch

    def _make(self, idx):
        import jax

        if self.local_shard_total:
            return self._make_local(idx)
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
        nb = len(self)
        step = self.bsz
        if self.local_shard_total:
            if self.sharding is not None:
                lo, hi = _process_local_rows(self.bsz)
                step = hi - lo           # local rows contributed per batch
            # byte-range shards are uneven: a shard with more rows than
            # nb*step cannot contribute its surplus this epoch (batch
            # geometry is fixed across processes). With shuffle the
            # permutation rotates WHICH rows sit in the surplus each epoch,
            # so all rows are seen across epochs; without shuffle the same
            # tail rows are skipped every epoch — surface the count. Warn
            # once per iterator, NOT on a fixed epoch number: Trainer's
            # init consumes one epoch before sharding (hence `step`) is
            # final, so the first accurate surplus may be any epoch.
            surplus = len(self.ds) - nb * step
            if surplus > 0 and not getattr(self, "_surplus_warned", False):
                self._surplus_warned = True
                warnings.warn(
                    f"local shard holds {surplus} more rows than the epoch's "
                    f"{nb} global batches consume ({step}/process/batch); "
                    f"{'a different ' if self.shuffle else 'the SAME '}"
                    f"{surplus} rows are skipped each epoch "
                    f"(shuffle={self.shuffle})")

        import jax

        if (os.environ.get("ARMNET_PREFETCH_THREAD", "0") == "1"
                and jax.process_count() == 1):
            # Background-thread prefetch (depth 2): the numpy row gather
            # runs while the device executes the previous step. OFF by
            # default since r5 — the real-training A/B (campaign stage 11,
            # frappe 3 epochs on TPU) measured the thread 2.2x SLOWER
            # end-to-end (36 s serial vs 79 s threaded): on this single
            # host core the thread contends with the dispatch loop for the
            # GIL between gathers, and the serial path's one-batch
            # device_put lookahead below already overlaps transfer with
            # compute. ARMNET_PREFETCH_THREAD=1 opts back in (multi-core
            # hosts may still win). Multi-process runs always keep the
            # serial path: assembly order is part of the cross-process
            # contract (make_array_from_process_local_data on every
            # process).
            yield from self._iter_threaded(order, nb, step)
            return
        # one-batch lookahead: device_put of batch k+1 overlaps step k
        pending = None
        for b in range(nb):
            idx = order[b * step:(b + 1) * step]
            nxt = self._make(idx)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    def _iter_threaded(self, order, nb, step):
        import queue
        import threading

        q = queue.Queue(maxsize=2)
        stop = threading.Event()

        def worker():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    idx = order[b * step:(b + 1) * step]
                    q.put(self._make(idx))
                q.put(None)                      # end-of-epoch sentinel
            except BaseException as e:           # surfaced on the main thread
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # unblock a worker stuck on a full queue, then reap it
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5)


def _global_row_count(local_n):
    """Sum of per-process shard row counts (the byte-range split partitions
    the file's rows exactly, so the sum IS the file's row count) — one tiny
    allgather at startup instead of every host parsing the whole file."""
    import jax

    if jax.process_count() == 1:
        return int(local_n)
    from jax.experimental import multihost_utils
    counts = multihost_utils.process_allgather(np.asarray(local_n, np.int64))
    return int(np.sum(counts))


def make_dataloaders(dataset, data_dir, nfield, batch_size, seed=0,
                     use_cache=True, shard=None):
    """Resolve {data_dir}/{dataset}/tr*|va*|te*libsvm and build iterators
    (train shuffled; val/test not — parity with data_loader.py:63-71).

    shard=(pid, nproc): multi-host mode — each process parses only its
    byte-range shard of every split (replacing the reference's eager
    whole-file load, data_loader.py:25-47, which a pod would repeat
    per-host) and the iterators assemble global batches from the local
    rows (local_shard_total = the allgathered global row count, so every
    process agrees on the batch schedule)."""
    base = os.path.join(data_dir, dataset)

    def pick(prefix):
        matches = sorted(glob.glob(os.path.join(base, f"{prefix}*libsvm")))
        if not matches:
            raise FileNotFoundError(
                f"no {prefix}*libsvm under {base} (expected the reference "
                f"tr/va/te naming convention)")
        return matches[0]

    if shard is not None and shard[1] > 1:
        sets = [LibsvmDataset(pick(p), nfield, use_cache, shard=shard)
                for p in ("tr", "va", "te")]
        totals = [_global_row_count(len(s)) for s in sets]
        train, val, test = sets
        return (BatchIterator(train, batch_size, True, seed,
                              local_shard_total=totals[0]),
                BatchIterator(val, batch_size, False, seed,
                              local_shard_total=totals[1]),
                BatchIterator(test, batch_size, False, seed,
                              local_shard_total=totals[2]))

    train = LibsvmDataset(pick("tr"), nfield, use_cache)
    val = LibsvmDataset(pick("va"), nfield, use_cache)
    test = LibsvmDataset(pick("te"), nfield, use_cache)
    return (BatchIterator(train, batch_size, True, seed),
            BatchIterator(val, batch_size, False, seed),
            BatchIterator(test, batch_size, False, seed))
