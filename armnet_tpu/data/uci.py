"""UCI numeric-dataset path (multi-class), TPU-first.

Mirrors the reference's UCI pipeline (data_loader.py:76-180): each numeric
row becomes a libsvm-schema record with `id = column index` for every field
(UCILibsvmDataset, data_loader.py:82-94), features are standardized with a
scaler fit on the training split, the train/test split comes from the
UCI-121 `conxuntos.dat` index file next to the `.arff` (data_loader.py:146-152),
and an optional validation split is carved from train (data_loader.py:114-116).

TPU redesign: no torch DataLoader workers — rows feed the same fixed-shape,
mask-padded, device-prefetching BatchIterator as the libsvm path, so the
multi-class pipeline shares every downstream component (jitted steps, mesh
sharding, checkpointing).
"""

import os

import numpy as np

from armnet_tpu.data.libsvm import BatchIterator

__all__ = ["load_arff", "load_uci_dataset", "UCIDataset", "uci_loader",
           "Standardizer"]


def load_arff(path):
    """Minimal ARFF reader for the UCI-121 layout: all-numeric attributes
    plus one final nominal class attribute (the reference asserts exactly
    this shape, data_loader.py:158).

    Returns (X [N,D] f32, y [N] int32 class indices, nclass).
    """
    attr_names, nominal_values = [], None
    data_lines = []
    in_data = False
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            low = line.lower()
            if in_data:
                data_lines.append(line)
            elif low.startswith("@attribute"):
                # "@attribute name numeric" or "@attribute clase {0,1,...}"
                rest = line.split(None, 1)[1].strip()
                if "{" in rest:
                    name = rest[:rest.index("{")].strip().strip("'\"")
                    vals = rest[rest.index("{") + 1:rest.rindex("}")]
                    nominal_values = [v.strip().strip("'\"")
                                      for v in vals.split(",")]
                    attr_names.append(name)
                else:
                    attr_names.append(rest.split()[0].strip("'\""))
            elif low.startswith("@data"):
                in_data = True
    if nominal_values is None:
        raise ValueError(f"{path}: expected a nominal class attribute "
                         "(UCI-121 layout: numeric features + nominal class)")
    cls_index = {v: i for i, v in enumerate(nominal_values)}
    ncol = len(attr_names)
    X = np.empty((len(data_lines), ncol - 1), np.float32)
    y = np.empty((len(data_lines),), np.int32)
    for i, line in enumerate(data_lines):
        cols = line.split(",")
        if len(cols) != ncol:
            raise ValueError(f"{path}: row {i} has {len(cols)} columns, "
                             f"expected {ncol}")
        X[i] = [float(c) for c in cols[:-1]]
        label = cols[-1].strip().strip("'\"")
        y[i] = cls_index[label] if label in cls_index else int(float(label))
    return X, y, len(nominal_values)


def load_uci_dataset(folder, train=True):
    """Load one UCI dataset folder -> (X, y, nclass).

    Split resolution matches the reference (data_loader.py:142-156): if
    `{name}.arff` exists, rows split by the two index lines of
    `conxuntos.dat`; otherwise `{name}_train.arff` / `{name}_test.arff`.
    """
    name = os.path.basename(os.path.normpath(folder))
    full = os.path.join(folder, f"{name}.arff")
    if os.path.exists(full):
        X, y, nclass = load_arff(full)
        with open(os.path.join(folder, "conxuntos.dat")) as f:
            lines = f.readlines()
        train_idx = np.array([int(e) for e in lines[0].split()], np.int64)
        test_idx = np.array([int(e) for e in lines[1].split()], np.int64)
        assert not (set(train_idx.tolist()) & set(test_idx.tolist()))
        idx = train_idx if train else test_idx
        return X[idx], y[idx], nclass
    part = "train" if train else "test"
    return load_arff(os.path.join(folder, f"{name}_{part}.arff"))


class Standardizer:
    """Per-column (x - mean) / std fit on train (StandardScaler parity:
    population std, zero-variance columns left unscaled)."""

    def __init__(self, X):
        self.mean = X.mean(axis=0)
        std = X.std(axis=0)
        self.std = np.where(std == 0.0, 1.0, std)

    def __call__(self, X):
        return ((X - self.mean) / self.std).astype(np.float32)


class UCIDataset:
    """Numeric rows in the libsvm batch schema: id = column index per field
    (reference UCILibsvmDataset, data_loader.py:82-94). The id matrix is a
    zero-copy broadcast view — no [N,F] materialization."""

    def __init__(self, X, y):
        n, nfield = X.shape
        self.ids = np.broadcast_to(np.arange(nfield, dtype=np.int32),
                                   (n, nfield))
        self.values = np.ascontiguousarray(X, np.float32)
        self.labels = np.asarray(y, np.float32)
        self.nfield = nfield

    def __len__(self):
        return self.labels.shape[0]


def uci_loader(data_dir, batch_size, valid_perc=0.0, seed=0):
    """Build (train, valid, test) BatchIterators for a UCI folder.

    Split semantics follow the reference uci_loader (data_loader.py:104-180):
    valid_perc > 0 carves a validation split from train (deterministic
    shuffle); with valid_perc == 0 the valid loader ALIASES train — exactly
    the reference's `valid_loader = train_loader` fallback
    (data_loader.py:169-171), so early stopping then selects on training
    accuracy; a warning is emitted. `nclass` rides on every loader.

    Two deliberate deviations from the reference, both standard practice
    (reference quirks are bugs, not behavior worth porting):
      * the StandardScaler is fit on TRAIN ONLY and applied to every split;
        the reference fits an independent scaler per split — including one
        fit on the test set (data_loader.py:118-121) — which leaks test
        statistics and makes splits incomparable.
      * the train iterator shuffles; the reference's `shuffle=transformer is
        None` evaluates after the transformer is assigned, so its shuffle is
        effectively always False (data_loader.py:122-133).
    """
    Xtr, ytr, nclass = load_uci_dataset(data_dir, train=True)
    if valid_perc > 0.0:
        rng = np.random.RandomState(0)
        order = rng.permutation(Xtr.shape[0])
        ncut = int(round(Xtr.shape[0] * valid_perc))
        val_idx, tr_idx = order[:ncut], order[ncut:]
        Xva, yva = Xtr[val_idx], ytr[val_idx]
        Xtr, ytr = Xtr[tr_idx], ytr[tr_idx]
    else:
        Xva, yva = None, None

    scaler = Standardizer(Xtr)
    train = BatchIterator(UCIDataset(scaler(Xtr), ytr), batch_size, True, seed)
    if Xva is not None:
        valid = BatchIterator(UCIDataset(scaler(Xva), yva), batch_size, False,
                              seed)
    else:
        import warnings
        warnings.warn(
            "valid_perc=0: the validation loader aliases the TRAIN split "
            "(reference data_loader.py:169-171 semantics) — early stopping "
            "will select on training accuracy; pass --valid_perc to carve a "
            "real validation split", stacklevel=2)
        valid = BatchIterator(train.ds, batch_size, False, seed)
    Xte, yte, _ = load_uci_dataset(data_dir, train=False)
    test = BatchIterator(UCIDataset(scaler(Xte), yte), batch_size, False, seed)

    train.nclass = valid.nclass = test.nclass = nclass
    return train, valid, test
