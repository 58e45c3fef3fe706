"""Native C++ parser parity + synthetic generator + presets."""

import numpy as np
import pytest

from armnet_tpu.data.libsvm import _parse_numpy_robust


def _native_available():
    try:
        from armnet_tpu.data import native
        native._load()
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_parser_matches_python(tmp_path):
    from armnet_tpu.data.native import parse_file

    p = tmp_path / "x.libsvm"
    rng = np.random.RandomState(0)
    lines = []
    for i in range(200):
        ids = rng.randint(0, 1000, 5)
        vals = np.round(rng.rand(5), 4)
        lines.append(f"{i % 2} " + " ".join(
            f"{a}:{b}" for a, b in zip(ids, vals)))
    p.write_text("\n".join(lines) + "\n")

    a = parse_file(str(p), 5)
    b = _parse_numpy_robust(str(p), 5)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], atol=1e-6)
    np.testing.assert_allclose(a[2], b[2])


@pytest.mark.skipif(not _native_available(), reason="no C++ toolchain")
def test_native_parser_skips_malformed(tmp_path):
    from armnet_tpu.data.native import parse_file

    p = tmp_path / "bad.libsvm"
    p.write_text("1 0:1 1:1\nnot a line\n0 2:1 3:0.5\n1 0:1\n1 0:1 1:1 2:1\n")
    with pytest.warns(UserWarning, match="malformed"):
        ids, vals, labels = parse_file(str(p), 2)
    assert ids.shape == (2, 2)
    np.testing.assert_allclose(labels, [1, 0])


def test_synthetic_generator_roundtrip(tmp_path):
    from armnet_tpu.data.libsvm import make_dataloaders
    from armnet_tpu.data.synthetic import generate_dataset

    out = generate_dataset(str(tmp_path / "synth"), rows=300, val_rows=100,
                           nfield=6, nfeat=120, seed=0)
    tr, va, te = make_dataloaders("synth", str(tmp_path), nfield=6,
                                  batch_size=64, use_cache=False)
    b = next(iter(tr))
    assert b["id"].shape == (64, 6)
    # per-field disjoint id ranges
    ids = np.asarray(tr.ds.ids)
    per = 120 // 6
    for f in range(6):
        assert ids[:, f].min() >= f * per and ids[:, f].max() < (f + 1) * per
    # the planted signal is learnable: both classes present
    labs = np.asarray(tr.ds.labels)
    assert 0 < labs.mean() < 1


def test_presets_parse_through_cli():
    from armnet_tpu.utils.config import get_args
    from armnet_tpu.utils.presets import PRESETS, expand

    for name in PRESETS:
        args = get_args(expand(name))
        assert args.exp_name == name
        assert args.model in ("armnet", "armnet_1h")
    with pytest.raises(KeyError):
        expand("nope")
