"""End-to-end Frappe AUC parity (integration; minutes of runtime).

Gated behind ARMNET_SLOW_TESTS=1 — run explicitly:

    ARMNET_SLOW_TESTS=1 python -m pytest tests/test_parity_frappe.py -q

Oracle: the unmodified reference implementation trained on the SAME bundled
data (57K-row train — its original 202K-row train split is stripped from
the checkout) reaches best valid AUC 0.9470 / test 0.9444 at the canonical
armnet_1h recipe (measured 2026-08-16, torch CPU; see BENCH_NOTES.md). The
published 0.9777 (reference README.md:39-41) needs the missing full split.
This framework must land in the same band.
"""

import os

import pytest

RUN = os.environ.get("ARMNET_SLOW_TESTS") == "1"
DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data")


@pytest.mark.skipif(not RUN, reason="set ARMNET_SLOW_TESTS=1 to run")
def test_frappe_auc_parity():
    from armnet_tpu.data import make_dataloaders
    from armnet_tpu.train.loop import Trainer
    from armnet_tpu.utils.config import ExperimentConfig
    from armnet_tpu.utils.logging import get_logger, seed_everything

    cfg = ExperimentConfig(
        model="armnet_1h", nfeat=5500, nfield=10, nemb=10, h=128, alpha=2.0,
        mlp_nlayer=2, mlp_nhid=256, lr=1e-3, batch_size=4096)
    seed_everything(2025)
    loaders = make_dataloaders("frappe", DATA, cfg.nfield, cfg.batch_size)
    logger = get_logger(None, to_stdout=True, name="parity_frappe")
    trainer = Trainer(cfg, *loaders, logger, seed=2025)
    best_valid, best_test = trainer.fit(epochs=40, patience=3)

    # reference oracle on identical data: 0.9470 / 0.9444 (tolerate seed and
    # backend variance; a wiring bug shows up as ~0.5-0.8 AUC)
    assert best_valid >= 0.935, f"valid AUC {best_valid:.4f} below parity band"
    assert best_test >= 0.930, f"test AUC {best_test:.4f} below parity band"
