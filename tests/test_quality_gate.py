"""Quality-regression gate (VERDICT r2 #8).

Trains a deterministic demand-benchmark subset (regenerated from the seeded
generator, 1 store / 24 series) for 2 epochs on CPU with a fixed seed and
asserts the best validation NLL lands inside a recorded band, so perf work
cannot silently regress model quality. Model dims are shrunk (d_model 32)
to keep the gate CPU-feasible — the full flagship step is ~440 GF, hours of
CPU per epoch — while still running the whole production pipeline: schema,
pivot, scaler, min-sigma calibration, device-resident epoch scan, selector,
fold convs, NB loss, scanned eval, early stopping, artifact save.

Band: the recorded trajectory is deterministic given the seed (epoch 1/2
val NLL 2.4714 / 2.4583 on the round-3 implementation, CPU backend); the
±0.05 tolerance absorbs backend/XLA numeric drift. A broken selector, fold
conv, loss, or pipeline wiring moves val NLL by far more (naive-level is
~2.6+; untrained ~2.9).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPECTED_BEST_NLL = 2.458269  # recorded round-3 value (see module docstring)
BAND = 0.05


@pytest.fixture(scope="module")
def subset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("qgate")
    full = root / "full"
    sub = root / "s1"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_demand_benchmark.py"),
         str(full), "--seed", "7"],
        check=True, cwd=REPO, env=env, capture_output=True,
    )
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_subset.py"),
         str(full), str(sub), "--stores", "1"],
        check=True, cwd=REPO, env=env, capture_output=True,
    )
    return sub


def test_fixed_seed_val_nll_band(subset_dir, tmp_path):
    from flow_timesnet_tpu.config import PipelineConfig
    from flow_timesnet_tpu.train import train_once

    cfg = PipelineConfig.from_files(
        os.path.join(REPO, "configs", "demand_benchmark.yaml"),
        overrides=[
            f"data.train_csv={subset_dir}/train.csv",
            f"data.test_dir={subset_dir}/test",
            f"data.sample_submission={subset_dir}/sample_submission.csv",
            "train.device=cpu",
            # pin the hyperparameters the recorded gate value was measured
            # with — the gate guards the *code*, not the shipped recipe, so
            # recipe retunes (HPO) must not shift it
            "train.lr=3.0e-4",
            "model.dropout=0.1",
            "train.ema_decay=0",
            "train.selection_metric=nll",
            "train.epochs=2",
            "train.batch_size=128",
            "train.lr_warmup_steps=20",
            "model.d_model=32",
            "model.d_ff=128",
            "window.stride=4",
            "train.val.strategy=holdout",
            "train.val.holdout_days=56",
            f"artifacts.dir={tmp_path}/artifacts",
            f"submission.out_path={tmp_path}/submission.csv",
        ],
    )
    best_nll, _ = train_once(cfg)
    assert abs(best_nll - EXPECTED_BEST_NLL) < BAND, (
        f"best val NLL {best_nll:.4f} left the recorded quality band "
        f"{EXPECTED_BEST_NLL} ± {BAND} — a change regressed model quality "
        f"(or improved it enough to re-record the band)."
    )
