"""Epoch LR schedule vs the torch schedulers the reference composes.

The reference steps a LinearLR-warmup -> CosineAnnealingLR wrapper once per
epoch (``train.py:38-103, 1185-1240``). LRController.lr_for_epoch must match
the torch-produced LR trajectory exactly.
"""

import numpy as np
import pytest
import torch

from flow_timesnet_tpu.optim import LRController, WarmupSpec, resolve_warmup


def _torch_lrs(base_lr, epochs, warmup_epochs, start_factor, t_max, eta_min):
    """Replay the reference's scheduler wiring and record per-epoch LRs."""

    model = torch.nn.Linear(1, 1)
    opt = torch.optim.AdamW(model.parameters(), lr=base_lr)
    cosine_t_max = max(1, t_max - warmup_epochs) if warmup_epochs > 0 else t_max
    cosine = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=cosine_t_max, eta_min=eta_min)
    sched = cosine
    if warmup_epochs > 0:
        warm = torch.optim.lr_scheduler.LinearLR(
            opt, start_factor=start_factor, end_factor=1.0, total_iters=warmup_epochs
        )
        # reference WarmupThenCosineScheduler
        class Wrapper:
            def __init__(self):
                self.count = 0
                self.synced = False

            def step(self):
                self.count += 1
                if self.count <= warmup_epochs:
                    warm.step()
                    if self.count == warmup_epochs:
                        cosine.base_lrs = [g["lr"] for g in opt.param_groups]
                        cosine.last_epoch = 0
                        cosine._last_lr = [g["lr"] for g in opt.param_groups]
                        self.synced = True
                    return
                if not self.synced:
                    cosine.base_lrs = [g["lr"] for g in opt.param_groups]
                    cosine.last_epoch = 0
                    self.synced = True
                cosine.step()

        sched = Wrapper()
        for g in opt.param_groups:
            g["lr"] = base_lr * start_factor

    lrs = []
    for _ in range(1, epochs + 1):
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    return lrs


@pytest.mark.parametrize(
    "warmup_epochs,t_max", [(0, 10), (3, 10), (1, 5), (4, 4)]
)
def test_warmup_cosine_matches_torch(warmup_epochs, t_max):
    base_lr, epochs, eta_min = 1e-3, 10, 1e-5
    spec = WarmupSpec(
        epochs=warmup_epochs,
        steps=warmup_epochs,
        start_factor=(
            1.0 if warmup_epochs == 0 else (0.5 if warmup_epochs <= 1 else 1.0 / warmup_epochs)
        ),
    )
    ctl = LRController(
        base_lr, epochs, {"type": "cosine", "T_max": t_max, "eta_min": eta_min}, spec
    )
    expected = _torch_lrs(base_lr, epochs, warmup_epochs, spec.start_factor, t_max, eta_min)
    ours = [ctl.lr_for_epoch(ep) for ep in range(1, epochs + 1)]
    np.testing.assert_allclose(ours, expected, rtol=1e-10)


def test_step_lr_matches_torch():
    base_lr, epochs = 1e-2, 12
    model = torch.nn.Linear(1, 1)
    opt = torch.optim.AdamW(model.parameters(), lr=base_lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=4, gamma=0.5)
    expected = []
    for _ in range(epochs):
        expected.append(opt.param_groups[0]["lr"])
        sched.step()
    ctl = LRController(
        base_lr, epochs, {"type": "StepLR", "step_size": 4, "gamma": 0.5},
        WarmupSpec(0, 0, 1.0),
    )
    ours = [ctl.lr_for_epoch(ep) for ep in range(1, epochs + 1)]
    np.testing.assert_allclose(ours, expected, rtol=1e-12)


def test_plateau_reduces_after_patience():
    ctl = LRController(
        1e-3, 20,
        {"type": "ReduceLROnPlateau", "factor": 0.1, "patience": 2, "min_lr": 1e-6},
        WarmupSpec(0, 0, 1.0),
    )
    lrs = []
    metrics = [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    for ep, m in enumerate(metrics, start=1):
        lrs.append(ctl.lr_for_epoch(ep))
        ctl.observe(m)
    # first epoch sets best; three non-improving epochs exceed patience=2
    assert lrs[0] == pytest.approx(1e-3)
    assert ctl.lr_for_epoch(7) == pytest.approx(1e-4)


def test_resolve_warmup_steps_to_epochs():
    spec = resolve_warmup(800, None, updates_per_epoch=100)
    assert spec.epochs == 8
    assert spec.steps == 800
    assert spec.start_factor == pytest.approx(max(1e-4, 1.0 / 800))
    spec2 = resolve_warmup(None, 3, updates_per_epoch=50)
    assert spec2.epochs == 3 and spec2.steps == 150
    assert spec2.start_factor == pytest.approx(1.0 / 150)
    with pytest.raises(ValueError):
        resolve_warmup(10, 2, 5)
    assert resolve_warmup(1, None, 100).start_factor == 0.5
