"""Optimizer and epoch-level learning-rate control.

Matches the reference's torch AdamW + epoch-stepped scheduler semantics
(``/root/reference/src/timesnet_forecast/train.py:38-103, 1127-1240``):

- AdamW as ``clip -> scale_by_adam -> add_decayed_weights -> -lr`` (identical
  update rule to torch.optim.AdamW with grads clipped before the moments);
- linear warmup measured in optimizer steps but applied per epoch (warmup
  epochs = ceil(warmup_steps / updates_per_epoch); start factor derived from
  the raw step count), then cosine annealing over the remaining epochs with
  base-lr resync at the boundary;
- StepLR / ReduceLROnPlateau / warmup-only variants.

The learning rate is passed into the jitted train step as a traced scalar,
so epoch-to-epoch LR changes never trigger recompilation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Mapping, Optional

import optax


def build_optimizer(grad_clip_norm: float, weight_decay: float) -> optax.GradientTransformation:
    parts = []
    if grad_clip_norm and grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(float(grad_clip_norm)))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    if weight_decay:
        parts.append(optax.add_decayed_weights(float(weight_decay)))
    parts.append(optax.scale(-1.0))  # lr multiplied in at the call site
    return optax.chain(*parts)


@dataclass
class WarmupSpec:
    epochs: int
    steps: int
    start_factor: float


def resolve_warmup(
    warmup_steps_cfg: Optional[int],
    warmup_epochs_cfg: Optional[int],
    updates_per_epoch: int,
) -> WarmupSpec:
    if warmup_steps_cfg is not None and warmup_epochs_cfg is not None:
        raise ValueError("Specify only one of train.lr_warmup_steps or train.lr_warmup_epochs")
    warmup_steps = 0
    warmup_epochs = 0
    if warmup_steps_cfg is not None:
        warmup_steps = max(int(warmup_steps_cfg), 0)
        if warmup_steps > 0:
            warmup_epochs = (
                max(1, math.ceil(warmup_steps / updates_per_epoch))
                if updates_per_epoch > 0
                else warmup_steps
            )
    elif warmup_epochs_cfg is not None:
        warmup_epochs = max(int(warmup_epochs_cfg), 0)
        warmup_steps = warmup_epochs * updates_per_epoch
    length = warmup_steps if warmup_steps > 0 else warmup_epochs
    if length <= 0:
        start = 1.0
    elif length <= 1:
        start = 0.5
    else:
        start = max(1e-4, min(1.0, 1.0 / length))
    return WarmupSpec(epochs=warmup_epochs, steps=warmup_steps, start_factor=start)


class LRController:
    """Host-side per-epoch learning rate, including plateau feedback.

    ``lr_for_epoch(ep)`` returns the LR used *during* 1-indexed epoch ``ep``
    (the reference steps its scheduler at the end of each epoch, so epoch 1
    always trains at the initial LR).
    """

    def __init__(
        self,
        base_lr: float,
        epochs: int,
        sched_cfg: Mapping[str, Any] | None,
        warmup: WarmupSpec,
    ) -> None:
        cfg = dict(sched_cfg or {})
        self.base_lr = float(base_lr)
        self.epochs = int(epochs)
        self.warmup = warmup
        self.type = cfg.get("type") or "cosine"
        self.cfg = cfg
        self._plateau_lr = self.base_lr
        self._plateau_best: Optional[float] = None
        self._plateau_bad = 0

        if self.type == "ReduceLROnPlateau" and warmup.epochs > 0:
            # reference: warmup unsupported with plateau scheduling
            self.warmup = WarmupSpec(epochs=0, steps=0, start_factor=1.0)

        if self.type == "cosine":
            t_max_raw = cfg.get("T_max", epochs)
            try:
                t_max = int(t_max_raw)
            except (TypeError, ValueError):
                t_max = epochs
            self.cosine_t_max = (
                max(1, t_max - self.warmup.epochs) if self.warmup.epochs > 0 else t_max
            )
            self.eta_min = float(cfg.get("eta_min", 1e-5))

    # -- plateau feedback -----------------------------------------------------

    def observe(self, metric: float) -> None:
        """Feed the per-epoch validation metric (used by ReduceLROnPlateau)."""

        if self.type != "ReduceLROnPlateau":
            return
        threshold = float(self.cfg.get("threshold", 1e-4))
        patience = int(self.cfg.get("patience", 10))
        factor = float(self.cfg.get("factor", 0.1))
        min_lr = float(self.cfg.get("min_lr", 0.0))
        if self._plateau_best is None or metric < self._plateau_best * (1.0 - threshold):
            self._plateau_best = metric
            self._plateau_bad = 0
        else:
            self._plateau_bad += 1
            if self._plateau_bad > patience:
                self._plateau_lr = max(self._plateau_lr * factor, min_lr)
                self._plateau_bad = 0

    # -- schedule -------------------------------------------------------------

    def _warmup_factor(self, steps_taken: int) -> float:
        w = self.warmup
        if w.epochs <= 0:
            return 1.0
        s = min(steps_taken, w.epochs)
        return w.start_factor + (1.0 - w.start_factor) * s / w.epochs

    def lr_for_epoch(self, epoch: int) -> float:
        """LR used during 1-indexed ``epoch`` (scheduler stepped per epoch end)."""

        steps_taken = epoch - 1
        if self.type == "ReduceLROnPlateau":
            return self._plateau_lr
        w = self.warmup
        if w.epochs > 0 and steps_taken < w.epochs:
            return self.base_lr * self._warmup_factor(steps_taken)
        if self.type == "cosine":
            t = steps_taken - w.epochs if w.epochs > 0 else steps_taken
            T = max(1, self.cosine_t_max)
            return self.eta_min + (self.base_lr - self.eta_min) * (
                1.0 + math.cos(math.pi * t / T)
            ) / 2.0
        if self.type == "StepLR":
            step_size = int(self.cfg.get("step_size", 10))
            gamma = float(self.cfg.get("gamma", 0.1))
            return self.base_lr * (gamma ** (steps_taken // max(1, step_size)))
        if w.epochs > 0:
            # warmup-only scheduler: hold at base lr after warmup completes
            return self.base_lr * self._warmup_factor(steps_taken)
        return self.base_lr

    def state_dict(self) -> Dict[str, Any]:
        return {
            "plateau_lr": self._plateau_lr,
            "plateau_best": self._plateau_best,
            "plateau_bad": self._plateau_bad,
        }

    def load_state_dict(self, state: Mapping[str, Any]) -> None:
        self._plateau_lr = float(state.get("plateau_lr", self._plateau_lr))
        best = state.get("plateau_best")
        self._plateau_best = None if best is None else float(best)
        self._plateau_bad = int(state.get("plateau_bad", 0))

    def effective_summary(self) -> Dict[str, Any]:
        return {
            "lr_warmup_steps_effective": self.warmup.steps,
            "lr_warmup_epochs_effective": self.warmup.epochs,
            "lr_warmup_start_factor_effective": self.warmup.start_factor,
        }
