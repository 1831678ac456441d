"""Jitted training / evaluation / decoding steps.

This replaces the reference's per-batch Python orchestration, AMP GradScaler
and CUDA-graph capture (``train.py:1261-1534``) with compiled JAX programs:
one ``train_step`` (loss + grads + AdamW update, optional accumulation), one
``eval_step`` streaming masked NLL/sMAPE/per-series accumulators on device,
and a ``lax.scan`` recursive decoder sharing the direct checkpoint
(north-star requirement; reference loop at ``predict.py:307-342``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .losses import negative_binomial_mask, negative_binomial_nll
from .models.timesnet import TimesNet, TimesNetConfig
from .optim import build_optimizer
from .utils.metrics import smape_batch_sums, wsmape_batch_sums


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    grad_accum: Any  # zeros-like params when accumulating, else None
    ema: Any = None  # Polyak-averaged params when train.ema_decay > 0, else None


def _strip_augment(staged):
    """Augmentation-free view of staged windows (shares the device arrays).

    One-off probes (init batch, period telemetry) gather without a PRNG key;
    on configs with ``data.augment`` the raw staged struct would raise
    "augmentation requires a PRNG key". The augment knobs are static
    (non-pytree) fields, so the replace costs one extra trace, zero copies.
    """

    if getattr(staged, "noise_std", 0.0) or getattr(staged, "time_shift", 0):
        return dataclasses.replace(staged, noise_std=0.0, time_shift=0)
    return staged


def _safe_ratio(num, den) -> float:
    """Metric sum / count with divergence made LOUD instead of perfect.

    A NaN'd model masks every element out (``negative_binomial_mask`` drops
    non-finite rates), so both accumulators come back 0 — the old
    ``0.0 if den == 0`` fallback then reported val_nll/val_smape of exactly
    0.0, which checkpoint selection AND the HPO objective read as a perfect
    score (observed live: a diverged phase-3 trial "won" with val_smape
    0.000000). Zero coverage or non-finite sums now score +inf.
    """

    num = float(num)
    den = float(den)
    if den <= 0.0 or not np.isfinite(num) or not np.isfinite(den):
        return float("inf")
    return num / den


def _base_mask(y, mask, row_valid, use_loss_masking: bool):
    base = (mask > 0.0) if use_loss_masking else jnp.ones_like(y, dtype=bool)
    if row_valid is not None:
        base = base & (row_valid[:, None, None] > 0.0)
    return base


class Engine:
    """Compiled step functions bound to one model configuration."""

    def __init__(
        self,
        cfg: TimesNetConfig,
        *,
        use_loss_masking: bool = False,
        accumulation_steps: int = 1,
        grad_clip_norm: float = 0.0,
        weight_decay: float = 0.0,
        num_series: int = 1,
        ema_decay: float = 0.0,
        donate: bool = True,
    ) -> None:
        self.cfg = cfg
        self.model = TimesNet(cfg)
        # Telemetry runs a standalone forward (no gradients), so remat would
        # only discard the sown intermediates; use a non-remat twin (identical
        # param tree) whenever checkpointing is on.
        self._telemetry_model = (
            TimesNet(dataclasses.replace(cfg, use_checkpoint=False))
            if cfg.use_checkpoint
            else self.model
        )
        self.use_loss_masking = bool(use_loss_masking)
        self.accum_steps = max(1, int(accumulation_steps))
        # Polyak/EMA weight averaging (no reference analogue): a trace-time
        # constant, so the disabled path compiles to exactly the old program.
        self.ema_decay = float(ema_decay)
        if not 0.0 <= self.ema_decay < 1.0:
            raise ValueError("ema_decay must be in [0, 1)")
        self.tx = build_optimizer(grad_clip_norm, weight_decay)
        self.num_series = int(num_series)
        # donation is off under train.debug_nans: the de-optimized NaN-hunt
        # re-run replays the original arguments, which donation deletes
        self._donate = (0,) if donate else ()
        self._train_step = jax.jit(
            self._train_step_impl,
            static_argnames=("do_update",),
            donate_argnums=self._donate,
        )
        self._eval_step = jax.jit(self._eval_step_impl)
        self._forward = jax.jit(
            functools.partial(self._forward_impl, deterministic=True)
        )
        self._rollout = jax.jit(self._rollout_impl, static_argnames=("horizon",))

    # -- initialisation -------------------------------------------------------

    def init_state(self, rng, sample_batch: Dict[str, Any]) -> TrainState:
        variables = self.model.init(
            {"params": rng},
            sample_batch["x"],
            sample_batch.get("x_mark"),
            sample_batch.get("static"),
            sample_batch.get("ids"),
            dispersion_floor=sample_batch.get("floor"),
            deterministic=True,
        )
        params = variables["params"]
        opt_state = self.tx.init(params)
        accum = (
            jax.tree_util.tree_map(jnp.zeros_like, params)
            if self.accum_steps > 1
            else None
        )
        # distinct buffers: params get donated by the step programs
        ema = (
            jax.tree_util.tree_map(lambda p: p.copy(), params)
            if self.ema_decay > 0.0
            else None
        )
        return TrainState(params=params, opt_state=opt_state, grad_accum=accum, ema=ema)

    def _ema_update(self, ema, params):
        """Trace-time-gated EMA: ``None`` (and no ops) when disabled."""

        if self.ema_decay <= 0.0:
            return None
        d = self.ema_decay
        return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d), ema, params)

    # -- forward / decode ------------------------------------------------------

    def _forward_impl(
        self, params, x, x_mark, static, ids, floor, row_valid=None,
        deterministic=True, rng=None,
    ):
        rngs = {"dropout": rng} if rng is not None else None
        return self.model.apply(
            {"params": params},
            x,
            x_mark,
            static,
            ids,
            dispersion_floor=floor,
            deterministic=deterministic,
            row_valid=row_valid,
            rngs=rngs,
        )

    def forward(self, params, x, x_mark=None, static=None, ids=None, floor=None,
                row_valid=None):
        return self._forward(params, x, x_mark, static, ids, floor, row_valid)

    def _rollout_impl(self, params, x, x_mark, y_mark, static, ids, floor,
                      horizon: int, row_valid=None):
        """Recursive H-step decode via lax.scan carrying (window, marks)."""

        has_marks = x_mark is not None
        if has_marks and y_mark is None:
            raise ValueError(
                "Temporal features provided for history but missing future marks "
                "during recursive forecast"
            )

        def step(carry, ymark_t):
            window, marks = carry
            rate, disp = self._forward_impl(
                params, window, marks, static, ids, floor, row_valid,
                deterministic=True,
            )
            rate_step = rate[:, -1:, :]
            disp_step = disp[:, -1:, :]
            new_window = jnp.concatenate([window[:, 1:, :], rate_step], axis=1)
            if has_marks:
                new_marks = jnp.concatenate([marks[:, 1:, :], ymark_t[:, None, :]], axis=1)
            else:
                new_marks = marks
            return (new_window, new_marks), (rate_step[:, 0], disp_step[:, 0])

        xs = jnp.swapaxes(y_mark, 0, 1)[:horizon] if has_marks else jnp.zeros((horizon, 0))
        (_, _), (rates, disps) = jax.lax.scan(step, (x, x_mark), xs, length=horizon)
        return jnp.swapaxes(rates, 0, 1), jnp.swapaxes(disps, 0, 1)

    def rollout(self, params, x, horizon, x_mark=None, y_mark=None, static=None,
                ids=None, floor=None, row_valid=None):
        return self._rollout(params, x, x_mark, y_mark, static, ids, floor,
                             horizon=int(horizon), row_valid=row_valid)

    # -- observability ---------------------------------------------------------

    def collect_period_telemetry(self, params, batch) -> Dict[str, Any]:
        """Run one deterministic forward capturing per-block period selections.

        Returns {block_name: {periods, valid, group_count}} — the TPU-native
        replacement for the reference's selector attribute logging
        (train.py:283-317).
        """

        # Jitted: the eager flax apply costs seconds of per-op dispatch
        # through a high-RTT relay; compiled it is one ~ms forward. One
        # device_get fetches every sown array in a single round-trip.
        if not hasattr(self, "_telemetry_apply"):
            def _impl(p, x, x_mark, static, ids, floor):
                return self._telemetry_model.apply(
                    {"params": p}, x, x_mark, static, ids,
                    dispersion_floor=floor, deterministic=True,
                    mutable=["intermediates"],
                )

            self._telemetry_apply = jax.jit(_impl)
        _, aux = self._telemetry_apply(
            params,
            batch["x"],
            batch.get("x_mark"),
            batch.get("static"),
            batch.get("ids"),
            batch.get("floor"),
        )
        return self._format_telemetry(aux)

    def collect_period_telemetry_staged(
        self, params, staged, flat_idx, row_valid
    ) -> Dict[str, Any]:
        """Resident-pipeline telemetry: gather + forward fused in ONE dispatch.

        Saves the separate gather round-trip per epoch that
        ``gather_staged_batch`` + :meth:`collect_period_telemetry` would pay.
        """

        if not hasattr(self, "_telemetry_staged"):
            from .data.device_windows import gather_batch

            def _impl(p, s, i, rv):
                b = gather_batch(s, i, rv, None)
                return self._telemetry_model.apply(
                    {"params": p}, b["x"], b.get("x_mark"), b.get("static"),
                    b.get("ids"), dispersion_floor=b.get("floor"),
                    deterministic=True, mutable=["intermediates"],
                )

            self._telemetry_staged = jax.jit(_impl)
        _, aux = self._telemetry_staged(
            params, _strip_augment(staged), jnp.asarray(flat_idx),
            jnp.asarray(row_valid),
        )
        return self._format_telemetry(aux)

    @staticmethod
    def _format_telemetry(aux) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        inter = jax.device_get(aux.get("intermediates", {}))
        for block_name, values in inter.items():
            if not isinstance(values, dict) or "selected_periods" not in values:
                continue
            out[block_name] = {
                "periods": np.asarray(values["selected_periods"][0]),
                "valid": np.asarray(values["period_valid"][0]),
                "group_count": int(np.asarray(values["group_count"][0])),
            }
            if "freq_indices" in values:  # freeze-periods snapshot needs bins
                out[block_name]["freq_indices"] = np.asarray(values["freq_indices"][0])
        return out

    @staticmethod
    def frozen_spec_from_telemetry(telemetry: Dict[str, Any], n_layers: int):
        """Telemetry dict -> hashable per-layer frozen-period spec.

        Returns ``None`` when any layer's snapshot is missing (e.g. blocks
        without freq_indices from an older engine).
        """

        layers = []
        for i in range(n_layers):
            info = telemetry.get(f"blocks_{i}")
            if not info or "freq_indices" not in info:
                return None
            slots = [
                (int(p), int(f), bool(v))
                for p, f, v in zip(
                    info["periods"], info["freq_indices"], info["valid"]
                )
            ]
            # canonical order (valid slots first, then sorted): softmax
            # weights sum over slots, so slot order is math-irrelevant —
            # sorting makes the drift comparison order-insensitive (top-k
            # rank swaps between equal-amplitude candidates are not drift)
            slots.sort(key=lambda s: (not s[2], s[0], s[1]))
            layers.append(tuple(slots))
        return tuple(layers)

    @staticmethod
    def parse_freeze_mode(raw: Any) -> str:
        """Normalise ``predict.freeze_periods`` to ``off``/``auto``/``on``.

        YAML 1.1 coerces bare ``on``/``off``/``yes``/``no`` in dotted CLI
        overrides to booleans before we ever see a string, so booleans map to
        their mode rather than erroring.
        """

        if isinstance(raw, bool):
            return "on" if raw else "off"
        mode = str(raw).strip().lower()
        if mode in ("off", "false", "0", "no", ""):
            return "off"
        if mode in ("on", "true", "1", "yes"):
            return "on"
        if mode == "auto":
            return "auto"
        raise ValueError(
            f"predict.freeze_periods must be off|auto|on, got '{raw}'"
        )

    @staticmethod
    def frozen_spec_from_config(raw: Any, n_layers: int):
        """Deserialize ``train.frozen_periods_spec`` (YAML nested lists, as
        written by ``train_once``) back into the hashable per-layer spec that
        ``TimesNetConfig.frozen_periods`` accepts.

        Returns ``None`` when absent; raises ``ValueError`` on a malformed or
        layer-count-mismatched spec so callers can warn and fall back to the
        dynamic path rather than silently mis-specializing.
        """

        if not raw:
            return None
        try:
            layers = tuple(
                tuple((int(p), int(f), bool(v)) for p, f, v in layer)
                for layer in raw
            )
        except (TypeError, ValueError) as err:
            raise ValueError(f"Malformed frozen_periods_spec: {err}") from err
        if len(layers) != int(n_layers):
            raise ValueError(
                f"frozen_periods_spec carries {len(layers)} layers but the "
                f"model has n_layers={n_layers}"
            )
        return layers

    # -- training ---------------------------------------------------------------

    def _loss(self, params, batch, rng):
        rate, dispersion = self.model.apply(
            {"params": params},
            batch["x"],
            batch.get("x_mark"),
            batch.get("static"),
            batch.get("ids"),
            dispersion_floor=batch.get("floor"),
            deterministic=False,
            row_valid=batch.get("row_valid"),
            rngs={"dropout": rng},
        )
        y = batch["y"]
        base = _base_mask(y, batch["mask"], batch.get("row_valid"), self.use_loss_masking)
        nbm = negative_binomial_mask(y, rate, dispersion, base)
        loss = negative_binomial_nll(y, rate, dispersion, nbm)
        rv = batch.get("row_valid")
        if rv is not None:
            # coverage over real rows only (DP padding adds row_valid=0 rows)
            total = rv.astype(jnp.float32).sum() * float(y.shape[1] * y.shape[2])
        else:
            total = jnp.asarray(float(np.prod(y.shape)), jnp.float32)
        stats = {
            "mask_true": nbm.sum().astype(jnp.float32),
            "mask_total": total,
        }
        return loss, stats

    def _train_step_impl(self, state: TrainState, lr, rng, batch, *, do_update: bool):
        (loss, stats), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, batch, rng
        )
        if self.accum_steps > 1:
            accum = jax.tree_util.tree_map(
                lambda a, g: a + g / self.accum_steps, state.grad_accum, grads
            )
            if do_update:
                updates, opt_state = self.tx.update(accum, state.opt_state, state.params)
                updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
                params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
                new_state = TrainState(
                    params=params,
                    opt_state=opt_state,
                    grad_accum=jax.tree_util.tree_map(jnp.zeros_like, accum),
                    ema=self._ema_update(state.ema, params),
                )
            else:
                new_state = state.replace(grad_accum=accum)
        else:
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            new_state = TrainState(
                params=params,
                opt_state=opt_state,
                grad_accum=None,
                ema=self._ema_update(state.ema, params),
            )
        return new_state, loss, stats

    def train_step(self, state, lr, rng, batch, do_update: bool = True):
        return self._train_step(state, lr, rng, batch, do_update=bool(do_update))

    def _train_scan_impl(self, state: TrainState, lr, rngs, batches):
        """Run one optimizer step per stacked batch inside a single lax.scan.

        ``batches`` is a batch dict whose arrays carry a leading steps axis;
        ``rngs`` is [steps] PRNG keys. Fuses the whole chunk into one device
        program — no per-step host dispatch (the TPU-native replacement for
        the reference's CUDA-graph capture, train.py:1261-1439).
        """

        def body(carry, xs):
            rng, batch = xs
            (loss, stats), grads = jax.value_and_grad(self._loss, has_aux=True)(
                carry.params, batch, rng
            )
            updates, opt_state = self.tx.update(grads, carry.opt_state, carry.params)
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
            params = jax.tree_util.tree_map(lambda p, u: p + u, carry.params, updates)
            new_carry = TrainState(
                params=params,
                opt_state=opt_state,
                grad_accum=None,
                ema=self._ema_update(carry.ema, params),
            )
            return new_carry, (loss, stats["mask_true"])

        final, (losses, mask_true) = jax.lax.scan(body, state, (rngs, batches))
        return final, losses, mask_true

    def train_steps_scanned(self, state, lr, rngs, stacked_batches):
        """Compiled multi-step driver (only valid when accumulation_steps == 1)."""

        if self.accum_steps != 1:
            raise ValueError("scanned training requires accumulation_steps == 1")
        if not hasattr(self, "_train_scan"):
            self._train_scan = jax.jit(self._train_scan_impl, donate_argnums=self._donate)
        return self._train_scan(state, lr, rngs, stacked_batches)

    # -- device-resident epoch (gather inside the program) ----------------------

    def _train_epoch_resident_impl(
        self, state: TrainState, lr, rngs, staged, idx, row_valid, step_offset
    ):
        """One whole epoch (or one chunk of it) as a single lax.scan: per
        step, gather the window batch from the staged fold arrays in HBM,
        then loss/grads/update.

        Replaces the host gather -> H2D -> dispatch chain entirely (VERDICT r2
        #1); the reference's analogue is the DataLoader worker/prefetch stack
        (``/root/reference/src/timesnet_forecast/train.py:218-227``).

        ``step_offset`` is the chunk's first global step index within the
        epoch, so per-step dropout keys derived from a single epoch key are
        identical whether the epoch runs as one dispatch or several.
        """

        from .data.device_windows import gather_batch

        if rngs.ndim == 1:
            # a single epoch key: derive the per-step keys inside the program
            # (same fold_in values the host-side vmap produced)
            rngs = jax.vmap(lambda i: jax.random.fold_in(rngs, i))(
                jnp.arange(idx.shape[0]) + step_offset
            )

        def body(carry, xs):
            rng, flat, rv = xs
            rng, gather_key = jax.random.split(rng)
            batch = gather_batch(staged, flat, rv, gather_key)
            (loss, stats), grads = jax.value_and_grad(self._loss, has_aux=True)(
                carry.params, batch, rng
            )
            updates, opt_state = self.tx.update(grads, carry.opt_state, carry.params)
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
            params = jax.tree_util.tree_map(lambda p, u: p + u, carry.params, updates)
            new_carry = TrainState(
                params=params,
                opt_state=opt_state,
                grad_accum=None,
                ema=self._ema_update(carry.ema, params),
            )
            return new_carry, (loss, stats["mask_true"])

        final, (losses, mask_true) = jax.lax.scan(
            body, state, (rngs, idx, row_valid)
        )
        return final, losses, mask_true

    def train_epoch_resident(self, state, lr, rngs, staged, idx, row_valid, step_offset=0):
        """Run one epoch's steps (or one chunk of them) as one dispatch over
        device-resident data.

        ``rngs`` is [S] keys, ``idx``/``row_valid`` are [S, B] plans from
        :func:`~flow_timesnet_tpu.data.device_windows.epoch_index_plan`.
        ``step_offset`` (chunked epochs) is the chunk's first global step
        index, used only for in-program per-step key derivation.
        """

        if self.accum_steps != 1:
            raise ValueError("device-resident training requires accumulation_steps == 1")
        if not hasattr(self, "_train_epoch_resident"):
            self._train_epoch_resident = jax.jit(
                self._train_epoch_resident_impl, donate_argnums=self._donate
            )
        return self._train_epoch_resident(
            state, lr, rngs, staged, idx, row_valid, step_offset
        )

    def gather_staged_batch(self, staged, flat_idx, row_valid, rng=None):
        """One-off device gather (init batch, period telemetry).

        Always gathers the CLEAN windows: augmentation (which needs a PRNG
        key) belongs to the training scan, not to one-off probes.
        """

        if not hasattr(self, "_gather_one"):
            from .data.device_windows import gather_batch

            self._gather_one = jax.jit(
                lambda s, i, rv: gather_batch(
                    s, i, rv, None, with_y_mark=(self.cfg.mode != "direct")
                )
            )
        return self._gather_one(
            _strip_augment(staged), jnp.asarray(flat_idx), jnp.asarray(row_valid)
        )

    def _evaluate_resident_impl(self, params, staged, idx, row_valid):
        """Whole validation pass as one scan; accumulators stay on device.

        One dispatch and ONE host fetch per eval pass instead of six scalar
        round-trips per batch (VERDICT r2 #5/#7).
        """

        from .data.device_windows import gather_batch

        def body(carry, xs):
            flat, rv = xs
            batch = gather_batch(
                staged, flat, rv, None, with_y_mark=(self.cfg.mode != "direct")
            )
            out = self._eval_step_impl(params, batch)
            return (
                carry[0] + out[0],
                carry[1] + out[1],
                carry[2] + out[2],
                carry[3] + out[3],
                carry[4] + out[4],
                carry[5] + out[5],
            ), None

        zeros = (
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros(self.num_series, jnp.float32),
            jnp.zeros(self.num_series, jnp.float32),
        )
        totals, _ = jax.lax.scan(body, zeros, (idx, row_valid))
        return totals

    def evaluate_resident(
        self, params, staged, idx, row_valid, max_dispatch_steps: int = 0
    ) -> Dict[str, Any]:
        if not hasattr(self, "_evaluate_resident"):
            self._evaluate_resident = jax.jit(self._evaluate_resident_impl)
        n_steps = int(idx.shape[0])
        if max_dispatch_steps and n_steps > max_dispatch_steps:
            # the scan carry is six pure sums, so chunked dispatches compose
            # by addition — same watchdog bound as the chunked train epoch
            parts = []
            off = 0
            while off < n_steps:
                end = min(off + max_dispatch_steps, n_steps)
                parts.append(
                    self._evaluate_resident(
                        params, staged, idx[off:end], row_valid[off:end]
                    )
                )
                off = end
            fetched = [jax.device_get(p) for p in parts]
            out = tuple(sum(vals) for vals in zip(*fetched))
        else:
            out = jax.device_get(self._evaluate_resident(params, staged, idx, row_valid))
        nll_num, nll_den, s_sum, s_cnt, ws_sums, ws_cnts = out
        return {
            "nll": _safe_ratio(nll_num, nll_den),
            "smape": _safe_ratio(s_sum, s_cnt),
            "series_sums": np.asarray(ws_sums),
            "series_cnts": np.asarray(ws_cnts),
        }

    # -- evaluation ---------------------------------------------------------------

    def _eval_step_impl(self, params, batch):
        y = batch["y"]
        if self.cfg.mode == "direct":
            rate, dispersion = self._forward_impl(
                params,
                batch["x"],
                batch.get("x_mark"),
                batch.get("static"),
                batch.get("ids"),
                batch.get("floor"),
                batch.get("row_valid"),
                deterministic=True,
            )
        else:
            rate, dispersion = self._rollout_impl(
                params,
                batch["x"],
                batch.get("x_mark"),
                batch.get("y_mark"),
                batch.get("static"),
                batch.get("ids"),
                batch.get("floor"),
                horizon=int(y.shape[1]),
                row_valid=batch.get("row_valid"),
            )
        rate = rate[:, : y.shape[1], :]
        dispersion = dispersion[:, : y.shape[1], :]
        base = _base_mask(y, batch["mask"], batch.get("row_valid"), self.use_loss_masking)
        nbm = negative_binomial_mask(y, rate, dispersion, base)
        nb_loss = negative_binomial_nll(y, rate, dispersion, nbm)
        # an all-masked batch contributes (0, 0) — a fabricated full-size
        # denominator would deflate the streamed aggregate; the final
        # num/den division already guards den > 0
        denom = nbm.astype(jnp.float32).sum()
        maskf = nbm.astype(y.dtype)
        y_eval = y * maskf
        rate_eval = rate * maskf
        smape_s, smape_c = smape_batch_sums(y_eval, rate_eval)
        if batch.get("ids") is not None:
            sid = batch["ids"].astype(jnp.int32)
        else:
            sid = jnp.broadcast_to(
                jnp.arange(y.shape[2], dtype=jnp.int32)[None], (y.shape[0], y.shape[2])
            )
        ws_sums, ws_cnts = wsmape_batch_sums(y_eval, rate_eval, sid, self.num_series)
        return (
            nb_loss * denom,
            denom,
            smape_s,
            smape_c,
            ws_sums,
            ws_cnts,
        )

    def eval_step(self, params, batch):
        return self._eval_step(params, batch)

    def evaluate(self, params, batches) -> Dict[str, float]:
        """Stream eval metrics over an iterable of device-ready batches.

        Accumulators stay on device across the pass (async adds, no per-batch
        host sync); ONE fetch at the end — the host-path counterpart of
        :meth:`evaluate_resident` (VERDICT r2 #7). Accumulation is float32 on
        device (same as the resident pass), replacing the old float64 host
        accumulation; deltas are ~1e-7 relative at realistic batch counts.
        """

        totals = None
        for batch in batches:
            out = self.eval_step(params, batch)
            totals = (
                out
                if totals is None
                else jax.tree_util.tree_map(lambda a, b: a + b, totals, out)
            )
        if totals is None:
            # an empty eval stream must not masquerade as a perfect score
            return {
                "nll": float("inf"),
                "smape": float("inf"),
                "series_sums": np.zeros(self.num_series, np.float32),
                "series_cnts": np.zeros(self.num_series, np.float32),
            }
        nll_num, nll_den, s_sum, s_cnt, ws_sums, ws_cnts = jax.device_get(totals)
        return {
            "nll": _safe_ratio(nll_num, nll_den),
            "smape": _safe_ratio(s_sum, s_cnt),
            "series_sums": np.asarray(ws_sums, np.float32),
            "series_cnts": np.asarray(ws_cnts, np.float32),
        }


def batch_to_host(batch, floor=None) -> Dict[str, Any]:
    """WindowBatch -> dict of HOST numpy arrays (None-preserving).

    For mesh runs: hand this straight to ``shard_batch`` so the batch pays
    ONE sharded H2D transfer — routing through :func:`batch_to_device` first
    would upload unsharded, sync a D2H copy back, and upload again. Dtypes
    match what ``jnp.asarray`` would produce under disabled x64 (f32/i32).
    """

    def f32(a):
        return None if a is None else np.asarray(a, np.float32)

    out = {
        "x": f32(batch.x),
        "y": f32(batch.y),
        "mask": f32(batch.mask),
        "row_valid": f32(batch.row_valid),
        "x_mark": f32(batch.x_mark),
        "y_mark": f32(batch.y_mark),
        "static": f32(batch.static),
        "ids": (
            np.asarray(batch.series_ids, np.int32)
            if batch.series_ids is not None
            else None
        ),
    }
    if floor is not None:
        out["floor"] = f32(floor)
    return out


def batch_to_device(batch, floor=None) -> Dict[str, Any]:
    """WindowBatch -> dict of jnp arrays (None-preserving)."""

    out = {
        "x": jnp.asarray(batch.x),
        "y": jnp.asarray(batch.y),
        "mask": jnp.asarray(batch.mask),
        "row_valid": jnp.asarray(batch.row_valid),
    }
    out["x_mark"] = jnp.asarray(batch.x_mark) if batch.x_mark is not None else None
    out["y_mark"] = jnp.asarray(batch.y_mark) if batch.y_mark is not None else None
    out["static"] = jnp.asarray(batch.static) if batch.static is not None else None
    out["ids"] = jnp.asarray(batch.series_ids) if batch.series_ids is not None else None
    if floor is not None:
        out["floor"] = jnp.asarray(floor)
    return out
