"""TimesBlock: weighted period-fold inception residuals (flax.linen).

Re-design of the reference ``InceptionBranch`` / ``InceptionBlock`` /
``TimesBlock`` (``/root/reference/src/timesnet_forecast/models/timesnet.py:
560-1101``) on top of the masked dilated-tap convolution in
:mod:`flow_timesnet_tpu.ops.fold`. All selected periods are processed in one
candidate-batched ``[K, B, Lp, C]`` program; the grouping/weighting semantics
of the reference's PeriodGrouper are reproduced by
:func:`flow_timesnet_tpu.models.period.group_periods`.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..ops.fold import (
    DenseFoldGeometry,
    FoldGeometry,
    combine_residuals,
    dense_fold_conv,
    make_dense_geometry,
    make_geometry,
    pad_time,
    pointwise_conv,
)
from ..ops.fold import tap_conv as tap_conv_xla
from .embedding import torch_bias_init, torch_kernel_init
from .period import PeriodSelection, amplitudes_at_bins, group_periods, jax_softmax_safe


def resolve_tap_conv(use_pallas: bool):
    """Select the fold-conv backend (Pallas kernel vs XLA tap formulation)."""

    if use_pallas:
        from ..ops.pallas_fold import tap_conv_pallas

        return tap_conv_pallas
    return tap_conv_xla


def _activation(name: str):
    if name.lower() == "relu":
        return nn.relu
    # exact (erf) GELU — torch nn.GELU default; jax defaults to tanh-approx
    return lambda x: nn.gelu(x, approximate=False)


class InceptionBranch(nn.Module):
    """One conv path: plain (kh, kw) conv, or 1x1 -> (kh, kw) -> 1x1 bottleneck.

    ``compute_dtype="bfloat16"`` keeps every matmul input (including the big
    tap stack) in bf16 with fp32 accumulation — without it the fp32 kernel
    params silently promote the whole stack to fp32 (2x HBM, slower MXU).
    """

    in_ch: int
    out_ch: int
    kernel_size: Tuple[int, int]
    bottleneck_ratio: float = 1.0
    use_pallas: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, h: Array, geom: FoldGeometry) -> Array:
        kh, kw = self.kernel_size
        # frozen-period fast path: static geometry -> dense mask-free conv
        if isinstance(geom, DenseFoldGeometry):
            tap_conv = dense_fold_conv
        else:
            tap_conv = resolve_tap_conv(self.use_pallas)
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        if self.bottleneck_ratio <= 0:
            raise ValueError("bottleneck_ratio must be a positive value")
        if math.isclose(self.bottleneck_ratio, 1.0, rel_tol=1e-9, abs_tol=1e-9):
            kernel = self.param(
                "conv_kernel", torch_kernel_init(), (kh, kw, self.in_ch, self.out_ch)
            )
            bias = self.param(
                "conv_bias", torch_bias_init(self.in_ch * kh * kw), (self.out_ch,)
            )
            return tap_conv(h.astype(dt), geom, kernel, bias, kh, kw)
        base = min(self.in_ch, self.out_ch)
        mid = max(1, int(math.ceil(base / float(self.bottleneck_ratio))))
        w_in = self.param("reduce_kernel", torch_kernel_init(), (self.in_ch, mid))
        b_in = self.param("reduce_bias", torch_bias_init(self.in_ch), (mid,))
        w_mid = self.param("conv_kernel", torch_kernel_init(), (kh, kw, mid, mid))
        b_mid = self.param("conv_bias", torch_bias_init(mid * kh * kw), (mid,))
        w_out = self.param("expand_kernel", torch_kernel_init(), (mid, self.out_ch))
        b_out = self.param("expand_bias", torch_bias_init(mid), (self.out_ch,))
        h = pointwise_conv(h.astype(dt), w_in, b_in).astype(dt)
        h = tap_conv(h, geom, w_mid, b_mid, kh, kw).astype(dt)
        return pointwise_conv(h, w_out, b_out)


class InceptionBlock(nn.Module):
    """Multi-kernel branches -> concat -> 1x1 proj -> act -> dropout -> +res."""

    in_ch: int
    out_ch: int
    kernel_set: Tuple[Tuple[int, int], ...]
    dropout: float
    activation: str = "gelu"
    bottleneck_ratio: float = 1.0
    use_pallas: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, h: Array, geom: FoldGeometry, deterministic: bool = True) -> Array:
        if not self.kernel_set:
            raise ValueError("kernel_set must contain at least one kernel size")
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        if self.in_ch != self.out_ch:
            w_res = self.param("res_kernel", torch_kernel_init(), (self.in_ch, self.out_ch))
            b_res = self.param("res_bias", torch_bias_init(self.in_ch), (self.out_ch,))
            res = pointwise_conv(h.astype(dt), w_res, b_res)
        else:
            res = h
        feats = [
            InceptionBranch(
                in_ch=self.in_ch,
                out_ch=self.out_ch,
                kernel_size=(int(kh), int(kw)),
                bottleneck_ratio=self.bottleneck_ratio,
                use_pallas=self.use_pallas,
                compute_dtype=self.compute_dtype,
                name=f"branch_{i}",
            )(h, geom).astype(dt)
            for i, (kh, kw) in enumerate(self.kernel_set)
        ]
        z = jnp.concatenate(feats, axis=-1)
        cat_ch = self.out_ch * len(self.kernel_set)
        w_proj = self.param("proj_kernel", torch_kernel_init(), (cat_ch, self.out_ch))
        b_proj = self.param("proj_bias", torch_bias_init(cat_ch), (self.out_ch,))
        # Cast to the compute dtype BEFORE the activation so its saved
        # residual (and the dropout product) stay bf16 in mixed precision;
        # no-op in float32 mode.
        z = pointwise_conv(z, w_proj, b_proj).astype(dt)
        z = _activation(self.activation)(z)
        z = nn.Dropout(self.dropout)(z, deterministic=deterministic)
        return z + res.astype(z.dtype)


def resolve_period_buckets(raw, seq_len: int, p_cap: int) -> Tuple[int, ...]:
    """Resolve the static period-cap ladder for bucketed compilation.

    ``None``/falsy -> single full-cap program. ``"auto"`` -> caps at
    ``ceil(L/4)`` and ``ceil(L/2)`` (weekly-ish periods on daily data land in
    the smallest bucket). An iterable of ints is used verbatim. The ladder is
    deduplicated, clipped to ``p_cap`` and always terminated by ``p_cap``.
    """

    if not raw:
        return (p_cap,)
    if isinstance(raw, str):
        text = raw.strip().lower()
        if text in ("", "off", "none", "false", "0"):
            return (p_cap,)
        if text == "auto":
            caps = [-(-seq_len // 4), -(-seq_len // 2)]
        else:
            try:
                caps = [int(tok) for tok in text.replace(",", " ").split()]
            except ValueError:
                return (p_cap,)
    else:
        try:
            caps = [int(c) for c in raw]
        except TypeError:
            caps = [int(raw)]
    ladder = sorted({c for c in caps if 0 < c < p_cap})
    return tuple(ladder) + (p_cap,)


class TimesBlock(nn.Module):
    """Period-fold residual block on [B, L, d_model] features.

    For each grouped period candidate: fold, run the two-stage inception
    stack (d_model -> d_ff -> d_model with a mid activation), compute the
    residual delta against the folded input, and softmax-weight candidates by
    their FFT amplitudes. Conv compute runs in float32 (the reference's
    default conv island, timesnet.py:1047-1062); when ``conv_dtype`` is
    bfloat16 the taps matmuls use bf16 inputs with f32 accumulation (the
    TIMES_MP_CONV analog).

    ``period_buckets`` (static cap ladder) compiles one conv program per cap
    and dispatches with ``lax.cond`` on the max *valid* period: a step whose
    periods fit a small cap runs on a fold extent ``Lp = L + cap`` instead of
    the worst-case ``L + (L - 1)``, cutting the tap-conv FLOPs/HBM traffic by
    up to ~2x at flagship shapes. All branches share parameters; results are
    identical because candidates clamped by a too-small cap are exactly the
    invalid (zero-weight) ones.
    """

    d_model: int
    d_ff: int
    kernel_set: Tuple[Tuple[int, int], ...]
    dropout: float
    activation: str = "gelu"
    bottleneck_ratio: float = 1.0
    min_period: int = 1
    max_period: int = 10_000
    p_cap: int = 10_000  # static bound on candidate periods (min(pmax, L-1))
    log_base: Optional[float] = None
    max_unique: Optional[int] = None
    conv_dtype: str = "float32"
    use_pallas: bool = False
    period_buckets: object = None
    # Trace-time period specialization (``model.freeze_periods``): a static
    # tuple of per-slot ``(canonical_period, freq_bin, valid)`` triples taken
    # from telemetry after warmup. When set, the block skips the dynamic
    # selector/grouper entirely and runs a dense mask-free fold conv at each
    # unique period's EXACT extent; only the amplitude softmax weights stay
    # live, so the math is unchanged whenever the live selection equals the
    # frozen one (the trainer's drift probe falls back to the dynamic path
    # otherwise). Attacks the ~2x masked overcompute of the worst-case
    # ``Lp = L + cap`` fold (VERDICT r3 #1).
    frozen: object = None

    def setup(self) -> None:
        self.inception_in = InceptionBlock(
            in_ch=self.d_model,
            out_ch=self.d_ff,
            kernel_set=self.kernel_set,
            dropout=self.dropout,
            activation=self.activation,
            bottleneck_ratio=self.bottleneck_ratio,
            use_pallas=self.use_pallas,
            compute_dtype=self.conv_dtype,
        )
        self.inception_out = InceptionBlock(
            in_ch=self.d_ff,
            out_ch=self.d_model,
            kernel_set=self.kernel_set,
            dropout=self.dropout,
            activation=self.activation,
            bottleneck_ratio=self.bottleneck_ratio,
            use_pallas=self.use_pallas,
            compute_dtype=self.conv_dtype,
        )

    def _conv_deltas(
        self, x: Array, periods: Array, p_cap: int, deterministic: bool
    ) -> Array:
        """Per-candidate inception residual deltas [K, B, L, C] on the fold
        geometry capped at the static ``p_cap``."""

        B, L, C = x.shape
        K = int(periods.shape[0])
        geom = make_geometry(periods, L, p_cap)
        conv_dt = jnp.bfloat16 if self.conv_dtype == "bfloat16" else jnp.float32
        xg = pad_time(x.astype(jnp.float32), L, geom.Lp)
        h = jnp.broadcast_to(xg[None], (K, B, geom.Lp, C)).astype(conv_dt)
        h = self.inception_in(h, geom, deterministic).astype(conv_dt)
        h = _activation(self.activation)(h)
        h = self.inception_out(h, geom, deterministic)
        # Residual delta vs the folded input, cropped to the original length
        # (the zero-pad tail of the fold is discarded, timesnet.py:1063-1066).
        delta = h.astype(jnp.float32)[:, :, :L, :] - xg[None, :, :L, :]
        return delta.astype(x.dtype)

    def _frozen_forward(self, x: Array, deterministic: bool) -> Array:
        """Static-period fast path: dense exact-extent fold per unique period.

        Per-slot softmax weights stay live (computed from the input's
        amplitudes at the frozen bins); everything shape-determining is a
        Python constant, so XLA sees plain reshapes + dense convs.
        """

        B, L, C = x.shape
        slots = tuple(tuple(s) for s in self.frozen)
        valid = [(int(p), int(f)) for (p, f, v) in slots if v]
        uperiods = sorted({p for p, _ in valid})
        # Telemetry constants (same keys as the dynamic path so epoch
        # logging and the drift probe formatting keep working).
        self.sow(
            "intermediates", "selected_periods",
            jnp.asarray([int(p) for p, _, _ in slots], jnp.int32),
        )
        self.sow(
            "intermediates", "period_valid",
            jnp.asarray([bool(v) for _, _, v in slots], bool),
        )
        self.sow(
            "intermediates", "group_count",
            jnp.asarray(len(uperiods), jnp.int32),
        )
        self.sow(
            "intermediates", "freq_indices",
            jnp.asarray([int(f) for _, f, _ in slots], jnp.int32),
        )
        if not valid:
            return x

        amps = amplitudes_at_bins(x, tuple(f for _, f in valid))  # [B, V]
        w = jax_softmax_safe(amps, axis=1)  # [B, V] (all slots valid here)
        # aggregate slot weights onto their (unique) canonical periods
        wu = jnp.stack(
            [
                sum(w[:, i] for i, (p, _) in enumerate(valid) if p == u)
                for u in uperiods
            ],
            axis=1,
        )  # [B, U]

        conv_dt = jnp.bfloat16 if self.conv_dtype == "bfloat16" else jnp.float32
        x32 = x.astype(jnp.float32)
        deltas = []
        for u in uperiods:
            geom = make_dense_geometry(u, L)
            xg = pad_time(x32, L, geom.total)  # [B, total, C]
            h = xg[None].astype(conv_dt)  # [1, B, total, C]
            h = self.inception_in(h, geom, deterministic).astype(conv_dt)
            h = _activation(self.activation)(h)
            h = self.inception_out(h, geom, deterministic)
            delta = h.astype(jnp.float32)[0, :, :L, :] - x32[:, :L, :]
            deltas.append(delta.astype(x.dtype))
        return combine_residuals(jnp.stack(deltas), wu, x)

    def __call__(
        self,
        x: Array,
        selection: PeriodSelection,
        deterministic: bool = True,
        row_weight: Optional[Array] = None,
    ) -> Array:
        if x.ndim != 3:
            raise ValueError("TimesBlock expects input shaped [B, L, d_model]")
        B, L, C = x.shape
        if C != self.d_model:
            raise ValueError("Input channel dimension does not match configured d_model")
        if self.frozen is not None:
            return self._frozen_forward(x, deterministic)
        K = int(selection.periods.shape[0])
        if K == 0:
            return x

        grouped = group_periods(
            selection.periods,
            selection.amplitudes,
            selection.valid,
            seq_len=L,
            min_period=self.min_period,
            max_period=self.max_period,
            log_base=self.log_base,
            max_unique=self.max_unique,
            row_weight=row_weight,
        )
        # Telemetry (replaces the reference's module-attribute counters,
        # timesnet.py:714-720, 891-893): collected via
        # ``apply(..., mutable=['intermediates'])`` when observability is on.
        self.sow("intermediates", "selected_periods", grouped.periods)
        self.sow("intermediates", "period_valid", grouped.valid)
        self.sow("intermediates", "group_count", grouped.group_count)
        # the selector's rFFT bins: the freeze-periods snapshot needs them to
        # re-derive the live softmax weights from static-bin amplitudes
        self.sow("intermediates", "freq_indices", selection.freq_indices)
        p_cap = min(int(self.p_cap), max(1, L - 1))
        caps = resolve_period_buckets(self.period_buckets, L, p_cap)

        if len(caps) == 1:
            delta = self._conv_deltas(x, grouped.periods, caps[0], deterministic)
        else:
            # Dispatch on the largest period that actually contributes; all
            # branches share this module's parameters (nn.cond).
            pmax_valid = jnp.max(
                jnp.where(grouped.valid, grouped.periods, 1)
            ).astype(jnp.int32)

            def fn_for(cap: int):
                def fn(mdl: "TimesBlock", xx: Array, pp: Array) -> Array:
                    return mdl._conv_deltas(xx, pp, cap, deterministic)

                # Remat each branch: under autodiff, lax.cond branches must
                # emit the UNION of both branches' residuals, so without
                # remat the small-cap branch still materialises worst-case
                # buffers and bucketing loses (measured 34.4 vs 25.7 ms/step
                # on a v5e). With remat the residual is just the inputs and
                # the backward recomputes the taken branch at its own cap.
                return nn.remat(fn)

            branch = fn_for(caps[-1])
            for cap in reversed(caps[:-1]):
                def branch(mdl, xx, pp, _cap=cap, _small=fn_for(cap), _big=branch):
                    return nn.cond(pmax_valid <= _cap, _small, _big, mdl, xx, pp)

            delta = branch(self, x, grouped.periods)

        out = combine_residuals(delta, grouped.weights, x)
        # No valid periods -> identity (reference returns x, timesnet.py:796-797).
        return jnp.where(grouped.any_valid, out, x)
