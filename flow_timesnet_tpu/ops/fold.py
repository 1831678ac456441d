"""Period-fold 2D convolution as masked dilated taps — the TPU hot path.

The reference folds ``[B, L, C]`` into a data-dependent grid
``[B, C, cycles, p]`` (tail zero-padded to a multiple of the traced period
``p``) and runs Conv2d stacks over it
(``/root/reference/src/timesnet_forecast/models/timesnet.py:955-1101``).
A traced ``p`` makes that reshape impossible under jit, and padding to a
static ``[cycles_max, p_max]`` grid wastes up to ``L / p_min`` x the FLOPs.

Identity used here instead: for fold position ``t = c * p + j``, the Conv2d
neighbour ``(c + dc, j + dj)`` is time index ``t + dc * p + dj``. A 2D
convolution over the fold is therefore a sum over ``kh * kw`` taps of
time-shifted copies of the sequence, where a tap is valid iff

    0 <= (t mod p) + dj < p        (stays inside the period row)
    0 <= (t div p) + dc < cycles   (stays inside the cycle grid)

and invalid taps contribute zero — exactly Conv2d's implicit zero padding.
Everything stays ``[K, B, Lp, C]`` with static shapes; the shift by the traced
``dc * p`` is a batched ``dynamic_slice``; channel mixing is one large matmul
over the stacked taps, which is MXU-shaped.

Candidates are batched on a leading K axis so all periods from the selector
run in one fused program.

**Backward is a custom VJP** (not XLA's mechanical transpose): the adjoint of
a masked-shift convolution is the same masked-shift convolution with negated
shifts and mirrored masks — ``dL/dh[s] = sum_{dc,dj} mask'(s) *
ct[s - dc*p - dj] @ W[dc,dj]^T`` with ``mask'(s) = [0 <= col(s)-dj < p] *
[0 <= row(s)-dc < cycles]`` (change of variables ``s = t + dc*p + dj`` is a
bijection on valid taps). This keeps the backward in dynamic-slice + matmul
form; XLA's transpose of the forward would instead scatter-accumulate every
tap into large zero buffers (measured ~4.4x the forward on a v5e chip).
``dW`` rebuilds the forward tap stack (cheap recompute; saves the O(kh*kw)
stack from being kept as a residual) and contracts it with the cotangent in
one ``[kh*kw*Cin, K*B*Lp] x [K*B*Lp, Cout]`` matmul.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array, lax

# Above this tap-stack footprint the fold conv switches from one fused matmul
# to per-kernel-row accumulation (peak memory / kh). Overridable for tuning.
_FULL_STACK_BYTES_LIMIT = int(
    os.environ.get("FLOW_TIMESNET_TAP_STACK_BYTES", 192 * 1024 * 1024)
)


def _resolve_strategy(stack_bytes: int) -> str:
    """Pick the fold contraction strategy (same math, different HBM shape).

    ``stack``  — materialize one [K, B, Lp, kh*kw*Cin] tap stack, one matmul.
    ``rowsum`` — one [K, B, Lp, kw*Cin] stack per kernel row, accumulate.
    ``tapsum`` — no stack at all: one [Cin, Cout] matmul per tap, accumulated
                 in fp32. The bottlenecked branch input (~[K, B, Lp, mid]) is
                 small enough to stay VMEM-resident across taps, so this
                 trades the stack's HBM write+read for extra small matmuls —
                 the right trade when the step is bandwidth-bound.
    ``auto``   — stack below ``FLOW_TIMESNET_TAP_STACK_BYTES``, else rowsum
                 (the measured round-2/3 default).
    """

    s = os.environ.get("FLOW_TIMESNET_FOLD_STRATEGY", "auto").lower()
    if s == "auto":
        return "stack" if stack_bytes <= _FULL_STACK_BYTES_LIMIT else "rowsum"
    if s not in ("stack", "rowsum", "tapsum"):
        raise ValueError(f"Unknown FLOW_TIMESNET_FOLD_STRATEGY: {s!r}")
    return s


class FoldGeometry(NamedTuple):
    """Per-candidate fold geometry over a static padded time axis."""

    periods: Array  # [K] int32
    total: Array  # [K] int32 — L + pad (fold extent per candidate)
    cycles: Array  # [K] int32
    col: Array  # [K, Lp] int32 — t mod p
    row: Array  # [K, Lp] int32 — t div p
    Lp: int  # static padded length (>= max total)
    L: int  # original sequence length


def make_geometry(periods: Array, L: int, p_cap: int) -> FoldGeometry:
    """Precompute fold coordinates for each candidate period.

    ``p_cap`` is the static bound on periods (the selector clamps to
    ``min(pmax, L - 1)``), so ``Lp = L + p_cap`` covers every padded extent.
    Periods are clamped into ``[1, p_cap]`` — the tap shift machinery relies
    on this bound to keep every dynamic slice in range.
    """

    p = jnp.clip(periods.astype(jnp.int32), 1, max(1, int(p_cap)))
    pad = (-L) % p
    total = L + pad
    cycles = total // p
    Lp = L + max(1, int(p_cap))
    t = jnp.arange(Lp, dtype=jnp.int32)[None, :]
    col = t % p[:, None]
    row = t // p[:, None]
    return FoldGeometry(periods=p, total=total, cycles=cycles, col=col, row=row, Lp=Lp, L=L)


def pad_time(x: Array, L: int, Lp: int) -> Array:
    """Zero-pad [B, L, C] on the time axis to the static fold length Lp."""

    return jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))


def _fwd_mask(
    periods: Array, cycles: Array, col: Array, row: Array, dc: int, dj: int
) -> Array:
    """Forward tap validity at output position t: the Conv2d neighbour
    ``(row+dc, col+dj)`` stays inside the [cycles, p] grid. [K, Lp] bool."""

    row_ok = ((row + dc) >= 0) & ((row + dc) < cycles[:, None])
    col_ok = ((col + dj) >= 0) & ((col + dj) < periods[:, None])
    return row_ok & col_ok


def _bwd_mask(
    periods: Array, cycles: Array, col: Array, Lp: int, dc: int, dj: int
) -> Array:
    """Transposed tap validity at input position s (dc-independent).

    A forward tap (dc, dj) contributes ct[t] with t = s - dc*p - dj iff the
    forward mask held at t. Change of variables (dc*p = 0 mod p):
    col(t) = (col(s) - dj) mod p =: c', and row(t) + dc = floor((s - dj) / p),
    so the condition becomes ``0 <= c' + dj < p`` and
    ``0 <= floor((s - dj) / p) < cycles`` — no dc dependence, which lets the
    backward share one padded cotangent buffer across kernel rows exactly
    like the forward. (t outside [0, Lp) is handled by the buffer's zeros.)
    """

    p = periods[:, None]
    s_idx = jnp.arange(Lp, dtype=jnp.int32)[None, :]
    c2 = (col - dj) % p
    col_ok = ((c2 + dj) >= 0) & ((c2 + dj) < p)
    r2 = (s_idx - dj) // p  # floor division (numpy semantics)
    row_ok = (r2 >= 0) & (r2 < cycles[:, None])
    return col_ok & row_ok


def _row_taps(
    padded: Array,
    periods: Array,
    cycles: Array,
    col: Array,
    row: Array,
    dc: int,
    kw: int,
    Lp: int,
    m: int,
    sign: int,
) -> Array:
    """All kw masked taps for kernel row dc: [K, B, Lp, kw * C].

    ``sign=+1`` builds forward taps ``x[t + dc*p + dj]``; ``sign=-1`` builds
    the transposed taps ``x[t - dc*p - dj]`` with the adjoint masks.
    """

    return jnp.concatenate(
        [
            tap
            for _, tap in _iter_row_taps(
                padded, periods, cycles, col, row, dc, kw, Lp, m, sign
            )
        ],
        axis=-1,
    )


def _iter_row_taps(padded, periods, cycles, col, row, dc, kw, Lp, m, sign):
    """Yield ``(dj_index, masked tap [K, B, Lp, C])`` for kernel row dc."""

    rw = kw // 2
    starts = m + sign * dc * periods  # [K], in [0, 2m]

    def slice_one(hk: Array, s: Array) -> Array:
        return lax.dynamic_slice_in_dim(hk, s, Lp + 2 * rw, axis=1)

    h_dc = jax.vmap(slice_one)(padded, starts)  # [K, B, Lp + 2rw, C]
    for j, dj in enumerate(range(-rw, rw + 1)):
        tap = lax.slice_in_dim(h_dc, rw + sign * dj, rw + sign * dj + Lp, axis=2)
        if sign > 0:
            mask = _fwd_mask(periods, cycles, col, row, dc, dj)
        else:
            mask = _bwd_mask(periods, cycles, col, Lp, dc, dj)
        yield j, tap * mask[:, None, :, None].astype(tap.dtype)


def _tap_matmul(
    x: Array,
    periods: Array,
    cycles: Array,
    col: Array,
    row: Array,
    w_flat: Array,
    kh: int,
    kw: int,
    Lp: int,
    L: int,
    sign: int,
) -> Array:
    """sum_{dc} row_taps(dc) @ w_flat[dc] in float32 accumulation.

    ``w_flat``: [kh, kw * Cin, Cout], rows ordered dc = -rh..rh to match the
    tap stacking order. Strategy (see :func:`_resolve_strategy`) is a static
    HBM-shape trade-off: one [K, B, Lp, kh*kw*Cin] stack + a single big
    matmul, per-kernel-row stacks (peak memory / kh), or stack-free per-tap
    matmuls accumulated in fp32 (``tapsum`` — no stack traffic at all).
    """

    K, B, _, Cin = x.shape
    rh, rw = kh // 2, kw // 2
    m = rh * (Lp - L)
    padded = jnp.pad(x, ((0, 0), (0, 0), (m + rw, m + rw), (0, 0)))

    stack_bytes = K * B * Lp * kh * kw * Cin * x.dtype.itemsize
    w_dt = w_flat.astype(x.dtype)
    strategy = _resolve_strategy(stack_bytes)
    if strategy == "tapsum":
        w4 = w_dt.reshape(kh, kw, Cin, -1)
        out = None
        for i, dc in enumerate(range(-rh, rh + 1)):
            for j, tap in _iter_row_taps(
                padded, periods, cycles, col, row, dc, kw, Lp, m, sign
            ):
                term = jnp.einsum(
                    "kbtc,co->kbto", tap, w4[i, j],
                    preferred_element_type=jnp.float32,
                )
                out = term if out is None else out + term
        return out
    if strategy == "stack":
        full = jnp.concatenate(
            [
                _row_taps(padded, periods, cycles, col, row, dc, kw, Lp, m, sign)
                for dc in range(-rh, rh + 1)
            ],
            axis=-1,
        )
        return jnp.einsum(
            "kbtc,co->kbto",
            full,
            w_dt.reshape(kh * kw * Cin, -1),
            preferred_element_type=jnp.float32,
        )
    out = None
    for i, dc in enumerate(range(-rh, rh + 1)):
        taps = _row_taps(padded, periods, cycles, col, row, dc, kw, Lp, m, sign)
        term = jnp.einsum(
            "kbtc,co->kbto", taps, w_dt[i], preferred_element_type=jnp.float32
        )
        out = term if out is None else out + term
    return out


def _tap_weight_grad(
    h: Array,
    periods: Array,
    cycles: Array,
    col: Array,
    row: Array,
    ct: Array,
    kh: int,
    kw: int,
    Lp: int,
    L: int,
) -> Array:
    """dW[kh, kw, Cin, Cout] = sum_t forward_taps(h)[t] (x) ct[t]."""

    K, B, _, Cin = h.shape
    Cout = ct.shape[-1]
    rh, rw = kh // 2, kw // 2
    m = rh * (Lp - L)
    padded = jnp.pad(h, ((0, 0), (0, 0), (m + rw, m + rw), (0, 0)))
    stack_bytes = K * B * Lp * kh * kw * Cin * h.dtype.itemsize
    if _resolve_strategy(stack_bytes) == "tapsum":
        rows = [
            jnp.einsum("kbtc,kbto->co", tap, ct, preferred_element_type=jnp.float32)
            for dc in range(-rh, rh + 1)
            for _, tap in _iter_row_taps(
                padded, periods, cycles, col, row, dc, kw, Lp, m, 1
            )
        ]
        return jnp.stack(rows).reshape(kh, kw, Cin, Cout)
    rows = []
    for dc in range(-rh, rh + 1):
        taps = _row_taps(padded, periods, cycles, col, row, dc, kw, Lp, m, 1)
        rows.append(
            jnp.einsum("kbtc,kbto->co", taps, ct, preferred_element_type=jnp.float32)
        )
    return jnp.stack(rows).reshape(kh, kw, Cin, Cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _tap_conv(h, periods, cycles, col, row, kernel, bias, kh, kw, Lp, L):
    w_flat = kernel.reshape(kh, kw * h.shape[-1], -1)
    out = _tap_matmul(h, periods, cycles, col, row, w_flat, kh, kw, Lp, L, 1)
    return out + bias.astype(out.dtype)


def _tap_conv_fwd(h, periods, cycles, col, row, kernel, bias, kh, kw, Lp, L):
    out = _tap_conv(h, periods, cycles, col, row, kernel, bias, kh, kw, Lp, L)
    return out, (h, periods, cycles, col, row, kernel)


def _tap_conv_bwd(kh, kw, Lp, L, res, ct):
    h, periods, cycles, col, row, kernel = res
    Cin = h.shape[-1]
    Cout = kernel.shape[-1]
    ct_dt = ct.astype(h.dtype)
    # dh: the transposed masked-shift conv (negated shifts, mirrored masks),
    # contracted with W reordered to [kh, kw * Cout, Cin].
    w_t = jnp.transpose(kernel, (0, 1, 3, 2)).reshape(kh, kw * Cout, Cin)
    dh = _tap_matmul(
        ct_dt, periods, cycles, col, row, w_t, kh, kw, Lp, L, -1
    ).astype(h.dtype)
    dw = _tap_weight_grad(h, periods, cycles, col, row, ct_dt, kh, kw, Lp, L)
    dw = dw.astype(kernel.dtype)
    db = ct.sum(axis=(0, 1, 2)).astype(ct.dtype)
    return dh, None, None, None, None, dw, db


_tap_conv.defvjp(_tap_conv_fwd, _tap_conv_bwd)


def tap_conv(
    h: Array,
    geom: FoldGeometry,
    kernel: Array,
    bias: Array,
    kh: int,
    kw: int,
) -> Array:
    """Fold-grid Conv2d with 'same' zero padding via masked time-shifted taps.

    Args:
        h: [K, B, Lp, Cin] candidate-batched features (garbage beyond each
            candidate's fold extent is fine — masks never read it).
        geom: fold geometry from :func:`make_geometry`.
        kernel: [kh, kw, Cin, Cout] (HWIO, rows = cycle axis, cols = period axis).
        bias: [Cout].

    Returns: [K, B, Lp, Cout] in float32 accumulation. The matmuls run in
    ``h.dtype`` (bf16 islands when the caller casts) with fp32 accumulation.
    """

    return _tap_conv(
        h, geom.periods, geom.cycles, geom.col, geom.row, kernel, bias,
        kh, kw, geom.Lp, geom.L,
    )


class DenseFoldGeometry(NamedTuple):
    """Static fold geometry for ONE trace-time-constant period.

    Used by the frozen-period fast path (``model.freeze_periods``): when the
    selected periods are known constants, the fold is a plain reshape to the
    exact ``[cycles, period]`` grid and the conv runs dense and mask-free at
    the exact extent ``total = L + (-L) % p`` — no worst-case ``Lp = L + cap``
    padding, no mask multiplies, no dynamic slices. Same math as the masked
    tap path whenever the live selection equals the frozen one (the masked
    path IS Conv2d-with-zero-padding over this very grid; see the module
    docstring identity).
    """

    period: int
    cycles: int
    total: int
    L: int


def make_dense_geometry(period: int, L: int) -> DenseFoldGeometry:
    p = max(1, int(period))
    total = L + (-L) % p
    return DenseFoldGeometry(period=p, cycles=total // p, total=total, L=int(L))


def dense_fold_conv(
    h: Array,
    geom: DenseFoldGeometry,
    kernel: Array,
    bias: Array,
    kh: int,
    kw: int,
) -> Array:
    """Exact-extent fold Conv2d for one static period.

    ``h``: [K=1, B, total, Cin] (the leading singleton keeps the call
    signature interchangeable with :func:`tap_conv` inside the inception
    stack). Reshapes to the [B, cycles, period, Cin] grid and runs one
    ``lax.conv_general_dilated`` with SAME zero padding — identical to the
    reference's fold + Conv2d (reference timesnet.py:955-1101) and to the
    masked tap formulation, with zero overcompute. Output in float32
    accumulation like :func:`tap_conv`.
    """

    K, B, total, Cin = h.shape
    grid = h.reshape(K * B, geom.cycles, geom.period, Cin)
    # conv runs in h.dtype (bf16 islands keep MXU-shaped inputs; the MXU
    # still accumulates in f32 internally). NOTE: preferred_element_type
    # cannot widen here — conv_general_dilated's transpose rule rejects a
    # f32 cotangent against bf16 operands — so the f32 bias-add happens on
    # the converted output instead (grad of the convert handles the cast).
    out = lax.conv_general_dilated(
        grid,
        kernel.astype(h.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out.reshape(K, B, total, -1).astype(jnp.float32)
    return out + bias.astype(out.dtype)


def fold_conv(h: Array, geom, kernel: Array, bias: Array, kh: int, kw: int) -> Array:
    """Geometry-dispatching fold conv: masked taps or dense static-period."""

    if isinstance(geom, DenseFoldGeometry):
        return dense_fold_conv(h, geom, kernel, bias, kh, kw)
    return tap_conv(h, geom, kernel, bias, kh, kw)


def pointwise_conv(h: Array, kernel: Array, bias: Array) -> Array:
    """1x1 conv == per-position channel matmul. kernel: [Cin, Cout].

    Runs on the MXU in ``h.dtype`` with fp32 accumulation.
    """

    out = jnp.einsum(
        "kbtc,co->kbto", h, kernel.astype(h.dtype),
        preferred_element_type=jnp.float32,
    )
    return out + bias.astype(out.dtype)


def combine_residuals(
    deltas: Array,
    weights: Array,
    x: Array,
) -> Array:
    """Weighted sum of per-candidate residuals onto the input.

    deltas: [K, B, L, C]; weights: [B, K]; returns x + sum_k w[b,k] delta_k.
    """

    combined = jnp.einsum(
        "kblc,bk->blc", deltas, weights.astype(deltas.dtype),
        preferred_element_type=jnp.float32,
    )
    return x + combined.astype(x.dtype)
