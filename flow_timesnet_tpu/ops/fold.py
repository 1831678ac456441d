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
"""

from __future__ import annotations

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

    Returns: [K, B, Lp, Cout] in float32 accumulation.
    """

    K, B, Lp, Cin = h.shape
    Cout = kernel.shape[-1]
    rh, rw = kh // 2, kw // 2

    # One padded buffer serves every row shift: p <= p_cap = Lp - L bounds
    # |dc * p| by rh * (Lp - L); the static column shifts need rw more on
    # each side.
    m = rh * (geom.Lp - geom.L)
    padded = jnp.pad(h, ((0, 0), (0, 0), (m + rw, m + rw), (0, 0)))
    window = Lp + 2 * rw

    def row_taps(dc: int):
        """All kw masked taps for kernel row dc: [K, B, Lp, kw*Cin]."""

        starts = m + dc * geom.periods  # [K], in [0, 2m]

        def slice_one(hk: Array, s: Array) -> Array:
            return lax.dynamic_slice_in_dim(hk, s, window, axis=1)

        h_dc = jax.vmap(slice_one)(padded, starts)  # [K, B, Lp + 2rw, Cin]
        row_ok = ((geom.row + dc) >= 0) & ((geom.row + dc) < geom.cycles[:, None])
        taps = []
        for dj in range(-rw, rw + 1):
            tap = lax.slice_in_dim(h_dc, rw + dj, rw + dj + Lp, axis=2)
            col_ok = ((geom.col + dj) >= 0) & ((geom.col + dj) < geom.periods[:, None])
            mask = (row_ok & col_ok)[:, None, :, None]  # [K, 1, Lp, 1]
            taps.append(tap * mask.astype(tap.dtype))
        return jnp.concatenate(taps, axis=-1)

    # Strategy is a static size trade-off: one [K, B, Lp, kh*kw*Cin] stack +
    # a single big matmul compiles much faster and fuses best, but its
    # footprint grows kh-fold; above the threshold we accumulate one kernel
    # row at a time (same math, peak memory / kh — matters at long context).
    stack_bytes = K * B * Lp * kh * kw * Cin * h.dtype.itemsize
    if stack_bytes <= _FULL_STACK_BYTES_LIMIT:
        full = jnp.concatenate([row_taps(dc) for dc in range(-rh, rh + 1)], axis=-1)
        out = jnp.einsum(
            "kbtc,co->kbto",
            full,
            kernel.reshape(kh * kw * Cin, Cout),
            preferred_element_type=jnp.float32,
        )
    else:
        w = kernel.reshape(kh, kw * Cin, Cout)
        out = jnp.zeros((K, B, Lp, Cout), jnp.float32)
        for i, dc in enumerate(range(-rh, rh + 1)):
            out = out + jnp.einsum(
                "kbtc,co->kbto", row_taps(dc), w[i], preferred_element_type=jnp.float32
            )
    return out + bias.astype(out.dtype)


def pointwise_conv(h: Array, kernel: Array, bias: Array) -> Array:
    """1x1 conv == per-position channel matmul. kernel: [Cin, Cout]."""

    out = jnp.einsum("kbtc,co->kbto", h, kernel, preferred_element_type=jnp.float32)
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
