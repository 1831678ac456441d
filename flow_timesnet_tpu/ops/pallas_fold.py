"""Pallas TPU kernel for the masked dilated-tap fold convolution.

Fuses what the XLA path in :mod:`flow_timesnet_tpu.ops.fold` expresses as
(pad -> K dynamic slices -> tap-stack materialisation -> one big matmul) into
a single VMEM-resident kernel: per (candidate, batch-tile) grid cell, the
padded sequence block is loaded once, every (dc, dj) tap is sliced out of
VMEM with its fold-validity mask computed from iota, and partial MXU dots
accumulate straight into the output block. The traced per-candidate period
and cycle counts arrive via scalar prefetch, so the tap offsets are computed
in SMEM before the body runs.

Numerics are identical to :func:`flow_timesnet_tpu.ops.fold.tap_conv`
(float32 accumulation); tests run the kernel in interpreter mode on CPU.

Enable per model via ``model.use_pallas`` (default off: the XLA tap
formulation is already MXU-shaped, and remote-compile TPU relays may not
support Mosaic kernel compilation at all — validate on your deployment
before flipping the default).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fold import FoldGeometry


def _kernel_vmem_bytes(
    b: int, lpad: int, lp: int, cin: int, cout: int, kw: int
) -> int:
    """Estimated scoped-VMEM footprint of one grid cell (fp32 everywhere).

    Counts the double-buffered input/output blocks plus the kernel-body
    intermediates (the kw-tap concat and the fp32 accumulator). Observed
    failure mode when underestimated: the TPU compiler rejects the kernel
    with a scoped-vmem stack OOM (22.1M vs the 16M limit at b=128 on the
    flagship shape), surfacing as an opaque HTTP 500 through remote-compile
    relays — so this stays deliberately conservative.
    """

    io_blocks = 2 * (b * lpad * cin) + 2 * (b * lp * cout)  # double-buffered
    body = b * lp * kw * cin + b * lp * cout  # tap concat + accumulator
    return 4 * (io_blocks + body)


def _pick_b_tile(
    B: int,
    lpad: int,
    lp: int,
    cin: int,
    cout: int,
    kw: int,
    budget_bytes: int = 10 * 1024 * 1024,
) -> int:
    """Largest divisor of B whose full kernel footprint fits the budget."""

    best = 1
    for cand in range(1, B + 1):
        if B % cand:
            continue
        if _kernel_vmem_bytes(cand, lpad, lp, cin, cout, kw) <= budget_bytes:
            best = cand
    return best


@functools.partial(
    jax.jit, static_argnames=("kh", "kw", "L", "Lp", "interpret", "b_tile", "sign")
)
def _tap_conv_pallas_impl(
    h: Array,
    periods: Array,
    cycles: Array,
    kernel: Array,
    bias: Array,
    *,
    kh: int,
    kw: int,
    L: int,
    Lp: int,
    interpret: bool,
    b_tile: int,
    sign: int = 1,
) -> Array:
    """``sign=+1``: forward taps ``x[t + dc*p + dj]`` with the fold-validity
    masks. ``sign=-1``: the adjoint — taps ``x[s - dc*p - dj]`` with the
    transposed masks (``ops.fold._bwd_mask``), used by the Pallas backward
    for dL/dh. Same kernel body either way; only shift directions and the
    mask formula differ (VERDICT r2 #9)."""

    K, B, _, Cin = h.shape
    Cout = kernel.shape[-1]
    rh, rw = kh // 2, kw // 2
    m = rh * (Lp - L)  # max |dc * p| given p <= p_cap = Lp - L
    pad = m + rw
    h_pad = jnp.pad(h, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    Lpad = Lp + 2 * pad
    S = kh * kw
    # weights laid out as [kh, kw*Cin, Cout] so each kernel row is one wide dot
    w = kernel.reshape(kh, kw * Cin, Cout).astype(jnp.float32)
    b_vec = bias.reshape(1, Cout).astype(jnp.float32)

    def kern(periods_ref, cycles_ref, h_ref, w_ref, b_ref, out_ref):
        k = pl.program_id(0)
        p = periods_ref[k]
        cyc = cycles_ref[k]
        t = jax.lax.broadcasted_iota(jnp.int32, (Lp, 1), 0)
        col = t % p
        row = t // p

        # Rolled loop over kernel rows (dc) keeps the Mosaic program small —
        # the fully unrolled variant OOMs the compiler at 7x7 — while the kw
        # taps inside a row are fused into one [b*Lp, kw*Cin] x [kw*Cin, Cout]
        # MXU dot (wide contraction, few iterations).
        def body(i, acc):
            dc = i - rh
            start = pad + sign * dc * p - rw
            if sign > 0:
                row_ok = ((row + dc) >= 0) & ((row + dc) < cyc)
            taps = []
            for j in range(kw):  # static, small
                dj = j - rw
                if sign > 0:
                    col_ok = ((col + dj) >= 0) & ((col + dj) < p)
                    mask = (row_ok & col_ok).astype(jnp.float32)  # [Lp, 1]
                else:
                    # transposed masks (ops.fold._bwd_mask): dc-independent
                    c2 = (col - dj) % p
                    col_ok = ((c2 + dj) >= 0) & ((c2 + dj) < p)
                    r2 = (t - dj) // p
                    mask = (col_ok & (r2 >= 0) & (r2 < cyc)).astype(jnp.float32)
                tap = h_ref[0, :, pl.ds(start + rw + sign * dj, Lp), :]
                taps.append(tap.astype(jnp.float32) * mask[None, :, :])
            stack = jnp.concatenate(taps, axis=-1)  # [b_tile, Lp, kw*Cin]
            return acc + jax.lax.dot_general(
                stack.reshape(b_tile * Lp, kw * Cin),
                w_ref[i],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            0, kh, body, jnp.zeros((b_tile * Lp, Cout), jnp.float32)
        )
        out_ref[0] = (acc + b_ref[0][None, :]).reshape(b_tile, Lp, Cout)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, B // b_tile),
        in_specs=[
            pl.BlockSpec(
                (1, b_tile, Lpad, Cin),
                lambda k, b, *refs: (k, b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kh, kw * Cin, Cout), lambda k, b, *refs: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, Cout), lambda k, b, *refs: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, b_tile, Lp, Cout), lambda k, b, *refs: (k, b, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    flops = 2 * K * B * Lp * S * Cin * Cout
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, B, Lp, Cout), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=h_pad.size * 4 + w.size * 4 + K * B * Lp * Cout * 4,
            transcendentals=0,
        ),
    )(periods.astype(jnp.int32), cycles.astype(jnp.int32), h_pad, w, b_vec)


# Differentiation: pallas_call has no automatic VJP, so the op carries a
# custom one — forward through the fused kernel, backward through the XLA tap
# formulation (whose gradients XLA derives and fuses itself).


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _tap_conv_op(h, periods, cycles, kernel, bias, kh, kw, L, Lp, interpret, b_tile):
    return _tap_conv_pallas_impl(
        h, periods, cycles, kernel, bias,
        kh=kh, kw=kw, L=L, Lp=Lp, interpret=interpret, b_tile=b_tile,
    )


def _tap_conv_fwd(h, periods, cycles, kernel, bias, kh, kw, L, Lp, interpret, b_tile):
    out = _tap_conv_op(h, periods, cycles, kernel, bias, kh, kw, L, Lp, interpret, b_tile)
    return out, (h, periods, kernel, bias)


def _tap_conv_bwd(kh, kw, L, Lp, interpret, b_tile, residuals, g):
    import os

    from .fold import make_geometry, tap_conv as tap_conv_xla

    h, periods, kernel, bias = residuals
    geom = make_geometry(periods, L, p_cap=Lp - L)
    zero_i = np.zeros(periods.shape, dtype=jax.dtypes.float0)

    if os.environ.get("FLOW_TIMESNET_PALLAS_BWD"):
        # dL/dh through the SAME Pallas kernel with negated shifts and
        # transposed masks (the adjoint derivation in ops/fold.py's module
        # docstring); dW/db stay in XLA — the tap-stack outer product is one
        # big matmul XLA already fuses well (VERDICT r2 #9 experiment).
        from .fold import _tap_weight_grad

        ct = g.astype(jnp.float32)
        K, B, _, Cout = ct.shape
        Cin = h.shape[-1]
        w_t = jnp.transpose(kernel, (0, 1, 3, 2)).astype(jnp.float32)  # [kh,kw,Cout,Cin]
        rh, rw = kh // 2, kw // 2
        pad = rh * (Lp - L) + rw
        bt = _pick_b_tile(B, Lp + 2 * pad, Lp, Cout, Cin, kw)
        dh = _tap_conv_pallas_impl(
            ct, periods, geom.cycles, w_t, jnp.zeros((Cin,), jnp.float32),
            kh=kh, kw=kw, L=L, Lp=Lp, interpret=interpret, b_tile=bt, sign=-1,
        )
        dkernel = _tap_weight_grad(
            h.astype(jnp.float32), geom.periods, geom.cycles, geom.col, geom.row,
            ct, kh, kw, Lp, L,
        ).astype(kernel.dtype)
        dbias = g.sum(axis=(0, 1, 2)).astype(bias.dtype)
        return dh.astype(h.dtype), zero_i, zero_i, dkernel, dbias

    def ref(h_, kernel_, bias_):
        return tap_conv_xla(h_, geom, kernel_, bias_, kh, kw)

    _, vjp = jax.vjp(ref, h, kernel, bias)
    dh, dkernel, dbias = vjp(g.astype(jnp.float32))
    return dh.astype(h.dtype), zero_i, zero_i, dkernel, dbias


_tap_conv_op.defvjp(_tap_conv_fwd, _tap_conv_bwd)


def tap_conv_pallas(
    h: Array,
    geom: FoldGeometry,
    kernel: Array,
    bias: Array,
    kh: int,
    kw: int,
    interpret: Optional[bool] = None,
    b_tile: Optional[int] = None,
) -> Array:
    """Drop-in replacement for :func:`ops.fold.tap_conv` backed by Pallas."""

    K, B, Lp, Cin = h.shape
    if h.dtype == jnp.bfloat16:
        # The kernel accumulates in fp32 anyway; bf16 VMEM loads crash the
        # Mosaic compiler on remote-compile relays (observed: tpu_compile_helper
        # exit 1 on every bf16 variant, fp32 fine), so upcast at entry.
        h = h.astype(jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    rh, rw = kh // 2, kw // 2
    pad = rh * (geom.Lp - geom.L) + rw
    if b_tile is None:
        b_tile = _pick_b_tile(
            B, Lp + 2 * pad, Lp, Cin, int(kernel.shape[-1]), kw
        )
    return _tap_conv_op(
        h,
        geom.periods,
        geom.cycles,
        kernel,
        bias,
        kh,
        kw,
        geom.L,
        geom.Lp,
        bool(interpret),
        int(b_tile),
    )
