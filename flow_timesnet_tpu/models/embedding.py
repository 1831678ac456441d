"""Embedding-layer building blocks (flax.linen).

Re-designs of the reference modules in
``/root/reference/src/timesnet_forecast/models/timesnet.py``:
``PositionalEmbedding`` (1104-1129), ``RMSNorm`` (1132-1159), fp32 norm
helpers (1162-1197), ``DataEmbedding`` (1200-1325) and
``LowRankTemporalContext`` (1328-1371). All normalisations compute in float32
and cast back, matching the reference's mixed-precision islands; parameter
initialisers mirror torch defaults so training dynamics are comparable.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import Array
from jax import random as jrandom


# ---------------------------------------------------------------------------
# torch-default initialisers
# ---------------------------------------------------------------------------


def torch_kernel_init() -> Callable:
    """kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)); fan_in = prod(shape[:-1])."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = 1
        for d in shape[:-1]:
            fan_in *= d
        bound = 1.0 / math.sqrt(max(1, fan_in))
        return jrandom.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(max(1, fan_in))
        return jrandom.uniform(key, shape, dtype, -bound, bound)

    return init


def dense(features: int, in_features: int, name: Optional[str] = None,
          zero_init: bool = False) -> nn.Dense:
    """torch-initialised Dense (or zero-initialised for baseline heads)."""

    if zero_init:
        kernel_init = nn.initializers.zeros
        bias_init = nn.initializers.zeros
    else:
        kernel_init = torch_kernel_init()
        bias_init = torch_bias_init(in_features)
    return nn.Dense(features, kernel_init=kernel_init, bias_init=bias_init, name=name)


# ---------------------------------------------------------------------------
# Normalisation in float32 islands
# ---------------------------------------------------------------------------


class LayerNorm32(nn.Module):
    """LayerNorm with float32 internal compute (torch eps default 1e-5)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        orig = x.dtype
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=-1, keepdims=True)
        var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
        normed = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        weight = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return (normed * weight + bias).astype(orig)


class RMSNorm(nn.Module):
    """Root-mean-square norm with affine scale and bias (float32 compute)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if x.shape[-1] != self.dim:
            raise ValueError("RMSNorm dimension mismatch")
        orig = x.dtype
        x32 = x.astype(jnp.float32)
        variance = (x32**2).mean(axis=-1, keepdims=True)
        normed = x32 * jnp.reciprocal(jnp.sqrt(variance + self.eps))
        weight = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return (normed * weight + bias).astype(orig)


# ---------------------------------------------------------------------------
# Positional / temporal context signals
# ---------------------------------------------------------------------------


def positional_encoding(length: int, d_model: int, dtype=jnp.float32) -> Array:
    """Deterministic sinusoidal encoding [L, d_model] (float32 compute)."""

    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((length, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    n_cos = pe[:, 1::2].shape[1]
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term[:n_cos]))
    return pe.astype(dtype)


def lrtc_basis(length: int, rank: int) -> Array:
    """DCT-II cosine basis [L, R], column zero-meaned and L2-normalised.

    Under jit this is a trace-time constant — XLA folds it, replacing the
    reference's host-side cache (timesnet.py:1341-1360).
    """

    steps = jnp.arange(length, dtype=jnp.float32)[:, None]
    freqs = jnp.arange(1, rank + 1, dtype=jnp.float32)[None, :]
    basis = jnp.cos(math.pi / float(length) * (steps + 0.5) * freqs)
    basis = basis - basis.mean(axis=0, keepdims=True)
    norm = jnp.linalg.norm(basis, axis=0, keepdims=True)
    eps = jnp.finfo(jnp.float32).eps
    return basis / jnp.clip(norm, eps, None)


class LowRankTemporalContext(nn.Module):
    """Zero-mean rank-R temporal context with a learnable scalar scale."""

    rank: int
    init_scale: float = 1e-2

    @nn.compact
    def __call__(self, coeff: Array, length: int) -> Array:
        if coeff.ndim != 3 or coeff.shape[-1] != self.rank:
            raise ValueError("LowRankTemporalContext expects coeff shaped [B, N, R]")
        basis = lrtc_basis(length, self.rank).astype(coeff.dtype)
        context = jnp.einsum("lr,bnr->bln", basis, coeff)
        context = context - context.mean(axis=1, keepdims=True)
        scale = self.param(
            "scale",
            lambda key: jnp.asarray(float(self.init_scale), jnp.float32),
        )
        return context * scale.astype(coeff.dtype)


# ---------------------------------------------------------------------------
# DataEmbedding
# ---------------------------------------------------------------------------

_VALID_NORM_MODES = ("none", "layer", "rms", "decoupled")


class DataEmbedding(nn.Module):
    """value Dense + sinusoidal positional (+ optional temporal Dense).

    ``embed_norm_mode``:
      - ``decoupled`` (default): ``value + gate * LayerNorm(pos + temporal)``
        with a learnable gate initialised to 0.1;
      - ``layer`` / ``rms``: normalise the summed embedding;
      - ``none``: plain sum.
    """

    c_in: int
    d_model: int
    dropout: float
    time_features: int = 0
    embed_norm_mode: str = "decoupled"

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_mark: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        if x.ndim != 3:
            raise ValueError("DataEmbedding expects input shaped [B, L, C]")
        mode = self.embed_norm_mode
        if mode not in _VALID_NORM_MODES:
            raise ValueError(
                f"embed_norm_mode must be one of {sorted(_VALID_NORM_MODES)}, got {mode!r}"
            )
        B, L, _ = x.shape
        value = dense(self.d_model, self.c_in, name="value_embedding")(x)
        pos = positional_encoding(L, self.d_model, dtype=value.dtype)[None]
        if self.time_features > 0 and x_mark is not None:
            temporal = dense(self.d_model, self.time_features, name="temporal_embedding")(
                x_mark.astype(value.dtype)
            )
            aux = pos + temporal
        else:
            aux = jnp.broadcast_to(pos, value.shape)

        if mode == "decoupled":
            aux_normed = LayerNorm32(self.d_model, name="aux_norm")(aux)
            gate = self.param(
                "gate",
                lambda key: jnp.full((1, 1, self.d_model), 0.1, jnp.float32),
            )
            out = value + gate.astype(value.dtype) * aux_normed
        else:
            out = value + aux
            if mode == "layer":
                out = LayerNorm32(self.d_model, name="norm")(out)
            elif mode == "rms":
                out = RMSNorm(self.d_model, name="norm")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


def resolve_embed_norm_mode(use_norm: bool, embed_norm_mode: Optional[str]) -> str:
    """Reference precedence: explicit mode wins; else decoupled iff use_norm."""

    if embed_norm_mode is None:
        return "decoupled" if use_norm else "none"
    mode = str(embed_norm_mode).lower()
    if mode not in _VALID_NORM_MODES:
        raise ValueError(
            f"embed_norm_mode must be one of {sorted(_VALID_NORM_MODES)}, got {embed_norm_mode!r}"
        )
    return mode
