"""TimesNet top-level model (flax.linen).

TPU-first re-design of the reference ``TimesNet``
(``/root/reference/src/timesnet_forecast/models/timesnet.py:1374-2102``).
Key deltas from the reference (see SURVEY.md §7.1):

- **No lazy building.** Every dimension (``c_in``, ``static_dim``,
  ``time_features``, ``id_vocab``) is an explicit static field; parameters are
  created once by ``init``. The 700-line ``_ensure_embedding`` mutation pass
  disappears.
- **Fully jitted forward.** The shared FFT selector runs once per forward and
  feeds every block; grouping is static-shape masked math; there is no
  data-dependent Python control flow, ``.item()`` host sync, or module
  mutation anywhere.
- The per-series dispersion floor (``min_sigma_vector`` buffer in the
  reference, timesnet.py:1474-1477) is an explicit ``dispersion_floor``
  argument; artifacts persist it next to the params.

Interface parity: ``[B, T >= input_len, N] -> (rate, dispersion)`` both
``[B, out_steps, N]`` with ``out_steps = pred_len`` (direct) or 1 (recursive
training); heads are zero-initialised and ``forecast_time_proj`` is
initialised to copy-last-step so the initial forecast is
``softplus(last value + history tail)`` (timesnet.py:1460-1466, 2076-2085).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..ops.softplus import softplus20
from .embedding import (
    DataEmbedding,
    LayerNorm32,
    LowRankTemporalContext,
    dense,
    resolve_embed_norm_mode,
)
from .period import (
    PeriodSelection,
    resolve_log_base,
    resolve_max_unique,
    select_periods,
)
from .timesblock import TimesBlock


def _hashable_buckets(raw):
    """Module fields must be hashable: coerce list-like bucket specs."""

    if isinstance(raw, (list, set)):
        return tuple(int(c) for c in raw)
    return raw


@dataclass(frozen=True)
class TimesNetConfig:
    """Static model hyper-parameters + data dimensions (known pre-init)."""

    input_len: int
    pred_len: int
    d_model: int = 128
    d_ff: Optional[int] = None
    n_layers: int = 2
    k_periods: int = 2
    kernel_set: Tuple[Tuple[int, int], ...] = ((3, 3), (5, 5), (7, 7))
    dropout: float = 0.1
    activation: str = "gelu"
    mode: str = "direct"
    bottleneck_ratio: float = 1.0
    min_period_threshold: int = 1
    use_checkpoint: bool = False
    use_embedding_norm: bool = True
    embed_norm_mode: Optional[str] = None
    min_sigma: float = 1e-3
    id_embed_dim: int = 32
    static_proj_dim: Optional[int] = None
    static_layernorm: bool = True
    use_zero_mean_context: bool = False
    context_rank: int = 0
    context_scale: float = 1e-2
    use_constant_context_bias: bool = False
    use_late_bias_head: bool = True
    # data dimensions (explicit — no lazy building)
    c_in: int = 1
    static_dim: int = 0
    time_features: int = 0
    id_vocab: int = 1
    # period grouping knobs (per-depth schedules accepted, see period.py)
    period_max_unique: object = None
    period_binning: object = None
    compute_dtype: str = "float32"
    use_pallas: bool = False
    # bucketed fold compilation: None | "auto" | iterable of static period
    # caps — see models/timesblock.py::resolve_period_buckets
    period_buckets: object = None
    # static upper bound on considered periods (None = input_len, the
    # reference's fixed pmax, timesnet.py:1437-1441). Tightening it shrinks
    # the padded fold extent Lp = L + cap, cutting tap-conv FLOPs/HBM traffic
    # when the data's dominant periods are known to be short (e.g. weekly
    # cycles on daily retail data). Longer candidates are clamped to the cap
    # exactly like the reference clamps to pmax.
    period_cap: Optional[int] = None
    # Trace-time period specialization (``train.freeze_periods``): per-layer
    # tuples of (canonical_period, freq_bin, valid) slot triples snapshotted
    # from telemetry after warmup. When set, each TimesBlock runs the dense
    # exact-extent fold path (see models/timesblock.py) instead of the
    # dynamic selector + masked tap conv. Parameters are identical either
    # way, so the trainer can swap mid-run.
    frozen_periods: object = None

    def __post_init__(self) -> None:
        if self.mode not in ("direct", "recursive"):
            raise ValueError("mode must be 'direct' or 'recursive'")
        if self.d_ff is not None and self.d_ff <= 0:
            raise ValueError("d_ff must be a positive integer")
        if self.bottleneck_ratio <= 0:
            raise ValueError("bottleneck_ratio must be a positive value")
        if self.id_embed_dim < 0:
            raise ValueError("id_embed_dim must be non-negative")
        if self.context_rank < 0:
            raise ValueError("context_rank must be non-negative")

    @property
    def out_steps(self) -> int:
        return self.pred_len if self.mode == "direct" else 1

    @property
    def hidden_ff(self) -> int:
        return self.d_ff if self.d_ff is not None else self.d_model

    @property
    def context_dim(self) -> int:
        static_out = 0
        if self.static_dim > 0:
            static_out = self.static_proj_dim if self.static_proj_dim else self.static_dim
        id_out = self.id_embed_dim if self.id_embed_dim > 0 else 0
        return static_out + id_out

    def with_vocab(self, id_vocab: int) -> "TimesNetConfig":
        return replace(self, id_vocab=int(id_vocab))


class TimesNet(nn.Module):
    """FFT-period TimesNet with NegBin (rate, dispersion) heads."""

    cfg: TimesNetConfig

    @nn.compact
    def __call__(
        self,
        x: Array,
        x_mark: Optional[Array] = None,
        series_static: Optional[Array] = None,
        series_ids: Optional[Array] = None,
        dispersion_floor: Optional[Array] = None,
        deterministic: bool = True,
        row_valid: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        cfg = self.cfg
        if x.ndim != 3:
            raise ValueError("TimesNet expects input shaped [B, T, N]")
        B, T, N = x.shape
        if T < cfg.input_len:
            raise ValueError(
                f"Input sequence length {T} is shorter than required input_len {cfg.input_len}"
            )
        if N != cfg.c_in:
            raise ValueError("Number of series differs from configured c_in")
        L = cfg.input_len
        x_val = x[:, -L:, :]
        marks = x_mark[:, -L:, :] if x_mark is not None else None
        target_steps = cfg.out_steps

        # ------------------------------------------------------------------
        # Context: static covariates + series-id embedding
        # ------------------------------------------------------------------
        context = None
        if cfg.static_dim > 0 and series_static is not None:
            if series_static.ndim == 2:
                static_in = jnp.broadcast_to(
                    series_static[None], (B,) + series_static.shape
                )
            elif series_static.ndim == 3:
                static_in = series_static
            else:
                raise ValueError("series_static must have shape [N, F] or [B, N, F]")
            proj_dim = cfg.static_proj_dim if cfg.static_proj_dim else cfg.static_dim
            sp = dense(proj_dim, cfg.static_dim, name="static_proj")(
                static_in.astype(x_val.dtype)
            )
            if cfg.static_layernorm:
                sp = LayerNorm32(proj_dim, name="static_norm")(sp)
            context = sp
        if cfg.id_embed_dim > 0:
            if series_ids is None:
                ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
            else:
                ids = series_ids
                if ids.ndim == 1:
                    ids = ids[None]
                if ids.shape[0] == 1 and B > 1:
                    ids = jnp.broadcast_to(ids, (B, N))
            emb = nn.Embed(
                cfg.id_vocab,
                cfg.id_embed_dim,
                embedding_init=nn.initializers.normal(stddev=1.0),
                name="series_embedding",
            )(ids.astype(jnp.int32))
            context = emb if context is None else jnp.concatenate([context, emb], axis=-1)

        if context is not None:
            ctx_dim = context.shape[-1]
            context = LayerNorm32(ctx_dim, name="context_norm")(context)
            if cfg.use_zero_mean_context and cfg.context_rank > 0:
                coeff = dense(
                    cfg.context_rank, ctx_dim, name="context_coeff", zero_init=True
                )(context.astype(jnp.float32))
                signal = LowRankTemporalContext(
                    rank=cfg.context_rank,
                    init_scale=cfg.context_scale,
                    name="temporal_context",
                )(coeff, L)
                x_feat = x_val + signal.astype(x_val.dtype)
            else:
                x_feat = x_val
            if cfg.use_constant_context_bias:
                bias = dense(1, ctx_dim, name="context_proj", zero_init=True)(
                    context.astype(jnp.float32)
                )[..., 0]
                x_feat = x_feat + bias.astype(x_feat.dtype)[:, None, :]
        else:
            x_feat = x_val

        # ------------------------------------------------------------------
        # Embedding + copy-last history baseline
        # ------------------------------------------------------------------
        features = DataEmbedding(
            c_in=cfg.c_in,
            d_model=cfg.d_model,
            dropout=cfg.dropout,
            time_features=cfg.time_features,
            embed_norm_mode=resolve_embed_norm_mode(
                cfg.use_embedding_norm, cfg.embed_norm_mode
            ),
            name="embedding",
        )(x_feat, marks, deterministic=deterministic)

        hist_steps = min(target_steps, L)
        history_tail = x_val[:, -hist_steps:, :]
        if hist_steps < target_steps:
            pad = jnp.broadcast_to(
                history_tail[:, -1:, :], (B, target_steps - hist_steps, N)
            )
            history_tail = jnp.concatenate([history_tail, pad], axis=1)

        # ------------------------------------------------------------------
        # Shared period selection + TimesBlock stack
        # ------------------------------------------------------------------
        pmax = L  # reference: FFTPeriodSelector(pmax=input_len) (timesnet.py:1437-1441)
        if cfg.period_cap is not None:
            pmax = min(pmax, max(1, int(cfg.period_cap)))
        min_thresh = min(pmax, max(1, cfg.min_period_threshold))

        # ``row_valid`` masks DP-padding rows out of the batch-coupled period
        # statistics (selector batch mean + grouper scores): a padded batch
        # must select exactly what the unpadded batch would.
        seq = features
        layer_norm = LayerNorm32(cfg.d_model, name="layer_norm")
        residual_dropout = nn.Dropout(cfg.dropout)
        p_cap = min(pmax, max(1, L - 1))
        frozen_spec = None
        if cfg.frozen_periods is not None:
            frozen_spec = tuple(
                tuple(tuple(slot) for slot in layer) for layer in cfg.frozen_periods
            )
            if len(frozen_spec) != cfg.n_layers:
                raise ValueError(
                    "frozen_periods must carry one slot tuple per layer "
                    f"(got {len(frozen_spec)} for n_layers={cfg.n_layers})"
                )
        for i in range(cfg.n_layers):
            frozen_i = frozen_spec[i] if frozen_spec is not None else None
            block = TimesBlock(
                d_model=cfg.d_model,
                d_ff=cfg.hidden_ff,
                kernel_set=cfg.kernel_set,
                dropout=cfg.dropout,
                activation=cfg.activation,
                bottleneck_ratio=cfg.bottleneck_ratio,
                min_period=min_thresh,
                max_period=pmax,
                p_cap=p_cap,
                log_base=resolve_log_base(cfg.period_binning, i),
                max_unique=resolve_max_unique(cfg.period_max_unique, i),
                conv_dtype=cfg.compute_dtype,
                use_pallas=cfg.use_pallas,
                period_buckets=_hashable_buckets(cfg.period_buckets),
                frozen=frozen_i,
                name=f"blocks_{i}",
            )

            def run_block(mdl, feat, rv, _frozen=frozen_i):
                # frozen mode skips the live FFT selector entirely — the
                # block re-derives softmax weights from static-bin amplitudes
                sel = (
                    None
                    if _frozen is not None
                    else select_periods(
                        feat, cfg.k_periods, pmax, min_thresh, row_weight=rv
                    )
                )
                return mdl(
                    feat,
                    sel,
                    deterministic=deterministic,
                    row_weight=rv,
                )

            if cfg.use_checkpoint:
                updated = nn.remat(run_block)(block, seq, row_valid)
            else:
                updated = run_block(block, seq, row_valid)
            delta = updated - seq
            seq = seq + residual_dropout(delta, deterministic=deterministic)
            seq = layer_norm(seq)

        # ------------------------------------------------------------------
        # Forecast heads
        # ------------------------------------------------------------------
        # Time projection Linear(input_len -> pred_len), copy-last-step init:
        # kernel zero except the last input row (timesnet.py:1460-1466).
        def _copy_last_kernel(key, shape, dtype=jnp.float32):
            kernel = jnp.zeros(shape, dtype)
            return kernel.at[-1, :].set(1.0)

        time_proj = nn.Dense(
            cfg.pred_len,
            kernel_init=_copy_last_kernel,
            bias_init=nn.initializers.zeros,
            name="forecast_time_proj",
        )
        seq_bn = jnp.swapaxes(seq, 1, 2)  # [B, D, L]
        baseline_bn = time_proj(seq_bn)  # [B, D, pred_len]
        if target_steps != cfg.pred_len:
            baseline_bn = baseline_bn[:, :, -target_steps:]
        baseline_hidden = jnp.swapaxes(baseline_bn, 1, 2)  # [B, out_steps, D]

        mu = dense(cfg.c_in, cfg.d_model, name="mu_head", zero_init=True)(baseline_hidden)
        rate_preact = mu + history_tail.astype(mu.dtype)

        if context is not None and cfg.use_late_bias_head:
            c = LayerNorm32(context.shape[-1], name="late_bias_norm")(
                context.astype(jnp.float32)
            )
            late = dense(target_steps, context.shape[-1], name="late_bias_head",
                         zero_init=True)(c)  # [B, N, out_steps]
            late = jnp.swapaxes(late, 1, 2)  # [B, out_steps, N]
            gate = self.param(
                "late_bias_gate",
                lambda key: jnp.full((1, target_steps, 1), 0.05, jnp.float32),
            )
            rate_preact = rate_preact + (gate * late).astype(rate_preact.dtype)

        rate = softplus20(rate_preact.astype(jnp.float32)).astype(rate_preact.dtype) + 1e-6

        sigma = dense(cfg.c_in, cfg.d_model, name="sigma_head", zero_init=True)(
            baseline_hidden
        )
        sigma_sp = softplus20(sigma.astype(jnp.float32)).astype(sigma.dtype)
        if dispersion_floor is not None:
            # Accepts a scalar, an [N] / [1,1,N] per-series vector, or a
            # per-sample [B,1,1] floor (gathered by series id upstream). The
            # reference stores a [1,1,N] buffer but silently truncates it to
            # width 1 whenever c_in == 1 (timesnet.py:1777-1784), losing the
            # per-series floors in the per-series-sample pipeline; gathering
            # per sample applies them as intended.
            floor = jnp.asarray(dispersion_floor, sigma_sp.dtype)
            if floor.ndim == 1:
                floor = floor.reshape(1, 1, -1)
            floor = jnp.broadcast_to(floor, sigma_sp.shape)
        else:
            floor = jnp.full_like(sigma_sp, cfg.min_sigma)
        dispersion = sigma_sp + floor + 1e-6
        return rate, dispersion
