"""Training pipeline: ``train_once(cfg) -> (best_nll, artifact_paths)``.

Pipeline parity with the reference orchestrator
(``/root/reference/src/timesnet_forecast/train.py:768-1675``): CSV -> schema
-> pivot (validity mask = pre-fill NaNs) -> static features -> leak-free
scaler fit -> holdout/rolling window batchers -> min-sigma calibration ->
model -> AdamW + warmup/cosine epoch schedule -> early stopping on val NLL ->
artifact save (checkpoint, scaler.pkl, schema.json, config_used.yaml,
metadata.json, model_signature.json).

TPU-native deltas: the whole step (forward+loss+backward+update) is one
compiled program; evaluation streams masked reductions on device; AMP /
GradScaler / CUDA-graphs / channels-last knobs are replaced by jit and the
bf16 ``model.compute_dtype`` policy; dataloader workers are replaced by the
vectorised window gather.
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
import pandas as pd

from .build import timesnet_config_from_dict
from .config import PipelineConfig, save_yaml
from .data.pivot import (
    fit_series_scaler,
    pivot_long_to_wide,
    read_long_pivot,
    transform_dataframe,
)
from .data.schema import DataSchema, extract_schema_overrides
from .data.device_windows import epoch_index_plan, stage_windows
from .data.split import make_holdout_slices, make_rolling_slices
from .data.static_features import compute_series_features
from .data.windows import Prefetcher, build_batcher, pad_batch_rows
from .engine import Engine, batch_to_device, batch_to_host
from .optim import LRController, resolve_warmup
from .parallel.mesh import (
    device_snapshot,
    host_fetch,
    make_mesh,
    put_global,
    replicated,
    shard_batch,
    shard_train_state,
    sync_frozen_spec,
)
from .utils import artifacts as artifacts_io
from .utils import metadata as metadata_utils
from .utils.logging import console, print_config
from .utils.metrics import wsmape_from_series_sums
from .utils.seed import seed_everything


def masked_std(
    arrays: List[np.ndarray],
    masks: List[Optional[np.ndarray]],
    method: str = "global",
) -> Tuple[float, Optional[np.ndarray]]:
    """Std summary over masked [T, N] arrays.

    ``global`` pools every valid point; ``per_series_median`` returns the
    median of per-series stds plus the per-series vector (reference
    ``train.py:447-566``).
    """

    if len(arrays) == 0:
        return 0.0, None
    method = method.lower()
    if method == "global":
        total = total_sq = 0.0
        count = 0
        for arr, mask in zip(arrays, masks):
            if arr.size == 0:
                continue
            values = arr.reshape(-1) if mask is None else arr[np.asarray(mask) > 0.0]
            if values.size == 0:
                continue
            v64 = values.astype(np.float64)
            total += float(v64.sum())
            total_sq += float(np.square(v64).sum())
            count += int(values.size)
        if count == 0:
            return 0.0, None
        mean = total / count
        return float(math.sqrt(max(total_sq / count - mean * mean, 0.0))), None

    if method == "per_series_median":
        n_series: Optional[int] = None
        s = ss = c = None
        for arr, mask in zip(arrays, masks):
            arr2d = np.asarray(arr)
            if arr2d.ndim == 1:
                arr2d = arr2d.reshape(-1, 1)
            if arr2d.size == 0:
                continue
            if mask is None:
                mb = np.ones(arr2d.shape, dtype=bool)
            else:
                mask_arr = np.asarray(mask)
                if mask_arr.shape != arr2d.shape:
                    raise ValueError(
                        "Mask shape must match array shape for per-series std computation"
                    )
                mb = mask_arr > 0.0
            if not np.any(mb):
                continue
            a64 = arr2d.astype(np.float64)
            mf = mb.astype(np.float64)
            if n_series is None:
                n_series = arr2d.shape[1]
                s = np.zeros(n_series)
                ss = np.zeros(n_series)
                c = np.zeros(n_series)
            elif n_series != arr2d.shape[1]:
                raise ValueError("All arrays must have the same number of series")
            s += (a64 * mf).sum(axis=0)
            ss += (np.square(a64) * mf).sum(axis=0)
            c += mf.sum(axis=0)
        if n_series is None:
            return 0.0, None
        per = np.zeros(n_series)
        valid = c > 0
        if not np.any(valid):
            return 0.0, per
        means = np.where(valid, s / np.maximum(c, 1.0), 0.0)
        variances = np.where(valid, np.maximum(ss / np.maximum(c, 1.0) - means**2, 0.0), 0.0)
        per = np.sqrt(variances)
        per[~valid] = 0.0
        stds = per[valid]
        return float(np.median(stds)), per

    raise ValueError(
        f"Unsupported min_sigma_method '{method}'. Expected 'global' or 'per_series_median'."
    )


def periods_to_day_counts(periods: List[int], freq: Optional[str]) -> List[Optional[float]]:
    """Convert period step counts to ~days using the pandas frequency."""

    if not freq:
        return [None for _ in periods]
    try:
        offset = pd.tseries.frequencies.to_offset(freq)
    except (TypeError, ValueError):
        return [None for _ in periods]
    nanos: Optional[int] = None
    try:
        nanos = int(getattr(offset, "nanos"))
    except (TypeError, AttributeError, ValueError):
        delta = getattr(offset, "delta", None)
        if delta is not None:
            try:
                nanos = int(pd.to_timedelta(delta).value)
            except (TypeError, ValueError):
                nanos = None
    if not nanos:
        return [None for _ in periods]
    day_scale = nanos / pd.Timedelta(days=1).value
    return [p * day_scale for p in periods]


def _log_period_telemetry(telemetry: Dict[str, Any], freq: Optional[str], epoch: int) -> None:
    all_periods = sorted(
        {
            int(p)
            for info in telemetry.values()
            for p, ok in zip(info["periods"], info["valid"])
            if ok
        }
    )
    if not all_periods:
        return
    days = periods_to_day_counts(all_periods, freq)
    parts = []
    for p, d in zip(all_periods, days):
        if d is None:
            parts.append(f"{p}")
        elif abs(d - round(d)) < 1e-6:
            parts.append(f"{p} (~{int(round(d))}d)")
        else:
            parts.append(f"{p} (~{d:.2f}d)")
    groups = ", ".join(f"{k}:{v['group_count']}" for k, v in sorted(telemetry.items()))
    console().print(
        f"[cyan]Epoch {epoch}: selected periods {', '.join(parts)} (groups {groups})[/cyan]"
    )


def _floor_for_batch(batch, sigma_vector: Optional[np.ndarray]):
    """Per-sample dispersion floor gathered by series id."""

    if sigma_vector is None:
        return None
    if batch.series_ids is None:
        return None
    gathered = sigma_vector[batch.series_ids.reshape(-1)]
    return gathered.reshape(-1, 1, 1).astype(np.float32)


def _pin_platform(device_req: Optional[str]) -> None:
    """Honor ``train.device: cpu`` (reference ``_select_device`` analogue).

    Best effort: platform selection only takes effect before the first
    backend initialisation in the process; afterwards JAX keeps whatever is
    live (a warning is not worth raising — tests pin the platform up front).
    """

    if str(device_req or "").lower() == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001 - backend already initialised
            pass
    # every product entry point routes through here — piggyback the
    # persistent compile cache so repeat CLI runs stop re-paying XLA
    # compiles that bench/tests already cache
    from .utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()


def _log_device_memory(tag: str) -> None:
    """Print per-device HBM usage (reference ``model.debug_memory`` analogue).

    The reference prints ``torch.cuda.memory_allocated`` when
    ``model.debug_memory`` is set (``models/timesnet.py:2016-2020``); the TPU
    runtime exposes the same information via ``Device.memory_stats()``. CPU
    backends return ``None`` — silently skipped so the knob is safe anywhere.
    """

    for dev in jax.local_devices():
        try:
            stats = dev.memory_stats()
        except Exception:  # noqa: BLE001 - backend without memory introspection
            stats = None
        if not stats:
            continue
        in_use = stats.get("bytes_in_use", 0) / 1e6
        peak = stats.get("peak_bytes_in_use", 0) / 1e6
        limit = stats.get("bytes_limit", 0) / 1e6
        console().print(
            f"[cyan]mem[{tag}] {dev.platform}:{dev.id} "
            f"in_use={in_use:.1f}MB peak={peak:.1f}MB limit={limit:.0f}MB[/cyan]"
        )


def _stage_from_batcher(batcher, sigma_vector, *, device_put=jax.device_put):
    """Stage a :class:`WindowBatcher`'s sources on device.

    Reuses the batcher's own (already filtered, already feature-computed)
    sources so the flat-index semantics of the device plan are identical to
    the host iterator's. Returns ``None`` for an empty batcher.
    """

    sources = batcher.sources
    if not sources:
        return None
    s0 = sources[0]
    return stage_windows(
        [s.X for s in sources],
        [s.M for s in sources],
        s0.L,
        s0.H,
        s0.stride,
        "direct",  # s0.H already encodes the mode's horizon
        marks=[s.marks for s in sources],
        static=s0.static,
        sigma_vector=sigma_vector,
        augment={"add_noise_std": s0.add_noise_std, "time_shift": s0.time_shift},
        device_put=device_put,
    )


def _staged_nbytes(batcher) -> int:
    sources = batcher.sources
    if not sources:
        return 0
    t_max = max(s.T for s in sources)
    per_fold = t_max * sources[0].N * 4 * 2  # X + M
    if sources[0].marks is not None:
        per_fold += t_max * sources[0].marks.shape[1] * 4
    return per_fold * len(sources)


def train_once(
    cfg: PipelineConfig | Dict[str, Any],
    epoch_hook: Optional[Any] = None,
) -> Tuple[float, Dict[str, Any]]:
    # ``epoch_hook(epoch, selection_value) -> bool`` is called after every
    # epoch's validation; returning True stops training early (the tuner's
    # pruner — optuna MedianPruner analogue for the in-repo sampler). It is
    # a Python callable, so it rides as a keyword, never through the config.
    #
    # ``train.debug_nans`` flips a process-global jax.config flag; restore it
    # on every exit so one debug run cannot leak de-optimized NaN checking
    # into subsequent predict/tune work in the same process.
    prev_debug_nans = bool(jax.config.jax_debug_nans)
    try:
        return _train_once_impl(cfg, epoch_hook=epoch_hook)
    finally:
        jax.config.update("jax_debug_nans", prev_debug_nans)
        # a mid-epoch exception (e.g. the finite-loss guard) must not leave
        # the profiler trace running for the rest of the process (HPO loops
        # call train_once repeatedly); stop_trace raises when no trace is
        # active, which is the normal case
        try:
            jax.profiler.stop_trace()
        except Exception:  # noqa: BLE001 - no public "is tracing" probe
            pass


def _train_once_impl(
    cfg: PipelineConfig | Dict[str, Any],
    epoch_hook: Optional[Any] = None,
) -> Tuple[float, Dict[str, Any]]:
    if isinstance(cfg, PipelineConfig):
        pipeline_cfg = cfg
    elif isinstance(cfg, dict):
        pipeline_cfg = PipelineConfig.from_mapping(cfg)
    else:
        raise TypeError("cfg must be a PipelineConfig or mapping")
    cfg = pipeline_cfg.to_dict()

    window_cfg = pipeline_cfg.window
    cfg.setdefault("window", {}).update(window_cfg.to_dict())
    cfg.setdefault("model", {}).update(pipeline_cfg.model.to_dict(window_cfg))
    artifacts_section = cfg.setdefault("artifacts", {})
    artifacts_section.setdefault("signature_file", "model_signature.json")
    artifacts_section.setdefault("metadata_file", "metadata.json")
    train_section = cfg.setdefault("train", {})
    train_section.setdefault("val", {})

    _pin_platform(cfg["train"].get("device"))
    # Sanitizer analogue (SURVEY §5.2): when ``train.debug_nans`` is set, XLA
    # re-runs any program that produced a NaN in de-optimized mode and raises
    # at the exact primitive — the jit-era replacement for the reference's
    # eager finiteness asserts (timesnet.py:2094-2101). The de-optimized
    # re-run replays the ORIGINAL arguments, so buffer donation must be off
    # for the step programs (donated buffers would already be deleted);
    # train_once restores the global flag on exit.
    debug_nans = bool(cfg["train"].get("debug_nans", False))
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    debug_memory = bool(cfg["model"].get("debug_memory", False))
    deterministic = bool(cfg["train"].get("deterministic", False))
    seed = int(cfg.get("tuning", {}).get("seed", 2025))
    root_key = seed_everything(seed, deterministic=deterministic)
    console().print(f"[bold green]Devices:[/bold green] {jax.devices()}")

    # ------------------------------------------------------------------ data
    data_cfg = cfg.setdefault("data", {})
    time_feature_cfg = dict(data_cfg.get("time_features") or {})
    time_feature_cfg.setdefault("enabled", False)
    time_features_enabled = bool(time_feature_cfg.get("enabled", False))
    data_cfg["time_features"] = time_feature_cfg

    train_csv = cfg["data"]["train_csv"]
    encoding = cfg["data"].get("encoding", "utf-8")
    # Native one-pass CSV pivot is eligible only when all three roles are
    # configured (no detection needed) and the file carries no extra feature
    # columns (schema's temporal-coverage analysis only inspects those), so
    # a 256-row sample is exactly as informative as the full frame.
    sample_df = None
    if len(extract_schema_overrides(data_cfg)) == 3:
        try:
            sample_df = pd.read_csv(train_csv, encoding=encoding, nrows=256)
        except (OSError, ValueError):
            sample_df = None
    if sample_df is not None and len(sample_df.columns) == 3:
        schema = DataSchema.from_config(data_cfg, sample_df=sample_df)
        data_cfg.setdefault("schema", schema.as_dict())
        wide_raw = read_long_pivot(
            train_csv,
            date_col=schema["date"],
            id_col=schema["id"],
            target_col=schema["target"],
            fill_missing_dates=bool(cfg["data"].get("fill_missing_dates", True)),
            fillna0=False,
            encoding=encoding,
        )
    else:
        df = pd.read_csv(train_csv, encoding=encoding)
        schema = DataSchema.from_config(data_cfg, sample_df=df)
        data_cfg.setdefault("schema", schema.as_dict())
        wide_raw = pivot_long_to_wide(
            df,
            date_col=schema["date"],
            id_col=schema["id"],
            target_col=schema["target"],
            fill_missing_dates=bool(cfg["data"].get("fill_missing_dates", True)),
            fillna0=False,
        )
    mask_wide = (~wide_raw.isna()).astype(np.float32)
    wide = wide_raw.fillna(0.0)
    series_static_np, static_feature_names = compute_series_features(wide, mask_wide)
    if cfg.get("preprocess", {}).get("clip_negative", False):
        wide = wide.clip(lower=0.0)
    ids = list(wide.columns)

    # ------------------------------------------------- splits + scaler (leak-free)
    preprocess = cfg.setdefault("preprocess", {})
    norm_method = preprocess.get("normalize", "none")
    norm_per_series = bool(preprocess.get("normalize_per_series", True))
    eps = float(preprocess.get("eps", 1e-8))
    val_cfg = cfg["train"]["val"]
    strategy = val_cfg.get("strategy", "holdout")

    train_arrays: List[np.ndarray] = []
    val_arrays: List[np.ndarray] = []
    train_mask_arrays: List[np.ndarray] = []
    val_mask_arrays: List[np.ndarray] = []
    train_time_indices: Optional[List[pd.DatetimeIndex]] = [] if time_features_enabled else None
    val_time_indices: Optional[List[pd.DatetimeIndex]] = [] if time_features_enabled else None

    if strategy == "holdout":
        trn_df, val_df = make_holdout_slices(wide, int(val_cfg["holdout_days"]))
        trn_mask_df, val_mask_df = make_holdout_slices(mask_wide, int(val_cfg["holdout_days"]))
        if norm_method == "none":
            scaler = None
            trn_norm, val_norm = trn_df.copy(), val_df.copy()
        else:
            scaler, trn_norm = fit_series_scaler(trn_df, norm_method, norm_per_series, eps)
            val_norm = transform_dataframe(val_df, ids, scaler, norm_method)
        train_arrays = [trn_norm.to_numpy(dtype=np.float32)]
        val_arrays = [val_norm.to_numpy(dtype=np.float32)]
        train_mask_arrays = [trn_mask_df.to_numpy(dtype=np.float32)]
        val_mask_arrays = [val_mask_df.to_numpy(dtype=np.float32)]
        if time_features_enabled:
            train_time_indices = [pd.DatetimeIndex(trn_norm.index)]
            val_time_indices = [pd.DatetimeIndex(val_norm.index)]
    else:
        folds = int(val_cfg.get("rolling_folds") or 1)
        step_days = int(val_cfg.get("rolling_step_days") or 1)
        val_len = int(val_cfg["holdout_days"])
        fold_slices = list(make_rolling_slices(wide, folds, step_days, val_len))
        if not fold_slices:
            raise ValueError("No folds produced; check rolling validation configuration")
        if norm_method == "none":
            scaler = None
            wide_norm = wide.copy()
        else:
            # Leak-free fit: the LAST fold's train slice ends before every
            # fold's validation window. (The reference fits on the FIRST
            # fold's train — reference train.py:874-884 — whose rows include
            # later folds' validation days whenever step_days < holdout_days,
            # leaking their statistics into the scaler.)
            fit_tr = fold_slices[-1][0]
            scaler, _ = fit_series_scaler(fit_tr, norm_method, norm_per_series, eps)
            wide_norm = transform_dataframe(wide, ids, scaler, norm_method)
        for (tr_df, va_df), (tr_m, va_m) in zip(
            make_rolling_slices(wide_norm, folds, step_days, val_len),
            make_rolling_slices(mask_wide, folds, step_days, val_len),
        ):
            train_arrays.append(tr_df.to_numpy(dtype=np.float32))
            val_arrays.append(va_df.to_numpy(dtype=np.float32))
            train_mask_arrays.append(tr_m.to_numpy(dtype=np.float32))
            val_mask_arrays.append(va_m.to_numpy(dtype=np.float32))
            if time_features_enabled:
                train_time_indices.append(pd.DatetimeIndex(tr_df.index))
                val_time_indices.append(pd.DatetimeIndex(va_df.index))

    # ------------------------------------------------------------ batchers
    input_len = window_cfg.input_len
    pred_len = window_cfg.pred_len
    mode = cfg["model"]["mode"]
    batch_size = int(cfg["train"]["batch_size"])
    series_id_array = np.arange(len(ids), dtype=np.int64)
    n_folds_t = len(train_arrays)
    n_folds_v = len(val_arrays)
    dl_train = build_batcher(
        train_arrays,
        train_mask_arrays,
        input_len,
        pred_len,
        window_cfg.stride,
        mode,
        batch_size,
        shuffle=True,
        drop_last=True,
        augment=cfg["data"].get("augment"),
        series_static=[series_static_np] * n_folds_t,
        series_ids=[series_id_array] * n_folds_t,
        time_indices=train_time_indices,
        time_feature_config=time_feature_cfg if time_features_enabled else None,
        seed=seed,
    )
    dl_val = build_batcher(
        val_arrays,
        val_mask_arrays,
        input_len,
        pred_len,
        window_cfg.stride,
        mode,
        batch_size,
        shuffle=False,
        drop_last=False,
        recursive_pred_len=(pred_len if mode == "recursive" else None),
        augment=None,
        series_static=[series_static_np] * n_folds_v,
        series_ids=[series_id_array] * n_folds_v,
        time_indices=val_time_indices,
        time_feature_config=time_feature_cfg if time_features_enabled else None,
        seed=seed + 1,
        pad_final=True,
    )
    if dl_val.total == 0:
        raise ValueError(
            "Validation split has no windows; increase train.val.holdout_days or "
            "adjust model.input_len/pred_len."
        )
    time_feature_dim = dl_train.time_feature_dim
    dataset_freq = dl_train.time_frequency
    inferred_freq = dataset_freq
    if inferred_freq is None and isinstance(wide.index, pd.DatetimeIndex):
        inferred_freq = getattr(wide.index, "freqstr", None) or pd.infer_freq(wide.index)
    cfg["data"]["time_features"]["feature_dim"] = int(time_feature_dim)
    if inferred_freq is not None:
        cfg["data"]["time_features"]["freq"] = inferred_freq
    time_feature_meta = {
        "enabled": bool(time_features_enabled and time_feature_dim > 0),
        "feature_dim": int(time_feature_dim),
        "config": dict(time_feature_cfg),
        "freq": inferred_freq,
    }

    use_loss_masking = bool(cfg["train"].get("use_loss_masking", False))

    # -------------------------------------------------- min-sigma calibration
    min_sigma_method = str(cfg["train"].get("min_sigma_method", "global"))
    target_std, per_series_std = masked_std(
        train_arrays, train_mask_arrays, method=min_sigma_method
    )
    min_sigma_cfg_val = float(cfg["train"].get("min_sigma", 1e-3))
    min_sigma_scale = float(cfg["train"].get("min_sigma_scale", 0.1))
    scaled = target_std * min_sigma_scale if target_std > 0.0 else 0.0
    min_sigma_scalar = max(min_sigma_cfg_val, scaled)
    sigma_vector: Optional[np.ndarray] = None
    if per_series_std is not None and per_series_std.size > 0:
        sigma_vector = np.maximum(
            np.asarray(per_series_std, np.float64) * min_sigma_scale, min_sigma_scalar
        ).astype(np.float32)
        cfg["train"]["min_sigma_vector"] = [float(v) for v in sigma_vector]
    else:
        cfg["train"].pop("min_sigma_vector", None)
    cfg["train"]["min_sigma_effective"] = float(min_sigma_scalar)
    console().print(
        f"[bold green]min_sigma calibrated:[/bold green] {min_sigma_scalar:.6f} "
        f"(target std={target_std:.6f}, scale={min_sigma_scale})"
    )

    # ------------------------------------------------------------------ model
    model_cfg_raw = cfg["model"]
    d_model = int(model_cfg_raw["d_model"])
    d_ff = int(model_cfg_raw.get("d_ff", 4 * d_model))
    model_cfg_raw["d_ff"] = d_ff
    static_dim = int(series_static_np.shape[1]) if series_static_np.size else 0
    # Shared builder (flow_timesnet_tpu/build.py): the single source of truth
    # for YAML -> TimesNetConfig, also used by bench.py / __graft_entry__ so
    # benchmark shapes can never drift from the product again (VERDICT r3 #2).
    model_cfg_raw["kernel_set"] = [list(k) for k in pipeline_cfg.model.kernel_set]
    model_cfg_raw["static_proj_dim"] = pipeline_cfg.model.static_proj_dim
    tn_cfg = timesnet_config_from_dict(
        cfg,
        static_dim=static_dim,
        time_feature_dim=int(time_feature_dim),
        id_vocab=max(1, len(ids)),
        min_sigma=float(min_sigma_scalar),
    )

    # Polyak/EMA weight averaging (`train.ema_decay`, default off — no
    # reference analogue): the averaged weights are what get evaluated,
    # selected and checkpointed; the raw weights keep training.
    ema_decay = float(cfg["train"].get("ema_decay", 0.0) or 0.0)

    def make_engine(model_cfg):
        return Engine(
            model_cfg,
            use_loss_masking=use_loss_masking,
            accumulation_steps=int(cfg["train"].get("accumulation_steps", 1)),
            grad_clip_norm=float(cfg["train"].get("grad_clip_norm", 0.0) or 0.0),
            weight_decay=float(cfg["train"].get("weight_decay", 0.0)),
            num_series=len(ids),
            ema_decay=ema_decay,
            donate=not debug_nans,
        )

    engine = make_engine(tn_cfg)
    # Trace-time period specialization (``train.freeze_periods``): after
    # ``train.freeze_after_epoch`` warmup epochs, snapshot the telemetry's
    # selected periods as static constants and swap in an engine whose blocks
    # run the dense exact-extent fold (models/timesblock.py::_frozen_forward).
    # The param tree is identical, so state/optimizer carry over; the
    # per-epoch telemetry probe keeps running on the DYNAMIC model, and a
    # selection drift swaps the dynamic engine back in (math preserved).
    dynamic_engine = engine
    freeze_enabled = str(cfg["train"].get("freeze_periods", "off")).lower() in (
        "1", "true", "yes", "on", "auto",
    )
    freeze_after = max(1, int(cfg["train"].get("freeze_after_epoch", 1) or 1))
    # Selections move while the features are still settling (measured at
    # flagship: {7,27} for epochs 1-2, then {14,27} from epoch 3 on), so
    # freezing is gated on the selection being STABLE across two consecutive
    # probes, and a drift falls back for one epoch and re-freezes when
    # stability returns. Each distinct spec costs one compile; the cap bounds
    # churn on pathologically oscillating selections.
    freeze_max = max(1, int(cfg["train"].get("freeze_max_recompiles", 3) or 3))
    frozen_state = {"spec": None, "prev": None, "engines": {}}

    def maybe_freeze(ep, telemetry, current_engine):
        if not freeze_enabled:
            return current_engine
        spec_now = Engine.frozen_spec_from_telemetry(telemetry, tn_cfg.n_layers)
        # Multi-process DP: per-process telemetry could disagree, and processes
        # holding different specs would compile different programs and deadlock
        # in the gradient all-reduce. Broadcast process 0's snapshot (a
        # collective — every process reaches this call each epoch when
        # freezing is enabled) so the whole decision sequence below is global.
        spec_now = sync_frozen_spec(spec_now, tn_cfg.n_layers, tn_cfg.k_periods)
        if spec_now is None:
            return current_engine
        prev = frozen_state["prev"]
        frozen_state["prev"] = spec_now
        if frozen_state["spec"] is not None:
            if spec_now == frozen_state["spec"]:
                return current_engine
            console().print(
                f"[yellow]freeze_periods: selection drifted at epoch {ep}; "
                "running this epoch on the dynamic path (re-freezes when the "
                "selection is stable again)[/yellow]"
            )
            frozen_state["spec"] = None
            cfg["train"].pop("frozen_periods_spec", None)
            cfg["train"]["freeze_periods_drift_epoch"] = int(ep)
            return dynamic_engine
        if ep <= freeze_after or spec_now != prev:
            return current_engine
        if spec_now not in frozen_state["engines"]:
            if len(frozen_state["engines"]) >= freeze_max:
                return current_engine
            import dataclasses as _dc

            frozen_state["engines"][spec_now] = make_engine(
                _dc.replace(tn_cfg, frozen_periods=spec_now)
            )
        frozen_state["spec"] = spec_now
        cfg["train"]["frozen_periods_spec"] = [
            [list(slot) for slot in layer] for layer in spec_now
        ]
        periods = sorted({p for layer in spec_now for p, _, v in layer if v})
        console().print(
            f"[bold green]freeze_periods:[/bold green] epoch {ep} freezes "
            f"periods {periods} into static fold programs"
        )
        return frozen_state["engines"][spec_now]

    # init from the first train batch's shapes
    init_iter = iter(dl_train)
    try:
        first_batch = next(init_iter)
    except StopIteration:
        raise ValueError("Training split has no windows")
    init_dev = batch_to_device(first_batch, floor=_floor_for_batch(first_batch, sigma_vector))
    state = engine.init_state(root_key, init_dev)

    # Data parallelism: batch-shard over all local devices (params replicated
    # except, optionally, the series-embedding table; XLA inserts the gradient
    # all-reduce). Batches whose row count does not divide the mesh are padded
    # with row_valid=0 rows instead of silently dropping to single-device.
    # ``train.dcn_slices > 1`` selects the 2-D multi-slice mesh.
    n_devices = len(jax.devices())
    mesh = None
    dp_batch_rows = batch_size
    shard_tables = False
    dp_enabled = str(cfg["train"].get("data_parallel", "auto")).lower() not in (
        "off", "false", "0", "no",
    )
    if n_devices > 1 and dp_enabled:
        mesh = make_mesh(dcn_slices=int(cfg["train"].get("dcn_slices", 1) or 1))
        mesh_size = int(mesh.devices.size)
        dp_batch_rows = -(-batch_size // mesh_size) * mesh_size
        shard_emb_raw = str(cfg["train"].get("shard_embedding", "auto")).lower()
        vocab = tn_cfg.id_vocab
        want_shard = (
            vocab >= 2048 if shard_emb_raw == "auto"
            else shard_emb_raw in ("true", "1", "yes", "on")
        )
        shard_tables = want_shard and vocab % mesh_size == 0
        if want_shard and not shard_tables:
            console().print(
                f"[yellow]shard_embedding requested but id_vocab={vocab} does not "
                f"divide the mesh size {mesh_size}; table stays replicated[/yellow]"
            )
        state = shard_train_state(mesh, state, shard_tables=shard_tables)
        cfg["train"]["shard_embedding_effective"] = bool(shard_tables)
        console().print(
            f"[bold green]Data parallel:[/bold green] batch {batch_size}"
            + (f" (padded to {dp_batch_rows})" if dp_batch_rows != batch_size else "")
            + f" sharded over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}"
            + (" · embedding table row-sharded" if shard_tables else "")
        )

    def to_device(batch):
        if mesh is not None:
            if batch.x.shape[0] < dp_batch_rows:
                batch = pad_batch_rows(batch, dp_batch_rows)
            # numpy -> sharded device_put directly: one H2D per batch (going
            # through batch_to_device first would upload unsharded, block on
            # a D2H readback inside shard_batch, and upload again)
            return shard_batch(
                mesh, batch_to_host(batch, floor=_floor_for_batch(batch, sigma_vector))
            )
        return batch_to_device(batch, floor=_floor_for_batch(batch, sigma_vector))
    n_params = sum(int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(state.params))
    console().print(f"[bold]Parameters:[/bold] {n_params:,}")

    # ------------------------------------------------------------ lr schedule
    epochs = int(cfg["train"]["epochs"])
    accum_steps = max(1, int(cfg["train"].get("accumulation_steps", 1)))
    batches_per_epoch = len(dl_train)
    updates_per_epoch = (
        max(1, math.ceil(batches_per_epoch / accum_steps)) if batches_per_epoch > 0 else 1
    )
    warmup = resolve_warmup(
        cfg["train"].get("lr_warmup_steps"),
        cfg["train"].get("lr_warmup_epochs"),
        updates_per_epoch,
    )
    lr_ctl = LRController(
        base_lr=float(cfg["train"]["lr"]),
        epochs=epochs,
        sched_cfg=cfg["train"].get("lr_scheduler", {}),
        warmup=warmup,
    )
    cfg["train"].update(lr_ctl.effective_summary())

    print_config(
        {"window": cfg.get("window"), "model": cfg.get("model"), "train": cfg.get("train")},
        current_lr=lr_ctl.lr_for_epoch(1),
    )

    # ------------------------------------------------------------ train loop
    best_nll = float("inf")
    best_smape = float("inf")
    best_wsmape = float("inf")
    best_params = None
    best_epoch = 0
    # frozen spec active when the best snapshot was taken (None = dynamic);
    # this — not the last epoch's spec — is what config_used.yaml records, so
    # predict-side specialization (predict.freeze_periods) describes the
    # checkpoint actually being shipped.
    best_frozen_spec = None
    patience_limit = cfg["train"].get("early_stopping_patience")
    patience = 0
    # Checkpoint-selection / early-stopping metric. The reference keys on val
    # NLL only (train.py:1536-1571); ``smape`` exists because the measured
    # val-NLL <-> test-sMAPE correlation inverts under EMA weight averaging
    # (BENCHMARKS.md "EMA weight averaging A/B") — pairing ema_decay with
    # selection_metric: smape keys selection on the metric that tracks the
    # true future. best_nll/best_smape/best_wsmape always report the values
    # AT the selected epoch.
    selection_metric = str(cfg["train"].get("selection_metric", "nll")).lower()
    if selection_metric not in ("nll", "smape"):
        raise ValueError(
            f"train.selection_metric must be 'nll' or 'smape', got {selection_metric!r}"
        )
    best_sel = float("inf")
    epoch_throughputs: List[float] = []
    dropout_key = jax.random.fold_in(root_key, 1)

    # True mid-training resume (a capability the reference lacks — it keeps
    # only best-epoch weights, SURVEY §5.4): optimizer moments, loop counters
    # and the scheduler's plateau state all round-trip.
    art_dir = cfg["artifacts"].get("dir", "outputs/artifacts")
    model_path = os.path.join(art_dir, cfg["artifacts"].get("model_file", "timesnet.msgpack"))
    resume_enabled = bool(cfg["train"].get("resume", False))
    save_state_enabled = bool(cfg["train"].get("save_train_state", resume_enabled))
    train_state_path = os.path.join(art_dir, "train_state.msgpack")
    start_epoch = 1
    if resume_enabled and os.path.exists(train_state_path):
        state, resume_extra = artifacts_io.load_train_state(train_state_path, state)
        if mesh is not None:
            state = shard_train_state(mesh, state, shard_tables=shard_tables)
        start_epoch = int(resume_extra.get("epoch", 0)) + 1
        best_nll = float(resume_extra.get("best_nll", best_nll))
        best_smape = float(resume_extra.get("best_smape", best_smape))
        best_wsmape = float(resume_extra.get("best_wsmape", best_wsmape))
        # migration: states saved before selection_metric existed carry no
        # best_sel — derive it from the stored per-metric bests
        best_sel = float(
            resume_extra.get(
                "best_sel", best_nll if selection_metric == "nll" else best_smape
            )
        )
        best_epoch = int(resume_extra.get("best_epoch", 0))
        patience = int(resume_extra.get("patience", 0))
        lr_ctl.load_state_dict(resume_extra.get("lr_state", {}))
        try:
            best_frozen_spec = Engine.frozen_spec_from_config(
                resume_extra.get("best_frozen_spec"), tn_cfg.n_layers
            )
        except ValueError:
            best_frozen_spec = None
        if os.path.exists(model_path) and np.isfinite(best_nll):
            best_params, _ = artifacts_io.load_checkpoint(model_path)
        console().print(
            f"[bold green]Resumed from epoch {start_epoch - 1} "
            f"(best_nll={best_nll:.6f} @ epoch {best_epoch})[/bold green]"
        )

    def eval_batches():
        for vb in dl_val:
            yield to_device(vb)

    # Optional multi-step fusion: chunks of `scan_steps` batches run as one
    # lax.scan program (no per-step dispatch; the jit-era answer to the
    # reference's CUDA-graph replay). Requires accumulation_steps == 1.
    scan_steps = int(cfg["train"].get("scan_steps", 0) or 0)
    if accum_steps != 1:
        scan_steps = 0
    # Upper bound on a single device-resident dispatch (train epoch chunk or
    # eval chunk), in steps. High-cardinality epochs reach thousands of steps
    # and a single multi-minute XLA program crashed the TPU worker (runtime
    # watchdog); 0 disables chunking. Math is dispatch-count invariant.
    resident_max_dispatch = int(
        cfg["train"].get("resident_max_dispatch_steps", 512) or 0
    )

    # Input-pipeline selection (VERDICT r2 #1). "device" stages the fold
    # arrays in HBM once and runs every epoch as ONE scanned program with the
    # window gather inside the jit — no per-step host gather / H2D / dispatch.
    # "host" keeps the numpy gather path (gradient accumulation, or arrays too
    # large to stage). "auto" (default) picks device whenever the staged
    # arrays fit ``train.device_stage_mb`` and accumulation is off.
    pipeline_req = str(cfg["train"].get("input_pipeline", "auto")).lower()
    stage_budget = float(cfg["train"].get("device_stage_mb", 512) or 512) * 1e6
    staged_train = staged_val = None
    if pipeline_req == "device" and accum_steps > 1:
        console().print(
            "[yellow]train.input_pipeline=device is incompatible with "
            f"accumulation_steps={accum_steps}; falling back to the host "
            "pipeline.[/yellow]"
        )
    if pipeline_req != "host" and accum_steps == 1:
        fits = _staged_nbytes(dl_train) + _staged_nbytes(dl_val) <= stage_budget
        if pipeline_req == "device" or fits:
            put = (
                (lambda a: put_global(a, replicated(mesh)))
                if mesh is not None
                else jax.device_put
            )
            staged_train = _stage_from_batcher(dl_train, sigma_vector, device_put=put)
            staged_val = _stage_from_batcher(dl_val, sigma_vector, device_put=put)
    use_resident = staged_train is not None and staged_val is not None
    cfg["train"]["input_pipeline_effective"] = "device" if use_resident else "host"
    plan_spec = None
    if use_resident:
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            plan_spec = NamedSharding(
                mesh, PartitionSpec(None, tuple(mesh.axis_names))
            )

        def put_plan(a):
            # put_global: a raw device_put against a cross-process sharding
            # is invalid on multi-process runtimes (VERDICT r2 #5)
            return put_global(a, plan_spec) if plan_spec is not None else jax.device_put(a)

        # the eval plan is deterministic — build and stage it once
        val_idx_np, val_rv_np = epoch_index_plan(
            staged_val.total,
            batch_size,
            dp_batch_rows if mesh is not None else None,
            shuffle=False,
            drop_last=False,
        )
        val_idx = put_plan(val_idx_np)
        val_rv = put_plan(val_rv_np)
        # FIXED telemetry probe batch (epoch-independent): probing the first
        # batch of each epoch's shuffled plan made the freeze_periods drift
        # check see batch-sampling noise as selection drift
        probe_idx_np, probe_rv_np = epoch_index_plan(
            staged_train.total,
            batch_size,
            dp_batch_rows if mesh is not None else None,
            shuffle=False,
            drop_last=True,
        )
        console().print(
            "[bold green]Input pipeline:[/bold green] device-resident "
            f"({(_staged_nbytes(dl_train) + _staged_nbytes(dl_val)) / 1e6:.1f} MB staged, "
            "one dispatch per epoch)"
        )

    # Optional on-device profiling: trace the first post-warmup epoch into
    # ``train.profile_dir`` for xprof/tensorboard (replaces the reference's
    # ad-hoc perf-counter logging, SURVEY §5.1).
    profile_dir = cfg["train"].get("profile_dir")
    profiling = False

    if debug_memory:
        _log_device_memory("post-init")

    for ep in range(start_epoch, epochs + 1):
        if profile_dir and ep == start_epoch + 1 and not profiling:
            jax.profiler.start_trace(str(profile_dir))
            profiling = True
        dl_train.set_epoch(ep)
        lr = lr_ctl.lr_for_epoch(ep)
        losses: List[float] = []
        mask_true_total = 0.0
        mask_total = 0.0
        t0 = time.perf_counter()
        n_batches = 0
        chunk: List[Any] = []
        chunk_keys: List[Any] = []

        if use_resident:
            # One dispatch for the whole epoch: host work is a permutation,
            # a [S, B] int32 upload and one scalar fetch at the end.
            host_rng = np.random.default_rng([seed, ep])
            idx_np, rv_np = epoch_index_plan(
                staged_train.total,
                batch_size,
                dp_batch_rows if mesh is not None else None,
                shuffle=True,
                drop_last=True,
                rng=host_rng,
            )
            if idx_np.shape[0] == 0:
                raise ValueError("Training split has no windows")
            # single epoch key; per-step keys derive inside the epoch program
            keys = jax.random.fold_in(dropout_key, ep)
            if mesh is not None:
                keys = put_global(keys, replicated(mesh))
            # probe always runs the DYNAMIC model (drift detection must see
            # the live selection, not the frozen constants)
            telemetry = dynamic_engine.collect_period_telemetry_staged(
                state.params, staged_train, probe_idx_np[0], probe_rv_np[0]
            )
            _log_period_telemetry(telemetry, inferred_freq, ep)
            engine = maybe_freeze(ep, telemetry, engine)
            # Cap single-dispatch length: at high cardinality one epoch is
            # thousands of steps, and a multi-minute single XLA program can
            # outlive the TPU runtime's execution watchdog (observed as a
            # worker crash at N=10k). Chunks reuse at most two compiled
            # programs (body + remainder) and chain state device-side; a
            # global step offset keeps in-program dropout keys identical to
            # the single-dispatch plan.
            n_steps = int(idx_np.shape[0])
            if resident_max_dispatch and n_steps > resident_max_dispatch:
                loss_parts, mask_parts = [], []
                off = 0
                while off < n_steps:
                    end = min(off + resident_max_dispatch, n_steps)
                    state, part_losses, part_mask = engine.train_epoch_resident(
                        state,
                        lr,
                        keys,
                        staged_train,
                        put_plan(idx_np[off:end]),
                        put_plan(rv_np[off:end]),
                        step_offset=off,
                    )
                    loss_parts.append(part_losses)
                    mask_parts.append(part_mask)
                    off = end
                losses = [float(v) for p in loss_parts for v in np.asarray(p)]
                mask_true_total = float(
                    sum(np.asarray(p).sum() for p in mask_parts)
                )
            else:
                state, ep_losses, ep_mask_true = engine.train_epoch_resident(
                    state, lr, keys, staged_train, put_plan(idx_np), put_plan(rv_np)
                )
                losses = [float(v) for v in np.asarray(ep_losses)]
                mask_true_total = float(np.asarray(ep_mask_true).sum())
            mask_total = float(rv_np.sum()) * float(staged_train.horizon)
            n_batches = int(idx_np.shape[0])

        def flush_chunk(state):
            nonlocal mask_true_total, mask_total, n_batches
            if not chunk:
                return state
            if len(chunk) == scan_steps:
                stacked = jax.tree_util.tree_map(lambda *xs: jax.numpy.stack(xs), *chunk)
                state, chunk_losses, mask_true = engine.train_steps_scanned(
                    state, lr, jax.numpy.stack(chunk_keys), stacked
                )
                losses.extend(float(v) for v in np.asarray(chunk_losses))
                mask_true_total += float(np.asarray(mask_true).sum())
                mask_total += sum(
                    float(np.asarray(b["row_valid"]).sum())
                    * float(b["y"].shape[1] * b["y"].shape[2])
                    if b.get("row_valid") is not None
                    else float(np.prod(b["y"].shape))
                    for b in chunk
                )
            else:  # tail chunk: fall back to per-step
                for key, b in zip(chunk_keys, chunk):
                    state, loss, stats = engine.train_step(state, lr, key, b, True)
                    losses.append(float(loss))
                    mask_true_total += float(stats["mask_true"])
                    mask_total += float(stats["mask_total"])
            n_batches += len(chunk)
            chunk.clear()
            chunk_keys.clear()
            return state

        if use_resident:
            host_iter = ()
        else:
            # overlap next-batch host assembly with the device step
            # (train.prefetch_factor, the reference DataLoader's knob; 0=off)
            depth = int(cfg["train"].get("prefetch_factor", 2) or 0)
            host_iter = Prefetcher(dl_train, depth) if depth > 0 else dl_train
        try:
            for i, batch in enumerate(host_iter):
                rng = jax.random.fold_in(jax.random.fold_in(dropout_key, ep), i)
                dev_batch = to_device(batch)
                if i == 0:
                    telemetry = dynamic_engine.collect_period_telemetry(
                        state.params, dev_batch
                    )
                    _log_period_telemetry(telemetry, inferred_freq, ep)
                    engine = maybe_freeze(ep, telemetry, engine)
                if scan_steps > 1:
                    chunk.append(dev_batch)
                    chunk_keys.append(rng)
                    if len(chunk) == scan_steps:
                        state = flush_chunk(state)
                    continue
                do_update = ((i + 1) % accum_steps == 0) or ((i + 1) == batches_per_epoch)
                state, loss, stats = engine.train_step(state, lr, rng, dev_batch, do_update)
                losses.append(float(loss))
                mask_true_total += float(stats["mask_true"])
                mask_total += float(stats["mask_total"])
                n_batches += 1
        finally:
            if isinstance(host_iter, Prefetcher):
                host_iter.close()
        if scan_steps > 1 and not use_resident:
            state = flush_chunk(state)
        epoch_time = time.perf_counter() - t0
        coverage = mask_true_total / mask_total if mask_total > 0 else 0.0
        throughput = (n_batches * batch_size) / max(epoch_time, 1e-9)
        epoch_throughputs.append(float(throughput))

        if not np.isfinite(np.mean(losses)):
            raise FloatingPointError(
                f"Non-finite training loss at epoch {ep}; check data scaling and lr."
            )
        if mask_total > 0 and coverage <= 0.0:
            # NaN params mask out every element, so the masked loss is an
            # exactly-finite 0.0 and the isfinite guard above never fires —
            # zero coverage on non-empty data means the model is dead
            raise FloatingPointError(
                f"Training mask coverage collapsed to 0 at epoch {ep} — the "
                "model has diverged (non-finite rate/dispersion); lower the "
                "lr or raise min_sigma."
            )
        eval_params = state.ema if ema_decay > 0.0 else state.params
        if use_resident:
            metrics = engine.evaluate_resident(
                eval_params, staged_val, val_idx, val_rv,
                max_dispatch_steps=resident_max_dispatch,
            )
        else:
            metrics = engine.evaluate(eval_params, eval_batches())
        val_nll = float(metrics["nll"])
        val_smape = float(metrics["smape"])
        console().print(
            f"[bold]Epoch {ep}[/bold] loss={np.mean(losses):.6f} val_nll={val_nll:.6f} "
            f"val_smape={val_smape:.6f} lr={lr:.3e} mask_cov={coverage:.4f} "
            f"windows/s={throughput:.1f}"
        )
        if debug_memory and ep == start_epoch:
            _log_device_memory(f"epoch {ep}")
        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            console().print(f"[cyan]Profiler trace written to {profile_dir}[/cyan]")
        sel_value = val_nll if selection_metric == "nll" else val_smape
        lr_ctl.observe(sel_value)
        if sel_value < best_sel:
            best_sel = sel_value
            best_nll = val_nll
            best_smape = val_smape
            best_wsmape = wsmape_from_series_sums(
                metrics["series_sums"], metrics["series_cnts"], ids
            )
            # On-device snapshot: the full host fetch (10 MB over a ~40 ms
            # RTT relay) is deferred to the save sites / end of the loop.
            best_params = device_snapshot(eval_params)
            best_epoch = ep
            best_frozen_spec = frozen_state["spec"]
            patience = 0
        else:
            patience += 1
            if patience_limit is not None and patience > int(patience_limit):
                console().print(
                    f"[yellow]Early stopping at epoch {ep}; best epoch was {best_epoch} "
                    f"with val_{selection_metric}={best_sel:.6f} "
                    f"(val_nll={best_nll:.6f}, val_smape={best_smape:.6f})[/yellow]"
                )
                break
        if epoch_hook is not None and epoch_hook(ep, float(sel_value)):
            console().print(
                f"[yellow]Pruned at epoch {ep} by the tuner "
                f"(val_{selection_metric}={sel_value:.6f})[/yellow]"
            )
            break
        if save_state_enabled:
            if best_params is not None and best_epoch == ep:
                artifacts_io.save_checkpoint(
                    model_path,
                    host_fetch(best_params),
                    {"min_sigma_effective": np.float32(min_sigma_scalar)}
                    | (
                        {"min_sigma_vector": sigma_vector.reshape(1, 1, -1)}
                        if sigma_vector is not None
                        else {}
                    ),
                )
            artifacts_io.save_train_state(
                train_state_path,
                host_fetch(state),
                {
                    "epoch": ep,
                    "best_nll": best_nll,
                    "best_smape": best_smape,
                    "best_wsmape": best_wsmape,
                    "best_sel": best_sel,
                    "best_epoch": best_epoch,
                    "patience": patience,
                    "lr_state": lr_ctl.state_dict(),
                    # spec active at the best snapshot (msgpack-safe nested
                    # lists; [] = dynamic) so a resumed run still writes the
                    # right spec into config_used.yaml
                    "best_frozen_spec": (
                        [[list(slot) for slot in layer] for layer in best_frozen_spec]
                        if best_frozen_spec is not None
                        else []
                    ),
                },
            )

    console().print(
        f"[bold]Best epoch {best_epoch} with val_nll={best_nll:.6f} "
        f"(val_smape={best_smape:.6f}, val_wsmape={best_wsmape:.6f})[/bold]"
    )
    if best_params is None:
        best_params = host_fetch(state.ema if ema_decay > 0.0 else state.params)
        best_frozen_spec = frozen_state["spec"]
    else:
        # no-op for host trees (resume path); one fetch for device snapshots
        best_params = host_fetch(best_params)

    # --------------------------------------------------------------- artifacts
    art_dir = cfg["artifacts"].get("dir", "outputs/artifacts")
    os.makedirs(art_dir, exist_ok=True)
    model_file = cfg["artifacts"].get("model_file", "timesnet.msgpack")
    model_path = os.path.join(art_dir, model_file)
    aux: Dict[str, Any] = {"min_sigma_effective": np.float32(min_sigma_scalar)}
    if sigma_vector is not None:
        aux["min_sigma_vector"] = sigma_vector.reshape(1, 1, -1)
    artifacts_io.save_checkpoint(model_path, best_params, aux)

    scaler_path = os.path.join(art_dir, cfg["artifacts"].get("scaler_file", "scaler.pkl"))
    schema_path = os.path.join(art_dir, cfg["artifacts"].get("schema_file", "schema.json"))
    cfg_path = os.path.join(art_dir, cfg["artifacts"].get("config_file", "config_used.yaml"))
    signature_path = os.path.join(art_dir, cfg["artifacts"]["signature_file"])
    metadata_path = os.path.join(art_dir, cfg["artifacts"]["metadata_file"])
    normalization_meta = {
        "method": norm_method,
        "per_series": norm_per_series,
        "eps": eps,
    }
    if freeze_enabled:
        # config_used.yaml must describe the checkpoint being shipped, not the
        # last epoch trained: record the frozen spec that was active when the
        # best snapshot was taken (None -> the snapshot came from a dynamic
        # epoch, so predict-side specialization has no stored selection).
        if best_frozen_spec is not None:
            cfg["train"]["frozen_periods_spec"] = [
                [list(slot) for slot in layer] for layer in best_frozen_spec
            ]
        else:
            cfg["train"].pop("frozen_periods_spec", None)
    artifacts_io.save_pickle(
        {
            "scaler": scaler,
            "method": norm_method,
            "ids": ids,
            "static_features": series_static_np,
            "feature_names": static_feature_names,
            "time_features": time_feature_meta,
        },
        scaler_path,
    )
    artifacts_io.save_schema_artifact(
        schema_path,
        schema,
        normalization=normalization_meta,
        extras={"time_features": time_feature_meta},
    )
    save_yaml(cfg, cfg_path)
    static_feature_dim = static_dim
    metadata_artifact = metadata_utils.MetadataArtifact.from_training(
        window=window_cfg,
        schema=schema,
        time_features=time_feature_meta,
        static_features={
            "feature_names": list(static_feature_names or []),
            "feature_dim": static_feature_dim,
        },
    )
    metadata_utils.save_metadata_artifact(metadata_artifact, metadata_path)

    signature_payload = {
        "signature_version": 1,
        "window": window_cfg.to_dict(),
        "model": {
            "mode": str(cfg["model"]["mode"]),
            "d_model": int(cfg["model"]["d_model"]),
            "d_ff": int(cfg["model"]["d_ff"]),
            "n_layers": int(cfg["model"]["n_layers"]),
            "k_periods": int(cfg["model"]["k_periods"]),
            "min_period_threshold": int(cfg["model"].get("min_period_threshold", 1)),
            "id_embed_dim": int(cfg["model"].get("id_embed_dim", 32)),
            "static_proj_dim": pipeline_cfg.model.static_proj_dim,
        },
        "train": {
            "batch_size": batch_size,
            "channels_last": bool(cfg["train"].get("channels_last", False)),
            "use_checkpoint": bool(cfg["train"].get("use_checkpoint", False)),
            "min_sigma_effective": float(min_sigma_scalar),
            "min_sigma_method": min_sigma_method,
            "min_sigma_scale": float(min_sigma_scale),
        },
        "data": {
            "num_series": len(ids),
            "static_feature_dim": static_feature_dim,
            "time_feature_dim": int(time_feature_dim),
            "time_features_enabled": bool(time_features_enabled and time_feature_dim > 0),
            "time_feature_freq": inferred_freq,
        },
        "preprocess": {
            **normalization_meta,
            "schema_artifact_version": artifacts_io.SCHEMA_ARTIFACT_VERSION,
        },
    }
    metadata_utils.save_json(signature_payload, signature_path)
    console().print(
        f"[green]Saved:[/green] {model_path}, {scaler_path}, {schema_path}, {cfg_path}, "
        f"{signature_path}, {metadata_path}"
    )
    return best_nll, {
        "model": model_path,
        "scaler": scaler_path,
        "schema": schema_path,
        "config": cfg_path,
        "metrics": {"nll": best_nll, "smape": best_smape, "wsmape": best_wsmape,
                    "epoch_windows_per_s": epoch_throughputs},
    }


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description="Train a TPU-native TimesNet forecaster.")
    parser.add_argument("--config", type=str, default="configs/default.yaml")
    parser.add_argument("--override", nargs="*", default=[])
    args = parser.parse_args()
    cfg = PipelineConfig.from_files(args.config, overrides=args.override)
    best_nll, paths = train_once(cfg)
    console().print(f"[bold magenta]Final best NLL: {best_nll:.6f}[/bold magenta]")


if __name__ == "__main__":
    main()
