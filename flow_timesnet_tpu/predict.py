"""Inference pipeline: ``predict_once(cfg) -> submission_path``.

Behavioural parity with the reference
(``/root/reference/src/timesnet_forecast/predict.py``): merges the runtime
config over the stored ``config_used.yaml``; validates metadata / signature /
schema / normalization artifacts; rebuilds the model from the checkpoint
(with zero-row embedding expansion for unseen vocab growth); prepares
per-TEST-file batches (drop unseen series, reindex to training ids, future
date index + row keys); forecasts direct or recursive (``lax.scan``); inverse
transforms, clips at zero and renders the configured submission format.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from glob import glob
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd
from pandas.tseries.frequencies import to_offset

from .config import PipelineConfig
from .data.pivot import inverse_transform, pivot_long_to_wide, transform_array
from .data.time_features import build_time_features
from .engine import Engine
from .models.timesnet import TimesNetConfig
from .utils import artifacts as artifacts_io
from .utils import metadata as metadata_utils
from .utils.logging import console
from .utils.quantiles import (
    parse_quantile_config,
    predictive_quantiles,
    quantile_label,
    quantile_out_path,
)
from .utils.submission import (
    SubmissionRowMeta,
    build_submission_context,
    get_submission_writer,
    merge_forecasts,
)


@dataclass
class TestBatch:
    path: str
    name: str
    wide: pd.DataFrame
    present_columns: List[str]
    gather_positions: List[int]
    history_index: pd.DatetimeIndex
    future_dates: pd.DatetimeIndex
    all_row_keys: List[str]
    pred_row_keys: List[str]
    missing_ids: List[str]


def _resolve_test_paths(data_cfg: Mapping[str, Any]) -> List[str]:
    """Resolve test CSVs from test_glob / test_files / test_path / test_dir."""

    patterns: List[str] = []
    if data_cfg.get("test_glob"):
        raw = data_cfg["test_glob"]
        patterns = [raw] if isinstance(raw, str) else [str(p) for p in raw]
    elif data_cfg.get("test_files"):
        raw = data_cfg["test_files"]
        patterns = [raw] if isinstance(raw, str) else [str(p) for p in raw]
    elif data_cfg.get("test_path"):
        patterns = [str(data_cfg["test_path"])]
    elif data_cfg.get("test_dir"):
        patterns = [
            os.path.join(str(data_cfg["test_dir"]), data_cfg.get("test_pattern", "TEST_*.csv"))
        ]
    inner = data_cfg.get("test_pattern", "TEST_*.csv")
    resolved: List[str] = []
    seen = set()
    for pattern in patterns:
        expanded = glob(pattern)
        if not expanded and os.path.isdir(pattern):
            expanded = glob(os.path.join(pattern, inner))
        if not expanded:
            expanded = [pattern]
        for path in expanded:
            # a glob that matches a directory expands to its test files
            # (improves on the reference, which would hand the directory
            # itself to the CSV reader)
            paths = glob(os.path.join(path, inner)) if os.path.isdir(path) else [path]
            for p in paths:
                full = os.path.abspath(p)
                if full not in seen:
                    resolved.append(full)
                    seen.add(full)
    return sorted(resolved)


def _prepare_test_batches(
    *,
    data_cfg: Mapping[str, Any],
    preprocess_cfg: Mapping[str, Any],
    schema_obj,
    ids: Sequence[str],
    id_position_map: Mapping[str, int],
    pred_len: int,
    full_horizon_decode: bool = False,
) -> Tuple[
    List[TestBatch],
    Dict[str, SubmissionRowMeta],
    List[str],
    Dict[str, List[str]],
    List[str],
    List[str],
    Dict[str, List[str]],
]:
    encoding = data_cfg.get("encoding", "utf-8")
    fill_missing_dates = bool(data_cfg.get("fill_missing_dates", True))
    horizon = int(data_cfg.get("horizon") or pred_len)
    horizon_freq = data_cfg.get("horizon_freq")
    clip_negative = bool(preprocess_cfg.get("clip_negative", False))

    test_paths = _resolve_test_paths(data_cfg)
    if not test_paths:
        raise FileNotFoundError(
            "No test files found; check data.test_dir, test_glob, or test_files configuration"
        )

    batches: List[TestBatch] = []
    row_meta: Dict[str, SubmissionRowMeta] = {}
    row_order: List[str] = []
    test_parts: Dict[str, List[str]] = {}
    missing_by_part: Dict[str, List[str]] = {}
    new_ids: List[str] = []
    union: set = set()

    for path in test_paths:
        df = pd.read_csv(path, encoding=encoding)
        schema_obj.require_columns(df.columns, context=path)
        wide_raw = pivot_long_to_wide(
            df,
            date_col=schema_obj["date"],
            id_col=schema_obj["id"],
            target_col=schema_obj["target"],
            fill_missing_dates=fill_missing_dates,
            fillna0=True,
        )
        if clip_negative:
            wide_raw = wide_raw.clip(lower=0.0)
        name = os.path.splitext(os.path.basename(path))[0]
        present = list(wide_raw.columns)
        union.update(present)
        unknown = [c for c in present if c not in id_position_map]
        if unknown:
            console().print(
                f"[yellow]{name} contains {len(unknown)} series unseen during training; "
                "values will be zero-filled.[/yellow]"
            )
            new_ids.extend([c for c in unknown if c not in new_ids])
            wide_raw = wide_raw.drop(columns=unknown)
            present = [c for c in present if c in id_position_map]
        if not present:
            raise ValueError(f"Test series '{path}' does not contain any known ids")
        missing = [c for c in ids if c not in present]
        if missing:
            console().print(
                f"[yellow]{name} missing {len(missing)} trained series; outputs will use "
                "default fill values for those ids.[/yellow]"
            )
        wide = wide_raw.reindex(columns=list(ids)).fillna(0.0)
        history_index = pd.DatetimeIndex(wide.index)
        if history_index.empty:
            raise ValueError(f"Test series '{path}' does not contain any historical rows")

        freq_str = horizon_freq
        if not freq_str:
            try:
                freq_str = pd.infer_freq(history_index)
            except ValueError:
                freq_str = None
        if not freq_str:
            freq_str = "D"
            console().print(
                f"[yellow]Failed to infer frequency for {name}; defaulting to daily "
                "horizon increments.[/yellow]"
            )
        try:
            offset = to_offset(freq_str)
        except (ValueError, TypeError) as err:
            console().print(
                f"[yellow]Invalid horizon frequency '{freq_str}' for {name} ({err}); "
                "falling back to daily steps.[/yellow]"
            )
            offset = to_offset("D")
        future_index = pd.date_range(history_index[-1] + offset, periods=horizon, freq=offset)
        row_keys = [f"{name}+D{i}" for i in range(1, horizon + 1)]
        row_order.extend(row_keys)
        test_parts[name] = row_keys
        missing_by_part[name] = missing
        for step, (row_key, date_val) in enumerate(zip(row_keys, future_index), start=1):
            row_meta[row_key] = SubmissionRowMeta(
                test_part=name, step=step, date=date_val, source=path
            )
        batches.append(
            TestBatch(
                path=path,
                name=name,
                wide=wide,
                present_columns=present,
                gather_positions=[id_position_map[c] for c in present],
                history_index=history_index,
                future_dates=future_index,
                all_row_keys=row_keys,
                pred_row_keys=list(row_keys) if full_horizon_decode else row_keys[:pred_len],
                missing_ids=missing,
            )
        )
    return batches, row_meta, row_order, test_parts, new_ids, sorted(union), missing_by_part


_AUTO_CHUNK_ROWS = 2048


def _resolve_chunk_rows(
    predict_cfg: Mapping[str, Any] | None, num_series: int, mesh_size: int
) -> Optional[int]:
    """Rows per compiled forward, or ``None`` for the whole-batch legacy path.

    At high cardinality (N=10k) a single [N, L, 1] forward forces XLA to
    compile a fresh program for a batch dimension nothing else uses — on the
    real chip that compile dominated predict wall time by two orders of
    magnitude. Chunking the series axis into fixed-size blocks (padded, with
    ``row_valid`` masking the tail) bounds the compiled shape regardless of N
    and is also closer to the training batch distribution that period
    selection (a batch mean) was fit under. ``predict.chunk_rows``:
    ``"auto"`` (default — whole batch up to 2048 rows, 2048-row chunks
    beyond), an int, or ``null``/``off`` to force the legacy exact path.
    """

    raw = (predict_cfg or {}).get("chunk_rows", "auto")
    if raw in (None, False) or str(raw).lower() in ("none", "null", "off", "0"):
        return None
    if str(raw).lower() == "auto":
        chunk = _AUTO_CHUNK_ROWS
    else:
        chunk = int(raw)
        if chunk <= 0:
            return None
    if mesh_size > 1:
        chunk = -(-chunk // mesh_size) * mesh_size
    if chunk >= num_series:
        return None
    return chunk


def _validate_signature(signature: Mapping[str, Any], cfg: PipelineConfig) -> None:
    """Fail fast on window/model-hyperparameter drift vs the checkpoint."""

    errors: List[str] = []
    window_sig = signature.get("window")
    if isinstance(window_sig, Mapping):
        for key, current in (
            ("input_len", cfg.window.input_len),
            ("pred_len", cfg.window.pred_len),
            ("stride", cfg.window.stride),
        ):
            sig_val = window_sig.get(key)
            if sig_val is not None and int(sig_val) != current:
                errors.append(
                    f"Configured window.{key}={current} differs from checkpoint value {sig_val}"
                )
    model_sig = signature.get("model")
    if isinstance(model_sig, Mapping):
        for key in ("d_model", "d_ff", "n_layers", "k_periods", "min_period_threshold", "id_embed_dim"):
            sig_val = model_sig.get(key)
            if sig_val is None:
                continue
            current = getattr(cfg.model, key)
            if int(sig_val) != int(current):
                errors.append(
                    f"Configured model.{key}={current} differs from checkpoint value {sig_val}"
                )
        if "static_proj_dim" in model_sig:
            sig_proj = model_sig.get("static_proj_dim")
            sig_proj_val = None if sig_proj in {None, "null"} else int(sig_proj)
            if sig_proj_val != cfg.model.static_proj_dim:
                errors.append(
                    f"Configured model.static_proj_dim={cfg.model.static_proj_dim} differs "
                    f"from checkpoint value {sig_proj_val}"
                )
        sig_mode = model_sig.get("mode")
        if sig_mode is not None and str(sig_mode) != cfg.model.mode:
            errors.append(
                f"Configured model.mode={cfg.model.mode} differs from checkpoint value {sig_mode}"
            )
    if errors:
        raise ValueError(
            "Configuration incompatible with checkpoint metadata:\n"
            + "\n".join(f"- {e}" for e in errors)
        )


def _expand_embedding(params: Dict[str, Any], required_vocab: int) -> int:
    """Zero-expand the series embedding for ids beyond the trained vocab."""

    emb = params.get("series_embedding", {}).get("embedding")
    if emb is None:
        return required_vocab
    vocab, dim = np.asarray(emb).shape
    if required_vocab > vocab:
        grown = np.zeros((required_vocab, dim), np.float32)
        grown[:vocab] = np.asarray(emb)
        params["series_embedding"]["embedding"] = grown
        return required_vocab
    return vocab


def _ensemble_out_path(runtime_dict: Dict[str, Any]) -> str:
    """Resolve the final submission path for an ensemble predict.

    Prefers the runtime config; falls back to the base member's stored
    ``config_used.yaml`` (the same precedence the single-model path applies
    after its merge).
    """

    sub = runtime_dict.get("submission") or {}
    path = sub.get("output_path") or sub.get("out_path")
    if path:
        return str(path)
    artifacts_cfg = runtime_dict.get("artifacts") or {}
    from .config import load_yaml

    trained = load_yaml(
        os.path.join(
            artifacts_cfg["dir"], artifacts_cfg.get("config_file", "config_used.yaml")
        )
    )
    sub = trained.get("submission") or {}
    path = sub.get("output_path") or sub.get("out_path")
    if not path:
        raise ValueError(
            "submission.output_path (or out_path) must be specified for ensemble "
            "prediction"
        )
    return str(path)


def _predict_ensemble(runtime_dict: Dict[str, Any], ensemble_dirs: Sequence[str]) -> str:
    """Deep-ensemble inference over independently trained artifact dirs.

    Runs the full single-model predict pipeline (validation chain included)
    once per member — ``artifacts.dir`` first, then every entry of
    ``predict.ensemble_dirs`` — and reduces the rendered submissions
    cell-wise (``predict.ensemble_reduce``: ``mean`` (default) or
    ``median``). Averaging final-scale predictions is the correct mixture
    expectation even when members were trained with different scalers, and
    reducing *rendered* submissions keeps every contract (row keys, template
    alignment, missing-row policy, fill values) identical to the
    single-model path. Member submissions are kept next to the output as
    ``<out>.member<i>.csv``.

    No reference analogue (the reference predicts from exactly one
    checkpoint, ``/root/reference/src/timesnet_forecast/predict.py:345``);
    measured on the demand benchmark a 3-seed mean cuts test sMAPE by
    ~0.005 vs the average member (BENCHMARKS.md).
    """

    import copy

    base_dir = (runtime_dict.get("artifacts") or {}).get("dir")
    if not base_dir:
        raise ValueError("artifacts.dir must be set for ensemble prediction")
    member_dirs: List[str] = [base_dir]
    for d in ensemble_dirs:
        d = str(d)
        if d not in member_dirs:
            member_dirs.append(d)
    if len(member_dirs) < 2:
        raise ValueError(
            "predict.ensemble_dirs must list at least one artifact directory "
            "besides artifacts.dir"
        )
    reduce = str(
        (runtime_dict.get("predict") or {}).get("ensemble_reduce", "mean")
    ).lower()
    if reduce not in ("mean", "median"):
        raise ValueError(
            f"predict.ensemble_reduce must be 'mean' or 'median', got {reduce!r}"
        )
    member_model = str(
        (runtime_dict.get("predict") or {}).get("ensemble_member_model", "member")
    ).lower()
    if member_model not in ("member", "runtime"):
        raise ValueError(
            "predict.ensemble_member_model must be 'member' or 'runtime', "
            f"got {member_model!r}"
        )

    from .config import load_yaml

    out_path = _ensemble_out_path(runtime_dict)
    frames: List[pd.DataFrame] = []
    for i, d in enumerate(member_dirs):
        member = copy.deepcopy(runtime_dict)
        member.setdefault("predict", {}).pop("ensemble_dirs", None)
        member["artifacts"] = dict(member.get("artifacts") or {}, dir=d)
        if member_model == "member":
            # Mixed-architecture ensembles: each member forwards through its
            # OWN trained architecture. The runtime config always carries a
            # fully-populated model section (dataclass defaults re-fill it),
            # which would otherwise override the member's stored
            # config_used.yaml in predict_once's merge and trip signature
            # validation for every member whose capacity differs. Substituting
            # the stored section makes the merge a no-op per member;
            # ``predict.ensemble_member_model: runtime`` restores the
            # override-wins behavior.
            cfg_path = os.path.join(
                d, member["artifacts"].get("config_file", "config_used.yaml")
            )
            if os.path.exists(cfg_path):
                stored_model = (load_yaml(cfg_path) or {}).get("model")
                if stored_model:
                    member["model"] = stored_model
        member_path = f"{out_path}.member{i}.csv"
        member["submission"] = dict(
            member.get("submission") or {},
            out_path=member_path,
            output_path=member_path,
        )
        console().print(
            f"[bold green]Ensemble member {i + 1}/{len(member_dirs)}:[/bold green] {d}"
        )
        frames.append(pd.read_csv(predict_once(member), encoding="utf-8-sig"))

    head = frames[0]
    key_col = head.columns[0]
    for i, frame in enumerate(frames[1:], start=1):
        if list(frame.columns) != list(head.columns):
            raise ValueError(
                f"Ensemble member {member_dirs[i]} rendered different submission "
                "columns than the base member"
            )
        if len(frame) != len(head) or not (frame[key_col] == head[key_col]).all():
            raise ValueError(
                f"Ensemble member {member_dirs[i]} rendered different submission "
                "rows than the base member"
            )
    stacked = np.stack(
        [frame.iloc[:, 1:].to_numpy(dtype=np.float64) for frame in frames]
    )
    reduced = np.median(stacked, axis=0) if reduce == "median" else stacked.mean(axis=0)
    out_df = head.copy()
    out_df.iloc[:, 1:] = reduced
    out_dir = os.path.dirname(out_path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    out_df.to_csv(out_path, index=False, encoding="utf-8-sig")
    console().print(
        f"[bold green]Saved {reduce}-of-{len(member_dirs)} ensemble submission:"
        f"[/bold green] {out_path}"
    )

    # Quantile levels reduce the same way (mean = Vincentized quantile
    # averaging; median = the component-wise median) over the per-member
    # quantile files the single-model path just wrote.
    q_levels, _ = parse_quantile_config(
        runtime_dict.get("predict") or {},
        (runtime_dict.get("preprocess") or {}).get("normalize", "none"),
    )
    for q in q_levels:
        member_frames = [
            pd.read_csv(
                quantile_out_path(f"{out_path}.member{i}.csv", q),
                encoding="utf-8-sig",
            )
            for i in range(len(member_dirs))
        ]
        q_stack = np.stack(
            [f.iloc[:, 1:].to_numpy(dtype=np.float64) for f in member_frames]
        )
        q_out = member_frames[0].copy()
        q_out.iloc[:, 1:] = (
            np.median(q_stack, axis=0) if reduce == "median" else q_stack.mean(axis=0)
        )
        q_path = quantile_out_path(out_path, q)
        q_out.to_csv(q_path, index=False, encoding="utf-8-sig")
        console().print(
            f"[bold green]Saved {reduce}-of-{len(member_dirs)} "
            f"{quantile_label(q)} ensemble submission:[/bold green] {q_path}"
        )
    return out_path


def predict_once(cfg: PipelineConfig | Dict[str, Any]) -> str:
    if isinstance(cfg, PipelineConfig):
        runtime_cfg = cfg
    elif isinstance(cfg, dict):
        runtime_cfg = PipelineConfig.from_mapping(cfg)
    else:
        raise TypeError("cfg must be a PipelineConfig or mapping")

    runtime_dict = runtime_cfg.to_dict()
    ensemble_dirs = (runtime_dict.get("predict") or {}).get("ensemble_dirs") or []
    if ensemble_dirs:
        return _predict_ensemble(runtime_dict, ensemble_dirs)
    runtime_artifacts = runtime_dict.setdefault("artifacts", {})
    runtime_artifacts.setdefault("signature_file", "model_signature.json")
    runtime_artifacts.setdefault("metadata_file", "metadata.json")
    art_dir = runtime_artifacts["dir"]

    from .config import load_yaml

    trained_cfg = PipelineConfig.from_mapping(
        load_yaml(os.path.join(art_dir, runtime_artifacts.get("config_file", "config_used.yaml")))
    )
    merged = trained_cfg.to_dict()
    merged.setdefault("artifacts", {}).update(runtime_artifacts)
    for key, value in runtime_dict.items():
        if key == "artifacts":
            continue
        if isinstance(value, dict):
            merged.setdefault(key, {}).update(value)
        else:
            merged[key] = value
    active_cfg = PipelineConfig.from_mapping(merged)
    cfg_used = active_cfg.to_dict()

    from .train import _pin_platform

    _pin_platform(cfg_used.get("train", {}).get("device"))

    metadata_path = os.path.join(art_dir, cfg_used["artifacts"].get("metadata_file", "metadata.json"))
    try:
        metadata_artifact = metadata_utils.load_metadata_artifact(metadata_path)
    except FileNotFoundError as err:
        raise FileNotFoundError(
            f"Metadata artifact '{metadata_path}' not found; run training to generate it."
        ) from err
    except ValueError as err:
        raise ValueError(f"Failed to load metadata artifact '{metadata_path}': {err}") from err
    metadata_artifact.validate_config(active_cfg)

    signature_path = os.path.join(
        art_dir, cfg_used["artifacts"].get("signature_file", "model_signature.json")
    )
    signature_meta: Optional[Mapping[str, Any]] = None
    if os.path.exists(signature_path):
        try:
            signature_meta = metadata_utils.load_json(signature_path)
        except Exception as err:  # noqa: BLE001
            console().print(
                f"[yellow]Failed to read signature metadata '{signature_path}': {err}. "
                "Continuing without compatibility checks.[/yellow]"
            )
    else:
        console().print(
            f"[yellow]Signature metadata '{signature_path}' not found; compatibility "
            "checks skipped.[/yellow]"
        )
    if signature_meta is not None:
        _validate_signature(signature_meta, active_cfg)

    scaler_meta = artifacts_io.load_pickle(
        os.path.join(art_dir, cfg_used["artifacts"].get("scaler_file", "scaler.pkl"))
    )
    schema_obj, schema_meta = artifacts_io.load_schema_artifact(
        os.path.join(art_dir, cfg_used["artifacts"].get("schema_file", "schema.json"))
    )
    schema_obj.validate_overrides(cfg_used.get("data", {}))
    preprocess_cfg = cfg_used.setdefault("preprocess", {})
    artifacts_io.validate_normalization_config(preprocess_cfg, schema_meta.get("normalization"))

    ids: List[str] = list(scaler_meta["ids"])
    metadata_artifact.validate_artifacts(
        schema=schema_obj, scaler_meta=scaler_meta, num_series=len(ids)
    )
    method = scaler_meta["method"]
    scaler = scaler_meta["scaler"]

    time_feature_meta = scaler_meta.get("time_features") or {}
    data_time_cfg = dict(cfg_used.get("data", {}).get("time_features") or {})
    meta_config = dict(time_feature_meta.get("config") or data_time_cfg)
    meta_enabled = bool(time_feature_meta.get("enabled", meta_config.get("enabled", False)))
    meta_dim = int(time_feature_meta.get("feature_dim", meta_config.get("feature_dim", 0)) or 0)
    meta_freq = time_feature_meta.get("freq") or meta_config.get("freq")
    meta_config.setdefault("enabled", meta_enabled)
    cfg_used.setdefault("data", {}).setdefault("time_features", {}).update(
        {"feature_dim": meta_dim, "freq": meta_freq, "enabled": meta_enabled}
    )
    time_features_enabled = bool(meta_enabled and meta_dim > 0)

    if signature_meta is not None and isinstance(signature_meta.get("data"), Mapping):
        data_sig = signature_meta["data"]
        if data_sig.get("num_series") is not None and int(data_sig["num_series"]) != len(ids):
            raise ValueError(
                f"Checkpoint expects {data_sig['num_series']} series but scaler metadata "
                f"provides {len(ids)}"
            )
        if data_sig.get("time_feature_dim") is not None and int(
            data_sig["time_feature_dim"]
        ) != meta_dim:
            raise ValueError("Time feature dimension does not match checkpoint metadata")
        if data_sig.get("time_features_enabled") is not None and bool(
            data_sig["time_features_enabled"]
        ) != bool(time_features_enabled):
            raise ValueError("Time feature enablement differs from checkpoint metadata")

    # static features: optional standalone artifact wins, else scaler metadata
    # (reference predict.py:466-507 incl. the graceful fallbacks)
    static_features_np = None
    static_feature_ids: Optional[List[str]] = None
    static_file = cfg_used["artifacts"].get("static_file")
    if static_file:
        static_path = static_file
        if not os.path.isabs(static_path):
            static_path = os.path.join(art_dir, static_path)
        try:
            payload = artifacts_io.load_pickle(static_path)
        except (FileNotFoundError, OSError) as err:
            console().print(
                f"[yellow]Static feature artifact not readable at {static_path} ({err}); "
                "falling back to scaler metadata.[/yellow]"
            )
        else:
            if isinstance(payload, dict):
                static_features_np = payload.get("static_features")
                payload_ids = payload.get("ids") or payload.get("series_ids")
                if payload_ids is not None:
                    static_feature_ids = list(payload_ids)
            elif isinstance(payload, np.ndarray):
                static_features_np = payload
            else:
                console().print(
                    f"[yellow]Unsupported static feature artifact type {type(payload)!r}; "
                    "falling back to scaler metadata.[/yellow]"
                )
            if static_features_np is None:
                console().print(
                    f"[yellow]Static feature artifact {static_path} did not contain "
                    "features; falling back to scaler metadata.[/yellow]"
                )
    if static_features_np is None:
        static_features_np = scaler_meta.get("static_features")
        static_feature_ids = static_feature_ids or list(ids)
    static_full: Optional[np.ndarray] = None
    if static_features_np is not None:
        arr = np.asarray(static_features_np, dtype=np.float32)
        if arr.ndim == 1:
            arr = arr.reshape(-1, 1)
        if arr.ndim == 2:
            base_ids = static_feature_ids or ids
            limit = min(arr.shape[0], len(base_ids))
            id_to_row = {base_ids[i]: i for i in range(limit)}
            static_full = np.zeros((len(ids), arr.shape[1]), np.float32)
            missing_static = []
            for pos, sid in enumerate(ids):
                row = id_to_row.get(sid)
                if row is None:
                    missing_static.append(sid)
                else:
                    static_full[pos] = arr[row]
            if missing_static:
                console().print(
                    f"[yellow]Static features missing for {len(missing_static)} series; "
                    "zero-filled values will be used.[/yellow]"
                )
    if signature_meta is not None and isinstance(signature_meta.get("data"), Mapping):
        sig_static_dim = signature_meta["data"].get("static_feature_dim")
        actual_dim = int(static_full.shape[1]) if static_full is not None else 0
        if sig_static_dim is not None and int(sig_static_dim) != actual_dim:
            raise ValueError(
                f"Static feature dimension {actual_dim} does not match checkpoint "
                f"metadata {sig_static_dim}"
            )

    # ------------------------------------------------------------------ model
    window_cfg = active_cfg.window
    input_len = window_cfg.input_len
    pred_len = window_cfg.pred_len
    model_cfg_raw = cfg_used["model"]
    train_cfg = cfg_used["train"]
    params, aux = artifacts_io.load_checkpoint(
        os.path.join(art_dir, cfg_used["artifacts"].get("model_file", "timesnet.msgpack"))
    )
    sigma_vector = aux.get("min_sigma_vector")
    if sigma_vector is not None:
        sigma_vector = np.asarray(sigma_vector, np.float32).reshape(-1)
    min_sigma_scalar = float(
        aux.get("min_sigma_effective", train_cfg.get("min_sigma_effective", 1e-3))
    )

    id_vocab = _expand_embedding(params, len(ids))
    static_dim = int(static_full.shape[1]) if static_full is not None else 0
    tn_cfg = TimesNetConfig(
        input_len=input_len,
        pred_len=pred_len,
        d_model=int(model_cfg_raw["d_model"]),
        d_ff=int(model_cfg_raw.get("d_ff", 4 * int(model_cfg_raw["d_model"]))),
        n_layers=int(model_cfg_raw["n_layers"]),
        k_periods=int(model_cfg_raw["k_periods"]),
        kernel_set=tuple(tuple(k) for k in active_cfg.model.kernel_set),
        dropout=float(model_cfg_raw["dropout"]),
        activation=str(model_cfg_raw["activation"]),
        mode=str(model_cfg_raw["mode"]),
        bottleneck_ratio=float(model_cfg_raw.get("bottleneck_ratio", 1.0)),
        min_period_threshold=int(model_cfg_raw.get("min_period_threshold", 1)),
        use_checkpoint=False,
        use_embedding_norm=bool(model_cfg_raw.get("use_embedding_norm", True)),
        embed_norm_mode=model_cfg_raw.get("embed_norm_mode"),
        min_sigma=min_sigma_scalar,
        id_embed_dim=int(model_cfg_raw.get("id_embed_dim", 32)),
        static_proj_dim=active_cfg.model.static_proj_dim,
        static_layernorm=bool(model_cfg_raw.get("static_layernorm", True)),
        use_zero_mean_context=bool(model_cfg_raw.get("use_zero_mean_context", False)),
        context_rank=max(0, int(model_cfg_raw.get("context_rank", 0))),
        context_scale=float(model_cfg_raw.get("context_scale", 1e-2)),
        use_constant_context_bias=bool(model_cfg_raw.get("use_constant_context_bias", False)),
        use_late_bias_head=bool(model_cfg_raw.get("use_late_bias_head", True)),
        c_in=1,
        static_dim=static_dim,
        time_features=meta_dim if time_features_enabled else 0,
        id_vocab=id_vocab,
        period_max_unique=model_cfg_raw.get("period_max_unique"),
        period_binning=model_cfg_raw.get("period_binning"),
        compute_dtype=str(model_cfg_raw.get("compute_dtype", "float32")),
        use_pallas=bool(model_cfg_raw.get("use_pallas", False)),
        period_buckets=model_cfg_raw.get("period_buckets"),
        period_cap=(
            int(model_cfg_raw["period_cap"])
            if model_cfg_raw.get("period_cap") is not None
            else None
        ),
    )
    # Inference-side trace-time period specialization
    # (``predict.freeze_periods``: off|auto|on, default off). When the
    # training run froze (``train.frozen_periods_spec`` in config_used.yaml
    # records the spec active at the best checkpoint), build the model with
    # those static periods: the fold runs dense exact-extent programs instead
    # of the masked worst-case extent. NOTE the semantics: the dynamic path
    # re-selects periods from each TEST window's FFT, while freezing pins the
    # training-time selection — identical within 1e-5 when the selections
    # agree (tests/test_freeze_periods.py) but a genuine behavioural switch
    # when they drift, hence off by default on the whole-batch path.
    #
    # Chunk-aware default (VERDICT r4 #6): chunked prediction selects periods
    # PER CHUNK (a chunk-local batch mean), which is batch-composition
    # dependent — the reference has the same weakness at
    # src/timesnet_forecast/models/timesnet.py:111-112 — and measurably worse
    # at N=10k (sMAPE 0.5849 chunked vs 0.5784 full-batch, BENCHMARKS.md).
    # Freezing to the training-time spec makes chunked inference
    # selection-invariant, so when the config is silent AND chunking will be
    # active, default to ``auto`` (engages only if the checkpoint stored a
    # spec; degrades to dynamic otherwise). Explicit settings always win.
    predict_cfg_raw = cfg_used.get("predict") or {}
    raw_freeze = predict_cfg_raw.get("freeze_periods")
    if raw_freeze is None:
        will_chunk = _resolve_chunk_rows(predict_cfg_raw, len(ids), 1) is not None
        raw_freeze = "auto" if will_chunk else "off"
        if will_chunk:
            console().print(
                "[dim]freeze_periods defaulting to 'auto' (chunked predict: "
                "pin the trained period selection if the checkpoint froze)[/dim]"
            )
    freeze_mode = Engine.parse_freeze_mode(raw_freeze)
    if freeze_mode in ("auto", "on"):
        import dataclasses as _dc

        try:
            stored_spec = Engine.frozen_spec_from_config(
                train_cfg.get("frozen_periods_spec"), tn_cfg.n_layers
            )
        except ValueError as err:
            if freeze_mode == "on":
                raise
            console().print(
                f"[yellow]predict.freeze_periods=auto: stored spec unusable "
                f"({err}); using the dynamic path.[/yellow]"
            )
            stored_spec = None
        if stored_spec is not None:
            tn_cfg = _dc.replace(tn_cfg, frozen_periods=stored_spec)
            periods = sorted({p for layer in stored_spec for p, _, v in layer if v})
            console().print(
                f"[dim]freeze_periods: inference specialized to stored "
                f"periods {periods}[/dim]"
            )
        elif freeze_mode == "on":
            raise ValueError(
                "predict.freeze_periods=on but the checkpoint's config_used.yaml "
                "carries no train.frozen_periods_spec (the training run never "
                "froze); retrain with train.freeze_periods=on or use auto/off"
            )
    engine = Engine(tn_cfg, num_series=len(ids))

    # Data-parallel inference (``predict.data_parallel: auto|off``, default
    # auto): the per-file forward is one [num_series, L, 1] batch — shard its
    # leading axis over the mesh with params replicated, pad the row count to
    # the mesh size, slice the padding back off. Single-process only (the
    # sharded output is fetched with one np.asarray); the forward is
    # row-independent so padded rows cannot perturb real ones.
    import jax as _jax

    from .parallel.mesh import make_mesh, replicated, shard_batch

    predict_dp = str(
        (cfg_used.get("predict") or {}).get("data_parallel", "auto")
    ).lower() not in ("off", "false", "0", "no")
    pred_mesh = None
    if predict_dp and _jax.process_count() == 1 and len(_jax.devices()) > 1:
        pred_mesh = make_mesh()
        params = _jax.device_put(params, replicated(pred_mesh))
        console().print(
            f"[bold green]Predict:[/bold green] data-parallel over "
            f"{pred_mesh.devices.size} devices"
        )

    id_position_map = {sid: i for i, sid in enumerate(ids)}
    t_prep = time.monotonic()
    (
        test_batches,
        row_meta,
        row_order,
        test_parts,
        new_ids,
        test_ids_union,
        missing_by_part,
    ) = _prepare_test_batches(
        data_cfg=cfg_used.setdefault("data", {}),
        preprocess_cfg=preprocess_cfg,
        schema_obj=schema_obj,
        ids=ids,
        id_position_map=id_position_map,
        pred_len=pred_len,
        # Recursive decode is horizon-agnostic (lax.scan rollout), so cover the
        # full requested horizon instead of zero-filling rows beyond pred_len
        # (the reference truncates recursive forecasts to pred_len too —
        # reference predict.py:189,942-945 — but a rolled-out forecast strictly
        # dominates the default fill for every row the writer would pad).
        full_horizon_decode=(tn_cfg.mode != "direct"),
    )
    console().print(
        f"[dim]prepared {len(test_batches)} test batches in "
        f"{time.monotonic() - t_prep:.1f}s[/dim]"
    )

    encoding = cfg_used["data"].get("encoding", "utf-8")
    sample_df: Optional[pd.DataFrame] = None
    sample_path = cfg_used["data"].get("sample_submission")
    if sample_path:
        try:
            sample_df = pd.read_csv(sample_path, encoding=encoding)
        except (FileNotFoundError, OSError) as err:
            console().print(
                f"[yellow]Sample submission not readable at {sample_path} ({err}); a "
                "template will be synthesized from test inputs.[/yellow]"
            )

    missing_global = sorted(set(ids) - set(test_ids_union))
    new_ids_sorted = sorted(set(new_ids))

    # Predictive intervals (no reference analogue): predict.quantiles renders
    # one extra submission per level from the NB2 head's (mu, alpha).
    q_levels, q_method = parse_quantile_config(
        cfg_used.get("predict") or {}, method
    )
    q_pred_lists: Dict[float, List[pd.DataFrame]] = {q: [] for q in q_levels}

    pred_list: List[pd.DataFrame] = []
    for batch in test_batches:
        X = batch.wide.values.astype(np.float32)
        Xn = transform_array(X, ids, scaler, method) if method != "none" and scaler else X

        disable_marks = False
        if Xn.shape[0] < input_len:
            missing_rows = input_len - Xn.shape[0]
            strategy = window_cfg.short_series_strategy
            if strategy == "repeat":
                pad_source = Xn[:1] if Xn.size else np.zeros((1, Xn.shape[1]), np.float32)
                Xn = np.concatenate([np.repeat(pad_source, missing_rows, axis=0), Xn], axis=0)
                disable_marks = True
                console().print(
                    f"[yellow]{batch.name} shorter than input_len={input_len}; repeating "
                    "earliest observations to fill the window.[/yellow]"
                )
            elif strategy == "pad":
                pad_block = np.full(
                    (missing_rows, Xn.shape[1]), window_cfg.pad_value, np.float32
                )
                Xn = np.concatenate([pad_block, Xn], axis=0)
                disable_marks = True
                console().print(
                    f"[yellow]{batch.name} shorter than input_len={input_len}; padding "
                    f"leading values with {window_cfg.pad_value}.[/yellow]"
                )
            else:
                raise ValueError(
                    f"Test series '{batch.path}' shorter than required input_len={input_len} "
                    "and window.short_series_strategy='error'"
                )

        gather = np.asarray(batch.gather_positions, dtype=np.int64)
        # one model row per present series: [num_series, input_len, 1]
        xb = np.transpose(Xn[-input_len:, :][:, gather], (1, 0))[:, :, None]
        num_series = xb.shape[0]
        if num_series == 0:
            raise ValueError(f"Test series '{batch.path}' does not contain any matching ids")

        decode_steps = len(batch.pred_row_keys)
        x_mark = y_mark = None
        if time_features_enabled and not disable_marks:
            recent_index = batch.history_index[-input_len:]
            active_tf = dict(meta_config)
            active_tf["enabled"] = True
            freq_str = meta_freq or cfg_used.get("data", {}).get("time_features", {}).get("freq")
            if freq_str is None:
                freq_str = pd.infer_freq(batch.history_index)
            if freq_str is None:
                console().print(
                    "[yellow]Unable to infer frequency for time features during prediction; "
                    "temporal marks disabled for this batch.[/yellow]"
                )
            else:
                try:
                    to_offset(freq_str)
                except (ValueError, TypeError) as err:
                    console().print(
                        f"[yellow]Invalid frequency '{freq_str}' for time features ({err}); "
                        "disabling temporal marks for this batch.[/yellow]"
                    )
                else:
                    combined = recent_index.append(batch.future_dates[:decode_steps])
                    marks = build_time_features(combined, active_tf)
                    if marks.shape[1] != meta_dim:
                        console().print(
                            "[yellow]Time feature dimension mismatch during prediction; "
                            "temporal marks disabled for this batch.[/yellow]"
                        )
                    else:
                        x_mark = np.broadcast_to(
                            marks[:input_len][None], (num_series, input_len, meta_dim)
                        ).copy()
                        y_mark = np.broadcast_to(
                            marks[input_len:][None], (num_series, decode_steps, meta_dim)
                        ).copy()
        elif time_features_enabled and disable_marks:
            console().print(
                f"[yellow]Temporal marks disabled for {batch.name} because padded windows "
                "may not align with calendar frequencies.[/yellow]"
            )

        static = static_full[gather][:, None, :] if static_full is not None else None
        ids_arr = gather.reshape(-1, 1).astype(np.int32)
        floor = (
            sigma_vector[gather].reshape(-1, 1, 1) if sigma_vector is not None else None
        )

        host_arrays = {
            "x": xb,
            "x_mark": x_mark,
            "y_mark": y_mark,
            "static": static,
            "ids": ids_arr,
            "floor": floor,
            "row_valid": None,
        }

        def run_rows(
            chunk_arrays: Dict[str, Optional[np.ndarray]], n_rows: int, want_disp: bool
        ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
            """Pad to the mesh, forward one fixed-shape block, fetch rows [0, n_rows)."""

            arrays = chunk_arrays
            if pred_mesh is not None:
                m = int(pred_mesh.devices.size)
                pad = (-arrays["x"].shape[0]) % m
                if pad:
                    valid = arrays.get("row_valid")
                    if valid is None:
                        valid = np.ones(arrays["x"].shape[0], np.float32)
                    arrays = {
                        k: (
                            np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                            if v is not None
                            else None
                        )
                        for k, v in arrays.items()
                    }
                    # period selection/grouping take batch means; row_valid
                    # masks the padded rows out so the sharded forward selects
                    # exactly what the unpadded single-device batch would
                    arrays["row_valid"] = np.concatenate(
                        [valid, np.zeros(pad, np.float32)]
                    )
                arrays = shard_batch(pred_mesh, arrays)
            else:
                arrays = {
                    k: (jnp.asarray(v) if v is not None else None)
                    for k, v in arrays.items()
                }
            kw = dict(
                x_mark=arrays["x_mark"],
                static=arrays["static"],
                ids=arrays["ids"],
                floor=arrays["floor"],
                row_valid=arrays["row_valid"],
            )
            if tn_cfg.mode == "direct":
                rate_pred, disp_pred = engine.forward(params, arrays["x"], **kw)
            else:
                rate_pred, disp_pred = engine.rollout(
                    params,
                    arrays["x"],
                    decode_steps,
                    y_mark=arrays["y_mark"],
                    **kw,
                )
            rate = np.asarray(rate_pred)[:n_rows, :, 0]  # [n_rows, H]
            disp = np.asarray(disp_pred)[:n_rows, :, 0] if want_disp else None
            return rate, disp

        mesh_size = int(pred_mesh.devices.size) if pred_mesh is not None else 1
        chunk_rows = _resolve_chunk_rows(
            cfg_used.get("predict"), num_series, mesh_size
        )
        t_fwd = time.monotonic()
        if chunk_rows is None:
            rate_np, disp_np = run_rows(host_arrays, num_series, bool(q_levels))
        else:
            # fixed-shape blocks: pad the tail with repeats of the last row and
            # mask them via row_valid, so every chunk reuses ONE compiled program
            rates: List[np.ndarray] = []
            disps: List[np.ndarray] = []
            for lo in range(0, num_series, chunk_rows):
                hi = min(lo + chunk_rows, num_series)
                pad = chunk_rows - (hi - lo)
                sub = {
                    k: (
                        np.concatenate([v[lo:hi], np.repeat(v[hi - 1 : hi], pad, axis=0)])
                        if pad
                        else v[lo:hi]
                    )
                    if v is not None
                    else None
                    for k, v in host_arrays.items()
                }
                sub["row_valid"] = np.concatenate(
                    [np.ones(hi - lo, np.float32), np.zeros(pad, np.float32)]
                )
                rate_c, disp_c = run_rows(sub, hi - lo, bool(q_levels))
                rates.append(rate_c)
                if disp_c is not None:
                    disps.append(disp_c)
            rate_np = np.concatenate(rates, axis=0)
            disp_np = np.concatenate(disps, axis=0) if disps else None
        console().print(
            f"[dim]{batch.name}: forward {num_series} rows in "
            f"{time.monotonic() - t_fwd:.1f}s"
            + (f" ({chunk_rows}-row chunks)" if chunk_rows else "")
            + "[/dim]"
        )
        effective_steps = len(batch.pred_row_keys)
        Pn = np.zeros((effective_steps, len(ids)), np.float32)
        Pn[:, gather] = rate_np[:, :effective_steps].T
        P = inverse_transform(Pn, ids, scaler, method=method)
        P = np.clip(P, 0.0, None)
        pred_df = pd.DataFrame(P, columns=ids)
        pred_df["row_key"] = batch.pred_row_keys[:effective_steps]
        pred_list.append(pred_df.set_index("row_key"))

        if q_levels:
            # Quantiles are computed in model space and pushed through the
            # (monotone affine) inverse scaler — quantiles commute with
            # monotone transforms, so this is exact for every scaler method.
            qs = predictive_quantiles(
                q_levels,
                rate_np[:, :effective_steps],
                disp_np[:, :effective_steps],
                method=q_method,
            )
            for q, qv in qs.items():
                Qn = np.zeros((effective_steps, len(ids)), np.float32)
                Qn[:, gather] = np.asarray(qv, np.float32).T
                Q = np.clip(
                    inverse_transform(Qn, ids, scaler, method=method), 0.0, None
                )
                q_df = pd.DataFrame(Q, columns=ids)
                q_df["row_key"] = batch.pred_row_keys[:effective_steps]
                q_pred_lists[q].append(q_df.set_index("row_key"))

    preds = merge_forecasts(pred_list)
    t_write = time.monotonic()
    submission_cfg = cfg_used.setdefault("submission", {})
    context = build_submission_context(
        predictions=preds,
        sample_df=sample_df,
        row_meta=row_meta,
        row_order=row_order,
        test_parts=test_parts,
        ids=ids,
        new_ids=new_ids_sorted,
        missing_ids=missing_global,
        missing_by_part=missing_by_part,
        submission_cfg=submission_cfg,
    )
    writer_cls = get_submission_writer(submission_cfg.get("format", "date_menu"))
    writer = writer_cls(
        default_fill_value=context.default_fill_value,
        missing_policy=submission_cfg.get("missing_policy"),
    )
    submission_df = writer.render(preds, context)

    output_path = submission_cfg.get("output_path") or submission_cfg.get("out_path")
    if not output_path:
        raise ValueError(
            "submission.output_path (or out_path) must be specified in the configuration"
        )
    out_dir = os.path.dirname(output_path)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    submission_df.to_csv(output_path, index=False, encoding="utf-8-sig")
    console().print(
        f"[bold green]Saved submission:[/bold green] {output_path} "
        f"[dim](render+write {time.monotonic() - t_write:.1f}s)[/dim]"
    )

    for q in q_levels:
        q_preds = merge_forecasts(q_pred_lists[q])
        q_df = writer.render(q_preds, context)
        q_path = quantile_out_path(output_path, q)
        q_df.to_csv(q_path, index=False, encoding="utf-8-sig")
        console().print(
            f"[bold green]Saved {quantile_label(q)} submission "
            f"({q_method}):[/bold green] {q_path}"
        )
    return output_path


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description="Run inference using stored artifacts with compatibility validation."
    )
    parser.add_argument("--config", type=str, default="configs/default.yaml")
    parser.add_argument("--override", nargs="*", default=[])
    args = parser.parse_args()
    cfg = PipelineConfig.from_files(args.config, overrides=args.override)
    predict_once(cfg)


if __name__ == "__main__":
    main()
