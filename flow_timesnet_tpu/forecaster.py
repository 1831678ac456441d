"""Serving API: load trained artifacts once, forecast windows programmatically.

The CLI predict path (``predict.py``) is file-to-file (test CSVs in,
submission CSV out). Production serving wants a resident object instead:
artifacts loaded and validated once, the model jitted once, then repeated
low-latency forecasts over in-memory history windows. This wraps the same
artifact contract (checkpoint + scaler + schema + metadata + signature).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
import pandas as pd

from .config import PipelineConfig, load_yaml
from .data.pivot import inverse_transform, transform_array
from .data.time_features import build_time_features
from .engine import Engine
from .models.timesnet import TimesNetConfig
from .predict import _expand_embedding
from .utils import artifacts as artifacts_io
from .utils import metadata as metadata_utils


class Forecaster:
    """Resident forecaster bound to one trained artifact directory."""

    def __init__(
        self,
        engine: Engine,
        params: Any,
        *,
        ids: List[str],
        scaler,
        method: str,
        static_features: Optional[np.ndarray],
        sigma_vector: Optional[np.ndarray],
        time_feature_config: Optional[Dict[str, Any]],
        time_feature_dim: int,
        freq: Optional[str],
    ) -> None:
        self.engine = engine
        self.params = params
        self.ids = ids
        self.id_position = {sid: i for i, sid in enumerate(ids)}
        self.scaler = scaler
        self.method = method
        self.static_features = static_features
        self.sigma_vector = sigma_vector
        self.time_feature_config = time_feature_config
        self.time_feature_dim = time_feature_dim
        self.freq = freq

    # ------------------------------------------------------------------
    @classmethod
    def from_artifacts(cls, art_dir: str, config_path: Optional[str] = None) -> "Forecaster":
        """Load and validate the train_once artifact set from ``art_dir``."""

        cfg_file = config_path or os.path.join(art_dir, "config_used.yaml")
        cfg = PipelineConfig.from_mapping(load_yaml(cfg_file))
        cfg_used = cfg.to_dict()
        artifacts = cfg_used.get("artifacts", {})

        metadata_path = os.path.join(art_dir, artifacts.get("metadata_file", "metadata.json"))
        metadata = metadata_utils.load_metadata_artifact(metadata_path)
        metadata.validate_config(cfg)

        scaler_meta = artifacts_io.load_pickle(
            os.path.join(art_dir, artifacts.get("scaler_file", "scaler.pkl"))
        )
        schema_obj, _schema_meta = artifacts_io.load_schema_artifact(
            os.path.join(art_dir, artifacts.get("schema_file", "schema.json"))
        )
        ids = list(scaler_meta["ids"])
        metadata.validate_artifacts(schema=schema_obj, scaler_meta=scaler_meta,
                                    num_series=len(ids))

        params, aux = artifacts_io.load_checkpoint(
            os.path.join(art_dir, artifacts.get("model_file", "timesnet.msgpack"))
        )
        sigma_vector = aux.get("min_sigma_vector")
        if sigma_vector is not None:
            sigma_vector = np.asarray(sigma_vector, np.float32).reshape(-1)
        min_sigma_scalar = float(
            aux.get("min_sigma_effective", cfg_used.get("train", {}).get("min_sigma_effective", 1e-3))
        )
        id_vocab = _expand_embedding(params, len(ids))

        tf_meta = scaler_meta.get("time_features") or {}
        tf_config = dict(tf_meta.get("config") or {})
        tf_enabled = bool(tf_meta.get("enabled", tf_config.get("enabled", False)))
        tf_dim = int(tf_meta.get("feature_dim", 0) or 0)
        freq = tf_meta.get("freq")

        static_arr = scaler_meta.get("static_features")
        static_np = (
            np.asarray(static_arr, np.float32) if static_arr is not None and np.size(static_arr)
            else None
        )

        model_raw = cfg_used["model"]
        tn_cfg = TimesNetConfig(
            input_len=cfg.window.input_len,
            pred_len=cfg.window.pred_len,
            d_model=int(model_raw["d_model"]),
            d_ff=int(model_raw.get("d_ff", 4 * int(model_raw["d_model"]))),
            n_layers=int(model_raw["n_layers"]),
            k_periods=int(model_raw["k_periods"]),
            kernel_set=tuple(tuple(k) for k in cfg.model.kernel_set),
            dropout=float(model_raw["dropout"]),
            activation=str(model_raw["activation"]),
            mode=str(model_raw["mode"]),
            bottleneck_ratio=float(model_raw.get("bottleneck_ratio", 1.0)),
            min_period_threshold=int(model_raw.get("min_period_threshold", 1)),
            use_embedding_norm=bool(model_raw.get("use_embedding_norm", True)),
            embed_norm_mode=model_raw.get("embed_norm_mode"),
            min_sigma=min_sigma_scalar,
            id_embed_dim=int(model_raw.get("id_embed_dim", 32)),
            static_proj_dim=cfg.model.static_proj_dim,
            static_layernorm=bool(model_raw.get("static_layernorm", True)),
            use_zero_mean_context=bool(model_raw.get("use_zero_mean_context", False)),
            context_rank=max(0, int(model_raw.get("context_rank", 0))),
            context_scale=float(model_raw.get("context_scale", 1e-2)),
            use_constant_context_bias=bool(model_raw.get("use_constant_context_bias", False)),
            use_late_bias_head=bool(model_raw.get("use_late_bias_head", True)),
            c_in=1,
            static_dim=int(static_np.shape[1]) if static_np is not None else 0,
            time_features=tf_dim if (tf_enabled and tf_dim > 0) else 0,
            id_vocab=id_vocab,
            period_max_unique=model_raw.get("period_max_unique"),
            period_binning=model_raw.get("period_binning"),
            compute_dtype=str(model_raw.get("compute_dtype", "float32")),
            use_pallas=bool(model_raw.get("use_pallas", False)),
            period_buckets=model_raw.get("period_buckets"),
            period_cap=(
                int(model_raw["period_cap"])
                if model_raw.get("period_cap") is not None
                else None
            ),
        )
        # Same inference-side specialization knob as predict_once
        # (predict.py): off by default because freezing pins the
        # training-time period selection instead of re-selecting per window.
        freeze_mode = Engine.parse_freeze_mode(
            (cfg_used.get("predict") or {}).get("freeze_periods", "off")
        )
        if freeze_mode in ("auto", "on"):
            import dataclasses as _dc

            try:
                stored_spec = Engine.frozen_spec_from_config(
                    cfg_used.get("train", {}).get("frozen_periods_spec"),
                    tn_cfg.n_layers,
                )
            except ValueError:
                if freeze_mode == "on":
                    raise
                stored_spec = None
            if stored_spec is not None:
                tn_cfg = _dc.replace(tn_cfg, frozen_periods=stored_spec)
            elif freeze_mode == "on":
                raise ValueError(
                    "predict.freeze_periods=on but the checkpoint carries no "
                    "train.frozen_periods_spec"
                )
        engine = Engine(tn_cfg, num_series=len(ids))
        return cls(
            engine,
            params,
            ids=ids,
            scaler=scaler_meta["scaler"],
            method=scaler_meta["method"],
            static_features=static_np,
            sigma_vector=sigma_vector,
            time_feature_config=tf_config if (tf_enabled and tf_dim > 0) else None,
            time_feature_dim=tf_dim,
            freq=freq,
        )

    # ------------------------------------------------------------------
    @property
    def input_len(self) -> int:
        return self.engine.cfg.input_len

    @property
    def pred_len(self) -> int:
        return self.engine.cfg.pred_len

    def forecast(
        self,
        history: pd.DataFrame | np.ndarray,
        series: Optional[Sequence[str]] = None,
        horizon: Optional[int] = None,
        return_dispersion: bool = False,
    ):
        """Forecast the next ``horizon`` steps for each requested series.

        Args:
            history: recent observations, either a DataFrame with a
                DatetimeIndex and series columns (named like the training
                ids) or a raw [T, n] array aligned with ``series``.
            series: series ids for the columns of ``history``; defaults to
                the DataFrame's columns (or all trained ids for arrays).
            horizon: steps ahead; defaults to the trained pred_len (direct
                mode forecasts exactly pred_len; recursive mode rolls out any
                horizon).
            return_dispersion: also return the NegBin dispersion.

        Returns a DataFrame (when history was a frame) or array of shape
        ``[horizon, n]`` of forecast rates in original units (clipped >= 0).
        """

        rate_np, disp_np, columns, future = self._forecast_raw(history, series, horizon)
        rate_out = np.clip(
            inverse_transform(rate_np, columns, self._sub_scaler(columns), self.method),
            0.0,
            None,
        )
        if future is not None:
            rate_out = pd.DataFrame(rate_out, index=future, columns=columns)
        if return_dispersion:
            return rate_out, disp_np
        return rate_out

    def _forecast_raw(
        self,
        history: pd.DataFrame | np.ndarray,
        series: Optional[Sequence[str]] = None,
        horizon: Optional[int] = None,
    ):
        """Model-space forward: ``(rate [H, n], dispersion [H, n], columns,
        future DatetimeIndex or None)`` — before any inverse transform/clip."""

        cfg = self.engine.cfg
        horizon = int(horizon or cfg.pred_len)
        if cfg.mode == "direct" and horizon > cfg.pred_len:
            raise ValueError(
                f"direct mode forecasts at most pred_len={cfg.pred_len} steps; "
                "train a recursive model for longer rollouts"
            )

        if isinstance(history, pd.DataFrame):
            columns = list(history.columns) if series is None else list(series)
            values = history[columns].to_numpy(dtype=np.float32)
            index = history.index if isinstance(history.index, pd.DatetimeIndex) else None
        else:
            values = np.asarray(history, np.float32)
            columns = list(series) if series is not None else list(self.ids)
            index = None
        if values.ndim != 2 or values.shape[1] != len(columns):
            raise ValueError("history must be [T, n] aligned with the series list")
        unknown = [c for c in columns if c not in self.id_position]
        if unknown:
            raise KeyError(f"Unknown series ids: {unknown[:5]}")
        if values.shape[0] < self.input_len:
            raise ValueError(
                f"history length {values.shape[0]} < required input_len {self.input_len}"
            )

        positions = np.asarray([self.id_position[c] for c in columns], np.int64)
        window = values[-self.input_len :, :]
        # scale with the trained per-series parameters of the selected columns
        scaled = transform_array(window, columns, self._sub_scaler(columns), self.method)
        xb = jnp.asarray(scaled.T[:, :, None])  # [n, L, 1]

        x_mark = y_mark = None
        if self.time_feature_config is not None and index is not None:
            recent = index[-self.input_len :]
            freq = self.freq or pd.infer_freq(index)
            if freq is not None:
                future = pd.date_range(
                    recent[-1] + pd.tseries.frequencies.to_offset(freq),
                    periods=horizon,
                    freq=freq,
                )
                marks = build_time_features(
                    recent.append(future), {**self.time_feature_config, "enabled": True}
                )
                if marks.shape[1] == self.time_feature_dim:
                    n = len(columns)
                    x_mark = jnp.asarray(
                        np.broadcast_to(marks[: self.input_len][None], (n, self.input_len, marks.shape[1])).copy()
                    )
                    y_mark = jnp.asarray(
                        np.broadcast_to(marks[self.input_len :][None], (n, horizon, marks.shape[1])).copy()
                    )
        elif self.time_feature_config is not None and index is None:
            raise ValueError(
                "model was trained with time features; pass a DataFrame with a DatetimeIndex"
            )

        static = (
            jnp.asarray(self.static_features[positions][:, None, :])
            if self.static_features is not None
            else None
        )
        ids_arr = jnp.asarray(positions.reshape(-1, 1).astype(np.int32))
        floor = (
            jnp.asarray(self.sigma_vector[positions].reshape(-1, 1, 1))
            if self.sigma_vector is not None
            else None
        )

        if cfg.mode == "direct":
            rate, disp = self.engine.forward(
                self.params, xb, x_mark=x_mark, static=static, ids=ids_arr, floor=floor
            )
            rate = rate[:, :horizon, :]
            disp = disp[:, :horizon, :]
        else:
            rate, disp = self.engine.rollout(
                self.params, xb, horizon, x_mark=x_mark, y_mark=y_mark,
                static=static, ids=ids_arr, floor=floor,
            )

        rate_np = np.asarray(rate)[:, :, 0].T  # [horizon, n]
        disp_np = np.asarray(disp)[:, :, 0].T
        future = None
        if isinstance(history, pd.DataFrame) and index is not None and self.freq:
            future = pd.date_range(
                index[-1] + pd.tseries.frequencies.to_offset(self.freq),
                periods=horizon,
                freq=self.freq,
            )
        return rate_np, disp_np, columns, future

    def forecast_quantiles(
        self,
        history: pd.DataFrame | np.ndarray,
        quantiles: Sequence[float] = (0.1, 0.5, 0.9),
        series: Optional[Sequence[str]] = None,
        horizon: Optional[int] = None,
        method: str = "auto",
    ) -> Dict[float, Any]:
        """NB2 predictive quantiles per series and step (original units).

        ``method``: ``"nb"`` (exact integer NB2 inverse CDF), ``"normal"``
        (moment-matched Gaussian), or ``"auto"`` (nb for unscaled count
        pipelines, normal otherwise). Quantiles are computed in model space
        — where the NB2 (mu, alpha) relation holds — then pushed through the
        monotone inverse scaler and clipped at zero in original units, the
        same order predict.py uses.
        """

        from .utils.quantiles import predictive_quantiles, resolve_method

        rate_np, disp_np, columns, future = self._forecast_raw(
            history, series, horizon
        )
        resolved = resolve_method(method, self.method)
        values = predictive_quantiles(quantiles, rate_np, disp_np, resolved)
        sub = self._sub_scaler(columns)
        out: Dict[float, Any] = {}
        for q, arr in values.items():
            arr = np.clip(
                inverse_transform(
                    np.asarray(arr, np.float32), columns, sub, self.method
                ),
                0.0,
                None,
            ).astype(np.float32)
            out[q] = (
                pd.DataFrame(arr, index=future, columns=columns)
                if future is not None
                else arr
            )
        return out

    def _sub_scaler(self, columns: List[str]):
        if self.scaler is None or self.method == "none":
            return None
        return {c: self.scaler[c] for c in columns}
