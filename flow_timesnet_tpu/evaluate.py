"""Offline evaluation: score stored artifacts on a holdout of a CSV.

``evaluate_once(cfg)`` loads the trained artifact set (same validation chain
as predict), windows the tail ``train.val.holdout_days`` of the evaluation
CSV (``data.eval_csv``, defaulting to ``data.train_csv``) with the stored
scaler, and streams masked NB-NLL / sMAPE / grouped wSMAPE on device —
the standalone counterpart of the reference's in-training ``_eval_metrics``
/ ``_eval_wsmape`` (reference ``train.py:595-765``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import pandas as pd

from .config import PipelineConfig, load_yaml
from .data.pivot import read_long_pivot, transform_dataframe
from .data.windows import build_batcher
from .engine import batch_to_device
from .forecaster import Forecaster
from .utils.logging import console
from .utils.metadata import save_json
from .utils.metrics import wsmape_from_series_sums


def evaluate_once(cfg: PipelineConfig | Dict[str, Any]) -> Dict[str, float]:
    if isinstance(cfg, dict):
        cfg = PipelineConfig.from_mapping(cfg)
    cfg_used = cfg.to_dict()

    from .train import _pin_platform

    _pin_platform(cfg_used.get("train", {}).get("device"))
    art_dir = cfg_used.get("artifacts", {}).get("dir", "outputs/artifacts")
    fc = Forecaster.from_artifacts(
        art_dir,
        config_path=os.path.join(
            art_dir, cfg_used.get("artifacts", {}).get("config_file", "config_used.yaml")
        ),
    )
    trained_cfg = PipelineConfig.from_mapping(
        load_yaml(
            os.path.join(
                art_dir, cfg_used.get("artifacts", {}).get("config_file", "config_used.yaml")
            )
        )
    )

    data_cfg = cfg_used.get("data", {})
    eval_csv = data_cfg.get("eval_csv") or data_cfg.get("train_csv")
    if not eval_csv:
        raise ValueError("data.eval_csv (or data.train_csv) must point to the evaluation CSV")
    wide_raw = read_long_pivot(
        eval_csv,
        date_col=data_cfg.get("date_col", trained_cfg.data.date_col),
        id_col=data_cfg.get("id_col", trained_cfg.data.id_col),
        target_col=data_cfg.get("target_col", trained_cfg.data.target_col),
        fill_missing_dates=bool(data_cfg.get("fill_missing_dates", True)),
        fillna0=False,
        encoding=data_cfg.get("encoding", "utf-8"),
    )
    mask_wide = (~wide_raw.isna()).astype(np.float32)
    wide = wide_raw.fillna(0.0)
    if cfg_used.get("preprocess", {}).get("clip_negative", False):
        wide = wide.clip(lower=0.0)
    # align to the trained series set (zero-fill unseen columns)
    wide = wide.reindex(columns=fc.ids).fillna(0.0)
    mask_wide = mask_wide.reindex(columns=fc.ids).fillna(0.0)

    holdout = int(
        cfg_used.get("train", {}).get("val", {}).get("holdout_days")
        or trained_cfg.train.val_holdout_days
        or (fc.input_len + fc.pred_len)
    )
    tail = wide.iloc[-holdout:]
    tail_mask = mask_wide.iloc[-holdout:]
    tail_norm = transform_dataframe(tail, fc.ids, fc.scaler, fc.method)

    engine = fc.engine
    engine.use_loss_masking = bool(cfg_used.get("train", {}).get("use_loss_masking", True))
    mode = engine.cfg.mode
    tf_cfg = dict(fc.time_feature_config or {})
    batcher = build_batcher(
        [tail_norm.to_numpy(dtype=np.float32)],
        [tail_mask.to_numpy(dtype=np.float32)],
        fc.input_len,
        fc.pred_len,
        int(cfg_used.get("window", {}).get("stride", 1)),
        mode,
        int(cfg_used.get("train", {}).get("batch_size", 256)),
        shuffle=False,
        drop_last=False,
        recursive_pred_len=(fc.pred_len if mode == "recursive" else None),
        series_static=[fc.static_features],
        series_ids=[np.arange(len(fc.ids), dtype=np.int64)],
        time_indices=[pd.DatetimeIndex(tail_norm.index)] if tf_cfg else None,
        time_feature_config=tf_cfg or None,
        pad_final=True,
    )
    if batcher.total == 0:
        raise ValueError(
            "Evaluation holdout has no windows; increase train.val.holdout_days"
        )

    def floor_for(batch):
        if fc.sigma_vector is None or batch.series_ids is None:
            return None
        return fc.sigma_vector[batch.series_ids.reshape(-1)].reshape(-1, 1, 1)

    # Device-resident pass (one dispatch, one fetch — same machinery as
    # train_once's scanned validation); host iterator kept as the fallback.
    # Honours the same staging knobs as train_once: ``train.input_pipeline``
    # (host opts out entirely) and the ``train.device_stage_mb`` HBM budget.
    from .data.device_windows import epoch_index_plan
    from .train import _stage_from_batcher, _staged_nbytes

    pipeline_req = str(
        cfg_used.get("train", {}).get("input_pipeline", "auto")
    ).lower()
    stage_budget = (
        float(cfg_used.get("train", {}).get("device_stage_mb", 512) or 512) * 1e6
    )
    staged = None
    if pipeline_req != "host" and (
        pipeline_req == "device" or _staged_nbytes(batcher) <= stage_budget
    ):
        staged = _stage_from_batcher(batcher, fc.sigma_vector)
    if staged is not None:
        idx, rv = epoch_index_plan(
            staged.total,
            int(cfg_used.get("train", {}).get("batch_size", 256)),
            None,
            shuffle=False,
            drop_last=False,
        )
        metrics = engine.evaluate_resident(fc.params, staged, idx, rv)
    else:
        metrics = engine.evaluate(
            fc.params,
            (batch_to_device(b, floor=floor_for(b)) for b in batcher),
        )
    wsmape = wsmape_from_series_sums(
        metrics["series_sums"], metrics["series_cnts"], fc.ids
    )
    result = {
        "nll": float(metrics["nll"]),
        "smape": float(metrics["smape"]),
        "wsmape": float(wsmape),
        "windows": int(batcher.total),
        "holdout_days": holdout,
    }
    console().print(
        f"[bold green]Evaluation:[/bold green] nll={result['nll']:.6f} "
        f"smape={result['smape']:.6f} wsmape={result['wsmape']:.6f} "
        f"({result['windows']} windows over the last {holdout} rows)"
    )

    # Interval calibration (no reference analogue): when
    # ``evaluation.quantiles`` (or ``predict.quantiles``) is set, report the
    # empirical coverage P(y <= q-hat) and mean pinball loss of the NB2
    # head's quantiles over every masked holdout cell. Coverage is invariant
    # under the (monotone) scaler; pinball is reported in model space.
    from .utils.quantiles import parse_quantile_config, predictive_quantiles

    eval_cfg = cfg_used.get("evaluation") or {}
    q_cfg = eval_cfg if eval_cfg.get("quantiles") else (cfg_used.get("predict") or {})
    q_levels, q_method = parse_quantile_config(q_cfg, fc.method)
    if q_levels:
        cov_num = {q: 0.0 for q in q_levels}
        pin_num = {q: 0.0 for q in q_levels}
        weight_sum = 0.0
        for b in batcher:
            dev = batch_to_device(b, floor=floor_for(b))
            kw = dict(
                x_mark=dev.get("x_mark"),
                static=dev.get("static"),
                ids=dev.get("ids"),
                floor=dev.get("floor"),
                row_valid=dev.get("row_valid"),
            )
            if mode == "direct":
                rate, disp = engine.forward(fc.params, dev["x"], **kw)
            else:
                # recursive checkpoints emit one step per forward — roll out
                # the full horizon so quantiles align with the [B, H] targets
                rate, disp = engine.rollout(
                    fc.params,
                    dev["x"],
                    int(b.y.shape[1]),
                    y_mark=dev.get("y_mark"),
                    **kw,
                )
            mu = np.asarray(rate)[..., 0]  # [B, H]
            alpha = np.asarray(disp)[..., 0]
            y = b.y[..., 0]
            w = b.mask[..., 0] * b.row_valid[:, None]
            qs = predictive_quantiles(q_levels, mu, alpha, method=q_method)
            weight_sum += float(w.sum())
            for q, qv in qs.items():
                d = y - qv
                cov_num[q] += float((w * (y <= qv)).sum())
                pin_num[q] += float(
                    (w * np.maximum(q * d, (q - 1.0) * d)).sum()
                )
        denom = max(weight_sum, 1.0)
        result["quantiles"] = {
            str(q): {
                "coverage": round(cov_num[q] / denom, 4),
                "pinball": round(pin_num[q] / denom, 6),
            }
            for q in q_levels
        }
        result["quantile_method"] = q_method
        cov_str = " ".join(
            f"q{100 * q:g}: cov={result['quantiles'][str(q)]['coverage']:.3f} "
            f"pinball={result['quantiles'][str(q)]['pinball']:.4f}"
            for q in q_levels
        )
        console().print(
            f"[bold green]Interval calibration ({q_method}):[/bold green] {cov_str}"
        )
    out_path = eval_cfg.get("out_path")
    if out_path:
        save_json(result, out_path)
        console().print(f"[green]Saved:[/green] {out_path}")
    return result
