"""Artifact IO: checkpoints (flax msgpack), scaler pickle, schema JSON.

Artifact set mirrors the reference's train->predict handoff
(``/root/reference/src/timesnet_forecast/train.py:1577-1668``): model weights,
``scaler.pkl`` (scaler + ids + static features + time-feature meta),
``schema.json`` (versioned, with a normalization block), ``config_used.yaml``,
``metadata.json`` and ``model_signature.json``. Model weights are stored as
flax msgpack (params + aux state such as the per-series dispersion floor)
instead of a torch state dict.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..data.schema import DataSchema
from .metadata import load_json, save_json

SCHEMA_ARTIFACT_VERSION = "1.0"
CHECKPOINT_VERSION = 1


# -- generic ---------------------------------------------------------------


def save_pickle(obj: Any, path: str) -> None:
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


# -- model checkpoint --------------------------------------------------------


def save_checkpoint(path: str, params: Any, aux: Optional[Mapping[str, Any]] = None) -> None:
    """Serialise a param pytree (+ small aux arrays) to msgpack bytes."""

    payload = {
        "version": CHECKPOINT_VERSION,
        "params": params,
        "aux": dict(aux or {}),
    }
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(_to_numpy_tree(payload)))


def load_checkpoint(path: str) -> Tuple[Any, Dict[str, Any]]:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if not isinstance(payload, dict) or "params" not in payload:
        raise ValueError(f"Unrecognised checkpoint payload in {path}")
    return payload["params"], dict(payload.get("aux") or {})


def _to_numpy_tree(tree: Any) -> Any:
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# -- full training state (true resume: params + optimizer + loop counters) ---


def save_train_state(path: str, state: Any, extra: Mapping[str, Any]) -> None:
    """Persist a TrainState pytree plus host-side loop state for resume.

    The reference has no mid-training resume (best-epoch weights only,
    SURVEY §5.4); this artifact adds it: optimizer moments, accumulation
    buffers and scheduler/early-stopping counters all round-trip.
    """

    payload = {
        "version": CHECKPOINT_VERSION,
        "state": serialization.to_state_dict(state),
        "extra": dict(extra),
    }
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(_to_numpy_tree(payload)))
    os.replace(tmp, path)


def load_train_state(path: str, template_state: Any) -> Tuple[Any, Dict[str, Any]]:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if not isinstance(payload, dict) or "state" not in payload:
        raise ValueError(f"Unrecognised train-state payload in {path}")
    state_sd = payload["state"]
    # ``ema`` migration: files written before the EMA field existed (or with
    # EMA off) lack a usable average, and files written with EMA on may be
    # resumed with it off. Reconcile against the template so every
    # combination round-trips instead of tripping flax's strict field match.
    template_sd = serialization.to_state_dict(template_state)
    if isinstance(state_sd, dict) and isinstance(template_sd, dict):
        if "ema" in template_sd:
            if template_sd["ema"] is None:
                state_sd["ema"] = None  # EMA off now: drop any stored average
            elif state_sd.get("ema") is None:
                # pre-EMA file (or EMA previously off): restart the average
                # from the resumed raw params (copies: distinct buffers, the
                # step programs donate the state)
                state_sd["ema"] = jax.tree_util.tree_map(
                    np.copy, state_sd.get("params", template_sd["ema"])
                )
        else:
            state_sd.pop("ema", None)
    state = serialization.from_state_dict(template_state, state_sd)
    return state, dict(payload.get("extra") or {})


# -- schema artifact ---------------------------------------------------------


def save_schema_artifact(
    path: str,
    schema: DataSchema,
    *,
    normalization: Mapping[str, Any] | None = None,
    extras: Mapping[str, Any] | None = None,
    version: str = SCHEMA_ARTIFACT_VERSION,
) -> None:
    payload: Dict[str, Any] = {
        "version": str(version),
        "fields": schema.as_dict(),
        "sources": dict(schema.sources),
        "detection": dict(schema.detection),
    }
    if normalization is not None:
        payload["normalization"] = dict(normalization)
    if extras is not None:
        payload["extras"] = dict(extras)
    save_json(payload, path)


def load_schema_artifact(path: str) -> Tuple[DataSchema, Dict[str, Any]]:
    payload = load_json(path)
    if not isinstance(payload, dict):
        raise ValueError("Schema artifact must be a JSON object")
    if "fields" in payload:
        fields = payload["fields"]
    else:  # legacy flat layout
        fields = {k: payload.get(k) for k in ("date", "id", "target")}
    schema = DataSchema.from_fields(
        fields, sources=payload.get("sources"), detection=payload.get("detection")
    )
    meta = {
        "version": payload.get("version", "0"),
        "normalization": payload.get("normalization"),
        "extras": payload.get("extras"),
        "raw": payload,
    }
    return schema, meta


def validate_normalization_config(
    preprocess_cfg: Dict[str, Any], normalization_meta: Mapping[str, Any] | None
) -> None:
    """Reconcile configured preprocess settings with the stored normalization.

    Missing configured values inherit the stored ones; conflicting values
    raise (reference ``io.py:691-741``).
    """

    if normalization_meta is None:
        return
    mismatches = []
    stored_method = normalization_meta.get("method")
    if stored_method is not None:
        configured = preprocess_cfg.get("normalize")
        if configured is None:
            preprocess_cfg["normalize"] = stored_method
        elif str(configured) != str(stored_method):
            mismatches.append(f"normalize configured='{configured}' stored='{stored_method}'")
    stored_ps = normalization_meta.get("per_series")
    if stored_ps is not None:
        configured = preprocess_cfg.get("normalize_per_series")
        if configured is None:
            preprocess_cfg["normalize_per_series"] = bool(stored_ps)
        elif bool(configured) != bool(stored_ps):
            mismatches.append(
                f"normalize_per_series configured='{configured}' stored='{stored_ps}'"
            )
    stored_eps = normalization_meta.get("eps")
    if stored_eps is not None:
        configured = preprocess_cfg.get("eps")
        if configured is None:
            preprocess_cfg["eps"] = stored_eps
        else:
            try:
                if not np.isclose(float(configured), float(stored_eps)):
                    mismatches.append(f"eps configured='{configured}' stored='{stored_eps}'")
            except (TypeError, ValueError):
                mismatches.append(f"eps configured='{configured}' stored='{stored_eps}'")
    if mismatches:
        raise ValueError(
            "Preprocess normalization settings do not match training artifacts: "
            + "; ".join(mismatches)
        )


# -- submission row keys ------------------------------------------------------


def parse_row_key(row_key: str) -> Tuple[str, int]:
    """Parse ``<part>+D<n>`` / ``<part>+Day n`` / ``<part>+n일`` row keys."""

    pattern = r"^(.*)\+(?:D(?:ay)?\s*)?(\d+)\D*$"
    match = re.match(pattern, row_key.strip(), flags=re.IGNORECASE)
    if not match:
        raise ValueError(f"Unsupported row key format: {row_key}")
    return match.group(1).strip(), int(match.group(2))
