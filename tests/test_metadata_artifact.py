"""Metadata artifact: validation, version guard, legacy migration.

Mirrors the reference tests/test_metadata_artifact.py.
"""

import numpy as np
import pytest

from flow_timesnet_tpu.config import PipelineConfig
from flow_timesnet_tpu.data.schema import DataSchema
from flow_timesnet_tpu.utils.metadata import (
    MetadataArtifact,
    load_metadata_artifact,
    save_json,
    save_metadata_artifact,
)


@pytest.fixture
def schema():
    return DataSchema.from_fields({"date": "date", "id": "id", "target": "target"})


@pytest.fixture
def cfg():
    return PipelineConfig.from_mapping(
        {
            "data": {
                "date_col": "date",
                "id_col": "id",
                "target_col": "target",
                "time_features": {
                    "enabled": True,
                    "features": ["day_of_week"],
                    "encoding": "cyclical",
                    "normalize": True,
                    "feature_dim": 2,
                },
            },
            "model": {"input_len": 16, "pred_len": 4, "kernel_set": [[3, 3]]},
            "train": {"val": {"strategy": "holdout", "holdout_days": 24}},
        }
    )


def _artifact(cfg, schema):
    return MetadataArtifact.from_training(
        window=cfg.window,
        schema=schema,
        time_features={
            "enabled": True,
            "feature_dim": 2,
            "config": cfg.data.time_features.to_dict(),
            "freq": "D",
        },
        static_features={"feature_names": ["mean", "std"], "feature_dim": 2},
    )


def test_round_trip_and_validate(tmp_path, cfg, schema):
    artifact = _artifact(cfg, schema)
    path = str(tmp_path / "metadata.json")
    save_metadata_artifact(artifact, path)
    loaded = load_metadata_artifact(path)
    assert loaded.meta_version == "1"
    loaded.validate_config(cfg)  # must not raise

    drifted = cfg.apply_overrides(["window.pred_len=8", "data.horizon=8"])
    with pytest.raises(ValueError, match="pred_len"):
        loaded.validate_config(drifted)


def test_validate_artifacts_cross_checks(cfg, schema):
    artifact = _artifact(cfg, schema)
    good_meta = {
        "feature_names": ["mean", "std"],
        "static_features": np.zeros((3, 2), np.float32),
        "time_features": {"enabled": True, "feature_dim": 2, "freq": "D"},
    }
    artifact.validate_artifacts(schema=schema, scaler_meta=good_meta, num_series=3)
    bad_names = dict(good_meta, feature_names=["mean"])
    with pytest.raises(ValueError, match="Static feature names"):
        artifact.validate_artifacts(schema=schema, scaler_meta=bad_names, num_series=3)
    bad_dim = dict(good_meta, static_features=np.zeros((3, 4), np.float32))
    with pytest.raises(ValueError, match="dimension"):
        artifact.validate_artifacts(schema=schema, scaler_meta=bad_dim, num_series=3)
    bad_rows = dict(good_meta, static_features=np.zeros((5, 2), np.float32))
    with pytest.raises(ValueError, match="row count"):
        artifact.validate_artifacts(schema=schema, scaler_meta=bad_rows, num_series=3)
    bad_tf = dict(good_meta, time_features={"enabled": False, "feature_dim": 0})
    with pytest.raises(ValueError, match="enablement"):
        artifact.validate_artifacts(schema=schema, scaler_meta=bad_tf, num_series=3)


def test_version_guard(tmp_path):
    path = str(tmp_path / "metadata.json")
    save_json(
        {"meta_version": "99", "window": {}, "schema": {}, "time_features": {},
         "static_features": {}},
        path,
    )
    with pytest.raises(ValueError, match="not supported"):
        load_metadata_artifact(path)


def test_legacy_migration(tmp_path, cfg, schema):
    """A version-'0' payload (flat sections) upgrades transparently."""

    path = str(tmp_path / "metadata.json")
    save_json(
        {
            "window": cfg.window.to_dict(),
            "schema": schema.as_dict(),
            "time_features": {
                "enabled": True,
                "feature_dim": 2,
                "freq": "D",
                "config": {
                    "enabled": True,
                    "features": ["day_of_week"],
                    "encoding": "cyclical",
                    "normalize": True,
                },
            },
            "static_features": ["mean", "std"],  # legacy list form
        },
        path,
    )
    loaded = load_metadata_artifact(path)
    assert loaded.meta_version == "1"
    assert loaded.static_features == {"feature_names": ["mean", "std"], "feature_dim": 2}
    assert loaded.time_features["feature_dim"] == 2
    loaded.validate_config(cfg)
