"""Schema detection policies and pipeline-config normalisation/validation.

Mirrors the reference ``tests/test_schema_policies.py`` and
``tests/test_pipeline_config_overrides.py``.
"""

import numpy as np
import pandas as pd
import pytest

from flow_timesnet_tpu.config import PipelineConfig, apply_overrides
from flow_timesnet_tpu.data.schema import DataSchema
from flow_timesnet_tpu.utils.artifacts import parse_row_key


def _frame():
    return pd.DataFrame(
        {
            "date": pd.date_range("2024-01-01", periods=10).astype(str),
            "id": [f"S{i % 2}" for i in range(10)],
            "target": np.arange(10, dtype=float),
        }
    )


def test_schema_inference_by_names():
    schema = DataSchema.from_config({}, sample_df=_frame())
    assert schema.as_dict() == {"date": "date", "id": "id", "target": "target"}


def test_schema_korean_candidates():
    df = _frame().rename(
        columns={"date": "영업일자", "id": "영업장명_메뉴명", "target": "매출수량"}
    )
    schema = DataSchema.from_config({}, sample_df=df)
    assert schema.date_col == "영업일자"
    assert schema.id_col == "영업장명_메뉴명"
    assert schema.target_col == "매출수량"


def test_schema_strict_policy_rejects_ambiguity():
    df = _frame()
    df["sales"] = df["target"] * 2  # second numeric candidate
    with pytest.raises(ValueError, match="Ambiguous auto-detection"):
        DataSchema.from_config({"schema_detection_policy": "strict"}, sample_df=df)
    # overrides disambiguate
    schema = DataSchema.from_config(
        {"schema_detection_policy": "strict", "target_col": "sales"}, sample_df=df
    )
    assert schema.target_col == "sales"


def test_schema_manual_requires_all_overrides():
    with pytest.raises(ValueError, match="manual"):
        DataSchema.from_config(
            {"schema_detection_policy": "manual", "date_col": "date"}, sample_df=_frame()
        )
    schema = DataSchema.from_config(
        {
            "schema_detection_policy": "manual",
            "date_col": "date",
            "id_col": "id",
            "target_col": "target",
        },
        sample_df=_frame(),
    )
    assert schema.sources == {"date": "override", "id": "override", "target": "override"}


def test_schema_evolution_error_policy():
    df = _frame()
    extra = [np.nan] * 5 + list(range(5))
    df["late_feature"] = extra
    with pytest.raises(ValueError, match="Schema evolution"):
        DataSchema.from_config({"schema_evolution_policy": "error"}, sample_df=df)
    # warn policy records coverage metadata instead
    schema = DataSchema.from_config({"schema_evolution_policy": "warn"}, sample_df=df)
    assert "coverage" in schema.detection
    assert schema.detection["coverage"]["late_feature"]["missing_prefix"] is True


def test_validate_overrides_detects_drift():
    schema = DataSchema.from_config({}, sample_df=_frame())
    schema.validate_overrides({"date_col": "date"})
    with pytest.raises(ValueError, match="do not match stored artifact"):
        schema.validate_overrides({"date_col": "other"})


def _base_cfg():
    return {
        "data": {"time_features": {"enabled": False}},
        "model": {"input_len": 16, "pred_len": 4, "kernel_set": [[3, 3]]},
        "train": {"val": {"strategy": "holdout", "holdout_days": 24}},
    }


def test_window_extraction_reconciles_model_keys():
    cfg = PipelineConfig.from_mapping(_base_cfg())
    assert cfg.window.input_len == 16
    assert cfg.raw["model"]["input_len"] == 16
    over = cfg.apply_overrides(["window.input_len=32", "train.val.holdout_days=40"])
    assert over.window.input_len == 32
    assert over.raw["model"]["input_len"] == 32


def test_dotted_overrides_parse_yaml_scalars():
    out = apply_overrides(
        {"a": {"b": 1}}, ["a.b=2", "a.c=true", "a.d=1.5", "a.e=null", "a.f=text"]
    )
    assert out["a"] == {"b": 2, "c": True, "d": 1.5, "e": None, "f": "text"}


def test_validation_rules():
    bad = _base_cfg()
    bad["model"]["min_period_threshold"] = 99
    with pytest.raises(ValueError, match="min_period_threshold"):
        PipelineConfig.from_mapping(bad)
    bad2 = _base_cfg()
    bad2["train"]["val"]["holdout_days"] = 5
    with pytest.raises(ValueError, match="holdout_days"):
        PipelineConfig.from_mapping(bad2)
    bad3 = _base_cfg()
    bad3["data"]["horizon"] = 2
    with pytest.raises(ValueError, match="horizon"):
        PipelineConfig.from_mapping(bad3)


def test_kernel_set_normalisation():
    cfg = PipelineConfig.from_mapping(
        {**_base_cfg(), "model": {"input_len": 16, "pred_len": 4, "kernel_set": [3, [5, 7]]}}
    )
    assert cfg.model.kernel_set == ((3, 3), (5, 7))
    legacy = _base_cfg()
    legacy["model"] = {
        "input_len": 16, "pred_len": 4, "inception_kernel_set": [[3, 3]],
    }
    cfg2 = PipelineConfig.from_mapping(legacy)
    assert cfg2.model.kernel_set == ((3, 3),)


@pytest.mark.parametrize(
    "key,expected",
    [
        ("TEST_00+Day 1", ("TEST_00", 1)),
        ("TEST_00+D3", ("TEST_00", 3)),
        ("TEST_07+12일", ("TEST_07", 12)),
        ("part+day 4", ("part", 4)),
    ],
)
def test_parse_row_key_variants(key, expected):
    assert parse_row_key(key) == expected


def test_parse_row_key_rejects_garbage():
    with pytest.raises(ValueError):
        parse_row_key("no_plus_sign")
