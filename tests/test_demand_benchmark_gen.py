"""The bundled quality-benchmark generator: schema fidelity + determinism."""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from make_demand_benchmark import (  # noqa: E402
    DATE_COL,
    HORIZON,
    ID_COL,
    TARGET_COL,
    TEST_FILES,
    simulate,
    write_benchmark,
)


def test_generator_is_deterministic():
    d1 = simulate(7)
    d2 = simulate(7)
    np.testing.assert_array_equal(d1[2], d2[2])
    assert simulate(8)[2].sum() != d1[2].sum()


def test_written_files_match_schema(tmp_path):
    out = str(tmp_path / "bench")
    write_benchmark(out, seed=7)

    train = pd.read_csv(os.path.join(out, "train.csv"), encoding="utf-8-sig")
    assert list(train.columns) == [DATE_COL, ID_COL, TARGET_COL]
    assert train[TARGET_COL].min() >= 0
    assert train[ID_COL].nunique() == 192
    # store grouping key (wsmape semantics): id.split('_', 1)[0]
    stores = train[ID_COL].str.split("_", n=1).str[0].nunique()
    assert stores == 8
    # ~2% of rows deliberately missing
    n_dates = train[DATE_COL].nunique()
    assert len(train) < n_dates * 192

    for i in range(TEST_FILES):
        t = pd.read_csv(os.path.join(out, "test", f"TEST_{i:02d}.csv"),
                        encoding="utf-8-sig")
        assert list(t.columns) == [DATE_COL, ID_COL, TARGET_COL]
        assert t[DATE_COL].nunique() <= 28

    sample = pd.read_csv(os.path.join(out, "sample_submission.csv"),
                         encoding="utf-8-sig")
    assert sample.shape == (TEST_FILES * HORIZON, 1 + 192)
    assert sample[DATE_COL].iloc[0] == "TEST_00+D1"
