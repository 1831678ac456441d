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


def test_return_params_same_stream_and_oracle_quantiles():
    """simulate(return_params=True) must not perturb the RNG stream, and the
    oracle quantiles built from the params must respect the generative law."""

    base = simulate(7)
    with_params = simulate(7, return_params=True)
    np.testing.assert_array_equal(base[2], with_params[2])  # demand identical
    params = with_params[5]
    assert set(params) == {"mu", "alpha", "intermittent", "closed"}
    assert params["mu"].shape == base[2].shape
    assert params["closed"].shape == base[2].shape
    # closure days really are zero-demand
    assert base[2][params["closed"]].max() == 0.0
    # expected = mu scaled by (1 - zero-inflation) on intermittent, 0 on closed
    expected = with_params[4]
    inter = params["intermittent"]
    open_cells = ~params["closed"]
    np.testing.assert_allclose(
        expected[:, ~inter][open_cells[:, ~inter]],
        params["mu"][:, ~inter][open_cells[:, ~inter]],
    )
    np.testing.assert_allclose(
        expected[:, inter][open_cells[:, inter]],
        0.45 * params["mu"][:, inter][open_cells[:, inter]],
    )

    from score_quantiles import oracle_quantiles

    oq, ids = oracle_quantiles(7, [0.1, 0.5, 0.9])
    assert list(ids) == with_params[1]
    assert (oq[0.1] <= oq[0.5]).all() and (oq[0.5] <= oq[0.9]).all()
    # oracle coverage at q: P(y <= ppf(q)) >= q (NB discreteness over-covers)
    from score_quantiles import _future_rows

    y = base[2][_future_rows()]
    for q in (0.1, 0.5, 0.9):
        assert (y <= oq[q]).mean() >= q - 0.02  # sampling noise allowance


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


def test_scorer_and_tools(tmp_path):
    from make_subset import main as subset_main  # noqa: F401  (import check)
    from score_submission import load_submission, score, truth_frame

    truth = truth_frame(7)
    assert truth.shape == (TEST_FILES * HORIZON, 192)
    assert list(truth.index)[:2] == ["TEST_00+D1", "TEST_00+D2"]

    # scoring the truth itself is a perfect forecast
    perfect = score(truth, truth)
    assert perfect["smape"] == 0.0 and perfect["wsmape"] == 0.0

    # oracle (conditional mean) beats any constant forecast
    oracle = score(truth_frame(7, use_expected=True), truth)
    zeros = truth * 0.0
    assert 0.0 < oracle["smape"] < score(zeros, truth)["smape"]

    # a row_key submission round-trips through load_submission, and a
    # date-keyed one maps back onto the same rows
    p = tmp_path / "sub.csv"
    wide = truth.reset_index().rename(columns={"index": DATE_COL})
    wide.to_csv(p, index=False, encoding="utf-8-sig")
    assert score(load_submission(str(p), truth), truth)["smape"] == 0.0

    dated = wide.copy()
    dated[DATE_COL] = [truth.attrs["date_of_key"][k] for k in truth.index]
    dated.to_csv(p, index=False, encoding="utf-8-sig")
    assert score(load_submission(str(p), truth), truth)["smape"] == 0.0


def test_subset_shares_scorer_columns(tmp_path):
    import subprocess

    src = str(tmp_path / "full")
    dst = str(tmp_path / "sub")
    write_benchmark(src, seed=7)
    tools = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    )
    subprocess.run(
        [sys.executable, os.path.join(tools, "make_subset.py"), src, dst,
         "--stores", "2"],
        check=True,
    )
    sample = pd.read_csv(os.path.join(dst, "sample_submission.csv"),
                         encoding="utf-8-sig")
    assert sample.shape[1] == 1 + 48

    from score_submission import load_submission, truth_frame

    truth = truth_frame(7)
    sub = load_submission(os.path.join(dst, "sample_submission.csv"), truth)
    assert sub.shape == (TEST_FILES * HORIZON, 48)
