"""Metric parity: numpy implementations vs the reference, and the jitted
streaming accumulators vs the numpy finalisers."""

import numpy as np
import pytest

from torch_ref import HAS_REFERENCE

import jax.numpy as jnp

from flow_timesnet_tpu.utils.metrics import (
    smape_batch_sums,
    smape_mean,
    wsmape_batch_sums,
    wsmape_from_series_sums,
    wsmape_grouped,
)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    y = rng.poisson(3.0, size=(10, 4)).astype(np.float32)
    p = np.maximum(y + rng.normal(0, 1.0, y.shape), 0).astype(np.float32)
    ids = ["A_x", "A_y", "B_x", "C_z"]
    return y, p, ids


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkout missing")
def test_numpy_metrics_match_reference(data):
    from timesnet_forecast.utils.metrics import (
        smape_mean as ref_smape,
        wsmape_grouped as ref_wsmape,
    )

    y, p, ids = data
    assert smape_mean(y, p) == pytest.approx(ref_smape(y, p), abs=1e-9)
    assert wsmape_grouped(y, p, ids) == pytest.approx(ref_wsmape(y, p, ids=ids), abs=1e-9)
    weights = {"A": 2.0, "B": 1.0, "C": 0.5}
    assert wsmape_grouped(y, p, ids, weights) == pytest.approx(
        ref_wsmape(y, p, ids=ids, weights=weights), abs=1e-9
    )


def test_streaming_smape_equals_host(data):
    y, p, _ = data
    # stream in two chunks, batch-major [B, H, N]
    yb = y.reshape(2, 5, 4)
    pb = p.reshape(2, 5, 4)
    s = c = 0.0
    for b in range(2):
        ds, dc = smape_batch_sums(jnp.asarray(yb[b : b + 1]), jnp.asarray(pb[b : b + 1]))
        s += float(ds)
        c += float(dc)
    assert s / c == pytest.approx(smape_mean(y, p), abs=1e-6)


def test_streaming_wsmape_equals_host(data):
    y, p, ids = data
    yb = y.reshape(2, 5, 4)
    pb = p.reshape(2, 5, 4)
    sums = np.zeros(4, np.float32)
    cnts = np.zeros(4, np.float32)
    sid = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32)[None], (1, 4))
    for b in range(2):
        ds, dc = wsmape_batch_sums(
            jnp.asarray(yb[b : b + 1]), jnp.asarray(pb[b : b + 1]), sid, 4
        )
        sums += np.asarray(ds)
        cnts += np.asarray(dc)
    streamed = wsmape_from_series_sums(sums, cnts, ids)
    assert streamed == pytest.approx(wsmape_grouped(y, p, ids), abs=1e-6)


def test_smape_zero_actuals_are_skipped():
    y = np.zeros((4, 2), np.float32)
    p = np.ones((4, 2), np.float32)
    assert smape_mean(y, p) == 0.0
    assert wsmape_grouped(y, p, ["A_1", "B_2"]) == 0.0
