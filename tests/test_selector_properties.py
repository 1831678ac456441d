"""FFT period selector property tests (mirrors tests/test_fft_period_selector.py)."""

import math

import jax.numpy as jnp
import numpy as np

from flow_timesnet_tpu.models.period import select_periods


def _sinusoids(L, periods, amps, C=3, B=2, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(L, dtype=np.float32)
    base = sum(a * np.sin(2 * math.pi * t / p) for p, a in zip(periods, amps))
    x = np.stack([base for _ in range(C)], axis=-1)[None].repeat(B, 0)
    if noise:
        x = x + noise * rng.standard_normal(x.shape)
    return x.astype(np.float32)


def test_dominant_periods_and_amplitude_ordering():
    L = 48
    x = _sinusoids(L, [12, 6], [2.0, 1.0])
    sel = select_periods(jnp.asarray(x), 2, L, 1)
    periods = np.asarray(sel.periods)
    valid = np.asarray(sel.valid)
    assert valid.all()
    assert set(periods.tolist()) == {12, 6}
    amps = np.asarray(sel.amplitudes)
    # the stronger 12-period component must carry the larger amplitude
    idx12 = int(np.where(periods == 12)[0][0])
    idx6 = int(np.where(periods == 6)[0][0])
    assert np.all(amps[:, idx12] > amps[:, idx6])
    # top-k ordering follows score (largest first)
    assert periods[0] == 12


def test_bounds_clamping():
    L = 64
    x = _sinusoids(L, [32, 4], [2.0, 1.5])
    sel = select_periods(jnp.asarray(x), 2, pmax=16, min_period_threshold=6)
    periods = np.asarray(sel.periods)[np.asarray(sel.valid)]
    assert np.all(periods >= 6)
    assert np.all(periods <= 16)


def test_zero_k_and_degenerate_inputs():
    x = np.zeros((2, 16, 3), np.float32)
    sel = select_periods(jnp.asarray(x), 0, 16, 1)
    assert sel.periods.shape == (0,)
    assert sel.amplitudes.shape == (2, 0)
    sel2 = select_periods(jnp.asarray(np.zeros((2, 1, 3), np.float32)), 2, 16, 1)
    assert sel2.periods.shape == (0,)


def test_min_cycles_enforced():
    """Candidates with fewer than two cycles are masked invalid."""

    L = 20
    x = _sinusoids(L, [20], [2.0], noise=0.01)
    sel = select_periods(jnp.asarray(x), 3, L, 1)
    periods = np.asarray(sel.periods)
    valid = np.asarray(sel.valid)
    cycles = np.ceil(L / periods[valid])
    assert np.all(cycles >= 2)


def test_non_power_of_two_lengths():
    for L in (28, 45, 97):
        x = _sinusoids(L, [7], [2.0], noise=0.05, seed=L)
        sel = select_periods(jnp.asarray(x), 2, L, 1)
        periods = np.asarray(sel.periods)[np.asarray(sel.valid)]
        assert len(periods) > 0
        assert any(abs(int(p) - 7) <= 1 for p in periods), (L, periods)


def test_k_larger_than_spectrum_is_clamped():
    L = 8  # rfft bins = 5, k capped at 4
    x = _sinusoids(L, [4], [1.0])
    sel = select_periods(jnp.asarray(x), 10, L, 1)
    assert sel.periods.shape[0] == 4
