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


def test_row_weight_masks_padding_out_of_selection_exactly():
    """select_periods/group_periods with zero-padded rows + row_weight must
    reproduce the unpadded batch's outputs exactly (DP padding invariance)."""

    import numpy as np

    from flow_timesnet_tpu.models.period import group_periods, select_periods

    rng = np.random.default_rng(0)
    B, L, C = 5, 24, 3
    t = np.arange(L)
    x = np.stack(
        [
            4
            + (2 + b) * np.sin(2 * np.pi * t / (7 if b < 3 else 4))[:, None]
            + rng.normal(0, 0.3, (L, C))
            for b in range(B)
        ]
    ).astype(np.float32)

    sel_ref = select_periods(jnp.asarray(x), 3, L, 2)
    g_ref = group_periods(
        sel_ref.periods, sel_ref.amplitudes, sel_ref.valid, seq_len=L, max_unique=2
    )

    # pad 5 -> 8 with zero rows; weight the real rows only
    pad = np.zeros((3, L, C), np.float32)
    xp = jnp.asarray(np.concatenate([x, pad]))
    w = jnp.asarray(np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32))
    sel_pad = select_periods(xp, 3, L, 2, row_weight=w)
    g_pad = group_periods(
        sel_pad.periods,
        sel_pad.amplitudes,
        sel_pad.valid,
        seq_len=L,
        max_unique=2,
        row_weight=w,
    )

    np.testing.assert_array_equal(np.asarray(sel_ref.periods), np.asarray(sel_pad.periods))
    np.testing.assert_array_equal(np.asarray(sel_ref.valid), np.asarray(sel_pad.valid))
    np.testing.assert_array_equal(
        np.asarray(sel_ref.freq_indices), np.asarray(sel_pad.freq_indices)
    )
    np.testing.assert_allclose(
        np.asarray(sel_ref.amplitudes), np.asarray(sel_pad.amplitudes)[:B], rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(g_ref.periods), np.asarray(g_pad.periods))
    np.testing.assert_array_equal(np.asarray(g_ref.canonical), np.asarray(g_pad.canonical))
    np.testing.assert_allclose(
        np.asarray(g_ref.weights), np.asarray(g_pad.weights)[:B], rtol=1e-6
    )
    assert np.all(np.isfinite(np.asarray(g_pad.weights)))

    # and WITHOUT the weight, heterogeneous padding (duplicates of one row)
    # genuinely changes the selection — the property the mask guards: three
    # period-7 rows pick bin L/7, but 20 duplicated period-4 rows make the
    # period-4 bin dominate the batch mean
    maj = np.stack(
        [4 + 8 * np.sin(2 * np.pi * t / 7)[:, None] + rng.normal(0, 0.1, (L, C))
         for _ in range(3)]
    ).astype(np.float32)
    minority = (
        4 + 6 * np.sin(2 * np.pi * t / 4)[:, None] + rng.normal(0, 0.1, (L, C))
    ).astype(np.float32)[None]
    base = np.concatenate([maj, minority])
    sel_base = select_periods(jnp.asarray(base), 1, L, 2)
    dup = np.concatenate([base, np.repeat(minority, 20, axis=0)])
    sel_dup = select_periods(jnp.asarray(dup), 1, L, 2)
    assert not np.array_equal(
        np.asarray(sel_base.freq_indices), np.asarray(sel_dup.freq_indices)
    )
    # ...while the row_weight mask keeps it exactly invariant
    w_dup = jnp.asarray(np.concatenate([np.ones(4), np.zeros(20)]).astype(np.float32))
    sel_dup_w = select_periods(jnp.asarray(dup), 1, L, 2, row_weight=w_dup)
    np.testing.assert_array_equal(
        np.asarray(sel_base.freq_indices), np.asarray(sel_dup_w.freq_indices)
    )
