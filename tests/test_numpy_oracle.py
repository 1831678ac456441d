"""Pure-numpy oracles for the fold conv / period grouping / FFT selector.

The transplant parity gates (test_reference_parity.py etc.) depend on the
torch reference checkout being mounted and skip without it. These oracles are
self-contained host-side re-derivations of the same semantics (loops and
dicts, the opposite style of the jitted static-K implementations), so the
model-core correctness net holds in any environment — the in-repo analogue of
the reference's own loop-path cross check (reference
``models/timesnet.py:866-953``, ``TIMESBLOCK_VEC_DISABLE``).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from flow_timesnet_tpu.models.period import group_periods, select_periods
from flow_timesnet_tpu.ops.fold import make_geometry, pad_time, tap_conv


# ---------------------------------------------------------------------------
# Oracles (numpy only, loop-based)
# ---------------------------------------------------------------------------


def fold_conv_oracle(x, period, kernel, bias):
    """Reference fold semantics: pad tail to a multiple of p, reshape
    [B, C, cycles, p], 'same'-zero-padded cross-correlation, unfold.

    x: [B, L, C]; kernel: [kh, kw, Cin, Cout] -> [B, L, Cout].
    """

    B, L, Cin = x.shape
    kh, kw, _, Cout = kernel.shape
    rh, rw = kh // 2, kw // 2
    pad_len = (-L) % period
    total = L + pad_len
    cycles = total // period
    grid = np.zeros((B, cycles, period, Cin), np.float64)
    flat = np.concatenate([x.astype(np.float64), np.zeros((B, pad_len, Cin))], axis=1)
    for c in range(cycles):
        grid[:, c] = flat[:, c * period : (c + 1) * period]
    out = np.zeros((B, cycles, period, Cout), np.float64)
    for i in range(cycles):
        for j in range(period):
            acc = np.zeros((B, Cout), np.float64)
            for di in range(-rh, rh + 1):
                for dj in range(-rw, rw + 1):
                    ii, jj = i + di, j + dj
                    if 0 <= ii < cycles and 0 <= jj < period:
                        acc += grid[:, ii, jj] @ kernel[di + rh, dj + rw].astype(np.float64)
            out[:, i, j] = acc + bias.astype(np.float64)
    return out.reshape(B, total, Cout)[:, :L]


def _logsumexp(v):
    m = np.max(v)
    if not np.isfinite(m):
        return m
    return float(m + np.log(np.sum(np.exp(np.asarray(v, np.float64) - m))))


def group_oracle(periods, amps, L, min_p=None, max_p=None, log_base=None, max_uniq=None):
    """Host-style grouping: returns (per-sample {period: weight}, group_count).

    Independently re-derives the reference PeriodGrouper contract
    (``models/timesnet.py:286-557``): duplicate/log-bucket merge with the
    highest-mean-amplitude member as canonical, group score = batch-mean
    logsumexp of member amplitudes, max-unique cap keeps the top groups by
    (score desc, key asc) and remaps evicted groups to the nearest kept
    period (ties -> higher-scored kept group); weights are the per-candidate
    softmax over valid amplitudes, mass summed per canonical period.
    """

    periods = [int(p) for p in periods]
    amps = np.asarray(amps, np.float64)
    B, K = amps.shape
    ok = []
    for p in periods:
        good = p > 0
        if good and min_p is not None:
            good = p >= min_p
        if good and max_p is not None:
            good = p <= max_p
        if good:
            total = L + ((-L) % p)
            good = total // p >= 2
        ok.append(good)

    def key_of(p):
        if log_base is None:
            return p
        return int(math.floor(math.log(p) / math.log(log_base) + 1e-6))

    groups = {}
    for i, p in enumerate(periods):
        if ok[i]:
            groups.setdefault(key_of(p), []).append(i)

    mean_amp = amps.mean(axis=0)
    reps = {}  # key -> canonical candidate index
    scores = {}  # key -> group score
    for key, members in groups.items():
        best = max(members, key=lambda i: (mean_amp[i], -i))
        reps[key] = best
        scores[key] = float(
            np.mean([_logsumexp(amps[b, members]) for b in range(B)])
        )

    kept_keys = sorted(groups, key=lambda k: (-scores[k], k))
    if max_uniq is not None and max_uniq < len(kept_keys):
        kept, dropped = kept_keys[:max_uniq], kept_keys[max_uniq:]
    else:
        kept, dropped = kept_keys, []
    remap = {k: k for k in kept}
    for key in dropped:
        p_drop = periods[reps[key]]
        # nearest kept period; tie -> higher-scored kept group (kept order)
        remap[key] = min(kept, key=lambda k: (abs(periods[reps[k]] - p_drop), kept.index(k)))

    valid_idx = [i for i in range(K) if ok[i]]
    out = []
    for b in range(B):
        if not valid_idx:
            out.append({})
            continue
        logits = amps[b, valid_idx]
        e = np.exp(logits - logits.max())
        w = e / e.sum()
        acc = {}
        for wi, i in zip(w, valid_idx):
            canon = reps[remap[key_of(periods[i])]]
            p_eff = periods[canon]
            acc[p_eff] = acc.get(p_eff, 0.0) + float(wi)
        out.append(acc)
    return out, len(kept) if valid_idx else 0


def select_oracle(x, k, pmax, min_thresh):
    """Numpy FFT dominant-period selection (reference timesnet.py:52-159)."""

    x = np.asarray(x, np.float64)
    B, L, C = x.shape
    spec = np.fft.rfft(x, axis=1)
    amp = np.abs(spec)
    amp_med = np.sort(amp, axis=2)[:, :, (C - 1) // 2]  # lower median
    amp_mean = amp_med.mean(axis=0)
    amp_mean[0] = -np.inf
    scores = amp_mean - 1e-8 * np.log1p(np.arange(len(amp_mean)))
    idx = np.argsort(-scores, kind="stable")[:k]
    idx = np.maximum(idx, 1)
    upper = min(pmax, max(1, L - 1))
    per = np.ceil(L / idx).astype(int)
    per = np.clip(per, min(pmax, max(1, min_thresh)), upper)
    cycles = np.ceil(L / per).astype(int)
    valid = cycles >= 2
    return per, idx, valid, amp_med[:, idx]


# ---------------------------------------------------------------------------
# Fuzz assertions
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kh,kw", [(1, 1), (3, 3), (5, 3), (3, 7), (5, 5)])
@pytest.mark.parametrize("seed", [0, 1])
def test_tap_conv_matches_numpy_oracle(kh, kw, seed):
    rng = np.random.default_rng(seed)
    B, L, Cin, Cout = 2, int(rng.integers(18, 40)), 3, 4
    periods = rng.integers(2, L - 1, size=3).tolist()
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    kernel = (rng.standard_normal((kh, kw, Cin, Cout)) * 0.3).astype(np.float32)
    bias = (rng.standard_normal(Cout) * 0.1).astype(np.float32)

    geom = make_geometry(jnp.asarray(periods, jnp.int32), L, p_cap=L - 1)
    xg = pad_time(jnp.asarray(x), L, geom.Lp)
    h = jnp.broadcast_to(xg[None], (len(periods), B, geom.Lp, Cin))
    out = np.asarray(tap_conv(h, geom, jnp.asarray(kernel), jnp.asarray(bias), kh, kw))

    for kk, p in enumerate(periods):
        expected = fold_conv_oracle(x, p, kernel, bias)
        np.testing.assert_allclose(out[kk, :, :L], expected, rtol=1e-4, atol=1e-4)


GROUP_CASES = [
    ([7, 7, 14], 28, 1, 28, None, None),
    ([7, 9, 14, 27], 28, 1, 28, 2.0, None),
    ([3, 5, 7, 9, 14], 28, 1, 28, None, 2),
    ([2, 4, 8, 16], 28, 3, 15, None, None),
    ([5, 10, 20], 20, 1, 20, None, None),
    ([6, 6, 6], 24, 1, 24, None, 1),
    ([4, 5, 6, 7, 8, 9], 36, 1, 36, 1.5, 2),
]


def _effective(result):
    periods = np.asarray(result.periods)
    valid = np.asarray(result.valid)
    weights = np.asarray(result.weights)
    out = []
    for b in range(weights.shape[0]):
        acc = {}
        for i in range(len(periods)):
            if valid[i]:
                acc[int(periods[i])] = acc.get(int(periods[i]), 0.0) + float(weights[b, i])
        out.append(acc)
    return out


@pytest.mark.parametrize("periods,L,min_p,max_p,log_base,max_uniq", GROUP_CASES)
def test_group_periods_matches_numpy_oracle(periods, L, min_p, max_p, log_base, max_uniq):
    rng = np.random.default_rng(11)
    amps = rng.gamma(2.0, 1.0, size=(3, len(periods))).astype(np.float32)
    got = group_periods(
        jnp.asarray(periods, jnp.int32), jnp.asarray(amps),
        jnp.ones(len(periods), bool), L,
        min_period=min_p, max_period=max_p, log_base=log_base, max_unique=max_uniq,
    )
    want, n_groups = group_oracle(periods, amps, L, min_p, max_p, log_base, max_uniq)
    assert int(got.group_count) == n_groups
    eff = _effective(got)
    assert len(eff) == len(want)
    for e, w in zip(eff, want):
        assert set(e) == set(w)
        for p in w:
            assert e[p] == pytest.approx(w[p], rel=1e-5, abs=1e-6)


def test_group_periods_fuzz_vs_numpy_oracle():
    rng = np.random.default_rng(2024)
    for trial in range(25):
        K = int(rng.integers(1, 7))
        L = int(rng.integers(8, 64))
        periods = rng.integers(1, max(2, L), size=K).tolist()
        amps = rng.gamma(2.0, 1.0, size=(2, K)).astype(np.float32)
        log_base = float(rng.choice([0, 1.5, 2.0])) or None
        max_uniq = int(rng.integers(0, K + 1)) or None
        got = group_periods(
            jnp.asarray(periods, jnp.int32), jnp.asarray(amps),
            jnp.ones(K, bool), L, log_base=log_base, max_unique=max_uniq,
        )
        want, n_groups = group_oracle(
            periods, amps, L, log_base=log_base, max_uniq=max_uniq
        )
        assert int(got.group_count) == n_groups, (trial, periods, L, log_base, max_uniq)
        for e, w in zip(_effective(got), want):
            assert set(e) == set(w), (trial, periods, L, log_base, max_uniq)
            for p in w:
                assert e[p] == pytest.approx(w[p], rel=1e-5, abs=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_select_periods_matches_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    B, L, C = 2, int(rng.integers(12, 48)), 3
    k = int(rng.integers(1, 4))
    x = rng.standard_normal((B, L, C)).astype(np.float32)
    # inject a strong seasonal component so top-k ordering is unambiguous
    f = int(rng.integers(1, max(2, L // 4)))
    x = x + 3.0 * np.sin(2 * np.pi * f * np.arange(L) / L)[None, :, None].astype(np.float32)

    sel = select_periods(jnp.asarray(x), k, pmax=L - 1, min_period_threshold=2)
    per, idx, valid, samp = select_oracle(x, k, L - 1, 2)
    np.testing.assert_array_equal(np.asarray(sel.freq_indices), idx)
    np.testing.assert_array_equal(np.asarray(sel.periods), per)
    np.testing.assert_array_equal(np.asarray(sel.valid), valid)
    np.testing.assert_allclose(np.asarray(sel.amplitudes), samp, rtol=1e-4)
