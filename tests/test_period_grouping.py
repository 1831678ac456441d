"""Static-K grouping semantics vs the reference host-side PeriodGrouper.

Covers duplicate merging (weight-mass conservation), log-bucket keys and
max-unique caps with nearest-period reassignment — the reference's env-knob
behaviours (TIMES_PERIOD_BINNING / TIMES_PERIOD_MAX_UNIQ) exposed here as
config values.
"""

import numpy as np
import pytest

from torch_ref import HAS_REFERENCE

import jax.numpy as jnp

from flow_timesnet_tpu.models.period import (
    group_periods,
    resolve_log_base,
    resolve_max_unique,
    resolve_scheduled,
)


def _reference_grouping(periods, amps, L, min_p, max_p, log_base, max_uniq, monkeypatch):
    import torch

    from timesnet_forecast.models.timesnet import PeriodGrouper

    if log_base is not None:
        monkeypatch.setenv("TIMES_PERIOD_BINNING", str(log_base))
    else:
        monkeypatch.delenv("TIMES_PERIOD_BINNING", raising=False)
    if max_uniq is not None:
        monkeypatch.setenv("TIMES_PERIOD_MAX_UNIQ", str(max_uniq))
    else:
        monkeypatch.delenv("TIMES_PERIOD_MAX_UNIQ", raising=False)
    grouper = PeriodGrouper(
        torch.as_tensor(periods, dtype=torch.long),
        torch.as_tensor(amps),
        seq_len=L,
        min_period=min_p,
        max_period=max_p,
        block_index=0,
    )
    return grouper.group()


def _effective_weights(result):
    """Map a GroupedPeriods result to {period: total softmax weight} per sample."""

    periods = np.asarray(result.periods)
    valid = np.asarray(result.valid)
    weights = np.asarray(result.weights)
    out = []
    for b in range(weights.shape[0]):
        acc = {}
        for k in range(len(periods)):
            if valid[k]:
                acc[int(periods[k])] = acc.get(int(periods[k]), 0.0) + float(weights[b, k])
        out.append(acc)
    return out


def _reference_weights(group_result):
    """Reference group weights: softmax over logsumexp-aggregated logits."""

    import torch
    import torch.nn.functional as F

    logits = group_result.logits
    if logits.numel() == 0:
        return []
    w = F.softmax(logits.float(), dim=1)
    out = []
    for b in range(w.shape[0]):
        out.append(
            {
                int(group_result.periods[g].item()): float(w[b, g])
                for g in range(group_result.periods.numel())
            }
        )
    return out


CASES = [
    # (periods, L, min_p, max_p, log_base, max_uniq)
    ([7, 7, 14], 28, 1, 28, None, None),  # duplicate merge
    ([7, 9, 14, 27], 28, 1, 28, 2.0, None),  # log-bucket keys
    ([3, 5, 7, 9, 14], 28, 1, 28, None, 2),  # max-unique cap -> nearest merge
    ([2, 4, 8, 16], 28, 3, 15, None, None),  # min/max filtering
    ([5, 10, 20], 20, 1, 20, None, None),  # p == L//2 edge (cycles == 2 valid)
]


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkout missing")
@pytest.mark.parametrize("periods,L,min_p,max_p,log_base,max_uniq", CASES)
def test_group_weights_match_reference(periods, L, min_p, max_p, log_base, max_uniq, monkeypatch):
    rng = np.random.default_rng(3)
    K = len(periods)
    amps = rng.gamma(2.0, 1.0, size=(3, K)).astype(np.float32)
    periods_arr = np.asarray(periods, np.int32)

    ref = _reference_grouping(
        periods_arr, amps, L, min_p, max_p, log_base, max_uniq, monkeypatch
    )
    ref_w = _reference_weights(ref)

    ours = group_periods(
        jnp.asarray(periods_arr),
        jnp.asarray(amps),
        jnp.ones(K, bool),
        seq_len=L,
        min_period=min_p,
        max_period=max_p,
        log_base=log_base,
        max_unique=max_uniq,
    )
    ours_w = _effective_weights(ours)

    assert int(ours.group_count) == int(ref.periods.numel())
    if not ref_w:
        assert not any(ours_w[0].values())
        return
    for b in range(len(ref_w)):
        assert set(ours_w[b]) == set(ref_w[b]), (ours_w[b], ref_w[b])
        for p in ref_w[b]:
            assert abs(ours_w[b][p] - ref_w[b][p]) < 1e-5, (b, p, ours_w[b], ref_w[b])


def test_group_weight_mass_is_conserved():
    periods = jnp.asarray([7, 7, 7, 14], jnp.int32)
    amps = jnp.asarray([[1.0, 2.0, 0.5, 3.0]], jnp.float32)
    result = group_periods(periods, amps, jnp.ones(4, bool), seq_len=28)
    assert float(np.asarray(result.weights).sum()) == pytest.approx(1.0, abs=1e-6)
    # duplicates share the canonical period
    assert list(np.asarray(result.periods)) == [7, 7, 7, 14]
    assert int(result.group_count) == 2


def test_group_all_invalid_yields_zero_weights():
    periods = jnp.asarray([40, 50], jnp.int32)  # > max_period
    amps = jnp.asarray([[1.0, 2.0]], jnp.float32)
    result = group_periods(
        periods, amps, jnp.ones(2, bool), seq_len=28, max_period=28
    )
    assert not bool(result.any_valid)
    assert float(np.abs(np.asarray(result.weights)).sum()) == 0.0


def test_scheduled_value_resolution():
    assert resolve_scheduled("0:4,2:8,default:2", 0) == "4"
    assert resolve_scheduled("0:4,2:8,default:2", 1) == "4"
    assert resolve_scheduled("0:4,2:8,default:2", 2) == "8"
    assert resolve_scheduled("0:4,2:8,default:2", 5) == "8"
    assert resolve_scheduled("default:3", 1) == "3"
    assert resolve_scheduled(4, 2) == 4
    assert resolve_max_unique("0:4,1:2", 1) == 2
    assert resolve_max_unique(None, 0) is None
    assert resolve_log_base("log", 0) == 2.0
    assert resolve_log_base("log:3", 0) == 3.0
    assert resolve_log_base("off", 0) is None
    assert resolve_log_base(1.0, 0) is None
    assert resolve_log_base(2.5, 0) == 2.5


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference checkout missing")
def test_group_weights_fuzz_vs_reference(monkeypatch):
    """Seeded fuzz over random period sets / bounds / knobs vs the reference."""

    rng = np.random.default_rng(2024)
    for trial in range(40):
        L = int(rng.integers(8, 64))
        K = int(rng.integers(1, 6))
        periods = rng.integers(1, L + 4, size=K).astype(np.int32)
        B = int(rng.integers(1, 4))
        amps = rng.gamma(2.0, 1.0, size=(B, K)).astype(np.float32)
        min_p = int(rng.integers(1, 5))
        max_p = int(rng.integers(min_p, L + 2))
        log_base = float(rng.choice([0.0, 2.0, 3.0]))
        log_base = None if log_base == 0.0 else log_base
        max_uniq = int(rng.integers(0, 4))
        max_uniq = None if max_uniq == 0 else max_uniq

        ref = _reference_grouping(
            periods, amps, L, min_p, max_p, log_base, max_uniq, monkeypatch
        )
        ref_w = _reference_weights(ref)
        ours = group_periods(
            jnp.asarray(periods),
            jnp.asarray(amps),
            jnp.ones(K, bool),
            seq_len=L,
            min_period=min_p,
            max_period=max_p,
            log_base=log_base,
            max_unique=max_uniq,
        )
        ours_w = _effective_weights(ours)
        ctx = dict(trial=trial, L=L, periods=periods.tolist(), min_p=min_p,
                   max_p=max_p, log_base=log_base, max_uniq=max_uniq)
        assert int(ours.group_count) == int(ref.periods.numel()), ctx
        if not ref_w:
            assert not any(ours_w[0].values()), ctx
            continue
        for b in range(len(ref_w)):
            assert set(ours_w[b]) == set(ref_w[b]), (ctx, ours_w[b], ref_w[b])
            for p in ref_w[b]:
                assert abs(ours_w[b][p] - ref_w[b][p]) < 1e-4, (ctx, b, p)
