"""TimesBlock behaviours with controlled period selections.

Mirrors the reference's fixed-selector seams (tests/test_times_block.py):
shape preservation, analytic softmax weighting, and identity when no valid
periods exist.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flow_timesnet_tpu.models.period import PeriodSelection
from flow_timesnet_tpu.models.timesblock import TimesBlock


def _selection(periods, amps, valid=None):
    periods = jnp.asarray(periods, jnp.int32)
    amps = jnp.asarray(amps, jnp.float32)
    if valid is None:
        valid = jnp.ones(periods.shape[0], bool)
    return PeriodSelection(
        periods=periods, amplitudes=amps, valid=valid,
        freq_indices=jnp.ones_like(periods),
    )


def _block(**kw):
    defaults = dict(
        d_model=6, d_ff=8, kernel_set=((3, 3),), dropout=0.0,
        activation="gelu", bottleneck_ratio=1.0, min_period=1,
        max_period=64, p_cap=63,
    )
    defaults.update(kw)
    return TimesBlock(**defaults)


def test_preserves_shape_and_differentiable():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 6)).astype(np.float32)
    block = _block()
    sel = _selection([4, 8], [[1.0, 0.5], [0.3, 0.9]])
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), sel)
    out = block.apply(variables, jnp.asarray(x), sel)
    assert out.shape == x.shape

    def loss(v):
        return jnp.sum(block.apply(v, jnp.asarray(x), sel) ** 2)

    grads = jax.grad(loss)(variables)
    total = sum(float(np.abs(np.asarray(g)).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_identity_when_no_valid_periods():
    x = np.random.default_rng(1).standard_normal((2, 12, 6)).astype(np.float32)
    block = _block()
    sel = _selection([5, 7], [[1.0, 1.0]], valid=jnp.zeros(2, bool))
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), sel)
    out = block.apply(variables, jnp.asarray(x), sel)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_softmax_weighting_of_candidate_residuals():
    """With equal periods the combined delta equals the single-period delta
    (weights sum to 1); amplitude shifts move the mix toward the dominant
    candidate."""

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 12, 6)).astype(np.float32)
    block = _block()

    sel_a = _selection([4], [[1.0]])
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), sel_a)
    out_single = np.asarray(block.apply(variables, jnp.asarray(x), sel_a))

    sel_dup = _selection([4, 4], [[5.0, -2.0]])
    out_dup = np.asarray(block.apply(variables, jnp.asarray(x), sel_dup))
    np.testing.assert_allclose(out_dup, out_single, rtol=1e-5, atol=1e-5)

    # strongly weighted toward period 6: output approaches the pure-6 result
    sel_b = _selection([6], [[1.0]])
    out6 = np.asarray(block.apply(variables, jnp.asarray(x), sel_b))
    sel_mix = _selection([4, 6], [[-30.0, 30.0]])
    out_mix = np.asarray(block.apply(variables, jnp.asarray(x), sel_mix))
    np.testing.assert_allclose(out_mix, out6, rtol=1e-4, atol=1e-4)


def test_max_unique_cap_reduces_groups():
    x = np.random.default_rng(3).standard_normal((1, 24, 6)).astype(np.float32)
    sel = _selection([3, 5, 8, 12], [[0.5, 1.5, 1.0, 2.0]])
    block_capped = _block(max_unique=2)
    variables = block_capped.init(jax.random.PRNGKey(0), jnp.asarray(x), sel)
    _, aux = block_capped.apply(
        variables, jnp.asarray(x), sel, mutable=["intermediates"]
    )
    counts = aux["intermediates"]["group_count"][0]
    assert int(counts) == 2


def test_period_buckets_match_unbucketed():
    """Bucketed compilation is a layout/FLOP optimisation only: for any mix of
    small/large/invalid periods the output and gradients must match the
    single full-cap program."""

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 6)).astype(np.float32))
    amps = rng.standard_normal((2, 3)).astype(np.float32)

    cases = [
        _selection([4, 2, 3], amps),                    # all small -> bucket 0
        _selection([4, 7, 2], amps),                    # mid -> bucket 1
        _selection([4, 15, 2], amps),                   # large -> full cap
        _selection([4, 15, 2], amps, valid=jnp.asarray([True, False, True])),
        _selection([5, 5, 5], amps),                    # duplicates
    ]
    base = _block(p_cap=15)
    bucketed = _block(p_cap=15, period_buckets="auto")
    variables = base.init(jax.random.PRNGKey(0), x, cases[0])
    # identical param trees (nn.cond branches share parameters)
    v2 = bucketed.init(jax.random.PRNGKey(0), x, cases[0])
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)

    for i, sel in enumerate(cases):
        out_a = base.apply(variables, x, sel)
        out_b = bucketed.apply(variables, x, sel)
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), rtol=1e-6, atol=1e-6
        )
        if i in (0, 2, 3):  # grads on small-cap, full-cap and invalid cases
            ga = jax.grad(lambda v: jnp.sum(jnp.tanh(base.apply(v, x, sel))))(variables)
            gb = jax.grad(lambda v: jnp.sum(jnp.tanh(bucketed.apply(v, x, sel))))(variables)
            for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
                )


def test_period_buckets_explicit_ladder_and_off():
    from flow_timesnet_tpu.models.timesblock import resolve_period_buckets

    assert resolve_period_buckets(None, 28, 27) == (27,)
    assert resolve_period_buckets("off", 28, 27) == (27,)
    assert resolve_period_buckets("auto", 28, 27) == (7, 14, 27)
    assert resolve_period_buckets([8, 4, 99], 28, 27) == (4, 8, 27)
    assert resolve_period_buckets("4 8", 28, 27) == (4, 8, 27)


def test_period_cap_preserves_outputs_when_periods_fit():
    """period_cap tightens the fold extent (Lp = L + cap); when the data's
    selected periods all fit under the cap the forward must be unchanged
    (the cap only removes padded overcompute, never real taps)."""

    import jax

    from flow_timesnet_tpu.models.timesnet import TimesNet, TimesNetConfig

    L, B = 24, 3
    rng = np.random.default_rng(0)
    t = np.arange(L, dtype=np.float32)
    x = (
        3.0
        + np.sin(2 * np.pi * t / 6.0)[None, :, None]
        + 0.8 * np.cos(2 * np.pi * t / 8.0)[None, :, None]
        + 0.01 * rng.standard_normal((B, L, 1))
    ).astype(np.float32)

    kw = dict(
        input_len=L, pred_len=4, d_model=8, d_ff=16, n_layers=1, k_periods=2,
        kernel_set=((3, 3),), dropout=0.0, mode="direct", c_in=1, id_vocab=1,
        id_embed_dim=0, min_period_threshold=2,
    )
    full = TimesNet(TimesNetConfig(**kw))
    capped = TimesNet(TimesNetConfig(**kw, period_cap=12))
    params = full.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                       None, None, None, deterministic=True)["params"]
    out_full = full.apply({"params": params}, jnp.asarray(x), None, None, None,
                          deterministic=True)
    out_cap = capped.apply({"params": params}, jnp.asarray(x), None, None, None,
                           deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_cap[0]), np.asarray(out_full[0]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_cap[1]), np.asarray(out_full[1]), rtol=1e-5, atol=1e-6
    )
