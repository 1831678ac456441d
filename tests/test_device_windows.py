"""Device-resident input pipeline: staging, in-program gather, epoch scan.

The resident path must sample the *identical* distribution as the host
:class:`WindowBatcher` (same flat-index semantics over concatenated folds)
and train to the same parameters as the per-step path. Mirrors the role of
the reference's dataloader tests (SURVEY §4) for the pipeline that replaces
its DataLoader workers (reference ``train.py:218-227``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flow_timesnet_tpu.data.device_windows import (
    epoch_index_plan,
    gather_batch,
    stage_windows,
)
from flow_timesnet_tpu.data.windows import build_batcher
from flow_timesnet_tpu.engine import Engine, batch_to_device
from flow_timesnet_tpu.models.timesnet import TimesNetConfig
from flow_timesnet_tpu.train import _stage_from_batcher


def _make_batcher(n_folds=2, T=40, N=3, L=8, H=4, stride=1, with_marks=True, seed=0):
    rng = np.random.default_rng(seed)
    arrays, masks, marks = [], [], []
    for f in range(n_folds):
        Tf = T + 3 * f  # distinct fold lengths exercise the T_max padding
        arrays.append(rng.normal(5.0, 2.0, size=(Tf, N)).astype(np.float32))
        masks.append((rng.random((Tf, N)) > 0.1).astype(np.float32))
        marks.append(rng.normal(size=(Tf, 5)).astype(np.float32) if with_marks else None)
    static = rng.normal(size=(N, 4)).astype(np.float32)
    ids = np.arange(N, dtype=np.int64)
    batcher = build_batcher(
        arrays,
        masks,
        L,
        H,
        stride,
        "direct",
        batch_size=16,
        shuffle=False,
        drop_last=False,
        series_static=[static] * n_folds,
        series_ids=[ids] * n_folds,
        time_features=marks if with_marks else None,
        pad_final=True,
    )
    return batcher


def test_gather_parity_with_host_batcher():
    batcher = _make_batcher()
    sigma = np.linspace(0.1, 0.3, 3).astype(np.float32)
    staged = _stage_from_batcher(batcher, sigma)
    assert staged is not None
    assert staged.total == batcher.total

    rng = np.random.default_rng(42)
    idx = rng.choice(batcher.total, size=24, replace=False).astype(np.int64)
    host = batcher._gather_global(idx, None)
    dev = gather_batch(staged, jnp.asarray(idx), jnp.ones(len(idx), jnp.float32))

    np.testing.assert_array_equal(np.asarray(dev["x"]), host.x)
    np.testing.assert_array_equal(np.asarray(dev["y"]), host.y)
    np.testing.assert_array_equal(np.asarray(dev["mask"]), host.mask)
    np.testing.assert_array_equal(np.asarray(dev["x_mark"]), host.x_mark)
    np.testing.assert_array_equal(np.asarray(dev["static"]), host.static)
    np.testing.assert_array_equal(
        np.asarray(dev["ids"]).astype(np.int64), host.series_ids.astype(np.int64)
    )
    # per-sample floor = sigma gathered by series id
    np.testing.assert_allclose(
        np.asarray(dev["floor"]).reshape(-1), sigma[np.asarray(dev["ids"]).reshape(-1)]
    )


def test_gather_parity_with_stride_and_recursive_horizon():
    rng = np.random.default_rng(3)
    arrays = [rng.normal(size=(57, 4)).astype(np.float32)]
    masks = [np.ones((57, 4), np.float32)]
    batcher = build_batcher(
        arrays, masks, 12, 6, 3, "recursive", batch_size=8,
        shuffle=False, drop_last=False, recursive_pred_len=6,
        series_ids=[np.arange(4)], pad_final=False,
    )
    staged = _stage_from_batcher(batcher, None)
    assert staged.total == batcher.total
    idx = np.arange(batcher.total, dtype=np.int64)
    host = batcher._gather_global(idx, None)
    dev = gather_batch(staged, jnp.asarray(idx), jnp.ones(len(idx), jnp.float32))
    np.testing.assert_array_equal(np.asarray(dev["x"]), host.x)
    np.testing.assert_array_equal(np.asarray(dev["y"]), host.y)


def test_epoch_index_plan_shapes_and_padding():
    idx, rv = epoch_index_plan(50, 16, None, shuffle=False, drop_last=False)
    assert idx.shape == (4, 16) and rv.shape == (4, 16)
    assert rv[:3].min() == 1.0
    assert rv[3, :2].min() == 1.0 and rv[3, 2:].max() == 0.0
    assert set(idx[rv > 0].tolist()) == set(range(50))

    idx, rv = epoch_index_plan(50, 16, None, shuffle=False, drop_last=True)
    assert idx.shape == (3, 16) and rv.min() == 1.0

    # DP row padding on top of batch assembly
    idx, rv = epoch_index_plan(50, 16, 24, shuffle=False, drop_last=True)
    assert idx.shape == (3, 24)
    assert rv[:, :16].min() == 1.0 and rv[:, 16:].max() == 0.0

    with pytest.raises(ValueError):
        epoch_index_plan(50, 16, None, shuffle=True, drop_last=True, rng=None)

    rng = np.random.default_rng(0)
    idx1, _ = epoch_index_plan(50, 16, None, shuffle=True, drop_last=True, rng=rng)
    assert sorted(idx1.reshape(-1).tolist()) != idx1.reshape(-1).tolist()


def _tiny_engine(N, L, H, with_marks, num_series=None):
    cfg = TimesNetConfig(
        input_len=L,
        pred_len=H,
        d_model=8,
        d_ff=16,
        n_layers=1,
        k_periods=2,
        kernel_set=((3, 3),),
        dropout=0.0,
        activation="gelu",
        mode="direct",
        id_embed_dim=4,
        static_proj_dim=4,
        c_in=1,
        static_dim=4,
        time_features=5 if with_marks else 0,
        id_vocab=N,
    )
    return Engine(cfg, use_loss_masking=True, weight_decay=1e-6, num_series=num_series or N)


def test_resident_epoch_matches_per_step_training():
    batcher = _make_batcher(n_folds=2, N=3, L=8, H=4)
    sigma = np.full(3, 0.15, np.float32)
    staged = _stage_from_batcher(batcher, sigma)
    engine = _tiny_engine(3, 8, 4, with_marks=True)

    idx, rv = epoch_index_plan(staged.total, 16, None, shuffle=False, drop_last=True)
    init_batch = engine.gather_staged_batch(staged, idx[0], rv[0])
    state_a = engine.init_state(jax.random.PRNGKey(0), init_batch)
    state_b = engine.init_state(jax.random.PRNGKey(0), init_batch)

    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(7), i))(
        jnp.arange(idx.shape[0])
    )
    state_a, losses_a, mask_true_a = engine.train_epoch_resident(
        state_a, 1e-3, keys, staged, jnp.asarray(idx), jnp.asarray(rv)
    )

    losses_b = []
    for s in range(idx.shape[0]):
        batch = engine.gather_staged_batch(staged, idx[s], rv[s])
        state_b, loss, stats = engine.train_step(state_b, 1e-3, keys[s], batch, True)
        losses_b.append(float(loss))

    np.testing.assert_allclose(np.asarray(losses_a), np.asarray(losses_b), rtol=1e-5)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(state_a.params), jax.tree_util.tree_leaves(state_b.params)
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5, atol=1e-6)


def test_evaluate_resident_matches_host_evaluate():
    batcher = _make_batcher(n_folds=1, N=3, L=8, H=4)
    staged = _stage_from_batcher(batcher, None)
    engine = _tiny_engine(3, 8, 4, with_marks=True)

    idx, rv = epoch_index_plan(staged.total, 16, None, shuffle=False, drop_last=False)
    init_batch = engine.gather_staged_batch(staged, idx[0], rv[0])
    state = engine.init_state(jax.random.PRNGKey(1), init_batch)

    resident = engine.evaluate_resident(
        state.params, staged, jnp.asarray(idx), jnp.asarray(rv)
    )
    host = engine.evaluate(
        state.params, (batch_to_device(b) for b in batcher)
    )
    assert resident["nll"] == pytest.approx(host["nll"], rel=1e-5)
    assert resident["smape"] == pytest.approx(host["smape"], rel=1e-5)
    np.testing.assert_allclose(
        resident["series_sums"], host["series_sums"], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        resident["series_cnts"], host["series_cnts"], rtol=1e-5
    )


def test_padded_rows_are_zeroed_like_host_pad_batch_rows():
    """The FFT selector pools amplitudes over the batch, so padded-row
    CONTENT changes every row's predictions — the resident gather must
    zero-fill pads exactly like the host pipeline's pad_batch_rows
    (regression: pads used to carry copies of window 0, shifting eval NLL
    by ~1e-4 vs the host path)."""

    from flow_timesnet_tpu.data.windows import pad_batch_rows

    batcher = _make_batcher(n_folds=1, N=3, L=8, H=4)
    staged = _stage_from_batcher(batcher, np.full(3, 0.2, np.float32))
    idx, rv = epoch_index_plan(staged.total, 16, None, shuffle=False, drop_last=False)
    last = idx.shape[0] - 1
    assert rv[last].min() == 0.0  # the final step really is padded
    dev = gather_batch(staged, jnp.asarray(idx[last]), jnp.asarray(rv[last]))

    batches = list(batcher)  # pad_final=True zero-pads the host tail batch
    host = batches[last]
    np.testing.assert_array_equal(np.asarray(dev["x"]), host.x)
    np.testing.assert_array_equal(np.asarray(dev["y"]), host.y)
    np.testing.assert_array_equal(np.asarray(dev["mask"]), host.mask)
    np.testing.assert_array_equal(np.asarray(dev["x_mark"]), host.x_mark)
    np.testing.assert_array_equal(np.asarray(dev["static"]), host.static)
    np.testing.assert_array_equal(
        np.asarray(dev["ids"]).astype(np.int64), host.series_ids.astype(np.int64)
    )
    pad_rows = rv[last] == 0.0
    assert np.abs(np.asarray(dev["x"])[pad_rows]).max() == 0.0


def test_augmentations_are_applied_in_program():
    batcher = _make_batcher(n_folds=1, N=3, L=8, H=4)
    src = batcher.sources[0]
    staged = stage_windows(
        [src.X], [src.M], src.L, src.H, src.stride, "direct",
        marks=[src.marks],
        augment={"add_noise_std": 0.5, "time_shift": 2},
    )
    idx = jnp.arange(12)
    rv = jnp.ones(12, jnp.float32)
    a = gather_batch(staged, idx, rv, jax.random.PRNGKey(0))
    b = gather_batch(staged, idx, rv, jax.random.PRNGKey(1))
    clean = gather_batch(
        stage_windows([src.X], [src.M], src.L, src.H, src.stride, "direct",
                      marks=[src.marks]),
        idx, rv, None,
    )
    # different keys -> different noise/shift; both differ from clean
    assert not np.allclose(np.asarray(a["x"]), np.asarray(b["x"]))
    assert not np.allclose(np.asarray(a["x"]), np.asarray(clean["x"]))
    with pytest.raises(ValueError):
        gather_batch(staged, idx, rv, None)


def test_resident_epoch_single_key_matches_host_derived_keys():
    """Passing one epoch key must reproduce the host-side vmap key derivation."""

    batcher = _make_batcher(n_folds=1, N=3, L=8, H=4)
    staged = _stage_from_batcher(batcher, np.full(3, 0.15, np.float32))
    engine = _tiny_engine(3, 8, 4, with_marks=True)

    idx, rv = epoch_index_plan(staged.total, 16, None, shuffle=False, drop_last=True)
    init_batch = engine.gather_staged_batch(staged, idx[0], rv[0])
    state_a = engine.init_state(jax.random.PRNGKey(0), init_batch)
    state_b = engine.init_state(jax.random.PRNGKey(0), init_batch)

    ep_key = jax.random.PRNGKey(7)
    keys = jax.vmap(lambda i: jax.random.fold_in(ep_key, i))(jnp.arange(idx.shape[0]))
    state_a, losses_a, _ = engine.train_epoch_resident(
        state_a, 1e-3, keys, staged, jnp.asarray(idx), jnp.asarray(rv)
    )
    state_b, losses_b, _ = engine.train_epoch_resident(
        state_b, 1e-3, ep_key, staged, jnp.asarray(idx), jnp.asarray(rv)
    )
    np.testing.assert_allclose(np.asarray(losses_a), np.asarray(losses_b), rtol=1e-6)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_device_snapshot_survives_donated_epochs():
    """The best-params HBM snapshot must outlive later donated train steps."""

    from flow_timesnet_tpu.parallel.mesh import device_snapshot, host_fetch

    batcher = _make_batcher(n_folds=1, N=3, L=8, H=4)
    staged = _stage_from_batcher(batcher, np.full(3, 0.15, np.float32))
    engine = _tiny_engine(3, 8, 4, with_marks=True)

    idx, rv = epoch_index_plan(staged.total, 16, None, shuffle=False, drop_last=True)
    init_batch = engine.gather_staged_batch(staged, idx[0], rv[0])
    state = engine.init_state(jax.random.PRNGKey(0), init_batch)

    state, _, _ = engine.train_epoch_resident(
        state, 1e-3, jax.random.PRNGKey(1), staged, jnp.asarray(idx), jnp.asarray(rv)
    )
    expected = jax.device_get(state.params)  # eager host copy before donation
    snap = device_snapshot(state.params)
    # two more epochs donate `state` (and would reuse its buffers)
    for ep in (2, 3):
        state, _, _ = engine.train_epoch_resident(
            state, 1e-3, jax.random.PRNGKey(ep), staged, jnp.asarray(idx), jnp.asarray(rv)
        )
    fetched = host_fetch(snap)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(expected), jax.tree_util.tree_leaves(fetched)
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_resident_training_with_augmentation_enabled():
    """Telemetry/one-off probes must not crash when data.augment is staged.

    Regression: configs/default.yaml ships data.augment (add_noise_std +
    time_shift); the staged struct then requires a PRNG key to gather, and
    the keyless probes (init/telemetry) must strip the augmentation instead
    of raising.
    """

    batcher = _make_batcher(n_folds=1, N=3, L=8, H=4)
    src = batcher.sources[0]
    staged = stage_windows(
        [src.X], [src.M], src.L, src.H, src.stride, "direct",
        marks=[src.marks],
        sigma_vector=np.full(3, 0.15, np.float32),
        augment={"add_noise_std": 0.01, "time_shift": 1},
    )
    engine = _tiny_engine(3, 8, 4, with_marks=True)
    idx, rv = epoch_index_plan(staged.total, 16, None, shuffle=False, drop_last=True)

    probe = engine.gather_staged_batch(staged, idx[0], rv[0])  # keyless: clean
    state = engine.init_state(jax.random.PRNGKey(0), probe)
    telemetry = engine.collect_period_telemetry_staged(state.params, staged, idx[0], rv[0])
    assert telemetry  # at least one block reported

    # the epoch program itself still applies the augmentation (keyed gather)
    state, losses, _ = engine.train_epoch_resident(
        state, 1e-3, jax.random.PRNGKey(1), staged, jnp.asarray(idx), jnp.asarray(rv)
    )
    assert np.isfinite(np.asarray(losses)).all()


def test_ema_matches_manual_average_across_all_step_paths():
    """EMA (train.ema_decay): the resident epoch, the scanned chunk and the
    per-step path must all produce the same Polyak average, and that average
    must equal a manual recomputation from the raw param trajectory."""

    batcher = _make_batcher(n_folds=2, N=3, L=8, H=4)
    sigma = np.full(3, 0.15, np.float32)
    staged = _stage_from_batcher(batcher, sigma)
    cfg = _tiny_engine(3, 8, 4, with_marks=True).cfg
    decay = 0.8
    engines = [
        Engine(cfg, use_loss_masking=True, weight_decay=1e-6, num_series=3, ema_decay=decay)
        for _ in range(3)
    ]

    idx, rv = epoch_index_plan(staged.total, 16, None, shuffle=False, drop_last=True)
    init_batch = engines[0].gather_staged_batch(staged, idx[0], rv[0])
    states = [e.init_state(jax.random.PRNGKey(0), init_batch) for e in engines]
    assert states[0].ema is not None

    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(7), i))(
        jnp.arange(idx.shape[0])
    )

    # path A: whole epoch resident
    state_a, _, _ = engines[0].train_epoch_resident(
        states[0], 1e-3, keys, staged, jnp.asarray(idx), jnp.asarray(rv)
    )

    # path B: per-step train_step, tracking the EMA manually from raw params
    state_b = states[1]
    manual = jax.tree_util.tree_map(lambda p: np.asarray(p), state_b.ema)
    for s in range(idx.shape[0]):
        batch = engines[1].gather_staged_batch(staged, idx[s], rv[s])
        state_b, _, _ = engines[1].train_step(state_b, 1e-3, keys[s], batch, True)
        manual = jax.tree_util.tree_map(
            lambda e, p: e * decay + np.asarray(p) * (1 - decay), manual, state_b.params
        )

    # path C: one scanned chunk over pre-gathered batches
    stacked = None
    gathered = [engines[2].gather_staged_batch(staged, idx[s], rv[s]) for s in range(idx.shape[0])]
    stacked = {
        k: jnp.stack([g[k] for g in gathered])
        for k in gathered[0]
        if gathered[0][k] is not None
    }
    state_c, _, _ = engines[2].train_steps_scanned(states[2], 1e-3, keys, stacked)

    for ea, eb, ec, em in zip(
        jax.tree_util.tree_leaves(state_a.ema),
        jax.tree_util.tree_leaves(state_b.ema),
        jax.tree_util.tree_leaves(state_c.ema),
        jax.tree_util.tree_leaves(manual),
    ):
        np.testing.assert_allclose(np.asarray(eb), em, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ec), np.asarray(eb), rtol=1e-5, atol=1e-6)
    # EMA differs from the raw params (it is genuinely lagging)
    diffs = [
        float(np.max(np.abs(np.asarray(e) - np.asarray(p))))
        for e, p in zip(
            jax.tree_util.tree_leaves(state_b.ema),
            jax.tree_util.tree_leaves(state_b.params),
        )
    ]
    assert max(diffs) > 1e-6


def test_chunked_resident_epoch_matches_single_dispatch():
    """Dispatch-count invariance (train.resident_max_dispatch_steps): the
    epoch split into capped chunks with a global step offset must reproduce
    the single-dispatch trajectory bit-for-bit — dropout keys derive from
    the same fold_in(epoch_key, global_step) values either way."""

    batcher = _make_batcher(n_folds=2, N=3, L=8, H=4)
    staged = _stage_from_batcher(batcher, np.full(3, 0.15, np.float32))
    cfg = TimesNetConfig(
        input_len=8, pred_len=4, d_model=8, d_ff=16, n_layers=1, k_periods=2,
        kernel_set=((3, 3),), dropout=0.3, activation="gelu", mode="direct",
        id_embed_dim=4, static_proj_dim=4, c_in=1, static_dim=4,
        time_features=5, id_vocab=3,
    )
    # dropout > 0 so a wrong step offset would change the trajectory
    engine = Engine(cfg, use_loss_masking=True, weight_decay=1e-6, num_series=3)

    idx, rv = epoch_index_plan(staged.total, 16, None, shuffle=False, drop_last=True)
    assert idx.shape[0] >= 3, "need several steps to exercise chunking"
    init_batch = engine.gather_staged_batch(staged, idx[0], rv[0])
    state_a = engine.init_state(jax.random.PRNGKey(0), init_batch)
    state_b = engine.init_state(jax.random.PRNGKey(0), init_batch)

    ep_key = jax.random.PRNGKey(7)
    state_a, losses_a, mask_a = engine.train_epoch_resident(
        state_a, 1e-3, ep_key, staged, jnp.asarray(idx), jnp.asarray(rv)
    )

    cap = 2  # uneven remainder: exercises the second compiled program
    loss_parts, mask_parts = [], []
    off = 0
    while off < idx.shape[0]:
        end = min(off + cap, idx.shape[0])
        state_b, pl, pm = engine.train_epoch_resident(
            state_b, 1e-3, ep_key, staged,
            jnp.asarray(idx[off:end]), jnp.asarray(rv[off:end]),
            step_offset=off,
        )
        loss_parts.append(np.asarray(pl))
        mask_parts.append(np.asarray(pm))
        off = end

    np.testing.assert_array_equal(
        np.asarray(losses_a), np.concatenate(loss_parts)
    )
    np.testing.assert_array_equal(
        np.asarray(mask_a), np.concatenate(mask_parts)
    )
    for pa, pb in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_chunked_eval_resident_matches_single_dispatch():
    """evaluate_resident(max_dispatch_steps=k) must equal the one-dispatch
    result: the scan carry is six pure sums, so chunking composes exactly."""

    batcher = _make_batcher(n_folds=2, N=3, L=8, H=4)
    staged = _stage_from_batcher(batcher, np.full(3, 0.15, np.float32))
    engine = _tiny_engine(3, 8, 4, with_marks=True)

    idx, rv = epoch_index_plan(staged.total, 16, None, shuffle=False, drop_last=False)
    init_batch = engine.gather_staged_batch(staged, idx[0], rv[0])
    state = engine.init_state(jax.random.PRNGKey(0), init_batch)

    whole = engine.evaluate_resident(
        state.params, staged, jnp.asarray(idx), jnp.asarray(rv)
    )
    chunked = engine.evaluate_resident(
        state.params, staged, jnp.asarray(idx), jnp.asarray(rv),
        max_dispatch_steps=2,
    )
    np.testing.assert_allclose(chunked["nll"], whole["nll"], rtol=1e-6)
    np.testing.assert_allclose(chunked["smape"], whole["smape"], rtol=1e-6)
    np.testing.assert_allclose(chunked["series_sums"], whole["series_sums"], rtol=1e-6)
    np.testing.assert_array_equal(chunked["series_cnts"], whole["series_cnts"])
