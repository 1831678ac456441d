"""Data-parallel training over the 8-device virtual mesh.

Sharded and single-device training must agree (same loss trajectory within
float tolerance) — the mesh only changes layout, not math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flow_timesnet_tpu.engine import Engine
from flow_timesnet_tpu.models.timesnet import TimesNetConfig
from flow_timesnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def setup():
    # Module-scoped: all five tests use the identical config, and sharing one
    # Engine shares its jit cache (states are rebuilt per test; the batch is
    # read-only), cutting repeated train-step compiles.
    cfg = TimesNetConfig(
        input_len=16, pred_len=4, d_model=8, d_ff=16, n_layers=1, k_periods=2,
        kernel_set=((3, 3),), dropout=0.0, mode="direct", min_period_threshold=2,
        c_in=1, id_vocab=8, id_embed_dim=4, static_dim=3, static_proj_dim=4,
        time_features=2,
    )
    engine = Engine(cfg, use_loss_masking=True, grad_clip_norm=1.0, num_series=8)
    rng = np.random.default_rng(0)
    B = 32
    batch = {
        "x": jnp.asarray(rng.standard_normal((B, 16, 1)).astype(np.float32) + 3),
        "y": jnp.asarray(rng.poisson(3.0, (B, 4, 1)).astype(np.float32)),
        "mask": jnp.ones((B, 4, 1)),
        "x_mark": jnp.asarray(rng.standard_normal((B, 16, 2)).astype(np.float32)),
        "y_mark": None,
        "static": jnp.asarray(rng.standard_normal((B, 1, 3)).astype(np.float32)),
        "ids": jnp.asarray(rng.integers(0, 8, (B, 1)).astype(np.int32)),
        "row_valid": jnp.ones(B, jnp.float32),
    }
    return cfg, engine, batch


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_dp_matches_single_device(setup):
    cfg, engine, batch = setup
    key = jax.random.PRNGKey(0)

    losses_single = []
    s_single = engine.init_state(key, batch)
    for i in range(3):
        s_single, loss, _ = engine.train_step(
            s_single, 1e-3, jax.random.fold_in(key, i), batch, True
        )
        losses_single.append(float(loss))
    final_single = jax.device_get(s_single.params)

    mesh = make_mesh()
    s_dp = replicate(mesh, engine.init_state(key, batch))
    dp_batch = shard_batch(mesh, batch)
    losses_dp = []
    for i in range(3):
        s_dp, loss, _ = engine.train_step(
            s_dp, 1e-3, jax.random.fold_in(key, i), dp_batch, True
        )
        losses_dp.append(float(loss))
    final_dp = jax.device_get(s_dp.params)

    np.testing.assert_allclose(losses_dp, losses_single, rtol=1e-5, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(final_dp), jax.tree_util.tree_leaves(final_single)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_dp_eval_matches_single_device(setup):
    cfg, engine, batch = setup
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    single = engine.evaluate(state.params, [batch])
    mesh = make_mesh()
    params_dp = replicate(mesh, state.params)
    dp = engine.evaluate(params_dp, [shard_batch(mesh, batch)])
    assert dp["nll"] == pytest.approx(single["nll"], rel=1e-5)
    assert dp["smape"] == pytest.approx(single["smape"], rel=1e-5)
    np.testing.assert_allclose(dp["series_sums"], single["series_sums"], rtol=1e-5)


def test_dp_padded_indivisible_batch_matches_single(setup):
    """B=30 does not divide the 8-device mesh; padding with row_valid=0 rows
    must leave the loss and the updated params bit-compatible."""

    from flow_timesnet_tpu.data.windows import WindowBatch, pad_batch_rows

    cfg, engine, batch = setup
    key = jax.random.PRNGKey(0)
    idx = np.arange(30)
    small = {k: (v[idx] if v is not None and getattr(v, "ndim", 0) >= 1 else v)
             for k, v in batch.items()}

    losses_single = []
    s_single = engine.init_state(key, small)
    for i in range(3):
        s_single, loss, _ = engine.train_step(
            s_single, 1e-3, jax.random.fold_in(key, i), small, True
        )
        losses_single.append(float(loss))

    host = WindowBatch(
        x=np.asarray(small["x"]), y=np.asarray(small["y"]),
        mask=np.asarray(small["mask"]), x_mark=np.asarray(small["x_mark"]),
        y_mark=None, static=np.asarray(small["static"]),
        series_ids=np.asarray(small["ids"]),
        row_valid=np.asarray(small["row_valid"]),
    )
    padded = pad_batch_rows(host, 32)
    assert padded.x.shape[0] == 32 and float(padded.row_valid.sum()) == 30.0

    mesh = make_mesh()
    dp_batch = shard_batch(mesh, {
        "x": padded.x, "y": padded.y, "mask": padded.mask,
        "x_mark": padded.x_mark, "y_mark": None, "static": padded.static,
        "ids": padded.series_ids.astype(np.int32), "row_valid": padded.row_valid,
    })
    s_dp = replicate(mesh, engine.init_state(key, dp_batch))
    losses_dp = []
    for i in range(3):
        s_dp, loss, _ = engine.train_step(
            s_dp, 1e-3, jax.random.fold_in(key, i), dp_batch, True
        )
        losses_dp.append(float(loss))
    np.testing.assert_allclose(losses_dp, losses_single, rtol=1e-5, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_dp.params)),
        jax.tree_util.tree_leaves(jax.device_get(s_single.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_embedding_sharded_state_matches_replicated(setup):
    """Row-sharding the series-embedding table (high-cardinality regime) is a
    layout change only: losses and params must match the replicated run."""

    from flow_timesnet_tpu.parallel.mesh import shard_train_state, table_sharding

    cfg, engine, batch = setup
    key = jax.random.PRNGKey(0)
    mesh = make_mesh()
    dp_batch = shard_batch(mesh, batch)

    # two independent (identical-valued) states: train_step donates its input,
    # and device_put aliases buffers when the sharding already matches
    s_rep = replicate(mesh, engine.init_state(key, dp_batch))
    s_shard = shard_train_state(
        mesh, engine.init_state(key, dp_batch), shard_tables=True
    )

    emb = s_shard.params["series_embedding"]["embedding"]
    assert emb.sharding == table_sharding(mesh)

    for i in range(3):
        s_rep, loss_r, _ = engine.train_step(
            s_rep, 1e-3, jax.random.fold_in(key, i), dp_batch, True
        )
        s_shard, loss_s, _ = engine.train_step(
            s_shard, 1e-3, jax.random.fold_in(key, i), dp_batch, True
        )
        assert float(loss_s) == pytest.approx(float(loss_r), rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_shard.params)),
        jax.tree_util.tree_leaves(jax.device_get(s_rep.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_dcn_2x4_mesh_matches_single_device(setup):
    """Multi-slice 2-D (dcn, data) mesh: batch sharded over both axes must
    reproduce the single-device trajectory (SURVEY §2.9 DCN story)."""

    cfg, engine, batch = setup
    key = jax.random.PRNGKey(0)

    s_single = engine.init_state(key, batch)
    losses_single = []
    for i in range(3):
        s_single, loss, _ = engine.train_step(
            s_single, 1e-3, jax.random.fold_in(key, i), batch, True
        )
        losses_single.append(float(loss))

    mesh = make_mesh(dcn_slices=2)
    assert mesh.axis_names == ("dcn", "data") and mesh.devices.shape == (2, 4)
    dp_batch = shard_batch(mesh, batch)
    s_dp = replicate(mesh, engine.init_state(key, batch))
    losses_dp = []
    for i in range(3):
        s_dp, loss, _ = engine.train_step(
            s_dp, 1e-3, jax.random.fold_in(key, i), dp_batch, True
        )
        losses_dp.append(float(loss))
    np.testing.assert_allclose(losses_dp, losses_single, rtol=1e-5, atol=1e-6)


def test_resident_epoch_dp_matches_single_device():
    """Device-resident epoch scan under the mesh: staged arrays replicated,
    [S, B] plan sharded on the batch axis — must reproduce the unsharded
    resident trajectory (layout change only)."""

    from jax.sharding import NamedSharding, PartitionSpec

    from flow_timesnet_tpu.data.device_windows import epoch_index_plan
    from flow_timesnet_tpu.parallel.mesh import replicated
    from flow_timesnet_tpu.train import _stage_from_batcher
    from flow_timesnet_tpu.data.windows import build_batcher

    rng = np.random.default_rng(5)
    N, L, H = 4, 16, 4
    arrays = [rng.normal(4.0, 1.0, size=(60, N)).astype(np.float32)]
    masks = [np.ones((60, N), np.float32)]
    batcher = build_batcher(
        arrays, masks, L, H, 1, "direct", batch_size=16, shuffle=False,
        drop_last=True, series_ids=[np.arange(N)], pad_final=False,
    )
    cfg = TimesNetConfig(
        input_len=L, pred_len=H, d_model=8, d_ff=16, n_layers=1, k_periods=2,
        kernel_set=((3, 3),), dropout=0.0, mode="direct", min_period_threshold=2,
        c_in=1, id_vocab=N, id_embed_dim=4,
    )
    engine = Engine(cfg, use_loss_masking=True, num_series=N)

    staged = _stage_from_batcher(batcher, None)
    idx, rv = epoch_index_plan(staged.total, 16, None, shuffle=False, drop_last=True)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(3), i))(
        jnp.arange(idx.shape[0])
    )
    init_batch = engine.gather_staged_batch(staged, idx[0], rv[0])
    s_single = engine.init_state(jax.random.PRNGKey(0), init_batch)
    s_single, losses_single, _ = engine.train_epoch_resident(
        s_single, 1e-3, keys, staged, jnp.asarray(idx), jnp.asarray(rv)
    )

    mesh = make_mesh()
    plan_spec = NamedSharding(mesh, PartitionSpec(None, tuple(mesh.axis_names)))
    staged_dp = _stage_from_batcher(
        batcher, None, device_put=lambda a: jax.device_put(a, replicated(mesh))
    )
    s_dp = replicate(mesh, engine.init_state(jax.random.PRNGKey(0), init_batch))
    s_dp, losses_dp, _ = engine.train_epoch_resident(
        s_dp, 1e-3, jax.device_put(keys, replicated(mesh)), staged_dp,
        jax.device_put(idx, plan_spec), jax.device_put(rv, plan_spec),
    )
    np.testing.assert_allclose(
        np.asarray(losses_dp), np.asarray(losses_single), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_dp.params)),
        jax.tree_util.tree_leaves(jax.device_get(s_single.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_host_pipeline_dp_train_once_matches_single(tmp_path):
    """End-to-end: train_once on the HOST pipeline under the mesh must match
    the single-device trajectory (covers to_device's direct numpy->sharded
    placement, which the engine-level tests bypass)."""

    import pandas as pd

    from flow_timesnet_tpu.config import PipelineConfig
    from flow_timesnet_tpu.train import train_once

    rng = np.random.default_rng(0)
    T = 50
    dates = pd.date_range("2024-01-01", periods=T, freq="D")
    rows = []
    for j in range(2):
        vals = np.maximum(np.round(4 + rng.normal(0, 0.5, T)), 0)
        for d, v in zip(dates, vals):
            rows.append({"date": d.strftime("%Y-%m-%d"), "id": f"S{j}", "target": float(v)})
    train_csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(train_csv, index=False)

    def run(dp):
        cfg = {
            "data": {"train_csv": str(train_csv), "date_col": "date", "id_col": "id",
                     "target_col": "target", "time_features": {"enabled": False}},
            "preprocess": {"normalize": "none", "clip_negative": True},
            "window": {"input_len": 12, "pred_len": 3},
            "model": {"mode": "direct", "input_len": 12, "pred_len": 3, "d_model": 8,
                      "d_ff": 16, "n_layers": 1, "k_periods": 1,
                      "min_period_threshold": 2, "kernel_set": [[3, 3]],
                      "dropout": 0.0, "id_embed_dim": 2},
            "train": {"device": "cpu", "epochs": 2, "batch_size": 16, "lr": 1e-3,
                      "lr_warmup_steps": 0, "input_pipeline": "host",
                      "data_parallel": dp,
                      "val": {"strategy": "holdout", "holdout_days": 18}},
            "artifacts": {"dir": str(tmp_path / f"artifacts_{dp}")},
            "tuning": {"seed": 1},
        }
        best, info = train_once(PipelineConfig.from_mapping(cfg))
        return best

    np.testing.assert_allclose(run("off"), run("auto"), rtol=1e-5, atol=1e-6)


def test_sync_frozen_spec_single_process_identity():
    """Single-process: sync_frozen_spec is the identity (no collective).

    The multi-process broadcast path (including a deliberately perturbed
    per-process spec) is exercised for real by tests/test_multiprocess_dp.py.
    """

    from flow_timesnet_tpu.parallel.mesh import sync_frozen_spec

    assert sync_frozen_spec(None, n_layers=2, k=2) is None
    spec = (((7, 3, True), (27, 1, True)), ((7, 3, True), (27, 1, False)))
    assert sync_frozen_spec(spec, n_layers=2, k=2) is spec
