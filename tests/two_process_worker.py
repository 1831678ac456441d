"""Worker process for the real two-process data-parallel test.

Launched twice by ``test_multiprocess_dp.py`` with a shared coordinator
(``jax.distributed.initialize`` on localhost). Each process owns 2 virtual
CPU devices -> a 4-device global mesh spanning both processes, which makes
the mesh helpers exercise their genuinely-multi-process code paths
(``make_array_from_process_local_data`` in ``shard_batch``/``_put_global``,
``process_allgather`` in ``host_fetch`` for the row-sharded embedding) that
a single-process virtual mesh can never reach (VERDICT r2 #5).
"""

import os
import sys

if __name__ == "__main__":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import numpy as np


def make_batch_and_cfg():
    """Deterministic tiny batch + config shared by workers and the parent."""

    import jax.numpy as jnp

    from flow_timesnet_tpu.models.timesnet import TimesNetConfig

    cfg = TimesNetConfig(
        input_len=16, pred_len=4, d_model=8, d_ff=16, n_layers=1, k_periods=2,
        kernel_set=((3, 3),), dropout=0.0, mode="direct", min_period_threshold=2,
        c_in=1, id_vocab=8, id_embed_dim=4, static_dim=3, static_proj_dim=4,
    )
    rng = np.random.default_rng(0)
    B = 16
    batch = {
        "x": jnp.asarray(rng.standard_normal((B, 16, 1)).astype(np.float32) + 3),
        "y": jnp.asarray(rng.poisson(3.0, (B, 4, 1)).astype(np.float32)),
        "mask": jnp.ones((B, 4, 1)),
        "x_mark": None,
        "y_mark": None,
        "static": jnp.asarray(rng.standard_normal((B, 1, 3)).astype(np.float32)),
        "ids": jnp.asarray(rng.integers(0, 8, (B, 1)).astype(np.int32)),
        "row_valid": jnp.ones(B, jnp.float32),
    }
    return cfg, batch


def run_steps(engine, state, batch, n=3):
    import jax

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(n):
        state, loss, _ = engine.train_step(
            state, 1e-3, jax.random.fold_in(key, i), batch, True
        )
        losses.append(float(loss))
    return state, losses


def main() -> None:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, "distributed runtime did not come up"

    from flow_timesnet_tpu.engine import Engine
    from flow_timesnet_tpu.parallel.mesh import (
        host_fetch,
        make_mesh,
        shard_batch,
        shard_train_state,
        table_sharding,
    )

    cfg, batch = make_batch_and_cfg()
    engine = Engine(cfg, use_loss_masking=True, grad_clip_norm=1.0, num_series=8)
    mesh = make_mesh()
    assert mesh.devices.size == 4, mesh

    state = engine.init_state(jax.random.PRNGKey(0), batch)
    state = shard_train_state(mesh, state, shard_tables=True)
    emb = state.params["series_embedding"]["embedding"]
    assert emb.sharding == table_sharding(mesh)
    assert not emb.is_fully_addressable  # rows live on BOTH processes

    dp_batch = shard_batch(mesh, batch)
    state, losses = run_steps(engine, state, dp_batch)

    fetched = host_fetch(state.params)  # must assemble the non-addressable table
    digest = float(
        sum(np.abs(np.asarray(x)).sum() for x in jax.tree_util.tree_leaves(fetched))
    )
    print(f"RESULT pid={pid} losses={','.join(f'{v:.8f}' for v in losses)} "
          f"digest={digest:.6f}", flush=True)


if __name__ == "__main__":
    main()
