"""Two identical seeded runs must produce identical losses and parameters.

JAX is deterministic by construction given fixed PRNG keys (the reference
needed torch deterministic-algorithms enforcement; ``tests/
test_deterministic_training.py``) — this guards the host-side RNG plumbing
(shuffling, augmentation, dropout key folding).
"""

import math

import jax
import numpy as np

from flow_timesnet_tpu.data.windows import build_batcher
from flow_timesnet_tpu.engine import Engine, batch_to_device
from flow_timesnet_tpu.models.timesnet import TimesNetConfig


def _run(seed=0, epochs=2):
    rng = np.random.default_rng(seed)
    T, N = 80, 2
    t = np.arange(T)
    X = np.stack(
        [3 + np.sin(2 * math.pi * t / 7), 4 + np.cos(2 * math.pi * t / 14)], axis=1
    ).astype(np.float32)
    X += 0.1 * rng.standard_normal(X.shape).astype(np.float32)
    cfg = TimesNetConfig(
        input_len=14, pred_len=4, d_model=8, d_ff=16, n_layers=1, k_periods=2,
        kernel_set=((3, 3),), dropout=0.1, mode="direct", min_period_threshold=2,
        c_in=1, id_vocab=N, id_embed_dim=4,
    )
    engine = Engine(cfg, use_loss_masking=True, grad_clip_norm=1.0, num_series=N)
    dl = build_batcher(
        [X], [None], 14, 4, 1, "direct", 16, shuffle=True, drop_last=True,
        series_ids=[np.arange(N)], seed=seed,
        augment={"time_shift": 2, "add_noise_std": 0.01},
    )
    state = engine.init_state(jax.random.PRNGKey(seed), batch_to_device(next(iter(dl))))
    losses = []
    for ep in range(epochs):
        for i, b in enumerate(dl):
            key = jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(seed), ep), i)
            state, loss, _ = engine.train_step(state, 1e-3, key, batch_to_device(b), True)
            losses.append(float(loss))
    return losses, jax.device_get(state.params)


def test_seeded_runs_are_bitwise_identical():
    l1, p1 = _run(seed=11)
    l2, p2 = _run(seed=11)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    keyfn = lambda t: jax.tree_util.keystr(t[0])
    for (k1, v1), (k2, v2) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(p1), key=keyfn),
        sorted(jax.tree_util.tree_leaves_with_path(p2), key=keyfn),
    ):
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_different_seeds_diverge():
    l1, _ = _run(seed=1, epochs=1)
    l2, _ = _run(seed=2, epochs=1)
    assert not np.allclose(l1, l2)
