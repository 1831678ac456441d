"""Benchmark: training throughput (series-windows/sec/chip) on the flagship
demand recipe (BASELINE config #2 shapes: L=28, H=7, d_model=128, d_ff=512,
2 TimesBlocks, kernels 3/5/7 with bottleneck 4, ID+static embeddings, LRTC).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no absolute throughput numbers (BASELINE.json
"published" is empty), so vs_baseline is measured live: the PyTorch
reference implementation (mounted read-only) trains the same shapes on this
host's CPU — its only runnable backend here — and vs_baseline is
ours / reference. Falls back to 1.0 when the reference checkout or torch is
unavailable.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import os

    import jax

    # persistent compile cache: repeat bench runs (and identical driver
    # rounds) skip the expensive (possibly remote) compilation
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "flow_timesnet_tpu", "jax_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, ".")
    from __graft_entry__ import _example_batch, _flagship_cfg
    from flow_timesnet_tpu.engine import Engine
    import jax.numpy as jnp

    batch = 256
    cfg = _flagship_cfg(compute_dtype="bfloat16")
    engine = Engine(
        cfg,
        use_loss_masking=True,
        grad_clip_norm=1.0,
        weight_decay=1e-6,
        num_series=cfg.id_vocab,
    )
    x, marks, static, ids, y = _example_batch(cfg, batch)
    dev_batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(y),
        "mask": jnp.ones_like(jnp.asarray(y)),
        "x_mark": jnp.asarray(marks),
        "y_mark": None,
        "static": jnp.asarray(static),
        "ids": jnp.asarray(ids),
        "row_valid": jnp.ones(batch, jnp.float32),
    }
    state = engine.init_state(jax.random.PRNGKey(0), dev_batch)

    # warmup / compile
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        state, loss, _ = engine.train_step(state, 1e-4, jax.random.fold_in(rng, i), dev_batch, True)
    jax.block_until_ready(state.params)

    # Differential timing over two fused scan lengths: each run is ONE device
    # dispatch (lax.scan over stacked batches) ended by a scalar VALUE fetch
    # (true end-to-end completion even through relays whose block_until_ready
    # acks early). The per-step time is the slope between the two lengths,
    # which cancels the constant dispatch/fetch round-trip latency.
    def make_stacked(steps: int):
        stacked = jax.tree_util.tree_map(
            lambda x: (
                jnp.broadcast_to(x[None], (steps,) + x.shape) if x is not None else None
            ),
            dev_batch,
        )
        keys = jnp.stack([jax.random.fold_in(rng, 100 + i) for i in range(steps)])
        return stacked, keys

    n1, n2 = 8, 32
    runs = {n: make_stacked(n) for n in (n1, n2)}

    def timed_run(n_steps: int) -> float:
        nonlocal state
        stacked, keys = runs[n_steps]
        t0 = time.perf_counter()
        state, losses, _ = engine.train_steps_scanned(state, 1e-4, keys, stacked)
        _ = float(losses[-1])
        return time.perf_counter() - t0

    timed_run(n1)  # compile + settle
    timed_run(n2)
    best_step = float("inf")
    for _ in range(2):
        e1 = timed_run(n1)
        e2 = timed_run(n2)
        step_time = max((e2 - e1) / (n2 - n1), 1e-9)
        best_step = min(best_step, step_time)
    windows_per_sec = batch / best_step

    vs_baseline = 1.0
    try:
        ref_wps = _reference_windows_per_sec(batch)
        if ref_wps and ref_wps > 0:
            vs_baseline = round(float(windows_per_sec) / ref_wps, 2)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "train_series_windows_per_sec_per_chip",
                "value": round(float(windows_per_sec), 2),
                "unit": "windows/s",
                "vs_baseline": vs_baseline,
            }
        )
    )


def _reference_windows_per_sec(batch: int) -> float:
    """Train-step throughput of the PyTorch reference on this host (CPU)."""

    import os

    ref_src = "/root/reference/src"
    if not os.path.isdir(ref_src):
        return 0.0
    if ref_src not in sys.path:
        sys.path.insert(0, ref_src)
    import numpy as np
    import torch

    from timesnet_forecast.losses import negative_binomial_nll
    from timesnet_forecast.models.timesnet import TimesNet as TorchTimesNet

    torch.manual_seed(0)
    model = TorchTimesNet(
        input_len=28, pred_len=7, d_model=128, d_ff=512, n_layers=2, k_periods=2,
        kernel_set=[[3, 3], [5, 5], [7, 7]], dropout=0.1, activation="gelu",
        mode="direct", bottleneck_ratio=4.0, min_period_threshold=7,
        id_embed_dim=32, static_proj_dim=32, use_zero_mean_context=True,
        context_rank=8, context_scale=0.05,
    )
    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        (2 + rng.standard_normal((batch, 28, 1))).astype(np.float32)
    )
    marks = torch.from_numpy(rng.standard_normal((batch, 28, 8)).astype(np.float32))
    static = torch.from_numpy(rng.standard_normal((batch, 1, 5)).astype(np.float32))
    ids = torch.from_numpy(rng.integers(0, 192, (batch, 1)))
    ids[0, 0] = 191
    y = torch.from_numpy(rng.poisson(3.0, (batch, 7, 1)).astype(np.float32))
    with torch.no_grad():
        model(x[:1], x_mark=marks[:1], series_static=static[:1], series_ids=ids[:1])
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=1e-6)

    def step():
        opt.zero_grad(set_to_none=True)
        rate, disp = model(x, x_mark=marks, series_static=static, series_ids=ids)
        loss = negative_binomial_nll(y, rate, disp)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()

    step()  # warm caches
    steps = 3
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    elapsed = time.perf_counter() - t0
    return steps * batch / elapsed


if __name__ == "__main__":
    main()
