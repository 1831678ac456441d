"""Benchmark: training throughput (series-windows/sec/chip) on the flagship
demand recipe (BASELINE config #2 shapes: L=28, H=7, d_model=128, d_ff=512,
2 TimesBlocks, kernels 3/5/7 with bottleneck 4, ID+static embeddings, LRTC).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.json "published" is
empty), so vs_baseline is reported against a fixed reference measurement of
the PyTorch implementation when available, else 1.0.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

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

    # Differential timing: run n1 and n2 steps, each ended by a scalar VALUE
    # fetch (true end-to-end completion even through relays whose
    # block_until_ready acks early); the per-step time is the slope, which
    # cancels the constant dispatch/fetch round-trip latency.
    def timed_run(n_steps: int, tag: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        loss = None
        for i in range(n_steps):
            state, loss, _ = engine.train_step(
                state, 1e-4, jax.random.fold_in(rng, tag * 1000 + i), dev_batch, True
            )
        _ = float(loss)
        return time.perf_counter() - t0

    n1, n2 = 10, 60
    timed_run(n1, 0)  # settle
    best_step = float("inf")
    for trial in range(2):
        e1 = timed_run(n1, 1 + 2 * trial)
        e2 = timed_run(n2, 2 + 2 * trial)
        step_time = max((e2 - e1) / (n2 - n1), 1e-9)
        best_step = min(best_step, step_time)
    windows_per_sec = batch / best_step

    print(
        json.dumps(
            {
                "metric": "train_series_windows_per_sec_per_chip",
                "value": round(float(windows_per_sec), 2),
                "unit": "windows/s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
