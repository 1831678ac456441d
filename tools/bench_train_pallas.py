"""On-chip A/B of the full flagship train step: use_pallas on vs off.

Same scan-slope timing as tools/perf_breakdown.py (slope between two scan
lengths, scalar-fetch terminated, so relay dispatch latency cancels).
Prints one JSON line per backend.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/flow_timesnet_tpu/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _example_batch, _flagship_cfg
    from flow_timesnet_tpu.engine import Engine

    batch = 256

    def bench(use_pallas: bool) -> None:
        cfg = _flagship_cfg(compute_dtype="bfloat16", use_pallas=use_pallas)
        engine = Engine(cfg, use_loss_masking=True, grad_clip_norm=1.0,
                        weight_decay=1e-6, num_series=cfg.id_vocab)
        x, marks, static, ids, y = _example_batch(cfg, batch)
        dev_batch = {
            "x": jnp.asarray(x), "y": jnp.asarray(y),
            "mask": jnp.ones_like(jnp.asarray(y)),
            "x_mark": jnp.asarray(marks), "y_mark": None,
            "static": jnp.asarray(static), "ids": jnp.asarray(ids),
            "row_valid": jnp.ones(batch, jnp.float32),
        }
        state = engine.init_state(jax.random.PRNGKey(0), dev_batch)
        key = jax.random.PRNGKey(1)

        def body(carry, _):
            st, i = carry
            st, loss, _ = engine._train_step_impl(
                st, 1e-4, jax.random.fold_in(key, i), dev_batch, do_update=True
            )
            return (st, i + 1), None

        def run(n):
            fn = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n)[0])
            c = fn((state, jnp.asarray(0, jnp.int32)))
            leaf = jax.tree_util.tree_leaves(c)[0]
            _ = float(jnp.asarray(leaf).reshape(-1)[0])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                c = fn((state, jnp.asarray(0, jnp.int32)))
                leaf = jax.tree_util.tree_leaves(c)[0]
                _ = float(jnp.asarray(leaf).reshape(-1)[0])
                best = min(best, time.perf_counter() - t0)
            return best

        n1, n2 = 8, 32
        e1, e2 = run(n1), run(n2)
        ms = max((e2 - e1) / (n2 - n1), 1e-9) * 1e3
        print(json.dumps({
            "backend": "pallas" if use_pallas else "xla",
            "ms_per_step": round(ms, 3),
            "windows_per_s": round(batch / ms * 1e3),
        }), flush=True)

    print(json.dumps({"device": getattr(jax.devices()[0], "device_kind", "?")}),
          flush=True)
    bench(False)
    bench(True)


if __name__ == "__main__":
    main()
