"""On-chip component timing for the flagship train step.

Differential scan timing (slope between two scan lengths, scalar-fetch
terminated) isolates per-iteration device time from relay/dispatch latency.
Prints a table: full train step, loss fwd, grad, model fwd, TimesBlock stack,
selector, and each tap conv — plus XLA's own FLOP estimate for the step.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

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
    cfg = _flagship_cfg(compute_dtype="bfloat16")
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
    params = state.params
    key = jax.random.PRNGKey(1)

    def time_scanned(make_body, n1=8, n2=32, reps=2):
        """make_body() -> (body(carry, xs) -> (carry, None), init_carry).
        Returns best per-iteration seconds from the slope."""

        body, init = make_body()

        def run(n):
            fn = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n)[0])
            c = fn(init)
            leaf = jax.tree_util.tree_leaves(c)[0]
            _ = float(jnp.asarray(leaf).reshape(-1)[0])  # settle/compile
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                c = fn(init)
                leaf = jax.tree_util.tree_leaves(c)[0]
                _ = float(jnp.asarray(leaf).reshape(-1)[0])
                best = min(best, time.perf_counter() - t0)
            return best

        e1, e2 = run(n1), run(n2)
        return max((e2 - e1) / (n2 - n1), 1e-9)

    results = {}

    # 1. full train step
    def mk_train():
        def body(carry, _):
            st, i = carry
            st, loss, _ = engine._train_step_impl(
                st, 1e-4, jax.random.fold_in(key, i), dev_batch, do_update=True
            )
            return (st, i + 1), None
        return body, (state, jnp.asarray(0, jnp.int32))
    results["train_step"] = time_scanned(mk_train)

    # 2. loss forward only (train mode, dropout)
    def mk_loss():
        def body(carry, _):
            i = carry
            loss, _ = engine._loss(params, dev_batch, jax.random.fold_in(key, i))
            return i + 1 + (loss * 0).astype(jnp.int32), None
        return body, jnp.asarray(0, jnp.int32)
    results["loss_fwd"] = time_scanned(mk_loss)

    # 3. value_and_grad (no optimizer)
    def mk_grad():
        def body(carry, _):
            i = carry
            (loss, _), grads = jax.value_and_grad(engine._loss, has_aux=True)(
                params, dev_batch, jax.random.fold_in(key, i)
            )
            gsum = sum(jnp.sum(g).astype(jnp.float32)
                       for g in jax.tree_util.tree_leaves(grads))
            return i + 1 + (gsum * 0).astype(jnp.int32), None
        return body, jnp.asarray(0, jnp.int32)
    results["loss_grad"] = time_scanned(mk_grad)

    # 4. deterministic model forward
    def mk_fwd():
        def body(carry, _):
            xp = dev_batch["x"] + carry * 1e-20
            rate, disp = engine._forward_impl(
                params, xp, dev_batch["x_mark"], dev_batch["static"],
                dev_batch["ids"], None, deterministic=True,
            )
            return carry + (jnp.sum(rate) * 0).astype(jnp.float32) + 1.0, None
        return body, jnp.asarray(0.0, jnp.float32)
    results["model_fwd"] = time_scanned(mk_fwd)

    # 5. TimesBlock stack alone on [B, L, d_model] features
    from flow_timesnet_tpu.models.period import select_periods
    from flow_timesnet_tpu.models.timesblock import TimesBlock

    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, cfg.input_len, cfg.d_model)
        ).astype(np.float32)
    )
    block = TimesBlock(
        d_model=cfg.d_model, d_ff=cfg.d_ff, kernel_set=cfg.kernel_set,
        dropout=0.0, activation=cfg.activation,
        bottleneck_ratio=cfg.bottleneck_ratio,
        min_period=cfg.min_period_threshold, max_period=cfg.input_len,
        p_cap=cfg.input_len - 1, conv_dtype="bfloat16",
    )
    sel0 = select_periods(feats, cfg.k_periods, cfg.input_len,
                          cfg.min_period_threshold)
    bvars = block.init(jax.random.PRNGKey(0), feats, sel0)

    def mk_block():
        def body(carry, _):
            f = feats + carry * 1e-20
            sel = select_periods(f, cfg.k_periods, cfg.input_len,
                                 cfg.min_period_threshold)
            out = block.apply(bvars, f, sel)
            return carry + (jnp.sum(out) * 0).astype(jnp.float32) + 1.0, None
        return body, jnp.asarray(0.0, jnp.float32)
    results["timesblock_fwd"] = time_scanned(mk_block)

    # 5b. TimesBlock fwd+bwd
    def mk_block_grad():
        def loss_fn(f):
            sel = select_periods(f, cfg.k_periods, cfg.input_len,
                                 cfg.min_period_threshold)
            return jnp.sum(block.apply(bvars, f, sel))
        def body(carry, _):
            f = feats + carry * 1e-20
            g = jax.grad(loss_fn)(f)
            return carry + (jnp.sum(g) * 0).astype(jnp.float32) + 1.0, None
        return body, jnp.asarray(0.0, jnp.float32)
    results["timesblock_fwd_bwd"] = time_scanned(mk_block_grad)

    # 6. selector alone
    def mk_sel():
        def body(carry, _):
            f = feats + carry * 1e-20
            sel = select_periods(f, cfg.k_periods, cfg.input_len,
                                 cfg.min_period_threshold)
            return carry + (jnp.sum(sel.amplitudes) * 0) + 1.0, None
        return body, jnp.asarray(0.0, jnp.float32)
    results["selector"] = time_scanned(mk_sel)

    # 7. each tap conv (mid bottleneck shapes) fwd
    from flow_timesnet_tpu.ops.fold import make_geometry, tap_conv

    K = cfg.k_periods
    mid = 32
    geom = make_geometry(jnp.asarray([7, 14], jnp.int32), cfg.input_len,
                         cfg.input_len - 1)
    h = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (K, batch, geom.Lp, mid)).astype(np.float32)
    ).astype(jnp.bfloat16)
    for kk in (3, 5, 7):
        kern = jnp.asarray(
            np.random.default_rng(2).standard_normal(
                (kk, kk, mid, mid)).astype(np.float32)
        ).astype(jnp.bfloat16)
        bias = jnp.zeros((mid,), jnp.bfloat16)

        def mk_tap(kern=kern, bias=bias, kk=kk):
            def body(carry, _):
                hp = h + carry.astype(h.dtype) * 1e-8
                out = tap_conv(hp, geom, kern, bias, kk, kk)
                return carry + (jnp.sum(out) * 0).astype(jnp.float32) + 1.0, None
            return body, jnp.asarray(0.0, jnp.float32)
        results[f"tap_conv_{kk}x{kk}_fwd"] = time_scanned(mk_tap)

    # XLA FLOP estimate of one full train step
    try:
        lowered = jax.jit(
            lambda st, b: engine._train_step_impl(st, 1e-4, key, b, do_update=True)
        ).lower(state, dev_batch)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001
        flops, cost = float("nan"), {"error": str(e)}

    print(f"\ndevice: {jax.devices()[0].device_kind}")
    print(f"XLA flops/train_step: {flops/1e9:.2f} GF")
    for name, sec in results.items():
        line = f"{name:24s} {sec*1e3:8.3f} ms"
        if name == "train_step" and np.isfinite(flops):
            line += f"   ({flops/sec/1e12:.2f} TF/s achieved)"
        print(line)
    print(f"windows/s (train_step): {batch/results['train_step']:.0f}")


if __name__ == "__main__":
    main()
