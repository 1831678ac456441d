"""Persistent XLA compilation cache for the product entry points.

The reference leans on ``torch.compile``'s in-process caching; on TPU the
analogous lever is JAX's persistent compilation cache, which survives
processes. bench.py and the test suite have always enabled it, but the CLI
paths (train/predict/evaluate/tune) did not — so e.g. the high-cardinality
predict re-paid a ~9-minute XLA compile of the chunked [2048, L, 1] forward
on every invocation. One ``enable_persistent_cache()`` call at each entry
point makes repeat product runs hit the same cache as bench/tests.

Opt out with ``FLOW_TIMESNET_COMPILE_CACHE=off`` (e.g. for compile-time
measurements). Safe to call multiple times and after backend init.
"""

from __future__ import annotations

import os

import jax

_DONE = False


def enable_persistent_cache() -> None:
    global _DONE
    if _DONE:
        return
    if os.environ.get("FLOW_TIMESNET_COMPILE_CACHE", "").lower() in (
        "off",
        "0",
        "false",
        "no",
    ):
        _DONE = True
        return
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "flow_timesnet_tpu",
        "jax_cache",
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # same location as bench/tests; 1 s threshold keeps thousands of tiny
        # eager-op programs out while persisting every real model program
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimisation, never fatal
        pass
    _DONE = True
