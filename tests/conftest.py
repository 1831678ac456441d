"""Test harness: force the CPU backend with 8 virtual devices.

Mirrors the reference's CPU-runnable test strategy (SURVEY.md §4) while also
exercising multi-chip sharding logic on a virtual mesh. The axon TPU plugin
(registered via sitecustomize) overrides JAX_PLATFORMS programmatically, so
we pin the platform through jax.config after import as well.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles many similar programs;
# caching cuts repeat-run wall clock dramatically. The thresholds are zero
# because most of the suite's compile time is thousands of ~60 ms eager-op
# compiles (parity tests run the model un-jitted) — each below the default
# 1 s persistence threshold, so with defaults NOTHING was persisted and
# every fresh pytest process re-paid the full compile bill (measured: the
# 6-architecture parity fuzz is 85 s cold vs 31 s warm cross-process).
_cache_dir = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "flow_timesnet_tpu", "jax_cache",
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
