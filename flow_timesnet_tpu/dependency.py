"""Environment bootstrap utility (reference ``dependency.py`` analogue).

Prints the visible JAX devices and seeds the host RNGs — a quick sanity
entrypoint for new deployments: ``python -m flow_timesnet_tpu.dependency``.
"""

from __future__ import annotations

import jax

from .utils.seed import seed_everything


def bootstrap(seed: int = 2025, deterministic: bool = False):
    """Seed host RNGs and return (root PRNG key, device list)."""

    key = seed_everything(seed, deterministic=deterministic)
    return key, jax.devices()


def main() -> None:
    key, devices = bootstrap()
    print(f"devices: {devices}")
    print(f"default backend: {jax.default_backend()}")
    print(f"root key: {key}")


if __name__ == "__main__":
    main()
