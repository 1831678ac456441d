"""Driver-hook contract tests.

``dryrun_multichip`` is executed by the driver in a fresh process with a
virtual CPU mesh (``xla_force_host_platform_device_count``). Round 1 failed
because an incidental ``device_put`` initialised a version-skewed TPU client
(MULTICHIP_r01.json); these tests pin the regression: the dryrun must run
green on the CPU mesh *and must never initialise any non-CPU backend*, even
when JAX_PLATFORMS is unset and an accelerator plugin is registered.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRYRUN_PROBE = """
import sys
sys.path.insert(0, {repo!r})
import __graft_entry__ as g
g.dryrun_multichip(8)
from jax._src import xla_bridge
print("BACKENDS=" + ",".join(sorted(xla_bridge.backends().keys())))
"""


def test_dryrun_multichip_cpu_only_backend():
    """Fresh process, no JAX_PLATFORMS pin: dryrun must pass and must have
    touched only the CPU backend (immunity to a broken TPU client)."""

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # Poison any TPU plugin lookup: if the dryrun ever tries to initialise a
    # TPU client, it fails loudly instead of silently using a healthy one.
    env["TPU_LIBRARY_PATH"] = "/nonexistent/libtpu.so"
    proc = subprocess.run(
        [sys.executable, "-c", _DRYRUN_PROBE.format(repo=REPO)],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip(8): ok" in proc.stdout, proc.stdout
    backends = [l for l in proc.stdout.splitlines() if l.startswith("BACKENDS=")]
    assert backends and backends[-1] == "BACKENDS=cpu", proc.stdout
