"""Real two-process data parallelism on localhost (VERDICT r2 #4/#5).

Spawns two ``jax.distributed``-initialized CPU subprocesses sharing a
4-device global mesh and runs sharded train steps through the production
mesh helpers; both processes must reproduce the single-process trajectory
and assemble identical global parameters from non-addressable shards.
"""

import os
import re
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "two_process_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device flag
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d) losses=([\d.,\-]+) digest=([\d.\-]+) "
            r"eplosses=([\d.,\-]+) nll=([\d.\-]+) digest2=([\d.\-]+) "
            r"hlosses=([\d.,\-]+) spec=([\d:;]+) frlosses=([\d.,\-]+) "
            r"frnll=([\d.\-]+)",
            out,
        )
        assert m, f"no RESULT line in:\n{out[-2000:]}"
        results[int(m.group(1))] = (
            [float(v) for v in m.group(2).split(",")],
            float(m.group(3)),
            [float(v) for v in m.group(4).split(",")],
            float(m.group(5)),
            float(m.group(6)),
            [float(v) for v in m.group(7).split(",")],
            m.group(8),
            [float(v) for v in m.group(9).split(",")],
            float(m.group(10)),
        )
    assert set(results) == {0, 1}

    # both processes see identical losses and assemble identical params —
    # for the per-step path AND the device-resident epoch/eval/snapshot path
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)
    np.testing.assert_allclose(results[0][2], results[1][2], rtol=1e-6)
    assert results[0][3] == pytest.approx(results[1][3], rel=1e-6)
    assert results[0][4] == pytest.approx(results[1][4], rel=1e-6)
    # hybrid (dcn, data) mesh: both processes agree, and the 2-D mesh
    # reproduces the 1-D mesh's trajectory (row-order invariant batch mean)
    np.testing.assert_allclose(results[0][5], results[1][5], rtol=1e-6)
    np.testing.assert_allclose(results[0][5], results[0][0], rtol=1e-4, atol=1e-5)
    # freeze under the mesh (VERDICT r4 #3): process 1 DELIBERATELY derived a
    # perturbed local spec; after sync_frozen_spec both must hold process 0's
    # spec and their frozen resident epochs must agree exactly
    assert results[0][6] == results[1][6], (results[0][6], results[1][6])
    np.testing.assert_allclose(results[0][7], results[1][7], rtol=1e-6)
    assert results[0][8] == pytest.approx(results[1][8], rel=1e-6)
    assert np.all(np.isfinite(results[0][7]))

    # single-process reference trajectory (same batches/plan, no mesh)
    from two_process_worker import (
        make_batch_and_cfg,
        make_staged_and_plan,
        run_resident_epoch,
        run_steps,
    )

    from flow_timesnet_tpu.engine import Engine

    cfg, batch = make_batch_and_cfg()
    engine = Engine(cfg, use_loss_masking=True, grad_clip_norm=1.0, num_series=8)
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    state, ref_losses = run_steps(engine, state, batch)
    np.testing.assert_allclose(results[0][0], ref_losses, rtol=1e-4, atol=1e-5)

    staged, idx, rv = make_staged_and_plan(batch_size=8)
    _, ref_ep_losses, ref_nll = run_resident_epoch(engine, state, staged, idx, rv)
    np.testing.assert_allclose(results[0][2], ref_ep_losses, rtol=1e-4, atol=1e-5)
    assert results[0][3] == pytest.approx(ref_nll, rel=1e-4)
