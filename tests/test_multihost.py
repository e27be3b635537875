"""Real multi-process jax.distributed exercise (VERDICT r03 item 4): two
local processes form a 2-process × 2-device CPU 'cluster' via a localhost
coordinator, build the global mesh, and run the sharded constraint BA —
the best available proxy for the ≥0.7 two-host scaling-efficiency target
in an environment with one physical chip.

Asserts: both processes converge, agree bit-for-bit with each other
(replicated outputs), and match the single-process solver on the same
problem up to f32 reduction-order noise.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(line: str) -> dict:
    m = re.search(r"RESULT pid=(\d+) cost=([\deE.+-]+) pose_err=([\deE.+-]+)"
                  r" tsum=([\deE.+-]+)", line)
    assert m, line
    return {"pid": int(m.group(1)), "cost": float(m.group(2)),
            "pose_err": float(m.group(3)), "tsum": float(m.group(4))}


def _run_workers(nproc: int, timeout: float = 420.0):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(WORKER),
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (out, err[-3000:])
        outs.append(out)
    return [_parse(o) for o in outs]


class TestTwoProcessDistributedBA:
    def test_two_processes_converge_and_agree(self):
        results = _run_workers(2)
        assert len(results) == 2
        r0, r1 = sorted(results, key=lambda r: r["pid"])
        # replicated outputs must be identical across processes
        assert r0["cost"] == r1["cost"], (r0, r1)
        assert r0["tsum"] == r1["tsum"], (r0, r1)
        # converged onto ground truth despite 20% outliers (same bound as
        # the in-process 8-device test, test_parallel.py)
        assert r0["pose_err"] < 0.03, r0
        assert np.isfinite(r0["cost"]) and r0["cost"] > 0

    def test_matches_single_process_solver(self):
        """Cross-process psum reduction must preserve the solver's
        semantics: compare the 2-process cost/poses to the plain
        single-device optimize_local_map on the identical problem."""
        sys.path.insert(0, os.path.dirname(__file__))
        from test_local_ba import K, build_problem

        from rspl_slam_tpu.backend import local_ba
        from rspl_slam_tpu.parallel import dist_ba

        results = _run_workers(2)
        prob, Tcw_gt, _, _, _ = build_problem(
            seed=5, noise_px=0.4, perturb=True, with_lines=True,
            outlier_frac=0.2,
        )
        prob = dist_ba.pad_constraints(prob, 4)
        ref = local_ba.optimize_local_map(K, prob)
        ref_cost = float(np.asarray(ref.cost))
        # f32 reduction-order noise across 15 LM iterations — relative gate
        assert abs(results[0]["cost"] - ref_cost) < 2e-3 * max(ref_cost, 1.0), (
            results[0]["cost"], ref_cost)
        ref_err = float(np.linalg.norm(
            np.asarray(ref.Tcw)[:, :3, 3] - Tcw_gt[:, :3, 3], axis=1).max())
        assert abs(results[0]["pose_err"] - ref_err) < 5e-3, (
            results[0]["pose_err"], ref_err)
