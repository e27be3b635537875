#!/usr/bin/env python
"""Per-piece device timing of the local BA step (the biggest amortized
item in the frame budget after SuperPoint).

Times, with the chained-scan methodology: the full 10->gate->5 schedule,
single LM phases of varying length (to split per-iteration cost from
fixed overhead), and the two halves of one iteration
(_build_and_solve vs _total_cost).
"""

import time

import numpy as np


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def make_problem(Ki, F=10, Pn=512, Ln=8, Cl=16):
    import jax
    import jax.numpy as jnp

    from rspl_slam_tpu.backend.local_ba import BAProblem
    from rspl_slam_tpu.geometry import plucker

    Cp = F * Pn // 2
    rngb = np.random.default_rng(1)
    pts = rngb.uniform([-3, -2, 2], [3, 2, 9], (Pn, 3))
    Tcw_w = np.tile(np.eye(4), (F, 1, 1))
    for f in range(F):
        Tcw_w[f, 0, 3] = -0.1 * f
    p_pose = rngb.integers(0, F, Cp).astype(np.int32)
    p_point = rngb.integers(0, Pn, Cp).astype(np.int32)
    mb = np.zeros((Cp, 3))
    for c in range(Cp):
        Xc = Tcw_w[p_pose[c], :3, :3] @ pts[p_point[c]] + Tcw_w[p_pose[c], :3, 3]
        u = Ki.fx * Xc[0] / Xc[2] + Ki.cx
        v = Ki.fy * Xc[1] / Xc[2] + Ki.cy
        mb[c] = [u, v, u - Ki.bf / Xc[2]]
    ep_a = rngb.uniform([-2, -1.5, 3], [2, 1.5, 8], (Ln, 3))
    ep_b = ep_a + rngb.uniform(-1, 1, (Ln, 3))
    L6 = np.asarray(jax.vmap(plucker.from_endpoints)(
        jnp.asarray(ep_a), jnp.asarray(ep_b)))
    l_pose = (np.arange(Cl) % F).astype(np.int32)
    l_line = (np.arange(Cl) % Ln).astype(np.int32)
    l_eps = np.zeros((Cl, 2, 2))
    l_eps_r = np.zeros((Cl, 2, 2))
    for c in range(Cl):
        T = Tcw_w[l_pose[c]]
        for e, P3 in enumerate((ep_a[l_line[c]], ep_b[l_line[c]])):
            Xc = T[:3, :3] @ P3 + T[:3, 3]
            l_eps[c, e] = [Ki.fx * Xc[0] / Xc[2] + Ki.cx,
                           Ki.fy * Xc[1] / Xc[2] + Ki.cy]
            l_eps_r[c, e] = [l_eps[c, e, 0] - Ki.bf / Xc[2], l_eps[c, e, 1]]
    return BAProblem(
        Tcw=jnp.asarray(Tcw_w), pose_fixed=jnp.asarray(np.arange(F) == 0),
        points=jnp.asarray(pts + rngb.standard_normal((Pn, 3)) * 0.02),
        lines=jnp.asarray(L6),
        p_pose=jnp.asarray(p_pose), p_point=jnp.asarray(p_point),
        p_meas=jnp.asarray(mb), p_stereo=jnp.ones(Cp, bool),
        p_valid=jnp.ones(Cp, bool),
        l_pose=jnp.asarray(l_pose), l_line=jnp.asarray(l_line),
        l_eps=jnp.asarray(l_eps), l_eps_r=jnp.asarray(l_eps_r),
        l_stereo=jnp.asarray(np.arange(Cl) % 2 == 0),
        l_valid=jnp.ones(Cl, bool),
    )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rspl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rspl_slam_tpu.backend import local_ba
    from rspl_slam_tpu.backend.local_ba import (_build_and_solve, _total_cost)
    from rspl_slam_tpu.backend.residuals import CameraIntrinsics
    from rspl_slam_tpu.config import CameraConfig

    cam = CameraConfig()
    Ki = CameraIntrinsics(cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    prob = make_problem(Ki)
    deltas = tuple(jnp.sqrt(jnp.asarray(v)) for v in (50.0, 75.0, 50.0, 75.0))

    def chained(stage, iters=20):
        @jax.jit
        def run(p):
            def body(carry, _):
                out = stage(carry)
                live = sum(jnp.sum(o.astype(jnp.float32)) for o in
                           jax.tree_util.tree_leaves(out)) * 1e-12
                return carry._replace(points=carry.points + live * 1e-9), live
            _, ts = jax.lax.scan(body, p, None, length=iters)
            return ts.sum()
        return run

    @jax.jit
    def noop(x):
        return x + 1.0

    float(noop(jnp.zeros(())))
    rtt = min(_timed(lambda: float(noop(jnp.zeros(())))) for _ in range(5))

    def full(p):
        out = local_ba.optimize_local_map(Ki, p)
        return (out.Tcw, out.points, out.cost)

    def schedule(i1, i2):
        def fn(p):
            out = local_ba.optimize_local_map(Ki, p, iters1=i1, iters2=i2)
            return (out.Tcw, out.points, out.cost)
        return fn

    def build_solve(p):
        dp, dx, dl, cost = _build_and_solve(
            Ki, p.Tcw, p.points, p.lines, p, p.p_valid, p.l_valid, True,
            deltas, jnp.asarray(1e-4, p.Tcw.dtype))
        return (dp, dx, dl, cost)

    def cost_only(p):
        c, chi2p, chi2l, z = _total_cost(
            Ki, p.Tcw, p.points, p.lines, p, p.p_valid, p.l_valid, deltas,
            True)
        return (c, chi2p)

    results = {}
    for name, stage, iters in [
        ("full 10+5", full, 10),
        ("sched 1+1", schedule(1, 1), 10),
        ("sched 2+2", schedule(2, 2), 10),
        ("build_and_solve", build_solve, 30),
        ("total_cost", cost_only, 30),
    ]:
        run = chained(stage, iters)
        float(run(prob))
        wall = min(_timed(lambda: float(run(prob))) for _ in range(3))
        results[name] = max(wall - rtt, 0.0) / iters * 1e3
        print(f"{name:>18}: {results[name]:7.3f} ms")

    per_iter = (results["sched 2+2"] - results["sched 1+1"]) / 2.0
    print(f"{'per LM iteration':>18}: {per_iter:7.3f} ms")
    print(f"{'fixed overhead':>18}: "
          f"{results['sched 1+1'] - 2 * per_iter:7.3f} ms")
    print(f"{'dispatch rtt':>18}: {rtt * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
