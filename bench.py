#!/usr/bin/env python
"""Benchmark: end-to-end per-frame SLAM compute (tracking + amortized
local BA) at EuRoC scale on one chip — batched SuperPoint on the stereo pair, ONE batched SuperGlue call
covering stereo + temporal matching (B=2), and the 4×10 pose-only LM.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo publishes no numbers (BASELINE.md). The
upstream AirVO system (TensorRT on a desktop GPU) runs ~30 fps end-to-end;
we use 30 fps as the nominal reference throughput, so vs_baseline = fps/30.
"""

import json
import time

import numpy as np


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax

    # persistent compilation cache ≙ the reference's TensorRT engine cache
    # (super_point.cpp:333-363): second runs skip the multi-minute compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/rspl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rspl_slam_tpu.backend import pose_solver
    from rspl_slam_tpu.backend.residuals import CameraIntrinsics
    from rspl_slam_tpu.config import (CameraConfig, SuperGlueConfig,
                                      SuperPointConfig)
    from rspl_slam_tpu.models import superglue, superpoint

    cam = CameraConfig()  # EuRoC 752×480
    H, W = cam.image_height, cam.image_width
    K = 400  # EuRoC config keypoint budget
    NC = 256  # pose-solver constraint capacity
    sp_cfg = SuperPointConfig(max_keypoints=K, keypoint_threshold=1e-4)
    sg_cfg = SuperGlueConfig(image_width=W, image_height=H)
    Ki = CameraIntrinsics(cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)

    sp_params = superpoint.init_params(jax.random.PRNGKey(0))
    sg_params = superglue.init_params(jax.random.PRNGKey(1), sg_cfg)

    @jax.jit
    def frame_step(images, ref_xy, ref_score, ref_desc, ref_valid,
                   Twc0, Xw, meas, stereo, valid):
        """One tracking frame: extract stereo pair; match (left↔right) and
        (left↔ref-keyframe) in ONE batched SuperGlue call; pose-only LM."""
        feats = superpoint.extract(sp_params, images, sp_cfg)
        # batch the two match problems: [left vs right, left vs ref]
        q_xy = jnp.stack([feats.xy[0], feats.xy[0]])
        q_sc = jnp.stack([feats.score[0], feats.score[0]])
        q_d = jnp.stack([feats.desc[0], feats.desc[0]])
        q_v = jnp.stack([feats.valid[0], feats.valid[0]])
        t_xy = jnp.stack([feats.xy[1], ref_xy])
        t_sc = jnp.stack([feats.score[1], ref_score])
        t_d = jnp.stack([feats.desc[1], ref_desc])
        t_v = jnp.stack([feats.valid[1], ref_valid])
        res = superglue.match_pair(
            sg_params, q_xy, q_sc, q_d, q_v, t_xy, t_sc, t_d, t_v, sg_cfg
        )
        # thread a scalar from the matcher into the pose solve so no stage
        # is dead code under the scan (XLA prunes unused carry chains)
        meas_live = meas + res.mscores0[0, 0] * 1e-12
        out = pose_solver.optimize_pose(Ki, Twc0, Xw, meas_live, stereo, valid)
        live = (jnp.sum(feats.xy) + jnp.sum(res.mscores0)) * 1e-12
        return res.indices0, out.Tcw, live

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(2, H, W)).astype(np.float32))
    ref_xy = jnp.asarray(rng.uniform(0, 400, (K, 2)).astype(np.float32))
    ref_score = jnp.asarray(rng.uniform(size=K).astype(np.float32))
    ref_desc = jnp.asarray(rng.standard_normal((K, 256)).astype(np.float32))
    ref_valid = jnp.ones(K, bool)
    Twc0 = jnp.eye(4)
    Xw = jnp.asarray(rng.uniform([-3, -2, 2], [3, 2, 9], (NC, 3)))
    Xc = np.asarray(Xw)
    meas = np.stack([
        cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx,
        cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy,
        cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx - cam.bf / Xc[:, 2],
    ], -1)
    meas = jnp.asarray(meas + rng.standard_normal(meas.shape) * 0.3)
    stereo = jnp.ones(NC, bool)
    valid = jnp.ones(NC, bool)

    # Timing methodology: per-call wall clock over this environment's
    # tunneled device is dominated by dispatch RTT (~25 ms/call), and
    # block_until_ready does not reliably synchronize — so we chain ITERS
    # dependent frame steps inside ONE jit and materialize one scalar that
    # every stage feeds (extract → match → pose; see `live` above —
    # otherwise XLA prunes unused carry chains out of the scan and the
    # "benchmark" times a fraction of the pipeline). The per-call dispatch
    # floor is measured with a no-op jit and subtracted.
    ITERS = 100

    @jax.jit
    def chained(images, meas):
        def body(carry, _):
            im, ms = carry
            idx, Tcw, live = frame_step(
                im, ref_xy, ref_score, ref_desc, ref_valid,
                Twc0, Xw, ms, stereo, valid,
            )
            im2 = im + (idx[0, 0].astype(jnp.float32) + live) * 1e-9
            ms2 = ms + (Tcw[0, 3] + live) * 1e-9
            return (im2, ms2), Tcw[0, 3] + live

        _, ts = jax.lax.scan(body, (images, meas), None, length=ITERS)
        return ts.sum()

    @jax.jit
    def noop(x):
        return x + 1.0

    float(noop(jnp.zeros(())))
    rtt = min(
        _timed(lambda: float(noop(jnp.zeros(())))) for _ in range(5)
    )

    float(chained(images, meas))  # compile + warm
    wall = min(_timed(lambda: float(chained(images, meas))) for _ in range(3))
    dt_track = max(wall - rtt, 0.0) / ITERS

    # ---- amortized local BA (runs once per keyframe ≈ every 10th frame;
    # the metric is frames/s for tracking + BA) -------------------------
    from rspl_slam_tpu.backend import local_ba
    from rspl_slam_tpu.backend.local_ba import BAProblem

    F, Pn = 10, 512
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
    prob = BAProblem(
        Tcw=jnp.asarray(Tcw_w), pose_fixed=jnp.asarray(np.arange(F) == 0),
        points=jnp.asarray(pts + rngb.standard_normal((Pn, 3)) * 0.02),
        lines=jnp.tile(jnp.asarray([0.0, 0, 1, 1, 0, 0]), (8, 1)),
        p_pose=jnp.asarray(p_pose), p_point=jnp.asarray(p_point),
        p_meas=jnp.asarray(mb), p_stereo=jnp.ones(Cp, bool),
        p_valid=jnp.ones(Cp, bool),
        l_pose=jnp.zeros(8, jnp.int32), l_line=jnp.zeros(8, jnp.int32),
        l_eps=jnp.zeros((8, 2, 2)), l_eps_r=jnp.zeros((8, 2, 2)),
        l_stereo=jnp.zeros(8, bool), l_valid=jnp.zeros(8, bool),
    )
    BA_REPS = 10  # one BA per ~10 tracked frames

    @jax.jit
    def chained_ba(p):
        def body(carry, _):
            pp = carry
            out = local_ba.optimize_local_map(Ki, pp)
            return pp._replace(points=out.points + 1e-12), out.cost

        _, costs = jax.lax.scan(body, p, None, length=BA_REPS)
        return costs.sum()

    float(chained_ba(prob))  # compile + warm
    wall_ba = min(_timed(lambda: float(chained_ba(prob))) for _ in range(3))
    dt_ba_amortized = max(wall_ba - rtt, 0.0) / BA_REPS / 10.0

    fps = 1.0 / (dt_track + dt_ba_amortized)

    print(json.dumps({
        "metric": "tracking_ba_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
