#!/usr/bin/env python
"""Benchmark: end-to-end per-frame tracking compute at EuRoC scale on one
chip — batched SuperPoint on the stereo pair, ONE batched SuperGlue call
covering stereo + temporal matching (B=2), and the 4×10 pose-only LM.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo publishes no numbers (BASELINE.md). The
upstream AirVO system (TensorRT on a desktop GPU) runs ~30 fps end-to-end;
we use 30 fps as the nominal reference throughput, so vs_baseline = fps/30.
"""

import json
import time

import numpy as np


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
        out = pose_solver.optimize_pose(Ki, Twc0, Xw, meas, stereo, valid)
        return res.indices0, out.Tcw

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
    # tunneled device is dominated by dispatch RTT, and block_until_ready
    # does not reliably synchronize — so we chain ITERS dependent frame
    # steps inside ONE jit (each step's inputs are perturbed by the
    # previous step's outputs, so nothing can be elided or overlapped away)
    # and materialize a single scalar at the end. total/ITERS is then an
    # upper bound on true per-frame device time.
    ITERS = 30

    @jax.jit
    def chained(images, meas):
        def body(carry, _):
            im, ms = carry
            idx, Tcw = frame_step(
                im, ref_xy, ref_score, ref_desc, ref_valid,
                Twc0, Xw, ms, stereo, valid,
            )
            im2 = im + idx[0, 0].astype(jnp.float32) * 1e-9
            ms2 = ms + Tcw[0, 3] * 1e-9
            return (im2, ms2), Tcw[0, 3]

        _, ts = jax.lax.scan(body, (images, meas), None, length=ITERS)
        return ts.sum()

    float(chained(images, meas))  # compile + warm
    t0 = time.perf_counter()
    float(chained(images, meas))
    dt = (time.perf_counter() - t0) / ITERS
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
