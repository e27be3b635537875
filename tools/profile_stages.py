#!/usr/bin/env python
"""Per-stage device-time breakdown of the full frame step.

Times each stage of the benchmark's frame_step_full in isolation with the
same chained-scan methodology bench.py uses (dependent iterations inside
one jit, live scalars, dispatch floor subtracted), so the per-stage
numbers sum approximately to the full-step time and point at the next
optimization target.
"""

import time

import numpy as np


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rspl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rspl_slam_tpu.backend import pose_solver
    from rspl_slam_tpu.backend.residuals import CameraIntrinsics
    from rspl_slam_tpu.config import (CameraConfig, SuperGlueConfig,
                                      SuperPointConfig)
    from rspl_slam_tpu.frontend.frontends import _downsample_mean
    from rspl_slam_tpu.models import rcf, superglue, superpoint
    from rspl_slam_tpu.ops import lines as lops

    cam = CameraConfig()
    H, W = cam.image_height, cam.image_width
    K, NC, LMAX = 400, 256, 64
    sp_cfg = SuperPointConfig(max_keypoints=K, keypoint_threshold=1e-4)
    sg_cfg = SuperGlueConfig(image_width=W, image_height=H)
    Ki = CameraIntrinsics(cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)

    sp_params = superpoint.init_params(jax.random.PRNGKey(0))
    sg_params = superglue.init_params(jax.random.PRNGKey(1), sg_cfg)
    rcf_params = rcf.init_params(jax.random.PRNGKey(2))

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

    # ---- stage closures: each maps a carry image -> live scalar ---------
    def stage_rcf(im):
        edges = rcf.edge_map(rcf_params, _downsample_mean(im, 2))
        return jnp.sum(edges) * 1e-12

    def stage_rcf_hough(im):
        edges = rcf.edge_map(rcf_params, _downsample_mean(im, 2))
        segs_l, valid_l, _ = lops.detect_line_segments(
            edges[0], max_segments=LMAX, min_length=10.0,
            max_edge_pixels=2048)
        segs_r, valid_r, _ = lops.detect_line_segments(
            edges[1], max_segments=LMAX, min_length=10.0,
            max_edge_pixels=2048)
        return (jnp.sum(segs_l) + jnp.sum(segs_r)
                + jnp.sum(valid_l) + jnp.sum(valid_r)) * 1e-12

    def stage_sp(im):
        feats = superpoint.extract(sp_params, im, sp_cfg)
        return (jnp.sum(feats.xy) + jnp.sum(feats.desc)) * 1e-12

    def stage_sp_sg(im):
        feats = superpoint.extract(sp_params, im, sp_cfg)
        q_xy = jnp.stack([feats.xy[0], feats.xy[0]])
        q_sc = jnp.stack([feats.score[0], feats.score[0]])
        q_d = jnp.stack([feats.desc[0], feats.desc[0]])
        q_v = jnp.stack([feats.valid[0], feats.valid[0]])
        t_xy = jnp.stack([feats.xy[1], ref_xy])
        t_sc = jnp.stack([feats.score[1], ref_score])
        t_d = jnp.stack([feats.desc[1], ref_desc])
        t_v = jnp.stack([feats.valid[1], ref_valid])
        res = superglue.match_pair(
            sg_params, q_xy, q_sc, q_d, q_v, t_xy, t_sc, t_d, t_v, sg_cfg)
        return (jnp.sum(res.mscores0) + jnp.sum(feats.xy)) * 1e-12

    def stage_sp_sg_short_sinkhorn(im):
        feats = superpoint.extract(sp_params, im, sp_cfg)
        q_xy = jnp.stack([feats.xy[0], feats.xy[0]])
        q_sc = jnp.stack([feats.score[0], feats.score[0]])
        q_d = jnp.stack([feats.desc[0], feats.desc[0]])
        q_v = jnp.stack([feats.valid[0], feats.valid[0]])
        t_xy = jnp.stack([feats.xy[1], ref_xy])
        t_sc = jnp.stack([feats.score[1], ref_score])
        t_d = jnp.stack([feats.desc[1], ref_desc])
        t_v = jnp.stack([feats.valid[1], ref_valid])
        res = superglue.match_pair(
            sg_params, q_xy, q_sc, q_d, q_v, t_xy, t_sc, t_d, t_v, sg_cfg,
            sinkhorn_iters=10)
        return (jnp.sum(res.mscores0) + jnp.sum(feats.xy)) * 1e-12

    def stage_pose(im):
        out = pose_solver.optimize_pose(
            Ki, Twc0, Xw, meas + jnp.sum(im) * 1e-15, stereo, valid)
        return out.Tcw[0, 3] * 1e-12

    def chained(stage, iters):
        @jax.jit
        def run(im):
            def body(carry, _):
                live = stage(carry)
                return carry + live * 1e-3, live
            _, ts = jax.lax.scan(body, im, None, length=iters)
            return ts.sum()
        return run

    @jax.jit
    def noop(x):
        return x + 1.0

    float(noop(jnp.zeros(())))
    rtt = min(_timed(lambda: float(noop(jnp.zeros(())))) for _ in range(5))

    ITERS = 50
    results = {}
    for name, stage in [
        ("rcf_pair", stage_rcf),
        ("rcf+hough", stage_rcf_hough),
        ("superpoint", stage_sp),
        ("sp+superglue", stage_sp_sg),
        ("sp+sg_sinkhorn10", stage_sp_sg_short_sinkhorn),
        ("pose_lm", stage_pose),
    ]:
        run = chained(stage, ITERS)
        float(run(images))  # compile + warm
        wall = min(_timed(lambda: float(run(images))) for _ in range(3))
        results[name] = max(wall - rtt, 0.0) / ITERS * 1e3
        print(f"{name:>20}: {results[name]:7.3f} ms")

    print(f"{'dispatch rtt':>20}: {rtt * 1e3:7.3f} ms")
    print(f"{'superglue alone':>20}: "
          f"{results['sp+superglue'] - results['superpoint']:7.3f} ms")
    print(f"{'sinkhorn 90 iters':>20}: "
          f"{results['sp+superglue'] - results['sp+sg_sinkhorn10']:7.3f} ms")
    print(f"{'hough alone':>20}: "
          f"{results['rcf+hough'] - results['rcf_pair']:7.3f} ms")

    # ---- MFU / speed-of-light accounting (XLA cost analysis vs nominal
    # bf16 peak; same machinery as bench.py's `mfu` block) ----------------
    import bench as _bench

    dev = jax.devices()[0]
    peak = _bench._peak_flops(dev)
    print(f"\nMFU on {getattr(dev, 'device_kind', dev)} "
          f"(peak {'?' if peak is None else peak / 1e12} bf16 Tflop/s):")
    for name, stage in [("rcf_pair", stage_rcf), ("superpoint", stage_sp),
                        ("sp+superglue", stage_sp_sg),
                        ("pose_lm", stage_pose)]:
        fl = _bench._graph_flops(jax.jit(stage), images)
        dt = results[name] * 1e-3
        if fl is None or peak is None or dt <= 0:
            print(f"{name:>20}: flops unavailable")
            continue
        print(f"{name:>20}: {fl / 1e9:8.2f} Gflop  "
              f"{fl / dt / peak * 100.0:6.2f}% of peak")


if __name__ == "__main__":
    main()
