"""Host keyframe-path latency: the map bookkeeping between device calls
must stay a few ms at EuRoC scale (K=400 keypoints, ~10-KF window,
~1.5k-landmark gather) or on-dataset throughput becomes host-bound at
every keyframe (the reference did this work inside its tracking thread;
our budget is tighter because the device work is faster)."""

import time

import numpy as np
import pytest

from rspl_slam_tpu.backend import map_store
from rspl_slam_tpu.config import PipelineConfig


K = 400  # EuRoC keypoint budget


def _build_map(n_kf=10, pts_per_kf=300, seed=0):
    rng = np.random.default_rng(seed)
    m = map_store.MapStore(K, 64, PipelineConfig())
    pt_ids = None
    for kf in range(n_kf):
        Twc = np.eye(4)
        Twc[0, 3] = 0.1 * kf
        meas = np.zeros((K, 3), np.float32)
        meas[:, :2] = rng.uniform(0, 400, (K, 2))
        meas[:, 2] = np.where(rng.random(K) < 0.6, meas[:, 0] - 5.0, -1.0)
        valid = np.ones(K, bool)
        desc = rng.standard_normal((K, 256)).astype(np.float16)
        score = rng.random(K).astype(np.float16)
        k = m.add_keyframe(kf, kf * 0.05, Twc, meas, valid, desc, score,
                           fixed=kf == 0)
        if pt_ids is None:
            pt_ids = m.new_mappoints_batch(
                rng.uniform(-3, 3, (pts_per_kf, 3)),
                desc[:pts_per_kf],
            )
        # every keyframe re-observes the same landmark set (dense window)
        m.add_point_obs_batch(pt_ids, k, np.arange(pts_per_kf))
        m.update_covisibility(k)
    return m


class TestKeyframePathLatency:
    def test_gather_ba_window_fast_and_loop_free(self):
        m = _build_map()
        # warm once (first-touch page faults etc.)
        m.gather_ba_window(9, 10, 512, 16, 2048, 64)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            prob, mapping = m.gather_ba_window(9, 10, 512, 16, 2048, 64)
        dt = (time.perf_counter() - t0) / reps
        assert mapping["ncp"] > 1000  # the gather is non-trivial
        # vectorized budget ~1-2 ms; 15 ms leaves CI headroom
        assert dt < 15e-3, f"gather_ba_window took {dt * 1e3:.1f} ms"

    def test_insert_keyframe_end_to_end_budget(self):
        """Full SLAM keyframe insertion (categorize + create + observe +
        triangulate dispatch + covisibility) at EuRoC scale."""
        import jax

        from rspl_slam_tpu.config import SuperPointConfig, SystemConfig
        from rspl_slam_tpu.evaluation import synthetic
        from rspl_slam_tpu.frontend.frontends import OracleFrontend
        from rspl_slam_tpu.slam import SLAMSystem

        cfg = SystemConfig(
            superpoint=SuperPointConfig(max_keypoints=K),
            use_lines=False,
        )
        scene = synthetic.make_scene(num_points=1500, num_lines=0, seed=1,
                                     extent=(10.0, 6.0, 16.0))
        traj = synthetic.make_trajectory(40, step=0.06, yaw_rate=0.004)
        fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=1)
        fe.poses = traj
        slam = SLAMSystem(cfg, fe, enable_ba=True)
        for i in range(40):
            slam.add_frame(i, i * 0.05, None, None)
        assert slam.map.n_kf >= 3
        med_insert = float(np.median(slam.timings["kf_insert"]))
        # host bookkeeping share of keyframe insertion (excludes BA solve)
        assert med_insert < 60e-3, f"kf_insert median {med_insert * 1e3:.1f} ms"
        print(f"kf_insert median {med_insert * 1e3:.2f} ms, "
              f"gathers n_kf={slam.map.n_kf} n_pt={slam.map.n_pt}")
