"""Tracking-degradation fallback: promoting the previous frame to keyframe
must chi²-gate its matches before they seed landmarks (map_builder.cc:
218-236 re-extracts AND re-optimizes). An ungated promotion would insert
outlier observations exactly when tracking is already weak."""

import numpy as np

from rspl_slam_tpu.config import PipelineConfig, SuperPointConfig, SystemConfig
from rspl_slam_tpu.evaluation import synthetic
from rspl_slam_tpu.frontend.frontends import OracleFrontend
from rspl_slam_tpu.slam import SLAMSystem


def _setup(outlier_frac=0.25, frames=30, seed=3):
    cfg = SystemConfig(
        superpoint=SuperPointConfig(max_keypoints=256),
        pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=8),
        use_lines=False,
    )
    scene = synthetic.make_scene(num_points=900, num_lines=0, seed=seed,
                                 extent=(10.0, 6.0, 16.0))
    traj = synthetic.make_trajectory(frames, step=0.05, yaw_rate=0.004)
    fe = OracleFrontend(cfg, scene, noise_px=0.3, outlier_frac=outlier_frac,
                        seed=seed)
    fe.poses = traj
    return cfg, fe, traj, SLAMSystem(cfg, fe)


def _advance_to_non_keyframe(slam, start, stop=40):
    """Feed frames until the just-added frame is NOT a keyframe, so the next
    frame's predecessor is promotable (the self-match guard skips promotion
    when the previous frame already IS the reference keyframe). Keyframe
    cadence shifts by ±1 frame between backends, so pick dynamically."""
    for i in range(start, stop):
        rec = slam.add_frame(i, i * 0.05, None, None)
        if i >= start + 1 and not rec.is_keyframe:
            return i + 1
    raise AssertionError("every frame became a keyframe")


class TestPromotedKeyframeGating:
    def test_fallback_fires_and_map_stays_outlier_free(self):
        cfg, fe, traj, slam = _setup(frames=45)
        collapse = _advance_to_non_keyframe(slam, 0)
        n_kf_before = slam.map.n_kf
        n_pt_before = slam.map.n_pt
        # collapse matching for one frame: descriptors become uninformative
        fe.desc_noise = 3.0
        slam.add_frame(collapse, collapse * 0.05, None, None)
        fe.desc_noise = 0.02
        assert slam.map.n_kf == n_kf_before + 1, "fallback did not promote"
        promoted = n_kf_before  # the new keyframe slot
        # it promoted the PREVIOUS frame, not the collapse frame itself
        assert int(slam.map.kf_frame_id[promoted]) == collapse - 1

        # every EXTENDED observation in the promoted keyframe (track to a
        # pre-existing landmark) must reproject within the chi² gate —
        # ungated insertion would admit the ~25% gross outliers
        m = slam.map
        Tcw = np.linalg.inv(m.kf_pose[promoted])
        checked = 0
        for kpt in np.nonzero(m.kf_kpt_valid[promoted])[0]:
            pt = m.kf_track[promoted, kpt]
            if pt < 0 or pt >= n_pt_before:
                continue  # unmatched or freshly created landmark
            Xc = Tcw[:3, :3] @ m.pt_pos[pt] + Tcw[:3, 3]
            u = cfg.camera.fx * Xc[0] / Xc[2] + cfg.camera.cx
            v = cfg.camera.fy * Xc[1] / Xc[2] + cfg.camera.cy
            err = np.hypot(u - m.kf_meas[promoted, kpt, 0],
                           v - m.kf_meas[promoted, kpt, 1])
            assert err < 8.0, f"outlier observation admitted: {err:.1f} px"
            checked += 1
        assert checked > 30  # the gate kept plenty of true inliers

        # recovery: tracking continues after the re-anchor
        for i in range(collapse + 1, collapse + 8):
            rec = slam.add_frame(i, i * 0.05, None, None)
        assert rec.num_inliers > 30

    def test_gated_promotion_preserves_trajectory(self):
        """End-to-end: a mid-sequence matching collapse + 25% outliers must
        not derail the trajectory."""
        from rspl_slam_tpu.evaluation import absolute_trajectory_error
        from rspl_slam_tpu.slam import INIT_POSE

        cfg, fe, traj, slam = _setup(frames=40)
        collapse = _advance_to_non_keyframe(slam, 0)
        for i in range(collapse, 40):
            if i == collapse:
                fe.desc_noise = 3.0
            slam.add_frame(i, i * 0.05, None, None)
            fe.desc_noise = 0.02
        est = np.stack([r.Twc for r in slam.records])
        ts = np.asarray([r.time for r in slam.records])
        gt = np.einsum("ij,njk->nik", INIT_POSE, traj)
        res = absolute_trajectory_error(ts, est[:, :3, 3], ts, gt[:, :3, 3])
        assert res["rmse"] < 0.05, res
