"""Checkpoint/resume of a full SLAM session: save the map mid-sequence,
rebuild a fresh system from the checkpoint, keep tracking. The reference
only writes text maps it never reads back (map.cc:1026-1077)."""

import numpy as np

from rspl_slam_tpu.config import PipelineConfig, SuperPointConfig, SystemConfig
from rspl_slam_tpu.evaluation import synthetic
from rspl_slam_tpu.frontend.frontends import OracleFrontend
from rspl_slam_tpu.slam import INIT_POSE, SLAMSystem


def _cfg():
    return SystemConfig(
        superpoint=SuperPointConfig(max_keypoints=256),
        pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=16),
    )


def _scene_traj(n):
    scene = synthetic.make_scene(num_points=900, seed=4, num_lines=0,
                                 extent=(10.0, 6.0, 16.0))
    traj = synthetic.make_trajectory(n, step=0.05, yaw_rate=0.003)
    return scene, traj


def test_resume_continues_tracking(tmp_path):
    cfg = _cfg()
    scene, traj = _scene_traj(50)
    fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=4)
    slam = SLAMSystem(cfg, fe, enable_ba=True)
    for i in range(30):
        slam.add_frame_features(i, i * 0.05, fe.observe(traj[i]))
    ckpt = str(tmp_path / "map.npz")
    slam.save_map(ckpt)
    n_kf, n_pt = slam.map.n_kf, slam.map.n_pt

    fresh = SLAMSystem(cfg, fe, enable_ba=True)
    fresh.resume_from_map(ckpt)
    assert fresh.initialized
    assert fresh.map.n_kf == n_kf and fresh.map.n_pt == n_pt

    errs = []
    for i in range(30, 50):
        rec = fresh.add_frame_features(i, i * 0.05, fe.observe(traj[i]))
        gt = INIT_POSE @ traj[i]
        errs.append(float(np.linalg.norm(rec.Twc[:3, 3] - gt[:3, 3])))
    assert max(errs) < 0.02, errs
    # tracking continued productively: new keyframes extend the map
    assert fresh.map.n_kf >= n_kf


def test_resume_from_moved_camera_relocalizes(tmp_path):
    """System goes down, camera is carried elsewhere along the mapped
    trajectory, comes back up: resume + relocalization re-anchor it."""
    cfg = _cfg()
    # wide yaw sweep (like the kidnap test) so the resume pose's view is
    # disjoint from the last keyframe's
    scene = synthetic.make_scene(num_points=1500, num_lines=0,
                                 extent=(40.0, 6.0, 14.0), seed=5)
    traj = synthetic.make_trajectory(50, step=0.02, yaw_rate=0.032)
    fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=1)
    slam = SLAMSystem(cfg, fe, enable_ba=True)
    for i in range(50):
        slam.add_frame_features(i, i * 0.05, fe.observe(traj[i]))
    ckpt = str(tmp_path / "map.npz")
    slam.save_map(ckpt)

    fresh = SLAMSystem(cfg, fe, enable_ba=True, enable_relocalization=True,
                       reloc_after=0)
    fresh.resume_from_map(ckpt)
    errs = []
    for k in range(5):  # wake up at an EARLY pose (view disjoint from anchor)
        rec = fresh.add_frame_features(60 + k, 3.0 + k * 0.05,
                                       fe.observe(traj[4 + k]))
        gt = INIT_POSE @ traj[4 + k]
        errs.append(float(np.linalg.norm(rec.Twc[:3, 3] - gt[:3, 3])))
    assert fresh.reloc_count >= 1
    assert errs[-1] < 0.05, errs
