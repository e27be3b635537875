"""Kidnapped-robot relocalization: after total tracking loss, the system
re-anchors on the keyframe database (place recognition + 3D-3D geometric
verification) and resumes accurate tracking.

The reference has NO recovery from full loss — on tracking failure it
re-anchors on the previous frame and keeps drifting (map_builder.cc:218-236).
This capability rides on the loop-closure machinery
(backend/loop_closure.py:LoopDetector.relocalize).

Scenario: the camera yaws ~90° through a wide scene (early and late views
are disjoint — fov is ~78°), features black out entirely for several
frames, then the camera wakes up back at an EARLY pose. Matching against
the latest reference keyframe yields nothing; only a database-wide search
can recover.
"""

import numpy as np

from rspl_slam_tpu.config import PipelineConfig, SuperPointConfig, SystemConfig
from rspl_slam_tpu.evaluation import synthetic
from rspl_slam_tpu.frontend.frontends import FrameFeatures, OracleFrontend
from rspl_slam_tpu.slam import INIT_POSE, SLAMSystem

K = 256


def _blackout(desc_dim=256):
    return FrameFeatures(
        xy=np.zeros((K, 2), np.float32),
        score=np.zeros(K, np.float32),
        desc=np.zeros((K, desc_dim), np.float32),
        valid=np.zeros(K, bool),
        meas=np.full((K, 3), -1.0, np.float32),
        depth=np.zeros(K, np.float32),
    )


def _run(enable_reloc: bool):
    cfg = SystemConfig(
        superpoint=SuperPointConfig(max_keypoints=K),
        pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=16),
    )
    # wide scene + yaw sweep: views at yaw 0 and yaw ~90° share no points
    scene = synthetic.make_scene(num_points=1500, num_lines=0,
                                 extent=(40.0, 6.0, 14.0), seed=5)
    traj = synthetic.make_trajectory(50, step=0.02, yaw_rate=0.032)
    fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=1)
    slam = SLAMSystem(cfg, fe, enable_ba=True,
                      enable_relocalization=enable_reloc)
    idx = 0
    for i in range(50):
        slam.add_frame_features(idx, idx * 0.05, fe.observe(traj[i]))
        idx += 1
    assert slam.initialized and slam.map.n_kf >= 3
    for _ in range(5):  # total feature blackout → tracking lost
        slam.add_frame_features(idx, idx * 0.05, _blackout())
        idx += 1
    errs = []
    for k in range(6):  # wake up back at an early pose
        pose = traj[4 + k]
        rec = slam.add_frame_features(idx, idx * 0.05, fe.observe(pose))
        idx += 1
        gt = INIT_POSE @ pose
        errs.append(float(np.linalg.norm(rec.Twc[:3, 3] - gt[:3, 3])))
    return slam, errs


def test_relocalization_recovers_from_kidnap():
    slam, errs = _run(enable_reloc=True)
    assert slam.reloc_count >= 1, errs
    # once relocalized, tracking is accurate again
    assert min(errs) < 0.05, errs
    assert errs[-1] < 0.05, errs


def test_without_relocalization_stays_lost():
    slam, errs = _run(enable_reloc=False)
    assert slam.reloc_count == 0
    # the pose freezes at the kidnap-time estimate, far from truth
    assert min(errs) > 0.3, errs


def test_relocalize_rejects_unmapped_place():
    """A query from a place never mapped must not produce a pose."""
    from rspl_slam_tpu.backend.loop_closure import LoopDetector

    cfg = SystemConfig(
        superpoint=SuperPointConfig(max_keypoints=K),
        pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=16),
    )
    scene = synthetic.make_scene(num_points=1500, num_lines=0,
                                 extent=(40.0, 6.0, 14.0), seed=5)
    traj = synthetic.make_trajectory(20, step=0.02, yaw_rate=0.0)
    fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=1)
    slam = SLAMSystem(cfg, fe, enable_ba=False)
    for i in range(20):
        slam.add_frame_features(i, i * 0.05, fe.observe(traj[i]))
    det = LoopDetector(bf=cfg.camera.bf)
    # a disjoint scene = a place the map has never seen
    other = synthetic.make_scene(num_points=1500, num_lines=0,
                                 extent=(40.0, 6.0, 14.0), seed=77)
    fe2 = OracleFrontend(cfg, other, noise_px=0.3, seed=2)
    q = fe2.observe(np.eye(4))
    assert det.relocalize(slam.map, q.desc, q.valid, q.meas) is None
