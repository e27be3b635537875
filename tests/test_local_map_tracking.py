"""Local-map tracking (PipelineConfig.track_local_map): projecting the
covisible map into each new keyframe recovers associations the temporal
match missed — the machinery the reference defines but never calls
(TrackLocalMap, map_builder.cc:684-785). VERDICT r03 item 6: using it is
how the engine BEATS the reference's data association instead of matching
it.

Setup: an oracle frontend whose matcher randomly DROPS a fraction of true
matches (simulating matcher misses on hard frames). Without local-map
association every dropped match spawns a duplicate landmark; with it, the
projection+descriptor search re-associates the keypoint with the original
landmark before any duplicate is created."""

import numpy as np
import pytest

from rspl_slam_tpu.config import (KeyframeConfig, PipelineConfig,
                                  SuperPointConfig, SystemConfig)
from rspl_slam_tpu.evaluation import absolute_trajectory_error, synthetic
from rspl_slam_tpu.frontend.frontends import OracleFrontend
from rspl_slam_tpu.slam import INIT_POSE, SLAMSystem


class DroppyOracle(OracleFrontend):
    """Oracle frontend that loses ``drop_frac`` of its true matches."""

    def __init__(self, *a, drop_frac=0.3, **kw):
        super().__init__(*a, **kw)
        self.drop_frac = drop_frac
        self._drop_rng = np.random.default_rng(99)

    def match(self, fA, fB):
        i0 = super().match(fA, fB)
        drop = (i0 >= 0) & (self._drop_rng.random(len(i0)) < self.drop_frac)
        return np.where(drop, -1, i0)


def run(track_local_map: bool, drop_frac: float = 0.3, n_frames: int = 30,
        seed: int = 0):
    cfg = SystemConfig(
        superpoint=SuperPointConfig(max_keypoints=256),
        pipeline=PipelineConfig(ba_max_points=768, ba_max_lines=16,
                                track_local_map=track_local_map),
        keyframe=KeyframeConfig(max_num_match=120),  # keyframe-dense run
        use_lines=False,
    )
    scene = synthetic.make_scene(num_points=800, seed=seed,
                                 extent=(10.0, 6.0, 16.0))
    traj = synthetic.make_trajectory(n_frames, step=0.05, yaw_rate=0.003)
    fe = DroppyOracle(cfg, scene, noise_px=0.4, outlier_frac=0.05,
                      seed=seed, drop_frac=drop_frac)
    fe.poses = traj
    slam = SLAMSystem(cfg, fe)
    for i in range(n_frames):
        slam.add_frame(i, i * 0.05, None, None)
    est = np.stack([r.Twc for r in slam.records])
    ts = np.asarray([r.time for r in slam.records])
    gt = np.einsum("ij,njk->nik", INIT_POSE, traj)
    ate = absolute_trajectory_error(ts, est[:, :3, 3], ts, gt[:, :3, 3])
    return slam, ate


class TestLocalMapTracking:
    def test_prevents_duplicate_landmarks(self):
        base, _ = run(False)
        aug, _ = run(True)
        m0, m1 = base.map, aug.map
        # dropped matches spawn duplicates without re-association
        assert m1.n_pt < m0.n_pt, (m0.n_pt, m1.n_pt)
        # and landmarks accumulate more observations each
        mean0 = m0.pt_obs_n[: m0.n_pt].mean()
        mean1 = m1.pt_obs_n[: m1.n_pt].mean()
        assert mean1 > mean0, (mean0, mean1)

    def test_ate_not_worse(self):
        _, ate0 = run(False)
        _, ate1 = run(True)
        # richer association must not hurt accuracy; typically it helps
        assert ate1["rmse"] <= ate0["rmse"] * 1.15 + 1e-4, (ate0, ate1)

    def test_recovered_obs_are_correct(self):
        """Association precision: every tracked slot's keypoint descriptor
        must be close to its landmark's descriptor (the 0.35/0.6 gates of
        map.cc:952-1005 must not let wrong points in)."""
        slam, _ = run(True, seed=3)
        m = slam.map
        bad = 0
        total = 0
        for kf in range(m.n_kf):
            tr = m.kf_track[kf]
            for k in np.nonzero(tr >= 0)[0]:
                pt = tr[k]
                d = 2.0 * (1.0 - float(
                    m.kf_desc[kf, k].astype(np.float32)
                    @ m.pt_desc[pt].astype(np.float32)))
                total += 1
                if d > 1.0:  # grossly wrong association
                    bad += 1
        assert total > 0
        assert bad / total < 0.02, (bad, total)
