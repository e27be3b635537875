"""End-to-end SLAM test on a synthetic sequence with the oracle frontend."""

import numpy as np
import pytest

from rspl_slam_tpu.config import (
    KeyframeConfig, PipelineConfig, SuperPointConfig, SystemConfig,
)
from rspl_slam_tpu.evaluation import absolute_trajectory_error, synthetic
from rspl_slam_tpu.frontend.frontends import OracleFrontend
from rspl_slam_tpu.slam import INIT_POSE, SLAMSystem


def run_sequence(n_frames=40, noise_px=0.3, outlier_frac=0.05, enable_ba=True,
                 seed=0, num_points=800, use_lines=False, num_lines=10):
    cfg = SystemConfig(
        superpoint=SuperPointConfig(max_keypoints=256),
        pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=16),
        use_lines=use_lines,
    )
    scene = synthetic.make_scene(num_points=num_points, seed=seed,
                                 num_lines=num_lines,
                                 extent=(10.0, 6.0, 16.0))
    traj_cam = synthetic.make_trajectory(n_frames, step=0.05, yaw_rate=0.003)
    # ground truth world poses of the SLAM output = INIT_POSE @ traj (the
    # first frame is pinned to the reference's gravity-aligned init pose)
    fe = OracleFrontend(cfg, scene, noise_px=noise_px,
                        outlier_frac=outlier_frac, seed=seed)
    fe.poses = traj_cam
    slam = SLAMSystem(cfg, fe, enable_ba=enable_ba)
    for i in range(n_frames):
        slam.add_frame(i, i * 0.05, None, None)
    return slam, traj_cam


class TestSLAMEndToEnd:
    def test_initialization(self):
        slam, traj = run_sequence(n_frames=1)
        assert slam.initialized
        assert slam.map.n_kf == 1
        assert slam.map.n_pt >= 100
        np.testing.assert_allclose(slam.map.kf_pose[0], INIT_POSE)

    def test_tracking_ate_no_ba(self):
        slam, traj = run_sequence(n_frames=30, enable_ba=False)
        est = np.stack([r.Twc for r in slam.records])
        ts = np.asarray([r.time for r in slam.records])
        # GT in the SLAM world frame: first pose INIT_POSE ≙ traj[0]=I
        gt = np.einsum("ij,njk->nik", INIT_POSE, traj)
        res = absolute_trajectory_error(ts, est[:, :3, 3], ts, gt[:, :3, 3])
        assert res["rmse"] < 0.01, res

    def test_tracking_ate_with_ba(self):
        slam, traj = run_sequence(n_frames=40, enable_ba=True)
        est = np.stack([r.Twc for r in slam.records])
        ts = np.asarray([r.time for r in slam.records])
        gt = np.einsum("ij,njk->nik", INIT_POSE, traj)
        res = absolute_trajectory_error(ts, est[:, :3, 3], ts, gt[:, :3, 3])
        assert res["rmse"] < 0.01, res
        # keyframes were created and BA ran
        assert slam.map.n_kf >= 2

    def test_keyframe_trajectory_io(self, tmp_path):
        slam, traj = run_sequence(n_frames=25)
        f = str(tmp_path / "kf.txt")
        slam.save_trajectory(f)
        from rspl_slam_tpu.datasets import read_tum_trajectory

        t, p = read_tum_trajectory(f)
        assert len(t) == slam.map.n_kf
        assert np.isfinite(p).all()

    def test_map_save_load_roundtrip(self, tmp_path):
        slam, _ = run_sequence(n_frames=15)
        f = str(tmp_path / "map.npz")
        slam.save_map(f)
        from rspl_slam_tpu.backend.map_store import MapStore

        m2 = MapStore.load(f, slam.cfg.pipeline)
        assert m2.n_kf == slam.map.n_kf
        assert m2.n_pt == slam.map.n_pt
        np.testing.assert_allclose(m2.kf_pose[: m2.n_kf],
                                   slam.map.kf_pose[: slam.map.n_kf])

    def test_point_line_slam(self):
        """Full point+line pipeline: maplines created, triangulated, and in
        the BA; ATE stays tight."""
        slam, traj = run_sequence(n_frames=40, use_lines=True, num_lines=12)
        est = np.stack([r.Twc for r in slam.records])
        ts = np.asarray([r.time for r in slam.records])
        gt = np.einsum("ij,njk->nik", INIT_POSE, traj)
        res = absolute_trajectory_error(ts, est[:, :3, 3], ts, gt[:, :3, 3])
        assert res["rmse"] < 0.01, res
        assert slam.map.n_ln > 0
        # at least one mapline triangulated near a GT scene line
        tri = np.nonzero(slam.map.ln_has_endpoints[: slam.map.n_ln])[0]
        assert len(tri) > 0
        fe_scene = slam.frontend.scene
        # world frame = INIT_POSE ∘ scene frame
        ok = 0
        for ln in tri:
            eps = slam.map.ln_endpoints[ln]  # (2,3) world
            eps_scene = (np.linalg.inv(INIT_POSE)[:3, :3] @ eps.T).T + \
                np.linalg.inv(INIT_POSE)[:3, 3]
            for seg in fe_scene.lines:
                d = seg[1] - seg[0]
                d = d / np.linalg.norm(d)
                # distance of both endpoints to the GT infinite line
                r = eps_scene - seg[0]
                perp = r - (r @ d)[:, None] * d[None]
                if np.linalg.norm(perp, axis=1).max() < 0.1:
                    ok += 1
                    break
        assert ok >= 1, f"no mapline matches a GT line ({len(tri)} triangulated)"

    def test_covisibility_window(self):
        slam, _ = run_sequence(n_frames=40)
        if slam.map.n_kf >= 3:
            nbrs = slam.map.neighbor_keyframes(slam.map.n_kf - 1, 9)
            assert nbrs[0] == slam.map.n_kf - 1
            assert len(set(nbrs.tolist())) == len(nbrs)


class TestCapacitySaturation:
    def test_long_sequence_saturates_instead_of_crashing(self):
        """A sequence that would overflow the fixed mappoint store degrades
        to extending existing landmarks (creation saturates with a warning)
        instead of dying on the allocator assert mid-run."""
        cfg = SystemConfig(
            superpoint=SuperPointConfig(max_keypoints=256),
            pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=16,
                                    max_map_points=400, max_map_lines=8),
        )
        scene = synthetic.make_scene(num_points=900, seed=6, num_lines=0,
                                     extent=(10.0, 6.0, 16.0))
        traj = synthetic.make_trajectory(40, step=0.05, yaw_rate=0.003)
        fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=6)
        fe.poses = traj
        slam = SLAMSystem(cfg, fe, enable_ba=True)
        for i in range(40):
            slam.add_frame(i, i * 0.05, None, None)
        # store full, tracking survived to the end of the sequence
        assert slam.map.n_pt <= 400
        assert slam.map.points_remaining == 400 - slam.map.n_pt
        assert slam._capacity_warned
        assert slam.records[-1].num_inliers > 10


class TestKeyframeCulling:
    def test_redundant_keyframes_culled_and_tracking_continues(self):
        """Slow overlapping motion makes most keyframes redundant; culling
        removes them (bounded life-long map) and tracking + BA continue on
        the survivors at unchanged accuracy."""
        cfg = SystemConfig(
            superpoint=SuperPointConfig(max_keypoints=256),
            pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=16),
            keyframe=KeyframeConfig(max_num_match=300),  # kf nearly every frame
        )
        scene = synthetic.make_scene(num_points=800, seed=8, num_lines=0,
                                     extent=(10.0, 6.0, 16.0))
        traj = synthetic.make_trajectory(60, step=0.02, yaw_rate=0.002)
        fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=8)
        fe.poses = traj
        slam = SLAMSystem(cfg, fe, enable_ba=True)
        for i in range(40):
            slam.add_frame(i, i * 0.05, None, None)
        n_kf = int(slam.map.kf_valid[: slam.map.n_kf].sum())
        assert n_kf >= 10, n_kf
        # the oracle samples a random 256-subset of the scene per frame, so
        # coverage tops out below the strict ORB default — pass an explicit
        # criterion matched to the synthetic overlap
        culled = slam.cull_redundant_keyframes(min_other_obs=2, ratio=0.7)
        assert culled >= 3, (n_kf, culled)
        live = int(slam.map.kf_valid[: slam.map.n_kf].sum())
        assert live == n_kf - culled
        # trajectory output excludes culled slots
        times, poses = slam.map.keyframe_trajectory()
        assert len(times) == live
        # tracking + keyframe insertion + BA continue on the culled map
        errs = []
        for i in range(40, 60):
            rec = slam.add_frame(i, i * 0.05, None, None)
            gt = INIT_POSE @ traj[i]
            errs.append(float(np.linalg.norm(rec.Twc[:3, 3] - gt[:3, 3])))
        assert max(errs) < 0.02, errs

    def test_protected_keyframes_survive(self):
        cfg = SystemConfig(
            superpoint=SuperPointConfig(max_keypoints=256),
            pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=16),
            keyframe=KeyframeConfig(max_num_match=300),
        )
        scene = synthetic.make_scene(num_points=800, seed=8, num_lines=0,
                                     extent=(10.0, 6.0, 16.0))
        traj = synthetic.make_trajectory(30, step=0.02, yaw_rate=0.002)
        fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=8)
        fe.poses = traj
        slam = SLAMSystem(cfg, fe, enable_ba=True)
        for i in range(30):
            slam.add_frame(i, i * 0.05, None, None)
        slam.cull_redundant_keyframes(min_other_obs=2, ratio=0.7, keep_recent=3)
        m = slam.map
        assert m.kf_valid[0]  # gauge frame (fixed)
        assert m.kf_valid[slam._ref_kf]
        assert m.kf_valid[m.n_kf - 3: m.n_kf].all()


class TestAsyncBA:
    """PipelineConfig.async_ba: the local BA solve overlaps subsequent
    frames' tracking; its result scatters at the next keyframe (or at any
    save/global op via flush_ba). One-keyframe staleness must not cost
    accuracy on a well-conditioned sequence."""

    def _run(self, async_ba: bool):
        cfg = SystemConfig(
            superpoint=SuperPointConfig(max_keypoints=256),
            pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=16,
                                    async_ba=async_ba),
        )
        scene = synthetic.make_scene(num_points=800, seed=0,
                                     extent=(10.0, 6.0, 16.0))
        traj = synthetic.make_trajectory(40, step=0.05, yaw_rate=0.003)
        fe = OracleFrontend(cfg, scene, noise_px=0.3, outlier_frac=0.05,
                            seed=0)
        fe.poses = traj
        slam = SLAMSystem(cfg, fe)
        for i in range(40):
            slam.add_frame(i, i * 0.05, None, None)
        return slam, traj

    def test_ate_matches_sync(self):
        slam_a, traj = self._run(True)
        slam_s, _ = self._run(False)
        # async path actually deferred at least one solve
        assert "ba_apply" in slam_a.timings, slam_a.timings.keys()
        assert "ba_apply" not in slam_s.timings
        for slam in (slam_a, slam_s):
            est = np.stack([r.Twc for r in slam.records])
            ts = np.asarray([r.time for r in slam.records])
            gt = np.einsum("ij,njk->nik", INIT_POSE, traj)
            res = absolute_trajectory_error(ts, est[:, :3, 3], ts,
                                            gt[:, :3, 3])
            assert res["rmse"] < 0.012, (slam.cfg.pipeline.async_ba, res)

    def test_flush_on_save(self, tmp_path):
        slam, _ = self._run(True)
        # force an in-flight solve, then save: flush must settle it
        assert slam.map.n_kf >= 2
        slam._dispatch_local_ba(slam.map.n_kf - 1)
        assert slam._pending_ba is not None
        slam.save_trajectory(str(tmp_path / "t.txt"))
        assert slam._pending_ba is None
        assert np.isfinite(slam.map.kf_pose[: slam.map.n_kf]).all()
