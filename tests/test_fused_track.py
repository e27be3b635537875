"""Fused one-dispatch tracking (fused_track.py) vs the three-dispatch slow
path: same trajectory (up to PnP RANSAC key draws), and the timing report
shows ONE device span per tracked frame."""

import dataclasses

import numpy as np
import pytest

from rspl_slam_tpu.config import CameraConfig, SuperPointConfig, SystemConfig
from rspl_slam_tpu.evaluation import absolute_trajectory_error, synthetic
from rspl_slam_tpu.frontend.frontends import NeuralFrontend
from rspl_slam_tpu.slam import INIT_POSE, SLAMSystem


def small_cfg():
    cam = CameraConfig(image_width=320, image_height=240, fx=240.0,
                       fy=240.0, cx=160.0, cy=120.0, bf=24.0,
                       depth_upper_thr=20.0)
    cfg = SystemConfig(
        superpoint=SuperPointConfig(max_keypoints=400,
                                    keypoint_threshold=1e-4),
        camera=cam, use_lines=False,
    )
    return dataclasses.replace(
        cfg, superglue=dataclasses.replace(cfg.superglue, image_width=320,
                                           image_height=240))


def run(fused: bool, n: int = 8):
    cfg = small_cfg()
    scene = synthetic.make_scene(num_points=500, num_lines=6, seed=1,
                                 extent=(6.0, 4.0, 6.0), on_line_frac=0.0)
    traj = synthetic.make_trajectory(n, step=0.06)
    fe = NeuralFrontend(cfg, matcher="cosine")
    slam = SLAMSystem(cfg, fe, fused_tracking=fused)
    recs = []
    for i in range(n):
        il, ir = synthetic.render_images(scene, cfg.camera, traj[i], seed=i)
        recs.append(slam.add_frame(i, i * 0.05, il, ir))
    return slam, recs, traj


class TestFusedTracking:
    def test_matches_slow_path_trajectory(self):
        slam_f, recs_f, traj = run(True)
        slam_s, recs_s, _ = run(False)
        assert slam_f.initialized and slam_s.initialized
        est_f = np.stack([r.Twc for r in recs_f])
        est_s = np.stack([r.Twc for r in recs_s])
        # identical matching; only the PnP key stream differs → the two
        # paths land on the same chi2-gated LM optimum
        d = np.linalg.norm(est_f[:, :3, 3] - est_s[:, :3, 3], axis=1)
        assert d.max() < 0.02, d
        inl_f = np.asarray([r.num_inliers for r in recs_f[1:]])
        inl_s = np.asarray([r.num_inliers for r in recs_s[1:]])
        assert (np.abs(inl_f - inl_s) <= np.maximum(5, 0.2 * inl_s)).all(), (
            inl_f, inl_s)

    def test_single_dispatch_per_frame(self):
        slam_f, recs_f, _ = run(True, n=6)
        t = slam_f.timings
        # every tracked frame went through the fused step; the slow-path
        # spans (separate match + pose_opt) never fired
        assert len(t.get("track_fused", [])) == len(recs_f) - 1
        assert "match" not in t
        assert "pose_opt" not in t

    def test_tracks_accurately(self):
        slam_f, recs_f, traj = run(True)
        est = np.stack([r.Twc for r in recs_f])
        ts = np.asarray([r.time for r in recs_f])
        gt = np.einsum("ij,njk->nik", INIT_POSE, traj)
        res = absolute_trajectory_error(ts, est[:, :3, 3], ts, gt[:, :3, 3])
        assert res["rmse"] < 0.3, res


class TestCombinedFrameStep:
    """Combined extraction+tracking dispatch (frame_step.CombinedTracker):
    one device round trip per tracked frame in lazy mode."""

    def _run(self, combined: bool, n: int = 8):
        import dataclasses as dc

        from rspl_slam_tpu.config import LineDetectorConfig, PipelineConfig

        cfg = small_cfg()
        cfg = dc.replace(
            cfg,
            pipeline=PipelineConfig(lazy_right_extraction=True,
                                    combined_frame_step=combined),
            line_detector=LineDetectorConfig(max_lines=32),
            use_lines=True,
        )
        scene = synthetic.make_scene(num_points=500, num_lines=6, seed=1,
                                     extent=(6.0, 4.0, 6.0),
                                     on_line_frac=0.0)
        traj = synthetic.make_trajectory(n, step=0.06)
        fe = NeuralFrontend(cfg, matcher="cosine")
        slam = SLAMSystem(cfg, fe)
        recs = []
        for i in range(n):
            il, ir = synthetic.render_images(scene, cfg.camera, traj[i],
                                             seed=i)
            il = (np.clip(il, 0, 1) * 255).astype(np.uint8)
            ir = (np.clip(ir, 0, 1) * 255).astype(np.uint8)
            recs.append(slam.add_frame(i, i * 0.05, il, ir))
        return slam, recs

    def test_matches_split_path(self):
        slam_c, recs_c = self._run(True)
        slam_s, recs_s = self._run(False)
        assert slam_c.initialized and slam_s.initialized
        # combined path actually ran (and only on tracked frames)
        assert len(slam_c.timings.get("frame_combined", [])) >= 6
        assert "frame_combined" not in slam_s.timings
        est_c = np.stack([r.Twc for r in recs_c])
        est_s = np.stack([r.Twc for r in recs_s])
        # same matcher, same solver — only the PnP key stream differs
        d = np.linalg.norm(est_c[:, :3, 3] - est_s[:, :3, 3], axis=1)
        assert d.max() < 0.02, d
        # keyframe structure agrees
        assert slam_c.map.n_kf == slam_s.map.n_kf

    def test_keyframe_desc_rides_completion_fetch(self):
        """The combined step defers the descriptor download; at keyframe
        insertion the left descriptors must ride the stereo-completion
        fetch (f16 pairs bitcast into the f32 buffer) instead of paying a
        separate round trip — and must round-trip EXACTLY to the device
        f16 values (bitcast is lossless; only the f32→f16 cast quantizes,
        which the map's own f16 descriptor store already accepts)."""
        import dataclasses as dc

        from rspl_slam_tpu.config import LineDetectorConfig, PipelineConfig
        from rspl_slam_tpu.frame_step import CombinedTracker

        cfg = small_cfg()
        cfg = dc.replace(
            cfg,
            pipeline=PipelineConfig(lazy_right_extraction=True),
            line_detector=LineDetectorConfig(max_lines=32),
            use_lines=True,
        )
        scene = synthetic.make_scene(num_points=500, num_lines=6, seed=1,
                                     extent=(6.0, 4.0, 6.0),
                                     on_line_frac=0.0)
        traj = synthetic.make_trajectory(3, step=0.06)
        fe = NeuralFrontend(cfg, matcher="cosine")
        slam = SLAMSystem(cfg, fe)
        for i in range(3):
            il, ir = synthetic.render_images(scene, cfg.camera, traj[i],
                                             seed=i)
            il = (np.clip(il, 0, 1) * 255).astype(np.uint8)
            ir = (np.clip(ir, 0, 1) * 255).astype(np.uint8)
            slam.add_frame(i, i * 0.05, il, ir)
        assert slam.initialized
        # drive one combined frame by hand so we hold its FrameFeatures
        # BEFORE keyframe completion
        assert slam.wants_images()
        il, ir = synthetic.render_images(scene, cfg.camera, traj[2], seed=9)
        il = (np.clip(il, 0, 1) * 255).astype(np.uint8)
        ir = (np.clip(ir, 0, 1) * 255).astype(np.uint8)
        ref_pt = slam.map.kf_track[slam._ref_kf]
        safe = np.maximum(ref_pt, 0)
        ref_good = ref_pt >= 0
        ff, i0, Twc, n_inl, inlier = slam._combined.step(
            il, ir, slam._ref_feats, slam.map.pt_pos[safe], ref_good,
            slam._last_Twc)
        # descriptors are deferred: xy on host, desc not, handle pending
        assert ff._np["xy"] is not None
        assert ff._np["desc"] is None and ff._packed is not None
        dev_desc16 = np.asarray(ff.dev[2]).astype(np.float16)
        ff2 = fe.complete_stereo(ff)
        # completion satisfied the descriptor need on ITS fetch: the
        # separate handle is gone and desc equals the device f16 exactly
        assert ff2._packed is None
        assert ff2._np["desc"] is not None
        np.testing.assert_array_equal(
            ff2.desc.astype(np.float16), dev_desc16)

    def test_pipelined_runner_uses_combined(self):
        from rspl_slam_tpu.datasets import StereoFrame
        from rspl_slam_tpu.pipeline import PipelinedRunner

        import dataclasses as dc

        from rspl_slam_tpu.config import LineDetectorConfig, PipelineConfig

        cfg = small_cfg()
        cfg = dc.replace(
            cfg,
            pipeline=PipelineConfig(lazy_right_extraction=True),
            line_detector=LineDetectorConfig(max_lines=32),
            use_lines=True,
        )
        scene = synthetic.make_scene(num_points=500, num_lines=6, seed=1,
                                     extent=(6.0, 4.0, 6.0),
                                     on_line_frac=0.0)
        traj = synthetic.make_trajectory(8, step=0.06)
        frames = []
        for i in range(8):
            il, ir = synthetic.render_images(scene, cfg.camera, traj[i],
                                             seed=i)
            frames.append(((np.clip(il, 0, 1) * 255).astype(np.uint8),
                           (np.clip(ir, 0, 1) * 255).astype(np.uint8)))

        class DS:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                return StereoFrame(index=i, time=i * 0.05,
                                   image_left=frames[i][0],
                                   image_right=frames[i][1])

        fe = NeuralFrontend(cfg, matcher="cosine")
        slam = SLAMSystem(cfg, fe)
        runner = PipelinedRunner(slam, dataset=DS())
        recs = runner.run()
        assert len(recs) == 8
        assert slam.initialized
        # frames already extracted while initialization was in flight take
        # the split path; the steady state switches to combined
        n_combined = len(slam.timings.get("frame_combined", []))
        n_fused = len(slam.timings.get("track_fused", []))
        assert n_combined >= 2, slam.timings
        assert n_combined + n_fused == 7  # every tracked frame covered
