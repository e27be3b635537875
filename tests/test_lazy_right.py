"""Lazy right-image extraction (the reference's schedule).

The reference extracts right-image features only when a frame becomes a
keyframe (InsertKeyframe → ExtractFeatureAndMatch, map_builder.cc:639-682);
tracked frames carry left features only and their pose optimization is
mono. `PipelineConfig.lazy_right_extraction` reproduces that schedule:

- equivalence: a lazily-extracted frame, once completed, carries exactly
  the stereo association the eager path computes;
- end-to-end: a rendered sequence initializes, tracks, and stays within
  the eager path's ATE bound with lazy extraction on.
"""

import dataclasses

import numpy as np

from rspl_slam_tpu.config import (CameraConfig, LineDetectorConfig,
                                  SuperPointConfig, SystemConfig)
from rspl_slam_tpu.evaluation import absolute_trajectory_error, synthetic
from rspl_slam_tpu.frontend.frontends import NeuralFrontend
from rspl_slam_tpu.slam import INIT_POSE, SLAMSystem


def _small_cfg(use_lines=False):
    cam = CameraConfig(image_width=320, image_height=240, fx=240.0,
                       fy=240.0, cx=160.0, cy=120.0, bf=24.0,
                       depth_upper_thr=20.0)
    cfg = SystemConfig(
        superpoint=SuperPointConfig(max_keypoints=400,
                                    keypoint_threshold=1e-4),
        camera=cam, use_lines=use_lines,
        line_detector=LineDetectorConfig(max_lines=32),
    )
    return dataclasses.replace(
        cfg, superglue=dataclasses.replace(cfg.superglue,
                                           image_width=320,
                                           image_height=240),
    ), cam


class TestLazyEqualsEager:
    def test_completion_matches_eager_extraction(self):
        cfg, cam = _small_cfg(use_lines=True)
        scene = synthetic.make_scene(num_points=400, num_lines=8, seed=3,
                                     extent=(6.0, 4.0, 6.0),
                                     on_line_frac=0.0)
        traj = synthetic.make_trajectory(2, step=0.06)
        il, ir = synthetic.render_images(scene, cam, traj[0], seed=0)

        eager = NeuralFrontend(cfg, matcher="cosine")
        lazy = NeuralFrontend(cfg, matcher="cosine",
                              sp_params=eager.sp_params,
                              sg_params=eager.sg_params,
                              rcf_params=eager.rcf_params,
                              lazy_right=True)
        fe_ff = eager.extract_pair(il, ir)
        lz_ff = lazy.extract_pair(il, ir)

        # before completion: left-only, stereo association withheld
        assert lz_ff.pending_right is not None
        assert (lz_ff.meas[:, 2] == -1).all()
        assert (lz_ff.depth == 0).all()
        np.testing.assert_allclose(lz_ff.xy, fe_ff.xy, atol=1e-3)
        np.testing.assert_array_equal(lz_ff.valid, fe_ff.valid)

        # after completion: identical stereo association and right lines
        lazy.complete_stereo(lz_ff)
        assert lz_ff.pending_right is None
        np.testing.assert_allclose(lz_ff.meas, fe_ff.meas, atol=1e-2)
        np.testing.assert_allclose(lz_ff.depth, fe_ff.depth, atol=1e-3)
        np.testing.assert_array_equal(lz_ff.line_valid, fe_ff.line_valid)
        np.testing.assert_array_equal(lz_ff.line_has_right,
                                      fe_ff.line_has_right)
        np.testing.assert_allclose(lz_ff.lines_right, fe_ff.lines_right,
                                   atol=1e-3)
        # completing twice is a no-op
        before = lz_ff.meas.copy()
        lazy.complete_stereo(lz_ff)
        np.testing.assert_array_equal(lz_ff.meas, before)


class TestLazySLAM:
    def test_rendered_sequence_tracks_lazy(self):
        cfg, cam = _small_cfg(use_lines=False)
        scene = synthetic.make_scene(num_points=500, num_lines=6, seed=1,
                                     extent=(6.0, 4.0, 6.0),
                                     on_line_frac=0.0)
        traj = synthetic.make_trajectory(10, step=0.06)
        fe = NeuralFrontend(cfg, matcher="cosine", lazy_right=True)
        slam = SLAMSystem(cfg, fe)
        recs = []
        for i in range(10):
            il, ir = synthetic.render_images(scene, cam, traj[i], seed=i)
            recs.append(slam.add_frame(i, i * 0.05, il, ir))
        assert slam.initialized, "lazy-right neural init failed"
        inliers = [r.num_inliers for r in recs[1:]]
        assert sum(1 for n in inliers if n > 20) >= 7, inliers
        # every keyframe's stored features were stereo-completed; tracked
        # non-keyframes stayed mono (that is the lazy schedule)
        assert slam._ref_feats.pending_right is None
        assert slam.map.n_pt > 50
        est = np.stack([r.Twc for r in recs])
        ts = np.asarray([r.time for r in recs])
        gt = np.einsum("ij,njk->nik", INIT_POSE, traj)
        res = absolute_trajectory_error(ts, est[:, :3, 3], ts, gt[:, :3, 3])
        assert res["rmse"] < 0.3, res


class TestDeferredMaterialization:
    """Transfer contract of the split lazy path: tracked frames must NEVER
    download their feature buffer — only frames consumed by keyframe
    insertion (or fallback promotion) materialize. On a tunneled device
    every materialization is a blocking round trip, so this is the
    difference between ~2 and ~5 round trips per frame."""

    def test_only_keyframes_materialize(self):
        import dataclasses as dc

        import numpy as np

        from rspl_slam_tpu.config import (LineDetectorConfig,
                                          PipelineConfig, SuperPointConfig,
                                          SystemConfig)
        from rspl_slam_tpu.evaluation import synthetic
        from rspl_slam_tpu.frontend.frontends import NeuralFrontend
        from rspl_slam_tpu.slam import SLAMSystem

        from rspl_slam_tpu.config import CameraConfig

        cam = CameraConfig(image_width=320, image_height=240, fx=240.0,
                           fy=240.0, cx=160.0, cy=120.0, bf=24.0,
                           depth_upper_thr=20.0)
        cfg = SystemConfig(
            superpoint=SuperPointConfig(max_keypoints=400,
                                        keypoint_threshold=1e-4),
            camera=cam,
            line_detector=LineDetectorConfig(max_lines=32),
            # split path: combined step off so extraction stays deferred
            pipeline=PipelineConfig(lazy_right_extraction=True,
                                    combined_frame_step=False),
            use_lines=True,
        )
        cfg = dc.replace(cfg, superglue=dc.replace(
            cfg.superglue, image_width=320, image_height=240))
        scene = synthetic.make_scene(num_points=500, num_lines=6, seed=1,
                                     extent=(6.0, 4.0, 6.0),
                                     on_line_frac=0.0)
        traj = synthetic.make_trajectory(10, step=0.06)
        fe = NeuralFrontend(cfg, matcher="cosine")
        slam = SLAMSystem(cfg, fe)
        frames = {}
        for i in range(10):
            il, ir = synthetic.render_images(scene, cam, traj[i], seed=i)
            ff = fe.extract_pair(il, ir)
            rec = slam.add_frame_features(i, i * 0.05, ff)
            frames[i] = (rec, ff)
        assert slam.initialized
        kf_or_promoted = {i for i, (r, _) in frames.items()
                          if r.is_keyframe}
        # every keyframe's features were consumed → materialized
        for i in kf_or_promoted:
            assert frames[i][1].is_materialized, i
        # plain tracked frames (excluding the last frame, which stays
        # cached as the fallback anchor and MAY be consumed later) never
        # downloaded their buffer
        plain = [i for i in frames if i not in kf_or_promoted and i != 9
                 and i != 0]
        assert plain, "expected some plain tracked frames"
        n_lazy = sum(not frames[i][1].is_materialized for i in plain)
        assert n_lazy == len(plain), (
            [(i, frames[i][1].is_materialized) for i in plain])
