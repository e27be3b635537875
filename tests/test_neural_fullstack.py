"""Full neural stack integration: rendered pixels → SuperPoint convnet →
cosine mutual-NN matching → PnP/LM tracking → keyframes/BA.

Untrained weights: random-conv descriptors of distinct patches are
discriminative enough for the pipeline to initialize and track; accuracy
is bounded by keypoint localization (no trained peak sharpening), so the
ATE threshold here is loose — this test pins the PLUMBING, the oracle
tests pin the math.
"""

import dataclasses

import numpy as np
import pytest

from rspl_slam_tpu.config import CameraConfig, SuperPointConfig, SystemConfig
from rspl_slam_tpu.evaluation import absolute_trajectory_error, synthetic
from rspl_slam_tpu.frontend.frontends import NeuralFrontend
from rspl_slam_tpu.ops.matching import cosine_mutual_match
from rspl_slam_tpu.slam import INIT_POSE, SLAMSystem


class TestCosineMatcher:
    def test_mutual_and_masked(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        d = rng.standard_normal((1, 10, 64)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        perm = np.asarray([3, 1, 4, 0, 2, 5, 6, 7, 8, 9])
        d1 = d[:, perm]
        m = jnp.asarray(np.arange(10) < 8)[None]
        idx = np.asarray(cosine_mutual_match(
            jnp.asarray(d), m, jnp.asarray(d1), m))[0]
        # matched index i should map to position of i in perm
        inv = np.argsort(perm)
        for i in range(8):
            if inv[i] < 8:
                assert idx[i] == inv[i], (i, idx[i], inv[i])
        assert (idx[8:] == -1).all()  # masked slots


class TestNeuralFullStack:
    def test_rendered_sequence_tracks(self):
        cam = CameraConfig(image_width=320, image_height=240, fx=240.0,
                           fy=240.0, cx=160.0, cy=120.0, bf=24.0,
                           depth_upper_thr=20.0)
        cfg = SystemConfig(
            superpoint=SuperPointConfig(max_keypoints=400,
                                        keypoint_threshold=1e-4),
            camera=cam, use_lines=False,
        )
        cfg = dataclasses.replace(
            cfg, superglue=dataclasses.replace(cfg.superglue,
                                               image_width=320,
                                               image_height=240),
        )
        # on_line_frac=0: blobs rendered ON dark line segments wash out and
        # cost the init gate its stereo-match quorum
        # near, dense scene: far blobs carry <3 px disparity and fail the
        # stereo quorum with untrained (coarse) keypoints
        scene = synthetic.make_scene(num_points=500, num_lines=6, seed=1,
                                     extent=(6.0, 4.0, 6.0), on_line_frac=0.0)
        traj = synthetic.make_trajectory(10, step=0.06)
        fe = NeuralFrontend(cfg, matcher="cosine")
        slam = SLAMSystem(cfg, fe)
        import jax.numpy  # noqa — ensure jax initialized on CPU via conftest

        recs = []
        for i in range(10):
            il, ir = synthetic.render_images(scene, cam, traj[i], seed=i)
            recs.append(slam.add_frame(i, i * 0.05, il, ir))
        assert slam.initialized, "neural init failed"
        # tracked through the sequence with a healthy inlier count
        inliers = [r.num_inliers for r in recs[1:]]
        assert sum(1 for n in inliers if n > 20) >= 7, inliers
        est = np.stack([r.Twc for r in recs])
        ts = np.asarray([r.time for r in recs])
        gt = np.einsum("ij,njk->nik", INIT_POSE, traj)
        res = absolute_trajectory_error(ts, est[:, :3, 3], ts, gt[:, :3, 3])
        # loose bound: untrained keypoint localization ~1.5 px → decimeter
        # drift over 0.6 m; trained weights tighten this by ~10×
        assert res["rmse"] < 0.3, res
