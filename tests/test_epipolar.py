"""Epipolar outlier rejection (ops.matching.fundamental_ransac_inliers) —
the TPU-native equivalent of the reference's optional
cv::findFundamentalMat(FM_RANSAC, 3, 0.99) pass (point_matching.cc:35-45,
exposed as PipelineConfig.match_outlier_rejection; default off, matching
the reference's own call sites)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspl_slam_tpu.ops.matching import fundamental_ransac_inliers


def two_view_matches(n=120, n_bad=30, noise_px=0.3, seed=0):
    """Points seen by two cameras with a known relative pose; the last
    ``n_bad`` correspondences are scrambled (wrong associations)."""
    rng = np.random.default_rng(seed)
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    X = rng.uniform([-3, -2, 3], [3, 2, 9], (n, 3))

    def project(T):
        Xc = X @ T[:3, :3].T + T[:3, 3]
        return np.stack([fx * Xc[:, 0] / Xc[:, 2] + cx,
                         fy * Xc[:, 1] / Xc[:, 2] + cy], -1)

    T1 = np.eye(4)
    ang = 0.1
    T1[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)],
                           [0, 1, 0],
                           [-np.sin(ang), 0, np.cos(ang)]])
    T1[:3, 3] = [0.4, 0.05, 0.1]
    p0 = project(np.eye(4)) + rng.standard_normal((n, 2)) * noise_px
    p1 = project(T1) + rng.standard_normal((n, 2)) * noise_px
    bad = np.arange(n - n_bad, n)
    # scramble: point i in image1 replaced by a random other point
    p1[bad] = p1[rng.permutation(bad)] + rng.uniform(20, 80, (n_bad, 2))
    return p0.astype(np.float32), p1.astype(np.float32), bad


class TestFundamentalRansac:
    def test_rejects_scrambled_matches(self):
        p0, p1, bad = two_view_matches()
        matched = np.ones(len(p0), bool)
        ok = np.asarray(fundamental_ransac_inliers(
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(matched),
            jax.random.PRNGKey(0)))
        good = np.setdiff1d(np.arange(len(p0)), bad)
        # keeps the epipolar-consistent majority, kills the scrambles
        assert ok[good].mean() > 0.9, ok[good].mean()
        assert ok[bad].mean() < 0.15, ok[bad].mean()

    def test_respects_matched_mask(self):
        p0, p1, _ = two_view_matches(n_bad=0)
        matched = np.ones(len(p0), bool)
        matched[::3] = False
        ok = np.asarray(fundamental_ransac_inliers(
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(matched),
            jax.random.PRNGKey(1)))
        assert not ok[~matched].any()

    def test_underconstrained_passthrough(self):
        """<8 matches can't constrain F: the original matches survive."""
        p0, p1, _ = two_view_matches(n=8, n_bad=0)
        matched = np.zeros(8, bool)
        matched[:5] = True
        ok = np.asarray(fundamental_ransac_inliers(
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(matched),
            jax.random.PRNGKey(2)))
        np.testing.assert_array_equal(ok, matched)


class TestFrontendKnob:
    def test_match_filters_planted_outliers(self):
        """NeuralFrontend.match with match_outlier_rejection: oracle-style
        descriptors force a known match set including scrambles; the knob
        must remove the scrambles the plain matcher accepts."""
        from rspl_slam_tpu.config import (CameraConfig, PipelineConfig,
                                          SuperPointConfig, SystemConfig)
        from rspl_slam_tpu.frontend.frontends import FrameFeatures, NeuralFrontend

        p0, p1, bad = two_view_matches(n=120, n_bad=24, seed=3)
        K = 128
        rng = np.random.default_rng(0)
        desc = rng.standard_normal((K, 64)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)

        def ff(xy):
            n = len(xy)
            pad = np.zeros((K, 2), np.float32)
            pad[:n] = xy
            valid = np.arange(K) < n
            return FrameFeatures(
                xy=pad, score=valid.astype(np.float32), desc=desc,
                valid=valid, meas=np.concatenate(
                    [pad, np.full((K, 1), -1.0, np.float32)], -1),
                depth=np.zeros(K, np.float32),
            )

        cam = CameraConfig(image_width=640, image_height=480, fx=400.0,
                           fy=400.0, cx=320.0, cy=240.0, bf=40.0)
        base = SystemConfig(
            superpoint=SuperPointConfig(max_keypoints=K), camera=cam,
            use_lines=False)
        fA, fB = ff(p0), ff(p1)

        fe_plain = NeuralFrontend(base, matcher="cosine")
        i_plain = fe_plain.match(fA, fB)
        cfg = dataclasses.replace(base, pipeline=PipelineConfig(
            match_outlier_rejection=True))
        fe_rej = NeuralFrontend(cfg, matcher="cosine")
        i_rej = fe_rej.match(fA, fB)
        # identical descriptors → the plain matcher accepts everything 1:1,
        # including the geometrically-scrambled rows
        assert (i_plain[:120] == np.arange(120)).all()
        assert (i_rej[bad] == -1).mean() > 0.8, i_rej[bad]
        good = np.setdiff1d(np.arange(120), bad)
        assert (i_rej[good] == good).mean() > 0.9
