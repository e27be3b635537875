"""Rectification in the default ingest path.

The reference undistorts EVERY frame at AddInput (map_builder.cc:57 →
Camera::UndistortImage, camera.cc:87). Here that lives in
NeuralFrontend.extract_pair: a frontend built from a config with raw
calibration must produce IDENTICAL features from raw distorted images as a
no-rectify frontend fed the pre-rectified images — the same pixels reach
the network either way.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from rspl_slam_tpu.camera import build_rectify_maps, remap_bilinear
from rspl_slam_tpu.config import (CameraConfig, LineDetectorConfig,
                                  SuperPointConfig, SystemConfig)
from rspl_slam_tpu.frontend.frontends import NeuralFrontend
from rspl_slam_tpu.models import superglue, superpoint


def _distorting_config(H=64, W=96):
    fx = fy = 80.0
    cx, cy = W / 2.0, H / 2.0
    K = (fx, 0, cx, 0, fy, cy, 0, 0, 1)
    P = (fx, 0, cx, 0, 0, fy, cy, 0, 0, 0, 1, 0)
    D = (-0.28, 0.07, 1e-4, 2e-5, 0.0)  # EuRoC-magnitude radtan
    cam = CameraConfig(
        image_width=W, image_height=H, fx=fx, fy=fy, cx=cx, cy=cy,
        left_K=K, left_D=D, left_R=tuple(np.eye(3).ravel()), left_P=P,
        right_K=K, right_D=D, right_R=tuple(np.eye(3).ravel()), right_P=P,
    )
    return SystemConfig(
        camera=cam,
        superpoint=SuperPointConfig(max_keypoints=64, keypoint_threshold=1e-5),
        use_lines=False,
    )


class TestFrontendRectification:
    def test_raw_input_matches_prerectified(self):
        cfg = _distorting_config()
        H, W = cfg.camera.image_height, cfg.camera.image_width
        rng = np.random.default_rng(0)
        raw_l = rng.random((H, W)).astype(np.float32)
        raw_r = rng.random((H, W)).astype(np.float32)

        sp = superpoint.init_params(jax.random.PRNGKey(0))
        sg = superglue.init_params(jax.random.PRNGKey(1), cfg.superglue)
        fe_rect = NeuralFrontend(cfg, sp_params=sp, sg_params=sg,
                                 matcher="cosine", rectify=True)
        fe_pre = NeuralFrontend(cfg, sp_params=sp, sg_params=sg,
                                matcher="cosine", rectify=False)
        assert fe_rect._rect_maps is not None
        assert fe_pre._rect_maps is None

        ml = build_rectify_maps(cfg.camera, "left")
        mr = build_rectify_maps(cfg.camera, "right")
        rect_l = np.asarray(remap_bilinear(jnp.asarray(raw_l), jnp.asarray(ml)))
        rect_r = np.asarray(remap_bilinear(jnp.asarray(raw_r), jnp.asarray(mr)))

        ff_a = fe_rect.extract_pair(raw_l, raw_r)
        ff_b = fe_pre.extract_pair(rect_l, rect_r)
        np.testing.assert_array_equal(ff_a.valid, ff_b.valid)
        np.testing.assert_allclose(ff_a.xy, ff_b.xy, atol=1e-4)
        np.testing.assert_allclose(ff_a.desc, ff_b.desc, atol=1e-4)
        np.testing.assert_allclose(ff_a.meas, ff_b.meas, atol=1e-4)

    def test_no_calibration_is_noop(self):
        cfg = dataclasses.replace(
            _distorting_config(),
            camera=CameraConfig(image_width=96, image_height=64),
        )
        sp = superpoint.init_params(jax.random.PRNGKey(0))
        sg = superglue.init_params(jax.random.PRNGKey(1), cfg.superglue)
        fe = NeuralFrontend(cfg, sp_params=sp, sg_params=sg,
                            matcher="cosine", rectify=True)
        assert fe._rect_maps is None  # pre-rectified input: nothing to do

    def test_maps_move_distorted_points_back(self):
        """A bright dot drawn at the DISTORTED location of a rectified-grid
        point must appear at the rectified location after remap."""
        cfg = _distorting_config()
        cam = cfg.camera
        ml = build_rectify_maps(cam, "left")
        H, W = cam.image_height, cam.image_width
        # rectified target pixel (away from center so distortion is visible)
        u, v = 78, 14
        src = ml[v, u]  # where that rectified pixel samples from
        assert np.hypot(src[0] - u, src[1] - v) > 0.5  # distortion is real
        img = np.zeros((H, W), np.float32)
        x0, y0 = int(np.floor(src[0])), int(np.floor(src[1]))
        fx, fy = src[0] - x0, src[1] - y0
        # bilinear splat of the dot at the (sub-pixel) distorted location
        img[y0, x0] = (1 - fx) * (1 - fy)
        img[y0, x0 + 1] = fx * (1 - fy)
        img[y0 + 1, x0] = (1 - fx) * fy
        img[y0 + 1, x0 + 1] = fx * fy
        rect = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(ml)))
        got_v, got_u = np.unravel_index(np.argmax(rect), rect.shape)
        assert abs(got_u - u) <= 1 and abs(got_v - v) <= 1
