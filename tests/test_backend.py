"""Backend tests: residual Jacobians vs autodiff, pose-only LM convergence
under noise/outliers, PnP-RANSAC robustness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspl_slam_tpu.backend import pnp, pose_solver
from rspl_slam_tpu.backend import residuals as res
from rspl_slam_tpu.backend.residuals import CameraIntrinsics
from rspl_slam_tpu.config import CameraConfig
from rspl_slam_tpu.evaluation import synthetic
from rspl_slam_tpu.geometry import plucker, se3

CAM = CameraConfig()
K = CameraIntrinsics(CAM.fx, CAM.fy, CAM.cx, CAM.cy, CAM.bf)


def make_obs(n=80, noise=0.0, seed=0, pose_err=(0.05, 0.02)):
    """Random landmarks + true pose + perturbed initial pose + measurements."""
    rng = np.random.default_rng(seed)
    Xw = rng.uniform([-3, -2, 2.5], [3, 2, 9], (n, 3))
    xi = rng.standard_normal(6) * 0.1
    Twc_true = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    Tcw = np.linalg.inv(Twc_true)
    Xc = Xw @ Tcw[:3, :3].T + Tcw[:3, 3]
    u = K.fx * Xc[:, 0] / Xc[:, 2] + K.cx
    v = K.fy * Xc[:, 1] / Xc[:, 2] + K.cy
    ur = u - K.bf / Xc[:, 2]
    meas = np.stack([u, v, ur], -1) + rng.standard_normal((n, 3)) * noise
    dxi = np.concatenate([
        rng.standard_normal(3) * pose_err[1], rng.standard_normal(3) * pose_err[0]
    ])
    Twc_init = np.asarray(se3.exp_se3(jnp.asarray(dxi))) @ Twc_true
    return jnp.asarray(Xw), jnp.asarray(meas), jnp.asarray(Twc_true), jnp.asarray(Twc_init)


class TestJacobians:
    def test_pose_jacobian_matches_autodiff(self):
        Xw, meas, Twc, _ = make_obs(12)
        Tcw = se3.inverse(Twc)
        stereo = jnp.asarray(np.arange(12) % 2 == 0)

        def r_of_xi(xi):
            T = se3.exp_se3(xi) @ Tcw
            r, _ = res.point_residual(K, T, Xw, meas, stereo)
            return r

        J_auto = jax.jacfwd(r_of_xi)(jnp.zeros(6))  # (N, 3, 6)
        J_manual = res.point_pose_jacobian(K, Tcw, Xw, stereo)
        np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_manual),
                                   rtol=1e-4, atol=1e-4)

    def test_landmark_jacobian_matches_autodiff(self):
        Xw, meas, Twc, _ = make_obs(8)
        Tcw = se3.inverse(Twc)
        stereo = jnp.ones(8, bool)

        def r_of_X(X):
            r, _ = res.point_residual(K, Tcw, X, meas, stereo)
            return r

        J_auto = jax.jacfwd(r_of_X)(Xw)  # (N, 3, N, 3)
        J_manual = res.point_landmark_jacobian(K, Tcw, Xw, stereo)
        for i in range(8):
            np.testing.assert_allclose(
                np.asarray(J_auto[i, :, i]), np.asarray(J_manual[i]),
                rtol=1e-4, atol=1e-4,
            )

    def test_huber_weight(self):
        w = res.huber_weight(jnp.asarray([1.0, 100.0]), 5.0)
        np.testing.assert_allclose(np.asarray(w), [1.0, 0.5], rtol=1e-6)


class TestPoseSolver:
    def test_converges_clean(self):
        Xw, meas, Twc_true, Twc_init = make_obs(80, noise=0.0)
        out = pose_solver.optimize_pose(
            K, Twc_init, Xw, meas, jnp.ones(80, bool), jnp.ones(80, bool)
        )
        Twc_est = np.asarray(se3.inverse(out.Tcw))
        err = np.linalg.norm(Twc_est[:3, 3] - np.asarray(Twc_true)[:3, 3])
        assert err < 1e-4
        assert int(out.num_inliers) == 80

    def test_converges_with_noise_and_outliers(self):
        rng = np.random.default_rng(3)
        n = 120
        Xw, meas, Twc_true, Twc_init = make_obs(n, noise=0.5, seed=3)
        meas = np.array(meas)  # writable copy
        # corrupt 20% of measurements grossly
        bad = rng.choice(n, n // 5, replace=False)
        meas[bad, :2] += rng.uniform(30, 80, (len(bad), 2)) * np.sign(
            rng.standard_normal((len(bad), 2))
        )
        out = pose_solver.optimize_pose(
            K, Twc_init, Xw, jnp.asarray(meas), jnp.ones(n, bool), jnp.ones(n, bool)
        )
        Twc_est = np.asarray(se3.inverse(out.Tcw))
        err = np.linalg.norm(Twc_est[:3, 3] - np.asarray(Twc_true)[:3, 3])
        assert err < 0.02
        # outliers rejected
        inl = np.asarray(out.inlier)
        assert not inl[bad].any()
        assert inl.sum() >= n - len(bad) - 5

    def test_padding_ignored(self):
        Xw, meas, Twc_true, Twc_init = make_obs(60, noise=0.1, seed=5)
        # pad with garbage rows marked invalid
        Xw_p = jnp.concatenate([Xw, jnp.zeros((20, 3))])
        meas_p = jnp.concatenate([meas, jnp.full((20, 3), 1e4)])
        valid = jnp.concatenate([jnp.ones(60, bool), jnp.zeros(20, bool)])
        out = pose_solver.optimize_pose(
            K, Twc_init, Xw_p, meas_p, jnp.ones(80, bool), valid
        )
        Twc_est = np.asarray(se3.inverse(out.Tcw))
        err = np.linalg.norm(Twc_est[:3, 3] - np.asarray(Twc_true)[:3, 3])
        assert err < 5e-3
        assert not np.asarray(out.inlier)[60:].any()


class TestPnP:
    def test_recovers_pose_with_outliers(self):
        n = 100
        rng = np.random.default_rng(7)
        Xw, meas, Twc_true, Twc_init = make_obs(n, noise=0.3, seed=7,
                                                pose_err=(0.15, 0.05))
        uv = np.asarray(meas)[:, :2].copy()
        bad = rng.choice(n, 30, replace=False)
        uv[bad] = rng.uniform([0, 0], [752, 480], (30, 2))
        out = pnp.pnp_ransac(
            K, Twc_init, Xw, jnp.asarray(uv), jnp.ones(n, bool),
            jax.random.PRNGKey(0),
        )
        assert bool(out.ok)
        Twc_est = np.asarray(se3.inverse(out.Tcw))
        err = np.linalg.norm(Twc_est[:3, 3] - np.asarray(Twc_true)[:3, 3])
        assert err < 0.05
        assert int(out.num_inliers) >= 60

    def test_too_few_points(self):
        Xw, meas, _, Twc_init = make_obs(5)
        out = pnp.pnp_ransac(
            K, Twc_init, Xw, meas[:, :2], jnp.ones(5, bool), jax.random.PRNGKey(1)
        )
        assert not bool(out.ok)


class TestLineResidual:
    def test_zero_on_line(self):
        # observed endpoints exactly on the projected line → zero residual
        p = jnp.asarray([1.0, 0.5, 4.0])
        q = jnp.asarray([-0.5, -0.2, 6.0])
        L = plucker.from_endpoints(p, q)[None]
        Tcw = jnp.eye(4)
        from rspl_slam_tpu.camera import project
        uv1 = project(CAM, p)
        uv2 = project(CAM, 0.3 * p + 0.7 * q)
        eps = jnp.stack([uv1, uv2])[None]
        r = res.line_residual(K, Tcw, L, eps, eps, jnp.asarray([False]))
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-4)

    def test_offset_endpoint_distance(self):
        # horizontal 3D line at height y in front of camera; shift an
        # endpoint vertically by k px → residual magnitude ≈ k
        p = jnp.asarray([-1.0, 0.3, 5.0])
        q = jnp.asarray([1.0, 0.3, 5.0])
        L = plucker.from_endpoints(p, q)[None]
        from rspl_slam_tpu.camera import project
        uv1 = np.array(project(CAM, p))
        uv2 = np.array(project(CAM, q))
        uv1[1] += 3.0  # 3 px off the line
        eps = jnp.asarray(np.stack([uv1, uv2]))[None]
        r = np.asarray(res.line_residual(K, jnp.eye(4), L, eps, eps, jnp.asarray([False])))
        assert abs(abs(r[0, 0]) - 3.0) < 1e-3
        assert abs(r[0, 1]) < 1e-4


class TestSynthetic:
    def test_observe_visibility_and_geometry(self):
        scene = synthetic.make_scene(num_points=200, seed=1)
        traj = synthetic.make_trajectory(5)
        obs = synthetic.observe_points(scene, CAM, traj[0])
        assert obs["visible"].sum() > 50
        # disparity consistent with depth for visible points
        vis = obs["visible"]
        disp = obs["uv_left"][vis, 0] - obs["uv_right"][vis, 0]
        np.testing.assert_allclose(disp, CAM.bf / obs["depth"][vis], rtol=1e-6)

    def test_render_images_have_structure(self):
        scene = synthetic.make_scene(num_points=40, num_lines=4, seed=2)
        cam_small = CameraConfig(image_width=160, image_height=120,
                                 fx=120.0, fy=120.0, cx=80.0, cy=60.0, bf=12.0)
        il, ir = synthetic.render_images(scene, cam_small, np.eye(4))
        assert il.shape == (120, 160)
        assert il.std() > 0.02  # not blank
        assert il.min() < 0.2 and il.max() > 0.8  # lines dark, blobs bright
