"""Golden-value tests for SE3/Plücker/camera math vs small numpy references."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspl_slam_tpu import camera as cam
from rspl_slam_tpu.config import CameraConfig
from rspl_slam_tpu.geometry import plucker, se3, triangulation


def rand_rot(rng):
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


class TestSE3:
    def test_exp_log_so3_roundtrip(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((16, 3))
        # log∘exp is identity only on the principal domain ‖w‖ < π
        w = w / np.linalg.norm(w, axis=1, keepdims=True) * rng.uniform(0.01, 3.0, (16, 1))
        w = jnp.asarray(w)
        R = se3.exp_so3(w)
        w2 = se3.log_so3(R)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-4)

    def test_exp_so3_small_angle(self):
        w = jnp.array([1e-9, -1e-9, 1e-10])
        R = se3.exp_so3(w)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)

    def test_exp_log_se3_roundtrip(self):
        rng = np.random.default_rng(1)
        xi = rng.standard_normal((8, 6))
        # keep the rotation part in the principal domain ‖ω‖ < π
        xi[:, :3] *= 0.9
        xi = jnp.asarray(xi)
        T = se3.exp_se3(xi)
        xi2 = se3.log_se3(T)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)

    def test_inverse_compose(self):
        rng = np.random.default_rng(2)
        T = se3.exp_se3(jnp.asarray(rng.standard_normal((5, 6))))
        I = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(
            np.asarray(I), np.tile(np.eye(4), (5, 1, 1)), atol=1e-5
        )

    def test_quat_roundtrip(self):
        rng = np.random.default_rng(3)
        Rs = jnp.asarray(np.stack([rand_rot(rng) for _ in range(32)]))
        q = se3.quat_from_rot(Rs)
        R2 = se3.rot_from_quat(q)
        np.testing.assert_allclose(np.asarray(Rs), np.asarray(R2), atol=1e-5)

    def test_rotation_angle(self):
        w = jnp.array([0.3, 0.0, 0.0])
        R = se3.exp_so3(w)
        assert abs(float(se3.rotation_angle(R)) - 0.3) < 1e-5

    def test_transform_points_batch(self):
        rng = np.random.default_rng(4)
        T = se3.exp_se3(jnp.asarray(rng.standard_normal(6)))
        p = jnp.asarray(rng.standard_normal((10, 3)))
        out = se3.transform_points(T, p)
        ref = (np.asarray(T)[:3, :3] @ np.asarray(p).T).T + np.asarray(T)[:3, 3]
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestCamera:
    cfg = CameraConfig()

    def test_project_backproject_roundtrip(self):
        rng = np.random.default_rng(5)
        p = jnp.asarray(rng.uniform(0.5, 5.0, (20, 3)) * np.array([0.3, 0.3, 1.0]))
        uv = cam.project(self.cfg, p)
        p2 = cam.back_project(self.cfg, uv, p[:, 2])
        np.testing.assert_allclose(np.asarray(p), np.asarray(p2), rtol=1e-5)

    def test_stereo_project_disparity(self):
        p = jnp.array([[0.5, 0.2, 2.0]])
        uvr = cam.stereo_project(self.cfg, p)
        disp = uvr[0, 0] - uvr[0, 2]
        depth = cam.disparity_to_depth(self.cfg, disp)
        assert abs(float(depth) - 2.0) < 1e-5

    def test_stereo_gate(self):
        # depth 2 m → valid; depth 100 m → disparity below min_x_diff → invalid
        for depth, expect in [(2.0, True), (100.0, False)]:
            p = jnp.array([[0.1, 0.1, depth]])
            uvr = cam.stereo_project(self.cfg, p)
            uvL = uvr[:, :2]
            uvR = jnp.stack([uvr[:, 2], uvr[:, 1]], -1)
            got = bool(cam.stereo_gate(self.cfg, uvL, uvR)[0])
            assert got == expect

    def test_remap_identity(self):
        rng = np.random.default_rng(6)
        img = jnp.asarray(rng.uniform(size=(32, 40)).astype(np.float32))
        x, y = np.meshgrid(np.arange(40, dtype=np.float32), np.arange(32, dtype=np.float32))
        maps = jnp.asarray(np.stack([x, y], -1))
        out = cam.remap_bilinear(img, maps)
        np.testing.assert_allclose(np.asarray(out)[:31, :39], np.asarray(img)[:31, :39], atol=1e-6)

    def test_rectify_maps_pinhole_no_distortion(self):
        # With D=0 and R=I and P==K, the map must be (near) identity.
        K = (435.2, 0, 367.4, 0, 435.2, 252.2, 0, 0, 1)
        P = (435.2, 0, 367.4, 0, 0, 435.2, 252.2, 0, 0, 0, 1, 0)
        cfg = CameraConfig(left_K=K, left_D=(0, 0, 0, 0, 0), left_R=(1, 0, 0, 0, 1, 0, 0, 0, 1), left_P=P)
        maps = cam.build_rectify_maps(cfg, "left")
        x, y = np.meshgrid(np.arange(cfg.image_width), np.arange(cfg.image_height))
        np.testing.assert_allclose(maps[..., 0], x, atol=1e-3)
        np.testing.assert_allclose(maps[..., 1], y, atol=1e-3)


class TestPlucker:
    def test_projection_contains_endpoint_projections(self):
        # The projected 2D line must pass through the pinhole projections of
        # any point on the 3D line.
        cfg = CameraConfig()
        rng = np.random.default_rng(7)
        p = jnp.asarray(rng.uniform(1, 3, 3))
        q = p + jnp.asarray(rng.standard_normal(3) * 0.5)
        L = plucker.from_endpoints(p, q)
        line2d = plucker.project_to_image(L, cfg.fx, cfg.fy, cfg.cx, cfg.cy)
        for pt in [p, q, 0.3 * p + 0.7 * q]:
            uv = cam.project(cfg, pt)
            d = plucker.point_line_dist_2d(line2d, uv)
            assert abs(float(d)) < 1e-3

    def test_transform_consistency(self):
        rng = np.random.default_rng(8)
        T = se3.exp_se3(jnp.asarray(rng.standard_normal(6)))
        p = jnp.asarray(rng.uniform(1, 3, 3))
        q = jnp.asarray(rng.uniform(1, 3, 3))
        L = plucker.from_endpoints(p, q)
        L2 = plucker.transform(T, L)
        Lref = plucker.from_endpoints(
            se3.transform_points(T, p), se3.transform_points(T, q)
        )
        np.testing.assert_allclose(np.asarray(L2), np.asarray(Lref), atol=1e-4)

    def test_orthonormal_roundtrip_and_update(self):
        p = jnp.array([1.0, 2.0, 3.0])
        q = jnp.array([2.0, 1.0, 4.0])
        L = plucker.from_endpoints(p, q)
        U, W = plucker.orthonormal_from_plucker(L)
        L2 = plucker.plucker_from_orthonormal(U, W)
        # orthonormal repr preserves the line up to scale
        np.testing.assert_allclose(
            np.asarray(L / jnp.linalg.norm(L)), np.asarray(L2 / jnp.linalg.norm(L2)), atol=1e-5
        )
        # zero update is identity
        L3 = plucker.orthonormal_update(L, jnp.zeros(4))
        np.testing.assert_allclose(
            np.asarray(L / jnp.linalg.norm(L)), np.asarray(L3 / jnp.linalg.norm(L3)), atol=1e-5
        )


class TestTriangulation:
    def test_point_multiview(self):
        cfg = CameraConfig()
        rng = np.random.default_rng(9)
        X = np.array([0.5, -0.3, 4.0])
        M = 6
        Twc = []
        uvn = []
        for i in range(M):
            t = np.array([i * 0.2, 0.0, 0.0])
            T = np.eye(4)
            T[:3, 3] = t
            Twc.append(T)
            Xc = X - t  # camera at t looking down +z, R=I
            uvn.append(Xc[:2] / Xc[2])
        pt, ok = triangulation.triangulate_point_multiview(
            jnp.asarray(np.stack(Twc)), jnp.asarray(np.stack(uvn)),
            jnp.ones(M, bool),
        )
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(pt), X, atol=1e-4)

    def test_point_multiview_degenerate(self):
        # Single-ray and parallel-ray setups must be rejected.
        T = jnp.asarray(np.tile(np.eye(4), (4, 1, 1)))
        uvn = jnp.asarray(np.tile(np.array([0.1, 0.1]), (4, 1)))
        _, ok = triangulation.triangulate_point_multiview(T, uvn, jnp.ones(4, bool))
        assert not bool(ok)

    def test_parallax_gate_forward_motion(self):
        """Explicit parallax gate (ADVICE r04): FORWARD-dominant motion —
        the regime the old raised eigenvalue-ratio gate thinned — must
        keep off-axis landmarks whose rays span ≥0.5°, and still reject
        near-on-axis points with essentially no parallax."""

        def rays_for(X, zs):
            Twc, uvn = [], []
            for z in zs:
                T = np.eye(4)
                T[2, 3] = z  # camera advancing along +z (forward motion)
                Twc.append(T)
                Xc = X - T[:3, 3]
                uvn.append(Xc[:2] / Xc[2])
            return jnp.asarray(np.stack(Twc)), jnp.asarray(np.stack(uvn))

        zs = [0.0, 0.7, 1.4, 2.0]  # 2 m advance
        # off-axis point: ~1.4° of parallax across the advance — accept
        X_side = np.array([1.0, 0.0, 10.0])
        T, uvn = rays_for(X_side, zs)
        pt, ok = triangulation.triangulate_point_multiview(
            T, uvn, jnp.ones(4, bool))
        assert bool(ok)
        # f32 at 10 m depth under ~1.4° parallax: mm-level, not µm-level
        np.testing.assert_allclose(np.asarray(pt), X_side, atol=1e-2)
        # near-axis point: ~0.02° of parallax — reject (depth unobservable)
        X_axis = np.array([0.005, 0.0, 10.0])
        T, uvn = rays_for(X_axis, zs)
        _, ok = triangulation.triangulate_point_multiview(
            T, uvn, jnp.ones(4, bool))
        assert not bool(ok)

    def test_line_fit_with_outliers(self):
        rng = np.random.default_rng(10)
        t = rng.uniform(-1, 1, 20)
        d = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
        c = np.array([0.0, 0.0, 2.0])
        pts = c + t[:, None] * d + rng.standard_normal((20, 3)) * 0.005
        pts[3] += 5.0  # gross outlier
        L, eps, ok = triangulation.fit_line3d_to_points(
            jnp.asarray(pts), jnp.ones(20, bool)
        )
        assert bool(ok)
        dfit = np.asarray(L[3:])
        dfit = dfit / np.linalg.norm(dfit)
        assert abs(abs(float(dfit @ d)) - 1.0) < 1e-3
        # endpoints near extreme inliers, not the outlier
        assert np.linalg.norm(np.asarray(eps), axis=1).max() < 4.0


class TestATE:
    def test_ate_zero_when_aligned(self):
        from rspl_slam_tpu.evaluation import absolute_trajectory_error

        rng = np.random.default_rng(11)
        t = np.linspace(0, 10, 50)
        p = np.cumsum(rng.standard_normal((50, 3)) * 0.1, 0)
        # apply arbitrary SE3 to estimate
        R = rand_rot(rng)
        est = (R @ p.T).T + np.array([5.0, -2.0, 1.0])
        res = absolute_trajectory_error(t, est, t, p)
        assert res["rmse"] < 1e-9
        assert res["n"] == 50

    def test_tum_io_roundtrip(self, tmp_path):
        from rspl_slam_tpu.datasets import read_tum_trajectory, write_tum_trajectory
        from rspl_slam_tpu.geometry import se3 as s

        rng = np.random.default_rng(12)
        poses = np.asarray(s.exp_se3(jnp.asarray(rng.standard_normal((7, 6)))))
        times = np.arange(7) * 0.05
        f = str(tmp_path / "traj.txt")
        write_tum_trajectory(f, times, poses)
        t2, p2 = read_tum_trajectory(f)
        np.testing.assert_allclose(t2, times, atol=1e-8)
        np.testing.assert_allclose(p2, poses, atol=1e-5)


class TestConfig:
    def test_defaults_match_reference_euroc(self):
        from rspl_slam_tpu.config import SystemConfig

        c = SystemConfig()
        assert c.superpoint.max_keypoints == 400
        assert c.keyframe.max_num_match == 80
        assert abs(c.camera.min_x_diff - c.camera.bf / 10.0) < 1e-9

    def test_load_reference_yaml_if_present(self):
        import os

        from rspl_slam_tpu.config import load_system_config

        algo = "/root/reference/configs/configs_euroc.yaml"
        camf = "/root/reference/configs/euroc.yaml"
        if not (os.path.exists(algo) and os.path.exists(camf)):
            pytest.skip("reference configs not present")
        c = load_system_config(algo, camf)
        assert c.superpoint.max_keypoints == 400
        assert c.superpoint.keypoint_threshold == 0.004
        assert c.keyframe.max_angle == 0.52
        assert abs(c.camera.fx - 435.2046959714599) < 1e-9
        assert abs(c.camera.bf - 47.90639384423901) < 1e-9
        assert c.optimization.tracking.stereo_point == 75


class TestAllReferenceConfigs:
    """All five reference algo YAMLs + their four camera calibration files
    parse through config.py with correct values (VERDICT r03 item 7), and
    the repo's own five combined configs mirror them."""

    REF = "/root/reference/configs"
    PAIRS = {
        # algo file → (camera file, kpts, W, H, fx, bf, chi2_stereo,
        #              distortion_type, depth_upper)
        "configs_euroc.yaml": ("euroc.yaml", 400, 752, 480,
                               435.2046959714599, 47.90639384423901, 75,
                               0, 10.0),
        "configs_oivio.yaml": ("oivio.yaml", 600, 1280, 720,
                               None, 32.3252131124, 75, 0, None),
        "configs_uma_bumblebee_indoor.yaml": (
            "uma_bumblebee.yaml", 500, 1024, 768, 437.0655449072,
            52.1485318013, 37, 1, 10.0),
        "configs_realsense.yaml": ("realsense_848_480.yaml", 500, 848, 480,
                                   420.1159362792969, 21.005796813964846,
                                   75, 0, 10.0),
        "configs_zed2i.yaml": ("zed2i.yaml", 300, 960, 540, 534.59, 25.2,
                               75, 0, 20.0),
    }

    @pytest.mark.skipif(not os.path.isdir("/root/reference/configs"),
                        reason="reference configs not mounted")
    def test_five_reference_algo_configs_parse(self):
        from rspl_slam_tpu.config import load_system_config

        for algo, (camf, kpts, W, H, fx, bf, chi2s, dist, dup) in \
                self.PAIRS.items():
            c = load_system_config(os.path.join(self.REF, algo),
                                   os.path.join(self.REF, camf))
            assert c.superpoint.max_keypoints == kpts, algo
            assert c.superglue.image_width == W, algo
            assert c.superglue.image_height == H, algo
            assert c.camera.image_width == W, algo
            assert c.camera.image_height == H, algo
            if fx is not None:
                assert abs(c.camera.fx - fx) < 1e-6, algo
            assert abs(c.camera.bf - bf) < 1e-6, algo
            assert c.optimization.tracking.stereo_point == chi2s, algo
            assert c.optimization.backend.stereo_point == chi2s, algo
            assert c.camera.distortion_type == dist, algo
            if dup is not None:
                assert abs(c.camera.depth_upper_thr - dup) < 1e-9, algo

    def test_repo_combined_configs(self):
        from rspl_slam_tpu.config import load_system_config

        root = os.path.join(os.path.dirname(__file__), "..", "configs")
        expect = {
            "euroc.yaml": (400, 752, 480, 47.90639384423901),
            "oivio.yaml": (600, 1280, 720, 32.3252131124),
            "uma_bumblebee_indoor.yaml": (500, 1024, 768, 52.1485318013),
            "realsense.yaml": (500, 848, 480, 21.005796813964846),
            "zed2i.yaml": (300, 960, 540, 25.2),
        }
        for name, (kpts, W, H, bf) in expect.items():
            p = os.path.join(root, name)
            assert os.path.exists(p), name
            c = load_system_config(p, p)
            assert c.superpoint.max_keypoints == kpts, name
            assert c.camera.image_width == W, name
            assert c.camera.image_height == H, name
            assert abs(c.camera.bf - bf) < 1e-6, name
