"""Loop closure: place recognition, geometric verification, and the
pose-graph integration that makes --pose-graph an actual drift corrector
(the reference has no loop closure at all — SURVEY §5)."""

import numpy as np
import pytest

from rspl_slam_tpu.backend import loop_closure as lc
from rspl_slam_tpu.backend import map_store
from rspl_slam_tpu.config import PipelineConfig


def _rot(axis, ang):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K


class TestRansacRigidAlign:
    def test_recovers_pose_with_outliers(self):
        rng = np.random.default_rng(3)
        R = _rot([0.2, 1.0, -0.3], 0.4)
        t = np.array([0.5, -0.2, 1.1])
        src = rng.uniform(-2, 2, (120, 3))
        dst = src @ R.T + t + rng.standard_normal((120, 3)) * 0.005
        # 30% gross outliers
        out = rng.choice(120, 36, replace=False)
        dst[out] += rng.uniform(0.5, 3.0, (36, 3))
        T, mask = lc.ransac_rigid_align(src, dst, inlier_dist=0.05,
                                        min_inliers=20, seed=1)
        assert T is not None
        np.testing.assert_allclose(T[:3, :3], R, atol=5e-3)
        np.testing.assert_allclose(T[:3, 3], t, atol=2e-2)
        # outliers rejected
        assert not mask[out].any()

    def test_rejects_insufficient_support(self):
        rng = np.random.default_rng(0)
        src = rng.uniform(-1, 1, (30, 3))
        dst = rng.uniform(-1, 1, (30, 3))  # unrelated
        T, mask = lc.ransac_rigid_align(src, dst, inlier_dist=0.02,
                                        min_inliers=15, seed=0)
        assert T is None


class TestMatching:
    def test_mutual_nn(self):
        rng = np.random.default_rng(1)
        d = rng.standard_normal((50, 64)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        perm = rng.permutation(50)
        db = d[perm]
        va = np.ones(50, bool)
        m = lc.mutual_nn_matches(d, va, db, va)
        assert (m >= 0).all()
        np.testing.assert_array_equal(perm[m], np.arange(50))

    def test_global_descriptor_similarity(self):
        rng = np.random.default_rng(2)
        d = rng.standard_normal((200, 128)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        v1 = np.zeros(200, bool)
        v1[:120] = True
        v2 = np.zeros(200, bool)
        v2[40:160] = True  # 80 shared descriptors
        g1 = lc.global_descriptor(d, v1)
        g2 = lc.global_descriptor(d, v2)
        other = rng.standard_normal((200, 128)).astype(np.float32)
        other /= np.linalg.norm(other, axis=1, keepdims=True)
        g3 = lc.global_descriptor(other, v1)
        assert g1 @ g2 > 0.5
        assert abs(g1 @ g3) < 0.3


def _make_loop_map(noise_px=0.1, gap=5, drift=None, seed=0):
    """A map with KF 0 and KF gap+1 observing the same synthetic cloud from
    two poses, separated by ``gap`` dummy keyframes of unrelated content.
    Returns (map, detector, Twc_c, Twc_q_true)."""
    rng = np.random.default_rng(seed)
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    bf = 40.0
    K = 256
    m = map_store.MapStore(K, 8, PipelineConfig())
    m.set_intrinsics(fx, fy, cx, cy)

    pts = rng.uniform([-3, -2, 3], [3, 2, 9], (200, 3))
    desc = rng.standard_normal((200, 256)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)

    Twc_c = np.eye(4)
    Twc_q = np.eye(4)
    Twc_q[:3, :3] = _rot([0, 1, 0], 0.08)
    Twc_q[:3, 3] = [0.3, -0.1, 0.2]

    def observe(Twc):
        Tcw = np.linalg.inv(Twc)
        Xc = pts @ Tcw[:3, :3].T + Tcw[:3, 3]
        u = fx * Xc[:, 0] / Xc[:, 2] + cx
        v = fy * Xc[:, 1] / Xc[:, 2] + cy
        ur = u - bf / Xc[:, 2]
        vis = (Xc[:, 2] > 0.5) & (u > 5) & (u < 635) & (v > 5) & (v < 475)
        idx = np.nonzero(vis)[0][:K]
        meas = np.zeros((K, 3), np.float32)
        dd = np.zeros((K, 256), np.float32)
        val = np.zeros(K, bool)
        n = len(idx)
        meas[:n, 0] = u[idx] + rng.standard_normal(n) * noise_px
        meas[:n, 1] = v[idx] + rng.standard_normal(n) * noise_px
        meas[:n, 2] = ur[idx] + rng.standard_normal(n) * noise_px
        dd[:n] = desc[idx]
        val[:n] = True
        return meas, val, dd

    def add(Twc, meas, val, dd, fid):
        m.add_keyframe(fid, float(fid), Twc, meas, val, dd,
                       np.ones(K, np.float32) * 0.9)

    meas, val, dd = observe(Twc_c)
    add(Twc_c, meas, val, dd, 0)
    # dummy in-between keyframes: unrelated content far away
    for g in range(gap):
        od = rng.standard_normal((K, 256)).astype(np.float32)
        od /= np.linalg.norm(od, axis=1, keepdims=True)
        dm = np.zeros((K, 3), np.float32)
        dm[:, 0] = rng.uniform(10, 630, K)
        dm[:, 1] = rng.uniform(10, 470, K)
        dm[:, 2] = dm[:, 0] - 5.0
        T = np.eye(4)
        T[:3, 3] = [10.0 + g, 0, 0]
        add(T, dm, np.ones(K, bool), od, g + 1)
    meas, val, dd = observe(Twc_q)
    # the STORED pose of the query may be drifted — detection must measure
    # the TRUE relative pose from the observations, not read the estimate
    stored_q = Twc_q if drift is None else drift @ Twc_q
    add(stored_q, meas, val, dd, gap + 1)
    det = lc.LoopDetector(bf=bf, min_gap=gap - 1, sim_thr=0.5,
                          min_inliers=15, inlier_dist=0.1)
    return m, det, Twc_c, Twc_q


class TestLoopDetector:
    def test_detects_revisit_and_measures_true_relative(self):
        drift = np.eye(4)
        drift[:3, :3] = _rot([0, 1, 0], 0.05)
        drift[:3, 3] = [0.4, 0.1, -0.2]
        m, det, Twc_c, Twc_q = _make_loop_map(drift=drift)
        out = det.detect(m, m.n_kf - 1)
        assert out is not None
        assert out.i == 0 and out.j == m.n_kf - 1
        # Z must equal the TRUE Tcw_c · Twc_q despite the drifted estimate
        Z_true = np.linalg.inv(Twc_c) @ Twc_q
        np.testing.assert_allclose(out.Z[:3, :3], Z_true[:3, :3], atol=5e-3)
        np.testing.assert_allclose(out.Z[:3, 3], Z_true[:3, 3], atol=3e-2)
        assert out.n_inliers >= 15

    def test_no_detection_on_unrelated_views(self):
        m, det, _, _ = _make_loop_map()
        # query a dummy keyframe — its content matches nothing
        out = det.detect(m, m.n_kf - 2)
        assert out is None

    def test_covisible_candidates_excluded(self):
        m, det, _, _ = _make_loop_map()
        q = m.n_kf - 1
        m.covis[q, 0] = m.covis[0, q] = 20  # pretend local window
        assert det.detect(m, q) is None


class TestSlamPoseGraphIntegration:
    def _run_slam(self):
        from tests.test_slam import run_sequence

        return run_sequence(n_frames=60, enable_ba=False)

    def test_pose_graph_gated_without_loops(self):
        slam, _ = self._run_slam()
        assert slam.run_pose_graph() is None  # documented no-op guard

    def test_loop_constraint_corrects_injected_drift(self):
        from rspl_slam_tpu.backend.loop_closure import LoopConstraint

        slam, traj = self._run_slam()
        m = slam.map
        n = m.n_kf
        if n < 5:
            pytest.skip("too few keyframes")
        gt_pose = m.kf_pose[:n].copy()
        # measured loop between first and last keyframe, from TRUE poses
        Z = np.linalg.inv(gt_pose[0]) @ gt_pose[n - 1]
        # inject growing drift into the stored estimates (posterior to the
        # measurement, like accumulated odometry error)
        drifted = gt_pose.copy()
        for k in range(n):
            d = np.eye(4)
            d[:3, :3] = _rot([0, 1, 0], 0.004 * k)
            d[:3, 3] = [0.02 * k, 0.01 * k, -0.015 * k]
            drifted[k] = d @ gt_pose[k]
        m.apply_pose_corrections(drifted[:n])
        err_before = np.linalg.norm(
            m.kf_pose[n - 1][:3, 3] - gt_pose[n - 1][:3, 3])
        slam.loop_constraints.append(LoopConstraint(
            i=0, j=n - 1, Z=Z, weight=50.0, n_inliers=50, similarity=0.95))
        cost = slam.run_pose_graph(min_weight=10, iters=25)
        assert cost is not None
        err_after = np.linalg.norm(
            m.kf_pose[n - 1][:3, 3] - gt_pose[n - 1][:3, 3])
        assert err_after < 0.5 * err_before, (err_before, err_after)


class TestAdversarialLoopRejection:
    """Visually similar but geometrically distinct places must NOT close a
    loop (VERDICT r03 item 9): a false accept fires a map-wide pose-graph
    correction, so precision is load-bearing. Both attacks below pass the
    place-recognition similarity gate and the descriptor-matching gate by
    construction — rejection must come from the 3D-3D RANSAC."""

    def _twin_place_map(self, transform_pts, seed=0):
        """KF 0 and KF gap+1 see the SAME 200 descriptors (visually
        identical places) but geometry transformed by ``transform_pts``."""
        rng = np.random.default_rng(seed)
        fx = fy = 400.0
        cx, cy = 320.0, 240.0
        bf = 40.0
        K = 256
        gap = 5
        m = map_store.MapStore(K, 8, PipelineConfig())
        m.set_intrinsics(fx, fy, cx, cy)
        pts = rng.uniform([-3, -2, 3], [3, 2, 9], (200, 3))
        desc = rng.standard_normal((200, 256)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)

        def observe(Twc, cloud):
            Tcw = np.linalg.inv(Twc)
            Xc = cloud @ Tcw[:3, :3].T + Tcw[:3, 3]
            u = fx * Xc[:, 0] / Xc[:, 2] + cx
            v = fy * Xc[:, 1] / Xc[:, 2] + cy
            ur = u - bf / Xc[:, 2]
            vis = (Xc[:, 2] > 0.5) & (u > 5) & (u < 635) & (v > 5) & (v < 475)
            idx = np.nonzero(vis)[0][:K]
            meas = np.zeros((K, 3), np.float32)
            dd = np.zeros((K, 256), np.float32)
            val = np.zeros(K, bool)
            n = len(idx)
            meas[:n, 0] = u[idx]
            meas[:n, 1] = v[idx]
            meas[:n, 2] = ur[idx]
            dd[:n] = desc[idx]
            val[:n] = True
            return meas, val, dd

        meas, val, dd = observe(np.eye(4), pts)
        m.add_keyframe(0, 0.0, np.eye(4), meas, val, dd,
                       np.ones(K, np.float32) * 0.9)
        for g in range(gap):
            od = rng.standard_normal((K, 256)).astype(np.float32)
            od /= np.linalg.norm(od, axis=1, keepdims=True)
            dm = np.zeros((K, 3), np.float32)
            dm[:, 0] = rng.uniform(10, 630, K)
            dm[:, 1] = rng.uniform(10, 470, K)
            dm[:, 2] = dm[:, 0] - 5.0
            T = np.eye(4)
            T[:3, 3] = [10.0 + g, 0, 0]
            m.add_keyframe(g + 1, float(g + 1), T, dm, np.ones(K, bool), od,
                           np.ones(K, np.float32) * 0.9)
        # the geometrically-distinct twin, same descriptors per index
        meas, val, dd = observe(np.eye(4), transform_pts(pts, rng))
        m.add_keyframe(gap + 1, float(gap + 1), np.eye(4), meas, val, dd,
                       np.ones(K, np.float32) * 0.9)
        det = lc.LoopDetector(bf=bf, min_gap=gap - 1, sim_thr=0.5,
                              min_inliers=15, inlier_dist=0.1)
        return m, det, gap + 1

    def _assert_rejected_and_untouched(self, m, det, q):
        snap_pose = m.kf_pose.copy()
        snap_meas = m.kf_meas.copy()
        out = det.detect(m, q)
        assert out is None
        np.testing.assert_array_equal(m.kf_pose, snap_pose)
        np.testing.assert_array_equal(m.kf_meas, snap_meas)

    def test_scrambled_geometry_rejected(self):
        """Same 'appearance', independently scrambled 3D layout: no rigid
        transform maps one point set onto the other."""
        m, det, q = self._twin_place_map(
            lambda pts, rng: rng.permutation(pts, axis=0))
        self._assert_rejected_and_untouched(m, det, q)

    def test_scaled_replica_rejected(self):
        """A 2x-scaled replica of the place (the classic monocular
        ambiguity): stereo depth makes the scale observable, so the 3D-3D
        alignment cannot reach the inlier quorum."""
        m, det, q = self._twin_place_map(
            lambda pts, rng: pts * 2.0 + np.array([0, 0, 3.0]))
        self._assert_rejected_and_untouched(m, det, q)

    def test_true_revisit_still_accepted(self):
        """Control: the identity 'transform' (a genuine revisit) passes the
        same gates the adversarial twins fail."""
        m, det, q = self._twin_place_map(lambda pts, rng: pts)
        out = det.detect(m, q)
        assert out is not None
        np.testing.assert_allclose(out.Z, np.eye(4), atol=1e-3)
