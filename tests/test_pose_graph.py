"""Global pose-graph optimization tests (backend/pose_graph.py) — a global
backend the reference entirely lacks (its consistency ends at the ~9-KF
covisibility window, map.cc:471-525)."""

import numpy as np
import jax.numpy as jnp

from rspl_slam_tpu.backend import pose_graph as pg
from rspl_slam_tpu.geometry import se3


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _gt_circle(F, radius=5.0):
    """Ground-truth Twc poses on a circular arc."""
    poses = []
    for f in range(F):
        a = 2 * np.pi * f / F * 0.5
        T = np.eye(4)
        T[:3, :3] = _rot_z(a)
        T[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0]
        poses.append(T)
    return np.stack(poses)


def _drifted(gt_Twc, seed=0, rot_noise=0.02, t_noise=0.05):
    """Initial estimate with ACCUMULATING odometric drift."""
    rng = np.random.default_rng(seed)
    F = len(gt_Twc)
    est = [gt_Twc[0]]
    for f in range(1, F):
        rel = np.linalg.inv(gt_Twc[f - 1]) @ gt_Twc[f]
        pert = np.eye(4)
        pert[:3, :3] = _rot_z(rng.normal(0, rot_noise))
        pert[:3, 3] = rng.normal(0, t_noise, 3)
        est.append(est[-1] @ rel @ pert)
    return np.stack(est)


def _problem_from(gt_Twc, est_Twc, loop_pairs):
    F = len(gt_Twc)
    pairs = [(f, f + 1) for f in range(F - 1)] + list(loop_pairs)
    C = len(pairs)
    c_i = np.array([p[0] for p in pairs], np.int32)
    c_j = np.array([p[1] for p in pairs], np.int32)
    c_Z = np.stack([np.linalg.inv(gt_Twc[a]) @ gt_Twc[b] for a, b in pairs])
    # Z is expressed as Tcw_i·Twc_j = (Twc_i)⁻¹·Twc_j — matches builder
    return pg.PoseGraphProblem(
        Tcw=jnp.asarray(np.linalg.inv(est_Twc)),
        fixed=jnp.asarray(np.arange(F) == 0),
        c_i=jnp.asarray(c_i), c_j=jnp.asarray(c_j), c_Z=jnp.asarray(c_Z),
        c_w=jnp.ones(C), c_valid=jnp.ones(C, bool),
    )


def _pose_err(Twc_a, Twc_b):
    return max(
        float(np.linalg.norm(a[:3, 3] - b[:3, 3]))
        for a, b in zip(Twc_a, Twc_b)
    )


class TestPoseGraphLM:
    def test_drift_corrected_with_loop_constraint(self):
        F = 12
        gt = _gt_circle(F)
        est = _drifted(gt, seed=1)
        err0 = _pose_err(est, gt)
        assert err0 > 0.05  # drift is real
        prob = _problem_from(gt, est, loop_pairs=[(0, F - 1), (0, F // 2)])
        res = pg.optimize_pose_graph(prob, iters=25)
        opt_Twc = np.linalg.inv(np.asarray(res.Tcw))
        err1 = _pose_err(opt_Twc, gt)
        assert err1 < 0.01, (err0, err1)
        assert float(res.cost) < 1e-6

    def test_fixed_anchor_untouched(self):
        F = 8
        gt = _gt_circle(F)
        est = _drifted(gt, seed=2)
        prob = _problem_from(gt, est, loop_pairs=[(0, F - 1)])
        res = pg.optimize_pose_graph(prob, iters=15)
        np.testing.assert_allclose(
            np.asarray(res.Tcw[0]), np.linalg.inv(est[0]), atol=1e-12
        )

    def test_consistent_graph_is_fixed_point(self):
        """Constraints built from the current estimates → zero-cost no-op."""
        F = 6
        gt = _gt_circle(F)
        prob = _problem_from(gt, gt, loop_pairs=[(0, F - 1)])
        res = pg.optimize_pose_graph(prob, iters=5)
        opt_Twc = np.linalg.inv(np.asarray(res.Tcw))
        assert _pose_err(opt_Twc, gt) < 1e-5  # f32 solver precision


class TestMapIntegration:
    def _build_slam(self, n=40):
        from rspl_slam_tpu.config import SuperPointConfig, SystemConfig
        from rspl_slam_tpu.evaluation import synthetic
        from rspl_slam_tpu.frontend.frontends import OracleFrontend
        from rspl_slam_tpu.slam import SLAMSystem

        cfg = SystemConfig(superpoint=SuperPointConfig(max_keypoints=256),
                           use_lines=True)
        scene = synthetic.make_scene(num_points=800, num_lines=8, seed=5)
        traj = synthetic.make_trajectory(n, step=0.05, yaw_rate=0.004)
        fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=5)
        fe.poses = traj
        slam = SLAMSystem(cfg, fe)
        for i in range(n):
            slam.add_frame(i, i * 0.05, None, None)
        return slam

    def test_apply_pose_corrections_preserves_reprojection(self):
        """A rigid per-keyframe correction must carry landmarks along: the
        reprojection of each mappoint into its anchor keyframe is invariant."""
        slam = self._build_slam()
        m = slam.map
        assert m.n_kf >= 3 and m.n_pt > 100

        def anchor_residual():
            errs = []
            for pt in range(m.n_pt):
                if m.pt_status[pt] != 2 or m.pt_obs_n[pt] == 0:
                    continue
                kf = m.pt_obs_kf[pt, 0]
                kpt = m.pt_obs_kpt[pt, 0]
                Tcw = np.linalg.inv(m.kf_pose[kf])
                Xc = Tcw[:3, :3] @ m.pt_pos[pt] + Tcw[:3, 3]
                if Xc[2] < 0.1:
                    continue
                u = m._fx * Xc[0] / Xc[2] + m._cx
                v = m._fy * Xc[1] / Xc[2] + m._cy
                uv = m.kf_meas[kf, kpt, :2]
                errs.append(np.hypot(u - uv[0], v - uv[1]))
            return np.asarray(errs)

        before = anchor_residual()
        # apply an arbitrary smooth warp of the keyframe poses
        new_Twc = m.kf_pose.copy()
        for k in range(m.n_kf):
            d = np.eye(4)
            d[:3, :3] = _rot_z(0.01 * k)
            d[:3, 3] = [0.05 * k, -0.02 * k, 0.03]
            new_Twc[k] = d @ m.kf_pose[k]
        m.apply_pose_corrections(new_Twc)
        after = anchor_residual()
        np.testing.assert_allclose(after, before, atol=1e-6)

    def test_run_pose_graph_near_noop_on_consistent_map(self):
        """On a drift-free map the PGO is a fixed point: trajectory moves
        negligibly and the line landmarks keep valid Plücker geometry."""
        slam = self._build_slam()
        # settle any in-flight async BA first: this test compares the PGO
        # fixed point, not the pending window scatter run_pose_graph
        # flushes on entry
        slam.flush_ba()
        poses_before = slam.map.kf_pose[: slam.map.n_kf].copy()
        cost = slam.run_pose_graph(min_weight=10, iters=10,
                                   require_loops=False)
        assert cost is not None and cost < 1e-4  # f32, weighted
        poses_after = slam.map.kf_pose[: slam.map.n_kf]
        assert _pose_err(poses_after, poses_before) < 1e-4
        # Plücker invariant n ⊥ d still holds for valid lines
        m = slam.map
        for ln in range(m.n_ln):
            if not m.ln_valid[ln]:
                continue
            nvec, dvec = m.ln_plucker[ln, :3], m.ln_plucker[ln, 3:]
            if np.linalg.norm(dvec) < 1e-9:
                continue
            assert abs(np.dot(nvec, dvec)) < 1e-6 * max(
                1.0, np.linalg.norm(nvec)
            )
