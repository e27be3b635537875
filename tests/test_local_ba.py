"""Local BA tests: synthetic multi-view windows with known ground truth."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspl_slam_tpu.backend import local_ba
from rspl_slam_tpu.backend.residuals import CameraIntrinsics
from rspl_slam_tpu.config import CameraConfig
from rspl_slam_tpu.geometry import plucker, se3

CAM = CameraConfig()
K = CameraIntrinsics(CAM.fx, CAM.fy, CAM.cx, CAM.cy, CAM.bf)
F, P, L, CP, CL = 5, 64, 8, 320, 40


def build_problem(seed=0, noise_px=0.0, perturb=True, with_lines=True,
                  outlier_frac=0.0):
    """GT scene: F cameras along x, P points, L lines; all points observed
    by all cameras (stereo); lines observed mono+stereo."""
    rng = np.random.default_rng(seed)
    pts_gt = rng.uniform([-3, -2, 3], [3, 2, 9], (P, 3))
    line_p = rng.uniform([-2, -1.5, 4], [2, 1.5, 8], (L, 3))
    line_d = rng.standard_normal((L, 3))
    line_d /= np.linalg.norm(line_d, axis=1, keepdims=True)
    line_q = line_p + line_d * rng.uniform(1, 2, (L, 1))

    Tcw_gt = []
    for i in range(F):
        Twc = np.eye(4)
        Twc[:3, 3] = [i * 0.25, 0.02 * i, 0.05 * i]
        Tcw_gt.append(np.linalg.inv(Twc))
    Tcw_gt = np.stack(Tcw_gt)

    # point constraints: each point seen from every frame
    p_pose, p_point, p_meas, p_stereo = [], [], [], []
    for f in range(F):
        for p in range(P):
            Xc = Tcw_gt[f, :3, :3] @ pts_gt[p] + Tcw_gt[f, :3, 3]
            u = K.fx * Xc[0] / Xc[2] + K.cx
            v = K.fy * Xc[1] / Xc[2] + K.cy
            ur = u - K.bf / Xc[2]
            p_pose.append(f)
            p_point.append(p)
            p_meas.append([u, v, ur])
            p_stereo.append(p % 2 == 0)
    p_meas = np.asarray(p_meas) + rng.standard_normal((len(p_meas), 3)) * noise_px
    if outlier_frac > 0:
        n_out = int(len(p_meas) * outlier_frac)
        bad = rng.choice(len(p_meas), n_out, replace=False)
        p_meas[bad, :2] += rng.uniform(40, 90, (n_out, 2)) * np.sign(
            rng.standard_normal((n_out, 2)))
    else:
        bad = np.array([], int)

    # line constraints: endpoints projected per frame
    l_pose, l_line, l_eps, l_eps_r, l_stereo = [], [], [], [], []
    for f in range(F):
        for li in range(L):
            eps = []
            eps_r = []
            for Pt in (line_p[li], line_q[li]):
                Xc = Tcw_gt[f, :3, :3] @ Pt + Tcw_gt[f, :3, 3]
                u = K.fx * Xc[0] / Xc[2] + K.cx
                v = K.fy * Xc[1] / Xc[2] + K.cy
                eps.append([u, v])
                eps_r.append([u - K.bf / Xc[2], v])
            l_pose.append(f)
            l_line.append(li)
            l_eps.append(eps)
            l_eps_r.append(eps_r)
            l_stereo.append(li % 2 == 0)

    # pad to capacities
    def pad(a, n, shape):
        out = np.zeros((n, *shape), a.dtype if hasattr(a, "dtype") else np.float64)
        a = np.asarray(a)
        out[: len(a)] = a
        return out

    ncp = len(p_pose)
    ncl = len(l_pose)
    pts0 = pts_gt + (rng.standard_normal((P, 3)) * 0.05 if perturb else 0)
    lines_gt = np.stack([
        np.asarray(plucker.from_endpoints(jnp.asarray(p), jnp.asarray(q)))
        for p, q in zip(line_p, line_q)
    ])
    if perturb:
        lines0 = np.stack([
            np.asarray(plucker.orthonormal_update(
                jnp.asarray(lines_gt[i]),
                jnp.asarray(rng.standard_normal(4) * 0.01),
            ))
            for i in range(L)
        ])
    else:
        lines0 = lines_gt

    Tcw0 = Tcw_gt.copy()
    if perturb:
        for f in range(1, F):  # frame 0 fixed
            xi = np.concatenate([
                rng.standard_normal(3) * 0.01, rng.standard_normal(3) * 0.03
            ])
            Tcw0[f] = np.asarray(se3.exp_se3(jnp.asarray(xi))) @ Tcw0[f]

    prob = local_ba.BAProblem(
        Tcw=jnp.asarray(Tcw0),
        pose_fixed=jnp.asarray(np.arange(F) == 0),
        points=jnp.asarray(pts0),
        lines=jnp.asarray(lines0 if with_lines else np.tile([0, 0, 1.0, 1, 0, 0], (L, 1))),
        p_pose=jnp.asarray(pad(p_pose, CP, ()), jnp.int32),
        p_point=jnp.asarray(pad(p_point, CP, ()), jnp.int32),
        p_meas=jnp.asarray(pad(p_meas, CP, (3,))),
        p_stereo=jnp.asarray(pad(p_stereo, CP, ()).astype(bool)),
        p_valid=jnp.asarray(np.arange(CP) < ncp),
        l_pose=jnp.asarray(pad(l_pose, CL, ()), jnp.int32),
        l_line=jnp.asarray(pad(l_line, CL, ()), jnp.int32),
        l_eps=jnp.asarray(pad(np.asarray(l_eps), CL, (2, 2))),
        l_eps_r=jnp.asarray(pad(np.asarray(l_eps_r), CL, (2, 2))),
        l_stereo=jnp.asarray(pad(l_stereo, CL, ()).astype(bool)),
        l_valid=jnp.asarray((np.arange(CL) < ncl) & np.full(CL, with_lines)),
    )
    return prob, Tcw_gt, pts_gt, lines_gt, bad


class TestLocalBA:
    def test_clean_convergence(self):
        prob, Tcw_gt, pts_gt, lines_gt, _ = build_problem(0, noise_px=0.0)
        out = local_ba.optimize_local_map(K, prob)
        pose_err = np.linalg.norm(
            np.asarray(out.Tcw)[:, :3, 3] - Tcw_gt[:, :3, 3], axis=1
        )
        assert pose_err.max() < 1e-3, pose_err
        pt_err = np.linalg.norm(np.asarray(out.points) - pts_gt, axis=1)
        assert np.median(pt_err) < 1e-3
        # lines converge to GT up to Plücker scale
        for i in range(L):
            a = np.asarray(plucker.normalize(out.lines[i]))
            b = np.asarray(plucker.normalize(jnp.asarray(lines_gt[i])))
            d = min(np.abs(a - b).max(), np.abs(a + b).max())
            assert d < 5e-3, (i, d)

    def test_noisy_with_outliers_gating(self):
        prob, Tcw_gt, pts_gt, _, bad = build_problem(
            1, noise_px=0.3, outlier_frac=0.1
        )
        out = local_ba.optimize_local_map(K, prob)
        pose_err = np.linalg.norm(
            np.asarray(out.Tcw)[:, :3, 3] - Tcw_gt[:, :3, 3], axis=1
        )
        assert pose_err.max() < 0.01
        # outlier constraints flagged
        inl = np.asarray(out.p_inlier)
        assert inl[bad].sum() <= 2
        valid_count = int(np.asarray(prob.p_valid).sum())
        assert inl.sum() > valid_count - len(bad) - 10

    def test_fixed_pose_untouched(self):
        prob, Tcw_gt, *_ = build_problem(2, noise_px=0.2)
        out = local_ba.optimize_local_map(K, prob)
        np.testing.assert_allclose(
            np.asarray(out.Tcw)[0], np.asarray(prob.Tcw)[0], atol=1e-9
        )

    def test_points_only_window(self):
        prob, Tcw_gt, pts_gt, _, _ = build_problem(3, with_lines=False)
        prob = prob._replace(l_valid=jnp.zeros(CL, bool))
        out = local_ba.optimize_local_map(K, prob)
        pose_err = np.linalg.norm(
            np.asarray(out.Tcw)[:, :3, 3] - Tcw_gt[:, :3, 3], axis=1
        )
        assert pose_err.max() < 1e-3


class TestF32DivergenceGuards:
    """Regression: a real BA window captured from the measured production
    loop (three keyframes, a landmark ~6 cm in front of a camera) drove
    the f32 solver into NaN — a divergent step flung landmarks to huge
    positions whose masked cost still looked acceptable, and the next
    normal-equation build overflowed (r04). The solver now clamps steps,
    refuses non-finite candidates, ceilings chi², and prices cheirality
    violations at the chi² gate. tests/fixtures/ba_divergence_case.npz is
    the exact failing problem."""

    FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                       "ba_divergence_case.npz")

    def test_captured_window_stays_finite_and_converges(self):
        d = dict(np.load(self.FIX))
        prob = local_ba.BAProblem(**d)
        out = local_ba.fetch_result(local_ba.optimize_local_map(K, prob))
        assert np.isfinite(out.Tcw).all()
        assert np.isfinite(out.points).all()
        assert np.isfinite(float(out.cost))
        # converges with a healthy inlier set (703 valid constraints)
        assert float(out.cost) < 2000.0, float(out.cost)
        assert int(out.p_inlier.sum()) > 600

    def test_degenerate_collapse_not_accepted(self):
        """A candidate that throws every point behind the camera must not
        be scored better than a sane state: the cheirality pricing keeps
        the masked-cost collapse attractor expensive."""
        import jax.numpy as jnp

        # near-converged state: the collapse must be expensive relative to
        # any reasonable fit (N·chi2_gate ≫ noise-level cost)
        prob, Tcw_gt, pts_gt, lines_gt, bad = build_problem(
            seed=2, noise_px=0.3, perturb=False
        )
        deltas = (jnp.sqrt(50.0), jnp.sqrt(75.0), jnp.sqrt(50.0),
                  jnp.sqrt(75.0))
        p = local_ba.BAProblem(
            **{f: jnp.asarray(getattr(prob, f)) for f in prob._fields})
        sane, *_ = local_ba._total_cost(
            K, p.Tcw, p.points, p.lines, p, p.p_valid, p.l_valid, deltas,
            True)
        # flip the whole map behind the cameras
        collapsed, *_ = local_ba._total_cost(
            K, p.Tcw, p.points - jnp.asarray([0.0, 0.0, 100.0]), p.lines,
            p, p.p_valid, p.l_valid, deltas, True)
        assert float(collapsed) > float(sane), (collapsed, sane)
