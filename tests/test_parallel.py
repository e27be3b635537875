"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspl_slam_tpu.parallel import dist_ba, mesh as meshlib


def test_mesh_axes():
    m = meshlib.make_mesh(n_data=8)
    assert m.shape["data"] == 8
    assert m.shape["model"] == 1


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_ba_matches_single_device():
    """The psum-reduced distributed BA must produce the same solution as a
    1-device mesh run (bitwise-identical assembly up to reduction order)."""
    import __graft_entry__  # reuse its problem builder indirectly

    from rspl_slam_tpu.backend.local_ba import BAProblem
    from rspl_slam_tpu.backend.residuals import CameraIntrinsics
    from rspl_slam_tpu.config import CameraConfig

    cam = CameraConfig()
    K = CameraIntrinsics(cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    rng = np.random.default_rng(1)
    F, P = 4, 64
    pts = rng.uniform([-3, -2, 3], [3, 2, 9], (P, 3))
    Tcw = np.tile(np.eye(4), (F, 1, 1))
    for f in range(F):
        Tcw[f, 0, 3] = -0.2 * f
    Cp = F * P
    p_pose = np.repeat(np.arange(F), P).astype(np.int32)
    p_point = np.tile(np.arange(P), F).astype(np.int32)
    meas = np.zeros((Cp, 3))
    for c in range(Cp):
        Xc = Tcw[p_pose[c], :3, :3] @ pts[p_point[c]] + Tcw[p_pose[c], :3, 3]
        u = K.fx * Xc[0] / Xc[2] + K.cx
        v = K.fy * Xc[1] / Xc[2] + K.cy
        meas[c] = [u, v, u - K.bf / Xc[2]]
    prob = BAProblem(
        Tcw=jnp.asarray(Tcw), pose_fixed=jnp.asarray(np.arange(F) == 0),
        points=jnp.asarray(pts + rng.standard_normal((P, 3)) * 0.03),
        lines=jnp.tile(jnp.asarray([0.0, 0, 1, 1, 0, 0]), (4, 1)),
        p_pose=jnp.asarray(p_pose), p_point=jnp.asarray(p_point),
        p_meas=jnp.asarray(meas), p_stereo=jnp.ones(Cp, bool),
        p_valid=jnp.ones(Cp, bool),
        l_pose=jnp.zeros(4, jnp.int32), l_line=jnp.zeros(4, jnp.int32),
        l_eps=jnp.zeros((4, 2, 2)), l_eps_r=jnp.zeros((4, 2, 2)),
        l_stereo=jnp.zeros(4, bool), l_valid=jnp.zeros(4, bool),
    )
    m8 = meshlib.make_mesh(n_data=8)
    m1 = meshlib.make_mesh(n_data=1)
    out8 = dist_ba.sharded_constraints_ba(K, prob, m8, iters=3)
    out1 = dist_ba.sharded_constraints_ba(K, prob, m1, iters=3)
    np.testing.assert_allclose(
        np.asarray(out8.points), np.asarray(out1.points), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out8.Tcw), np.asarray(out1.Tcw), atol=1e-5
    )
    # and both recover ground truth
    assert np.abs(np.asarray(out8.points) - pts).max() < 1e-2


def test_batched_windows_sharded():
    from rspl_slam_tpu.backend.local_ba import BAProblem
    from rspl_slam_tpu.backend import local_ba
    from rspl_slam_tpu.backend.residuals import CameraIntrinsics
    from rspl_slam_tpu.config import CameraConfig

    cam = CameraConfig()
    K = CameraIntrinsics(cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    rng = np.random.default_rng(2)
    F, P = 3, 32
    Cp = F * P

    def build(seed):
        r = np.random.default_rng(seed)
        pts = r.uniform([-3, -2, 3], [3, 2, 9], (P, 3))
        Tcw = np.tile(np.eye(4), (F, 1, 1))
        for f in range(F):
            Tcw[f, 0, 3] = -0.25 * f
        p_pose = np.repeat(np.arange(F), P).astype(np.int32)
        p_point = np.tile(np.arange(P), F).astype(np.int32)
        meas = np.zeros((Cp, 3))
        for c in range(Cp):
            Xc = Tcw[p_pose[c], :3, :3] @ pts[p_point[c]] + Tcw[p_pose[c], :3, 3]
            u = K.fx * Xc[0] / Xc[2] + K.cx
            v = K.fy * Xc[1] / Xc[2] + K.cy
            meas[c] = [u, v, u - K.bf / Xc[2]]
        return BAProblem(
            Tcw=jnp.asarray(Tcw), pose_fixed=jnp.asarray(np.arange(F) == 0),
            points=jnp.asarray(pts + r.standard_normal((P, 3)) * 0.02),
            lines=jnp.tile(jnp.asarray([0.0, 0, 1, 1, 0, 0]), (2, 1)),
            p_pose=jnp.asarray(p_pose), p_point=jnp.asarray(p_point),
            p_meas=jnp.asarray(meas), p_stereo=jnp.ones(Cp, bool),
            p_valid=jnp.ones(Cp, bool),
            l_pose=jnp.zeros(2, jnp.int32), l_line=jnp.zeros(2, jnp.int32),
            l_eps=jnp.zeros((2, 2, 2)), l_eps_r=jnp.zeros((2, 2, 2)),
            l_stereo=jnp.zeros(2, bool), l_valid=jnp.zeros(2, bool),
        ), pts

    probs_pts = [build(s) for s in range(8)]
    probs = jax.tree.map(lambda *x: jnp.stack(x), *[p for p, _ in probs_pts])
    mesh = meshlib.make_mesh(n_data=8)
    out = dist_ba.batched_windows_ba(K, probs, mesh, iters1=3, iters2=2)
    for w, (_, pts) in enumerate(probs_pts):
        err = np.abs(np.asarray(out.points[w]) - pts).max()
        assert err < 1e-2, (w, err)
