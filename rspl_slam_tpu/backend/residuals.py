"""Reprojection residuals + analytic Jacobians for the LM solvers.

Replaces g2o's edge types:
- mono point  ≙ EdgeSE3ProjectXYZOnlyPose / EdgeSE3ProjectXYZ
- stereo point ≙ EdgeStereoSE3ProjectXYZOnlyPose / EdgeStereoSE3ProjectXYZ
- mono/stereo line ≙ EdgeSE3ProjectLine / EdgeStereoSE3ProjectLine
  (edge_project_line.cc:21-42, edge_project_stereo_line.cc:22-51)

Conventions:
- ``Tcw`` is camera-from-world (the g2o vertex estimate, the inverse of the
  frame's world pose — g2o_optimization.cc:272).
- Residual r = measurement − prediction, per-component masked.
- Pose perturbation is LEFT-multiplicative on Tcw: Tcw ← exp(ξ)·Tcw with
  ξ = [ω, v]; point perturbation is additive in world coords.
- Information matrices are identity (pixel units) exactly like the
  reference (g2o_optimization.cc:297, 325); robust weighting happens in the
  solver.

Everything is batched over constraints with vmap-free broadcasting; shapes
are (N, ...) with a validity mask handled by callers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rspl_slam_tpu.geometry import plucker

__all__ = [
    "CameraIntrinsics",
    "point_residual",
    "point_pose_jacobian",
    "point_landmark_jacobian",
    "line_residual",
    "huber_weight",
]


class CameraIntrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    bf: float


def transform_to_cam(Tcw: jnp.ndarray, Xw: jnp.ndarray) -> jnp.ndarray:
    """(4,4) × (N,3) → (N,3) camera-frame points."""
    return Xw @ Tcw[:3, :3].T + Tcw[:3, 3]


def point_residual(
    K: CameraIntrinsics,
    Tcw: jnp.ndarray,  # (4, 4)
    Xw: jnp.ndarray,  # (N, 3) world points
    meas: jnp.ndarray,  # (N, 3) [uL, vL, uR]; uR ignored for mono rows
    is_stereo: jnp.ndarray,  # (N,) bool
):
    """Returns (r (N, 3), z (N,)) with r = meas − [u, v, uR] and the third
    component zeroed for mono constraints. chi² = ‖r‖² then matches g2o's
    identity-information chi2 (e->chi2())."""
    Xc = transform_to_cam(Tcw, Xw)
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    zs = jnp.maximum(z, 1e-6)
    u = K.fx * x / zs + K.cx
    v = K.fy * y / zs + K.cy
    ur = u - K.bf / zs
    pred = jnp.stack([u, v, ur], -1)
    r = meas - pred
    r = r.at[:, 2].set(jnp.where(is_stereo, r[:, 2], 0.0))
    return r, z


def point_pose_jacobian(
    K: CameraIntrinsics,
    Tcw: jnp.ndarray,
    Xw: jnp.ndarray,
    is_stereo: jnp.ndarray,
):
    """∂r/∂ξ for left-multiplicative ξ = [ω, v] on Tcw. Returns (N, 3, 6).

    dXc/dω = −[Xc]×, dXc/dv = I; dr/dXc = −J_proj.
    """
    Xc = transform_to_cam(Tcw, Xw)
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    z = jnp.maximum(z, 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    fx, fy, bf = K.fx, K.fy, K.bf
    zero = jnp.zeros_like(x)
    # J_proj rows: du/dXc, dv/dXc, duR/dXc  (N, 3, 3)
    Jp = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], -1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], -1),
            jnp.stack([fx * iz, zero, -fx * x * iz2 + bf * iz2], -1),
        ],
        -2,
    )
    # dXc/dξ = [ −[Xc]× | I ]  (N, 3, 6)
    zz = jnp.zeros_like(x)
    neg_hat = jnp.stack(
        [
            jnp.stack([zz, z, -y], -1),
            jnp.stack([-z, zz, x], -1),
            jnp.stack([y, -x, zz], -1),
        ],
        -2,
    )
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=Xw.dtype), (Xw.shape[0], 3, 3))
    dXc = jnp.concatenate([neg_hat, I3], -1)
    J = -(Jp @ dXc)  # r = meas − pred
    J = J.at[:, 2, :].set(
        jnp.where(is_stereo[:, None], J[:, 2, :], 0.0)
    )
    return J


def point_landmark_jacobian(
    K: CameraIntrinsics,
    Tcw: jnp.ndarray,
    Xw: jnp.ndarray,
    is_stereo: jnp.ndarray,
):
    """∂r/∂Xw (additive world-point perturbation). Returns (N, 3, 3):
    dr/dXw = −J_proj · R."""
    Xc = transform_to_cam(Tcw, Xw)
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    z = jnp.maximum(z, 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    fx, fy, bf = K.fx, K.fy, K.bf
    zero = jnp.zeros_like(x)
    Jp = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], -1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], -1),
            jnp.stack([fx * iz, zero, -fx * x * iz2 + bf * iz2], -1),
        ],
        -2,
    )
    J = -(Jp @ Tcw[:3, :3][None])
    J = J.at[:, 2, :].set(jnp.where(is_stereo[:, None], J[:, 2, :], 0.0))
    return J


def line_residual(
    K: CameraIntrinsics,
    Tcw: jnp.ndarray,  # (4, 4)
    L_world: jnp.ndarray,  # (N, 6) Plücker in world frame
    endpoints: jnp.ndarray,  # (N, 2, 2) observed LEFT segment endpoints (px)
    endpoints_right: jnp.ndarray,  # (N, 2, 2) observed RIGHT endpoints
    is_stereo: jnp.ndarray,  # (N,) bool — adds the right-camera pair
):
    """Line reprojection residual (N, 4):
    [d(epL1, l_left), d(epL2, l_left), d(epR1, l_right), d(epR2, l_right)]
    where d is the normalized point-to-line distance of the observed segment
    endpoints to the projected infinite line — EdgeSE3ProjectLine's 2-vector
    error (edge_project_line.cc:21-42) and EdgeStereoSE3ProjectLine's
    4-vector error with the right camera displaced by the baseline and the
    8-vector [left eps; right eps] measurement (edge_project_stereo_line.cc:
    22-51). Mono rows zero the right components.
    """
    L_cam = plucker.transform(Tcw[None], L_world)
    line2d = plucker.project_to_image(L_cam, K.fx, K.fy, K.cx, K.cy)
    d1 = plucker.point_line_dist_2d(line2d, endpoints[:, 0])
    d2 = plucker.point_line_dist_2d(line2d, endpoints[:, 1])
    # right camera: world→right-cam transform has t_x reduced by baseline b
    b = K.bf / K.fx
    Trw = Tcw.at[0, 3].add(-b)
    L_cam_r = plucker.transform(Trw[None], L_world)
    line2d_r = plucker.project_to_image(L_cam_r, K.fx, K.fy, K.cx, K.cy)
    d1r = plucker.point_line_dist_2d(line2d_r, endpoints_right[:, 0])
    d2r = plucker.point_line_dist_2d(line2d_r, endpoints_right[:, 1])
    s = is_stereo.astype(L_world.dtype)
    return jnp.stack([d1, d2, d1r * s, d2r * s], -1)


def huber_weight(chi2: jnp.ndarray, delta: jnp.ndarray | float) -> jnp.ndarray:
    """IRLS weight of the Huber kernel at squared error ``chi2`` with
    threshold δ (g2o RobustKernelHuber: ρ'(s) = min(1, δ/√s))."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.minimum(1.0, delta / e)
