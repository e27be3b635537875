"""SE(3) / SO(3) operations as pure JAX functions.

Replaces the reference's dependence on g2o's SE3Quat/SE3Expmap types
(g2o_optimization.cc) with explicit, batchable, autodiff-friendly math.
Poses are stored as (4,4) homogeneous matrices camera-from-world or
world-from-camera depending on call site — helpers are convention-free.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "hat", "vee", "exp_so3", "log_so3", "exp_se3", "log_se3",
    "inverse", "compose", "transform_points", "quat_from_rot",
    "rot_from_quat", "rotation_angle",
]


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) vectors → (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) → (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential: (..., 3) axis-angle → (..., 3, 3) rotation.

    Taylor-guarded near θ=0 so gradients stay finite.
    """
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation log map: (..., 3, 3) → (..., 3) axis-angle.

    Uses the quaternion route for stability near π.
    """
    q = quat_from_rot(R)  # (..., 4) wxyz
    qw = q[..., 0]
    qv = q[..., 1:]
    n = jnp.linalg.norm(qv, axis=-1)
    # angle = 2 atan2(|qv|, qw); axis = qv/|qv|
    angle = 2.0 * jnp.arctan2(n, qw)
    scale = jnp.where(n < 1e-9, 2.0 / jnp.maximum(qw, 1e-9), angle / jnp.maximum(n, 1e-12))
    return qv * scale[..., None]


def _V(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO(3)."""
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * (W @ W)


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exponential. xi = (..., 6) as [ω, v] → (..., 4, 4).

    Convention [rotation, translation] matches g2o SE3Quat::exp order used by
    the reference's pose updates (translation coupled through V(ω)).
    """
    w, v = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    t = jnp.einsum("...ij,...j->...i", _V(w), v)
    top = jnp.concatenate([R, t[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], -2)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of exp_se3: (..., 4, 4) → (..., 6) [ω, v]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    from rspl_slam_tpu.geometry.linalg import inv3  # local: avoid cycle

    Vinv = inv3(_V(w))  # closed-form: LU is ~40x slower on TPU (linalg.py)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], -1)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], -2)


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def transform_points(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if p.ndim >= 2 and p.shape[-2:] != (3,) and p.shape[-1] == 3 and p.ndim > T.ndim - 1:
        return jnp.einsum("...ij,...nj->...ni", R, p) + t[..., None, :]
    return jnp.einsum("...ij,...j->...i", R, p) + t


def quat_from_rot(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → unit quaternion (..., 4) in wxyz order.

    Branch-free Shepperd-style construction (max-trace selection) so it is
    jit/vmap safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (un-normalized), one per pivot.
    qw0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    qx0 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy0 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    qz0 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)

    vals = jnp.stack([tr, m00, m11, m22], -1)
    idx = jnp.argmax(vals, -1)
    cands = jnp.stack([qw0, qx0, qy0, qz0], -2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), -2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: qw >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def rot_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) wxyz → rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.maximum(n, 1e-24)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], -1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], -1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], -1),
        ],
        -2,
    )


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in radians of (..., 3, 3) — keyframe trigger Δangle
    (map_builder.cc:621)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))
