"""Plücker 3D line algebra + 4-DoF orthonormal parameterization.

Replaces g2o's Line3D type and the reference's VertexLine3D orthonormal
update (vertex_line3d.h:16-44) with explicit JAX functions usable inside the
BA solver under autodiff.

Representation: L = (n, d) ∈ R⁶ where n = p × q (moment) for any two points
p, q on the line and d = q − p (direction). The projection of the infinite
line into a pinhole camera uses only n:
    l2d = [fy·n₀, fx·n₁, Kv·n],  Kv = [−cx·fy, −fx·cy, fx·fy]
matching edge_project_line.cc:21-42.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "from_endpoints", "transform", "project_to_image", "orthonormal_from_plucker",
    "plucker_from_orthonormal", "orthonormal_update", "point_line_dist_2d",
    "normalize",
]


def from_endpoints(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Two (..., 3) points → (..., 6) Plücker [n, d]."""
    n = jnp.cross(p, q)
    d = q - p
    return jnp.concatenate([n, d], -1)


def normalize(L: jnp.ndarray) -> jnp.ndarray:
    """Scale so ‖d‖=1 (direction-normalized Plücker)."""
    d = L[..., 3:]
    s = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return L / jnp.maximum(s, 1e-12)


def transform(T: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """Rigid transform of Plücker lines: for T = [R t] mapping points
    p' = R p + t, the line maps as n' = R n + [t]× R d, d' = R d."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    n, d = L[..., :3], L[..., 3:]
    Rd = jnp.einsum("...ij,...j->...i", R, d)
    Rn = jnp.einsum("...ij,...j->...i", R, n)
    n2 = Rn + jnp.cross(t, Rd)
    return jnp.concatenate([n2, Rd], -1)


def project_to_image(L_cam: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Plücker line in camera frame → 2D image line coefficients (a, b, c)
    with a·u + b·v + c = 0, following the reference's K-line map
    (edge_project_line.cc:27-33)."""
    n = L_cam[..., :3]
    a = fy * n[..., 0]
    b = fx * n[..., 1]
    c = -cx * fy * n[..., 0] - fx * cy * n[..., 1] + fx * fy * n[..., 2]
    return jnp.stack([a, b, c], -1)


def point_line_dist_2d(line_abc: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Signed normalized distance of pixel (..., 2) to line (..., 3)
    — the BA line residual core (edge_project_line.cc:34-41)."""
    a, b, c = line_abc[..., 0], line_abc[..., 1], line_abc[..., 2]
    denom = jnp.sqrt(jnp.maximum(a * a + b * b, 1e-12))
    return (a * uv[..., 0] + b * uv[..., 1] + c) / denom


def orthonormal_from_plucker(L: jnp.ndarray):
    """Plücker (..., 6) → orthonormal (U ∈ SO(3), W ∈ SO(2)).

    U columns: [n̂, d̂, n̂×d̂]; W encodes (‖n‖, ‖d‖) direction on the circle.
    """
    n, d = L[..., :3], L[..., 3:]
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    nd = jnp.linalg.norm(d, axis=-1, keepdims=True)
    u1 = n / jnp.maximum(nn, 1e-12)
    u2 = d / jnp.maximum(nd, 1e-12)
    u3 = jnp.cross(u1, u2)
    U = jnp.stack([u1, u2, u3], -1)  # columns
    s = jnp.sqrt(jnp.maximum(nn * nn + nd * nd, 1e-24))[..., 0]
    w1 = nn[..., 0] / s
    w2 = nd[..., 0] / s
    W = jnp.stack(
        [jnp.stack([w1, -w2], -1), jnp.stack([w2, w1], -1)], -2
    )
    return U, W


def plucker_from_orthonormal(U: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
    n = W[..., 0, 0][..., None] * U[..., :, 0]
    d = W[..., 1, 0][..., None] * U[..., :, 1]
    return jnp.concatenate([n, d], -1)


def _rot2(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def orthonormal_update(L: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4-DoF update δ = (δθ₁, δθ₂, δθ₃, δφ) to a Plücker line via its
    orthonormal representation (vertex_line3d.h:26-29): U ← U·exp([δθ]×),
    W ← W·rot2(δφ). Autodiff-friendly (used as the BA line manifold step)."""
    from rspl_slam_tpu.geometry.se3 import exp_so3

    U, W = orthonormal_from_plucker(L)
    U2 = U @ exp_so3(delta[..., :3])
    W2 = W @ _rot2(delta[..., 3])
    return plucker_from_orthonormal(U2, W2)
