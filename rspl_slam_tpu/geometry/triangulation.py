"""Triangulation of points and lines — batched, fixed-shape, masked.

Replaces Map::TriangulateMappoint (map.cc:292-339, multi-view bearing least
squares) and Map::TriangulateMaplineByMappoints (map.cc:341-419, iterative
3D line fit with outlier pruning). All routines take a static maximum
observation count with a validity mask and vmap over landmarks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rspl_slam_tpu.geometry import plucker

__all__ = [
    "triangulate_point_multiview",
    "fit_line3d_to_points",
    "triangulate_line_endpoints",
]

# minimum accepted parallax between some pair of observing rays: 0.5°.
# More permissive than the old 1e-4 eigenvalue-ratio gate (≈0.8° for two
# rays) — forward-dominant motion keeps more of its map — while still well
# above the f32 depth-noise regime.
COS_MIN_PARALLAX = float(np.cos(np.deg2rad(0.5)))


def triangulate_point_multiview(
    Twc: jnp.ndarray,  # (M, 4, 4) world-from-camera poses of observers
    uv_norm: jnp.ndarray,  # (M, 2) normalized image coords ((u-cx)/fx, (v-cy)/fy)
    mask: jnp.ndarray,  # (M,) bool
):
    """Multi-view midpoint/DLT triangulation with rank check.

    Builds per-observation cross-product constraints on the world point
    (the linear system the reference assembles at map.cc:302-330) and solves
    the 3×3 normal equations. Returns (point_world (3,), ok bool).

    A landmark is accepted when ≥2 valid rays and the system is well
    conditioned (rank-3 check ≙ the QR rank test at map.cc:331-336).
    """
    m = mask.astype(Twc.dtype)
    # Ray in world frame per observation.
    d_cam = jnp.concatenate([uv_norm, jnp.ones_like(uv_norm[..., :1])], -1)  # (M,3)
    R = Twc[..., :3, :3]
    t = Twc[..., :3, 3]
    d_w = jnp.einsum("mij,mj->mi", R, d_cam)
    d_w = d_w / jnp.maximum(jnp.linalg.norm(d_w, axis=-1, keepdims=True), 1e-12)
    # For each ray: (I − d dᵀ) x = (I − d dᵀ) t   (point closest to all rays)
    P = jnp.eye(3, dtype=Twc.dtype)[None] - d_w[:, :, None] * d_w[:, None, :]
    P = P * m[:, None, None]
    A = jnp.sum(P, 0)  # (3,3)
    b = jnp.sum(jnp.einsum("mij,mj->mi", P, t), 0)
    # Rank / conditioning check via eigenvalues of the SPD 3×3
    # (closed-form: batched eigvalsh is an iterative loop on TPU).
    from rspl_slam_tpu.geometry.linalg import eigvalsh3, solve3

    # Acceptance is gated on EXPLICIT parallax: some pair of observing
    # rays must span ≥ ~0.5° (cos < COS_MIN_PARALLAX). This replaces the
    # raised eigenvalue-ratio proxy (1e-4 relative), which entangled a
    # geometric decision with the f32 Cardano noise floor and rejected up
    # to 100× more low-parallax configurations than the reference's
    # SVD-based acceptance (map.cc:331-336) — thinning the map on
    # near-pure-forward motion. The eigenvalue ratio keeps only a NUMERIC
    # floor (1e-6): the 3×3 solve must be well-posed in f32.
    pair = mask[:, None] & mask[None, :] & ~jnp.eye(mask.shape[0], dtype=bool)
    dots = jnp.clip(d_w @ d_w.T, -1.0, 1.0)
    min_dot = jnp.min(jnp.where(pair, dots, 1.0))
    ok_parallax = min_dot < COS_MIN_PARALLAX
    w = eigvalsh3(A)
    ok_rank = w[..., 0] > 1e-6 * jnp.maximum(w[..., 2], 1e-12)

    x = solve3(A + 1e-9 * jnp.eye(3, dtype=A.dtype), b)
    # Cheirality: point must be in front of every observing camera.
    p_cam_z = jnp.einsum("mi,mi->m", d_w, (x[None] - t))
    ok_cheir = jnp.all(jnp.where(mask, p_cam_z > 0, True))
    ok = (jnp.sum(mask) >= 2) & ok_rank & ok_parallax & ok_cheir
    return x, ok


def fit_line3d_to_points(
    pts: jnp.ndarray,  # (P, 3) candidate on-line mappoint positions
    mask: jnp.ndarray,  # (P,) bool
    inlier_dist: float = 0.05,
    min_inliers: int = 3,
):
    """Robust 3D line fit — functional upgrade of the reference's iterative
    cv::fitLine + 0.2 m pruning loop (map.cc:380-404), which degrades badly
    when the candidate set is contaminated by accidental projective members.

    Deterministic pair-hypothesis RANSAC: every pair of candidate points
    proposes a line; the pair with the largest inlier consensus (distance <
    ``inlier_dist``) wins; the final line is the PCA fit of its inliers.
    All (P, P) hypotheses are scored in one broadcasted tensor op.

    Returns (plucker (6,), endpoints (2,3), ok). Endpoints are the extreme
    inliers along the direction (map.cc:405-416).
    """
    dtype = pts.dtype
    P = pts.shape[0]

    # pairwise directions (P, P, 3)
    d = pts[None, :, :] - pts[:, None, :]
    dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d / jnp.maximum(dn, 1e-9)
    pair_ok = (
        mask[:, None] & mask[None, :] & (dn[..., 0] > 0.2)
    )  # well-separated pairs only
    # distance of every point k to line (i, j): ‖(pk−pi) − ⟨pk−pi, d⟩d‖
    r = pts[None, None, :, :] - pts[:, None, None, :]  # (P, 1→P, P, 3) rel to i
    proj = jnp.einsum("ijkc,ijc->ijk", r, d)
    perp = r - proj[..., None] * d[:, :, None, :]
    dist = jnp.linalg.norm(perp, axis=-1)  # (P, P, P)
    inl = (dist < inlier_dist) & mask[None, None, :]
    counts = jnp.sum(inl, -1) * pair_ok  # (P, P)
    best = jnp.argmax(counts.reshape(-1))
    bi, bj = best // P, best % P
    # no well-separated pair at all (all counts zero) → argmax returns
    # (0, 0) whose "line" is degenerate; reject the fit outright
    have_pair = counts.reshape(-1)[best] > 0
    consensus = inl[bi, bj] & mask & have_pair
    n_inl = jnp.sum(consensus)

    # PCA refinement on the consensus set
    w = consensus.astype(dtype)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    c = jnp.sum(pts * w[:, None], 0) / cnt
    X = (pts - c) * w[:, None]
    evals, evecs = jnp.linalg.eigh(X.T @ X)
    dirn = evecs[:, 2]

    proj = jnp.einsum("pi,i->p", pts - c, dirn)
    big = jnp.asarray(1e9, dtype)
    tmin = jnp.min(jnp.where(consensus, proj, big))
    tmax = jnp.max(jnp.where(consensus, proj, -big))
    p1 = c + tmin * dirn
    p2 = c + tmax * dirn
    ok = (n_inl >= min_inliers) & (tmax - tmin > 1e-3)
    L = plucker.from_endpoints(p1, p2)
    return L, jnp.stack([p1, p2], 0), ok


def triangulate_line_endpoints(
    L_world: jnp.ndarray,  # (6,) Plücker
    anchor_pts: jnp.ndarray,  # (P, 3) observing mappoints
    mask: jnp.ndarray,  # (P,)
):
    """Refresh cartesian endpoints of an (optimized) infinite Plücker line
    from the extreme projections of its supporting mappoints
    (Map::UpdateMaplineEndpoints, map.cc:121-269)."""
    n, d = L_world[:3], L_world[3:]
    dn = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)
    # closest point on line to origin: p0 = d × n / ‖d‖²
    p0 = jnp.cross(d, n) / jnp.maximum(jnp.sum(d * d), 1e-12)
    proj = jnp.einsum("pi,i->p", anchor_pts - p0, dn)
    big = jnp.asarray(1e9, L_world.dtype)
    tmin = jnp.min(jnp.where(mask, proj, big))
    tmax = jnp.max(jnp.where(mask, proj, -big))
    ok = jnp.sum(mask) >= 2
    return jnp.stack([p0 + tmin * dn, p0 + tmax * dn], 0), ok
