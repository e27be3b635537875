"""Robust PnP initialization — the TPU-native stand-in for
``SolvePnPWithCV`` (g2o_optimization.cc:402-461, cv::solvePnPRansac with
100 iterations, 20 px threshold, 0.99 confidence, ≥8 points).

Design: instead of a sequential RANSAC loop with a P3P minimal solver (all
branchy scalar code — hostile to the MXU), we run a **batched
hypothesize-and-refine RANSAC**: H random minimal subsets are each polished
by a handful of Gauss-Newton steps from the prior pose, all H hypotheses in
one vmapped computation, then scored by 20-px inlier count in a single
(H, N) residual matrix. The winner is refined on its inliers.

In the visual-odometry setting the prior (last frame's pose) is always
close, so GN-from-prior on 4-point subsets recovers the same basin as P3P
while being two fused batched matmuls per iteration. The reference calls
PnP for exactly this purpose — an outlier-robust initializer ahead of the
pose-only LM (map_builder.cc:515).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rspl_slam_tpu.backend import residuals as res
from rspl_slam_tpu.backend.residuals import CameraIntrinsics
from rspl_slam_tpu.geometry import linalg as glin
from rspl_slam_tpu.geometry import se3

__all__ = ["PnPResult", "pnp_ransac"]


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray  # (4, 4)
    inlier: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray  # () bool — ≥8 valid points and nonempty consensus


def _gn_refine(K, Tcw, Xw, uv, weight, iters):
    """A few Gauss-Newton steps on mono reprojection with per-point weights."""
    meas = jnp.concatenate([uv, jnp.zeros_like(uv[:, :1])], -1)
    no_stereo = jnp.zeros(Xw.shape[0], bool)

    def body(Tcw, _):
        r, z = res.point_residual(K, Tcw, Xw, meas, no_stereo)
        w = weight * (z > 1e-6)
        J = res.point_pose_jacobian(K, Tcw, Xw, no_stereo)
        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J) + 1e-6 * jnp.eye(6, dtype=Tcw.dtype)
        g = jnp.einsum("nij,ni->j", Jw, r)
        step = -glin.solve_spd(H, g)
        return se3.exp_se3(step) @ Tcw, None

    Tcw, _ = jax.lax.scan(body, Tcw, None, length=iters)
    return Tcw


@partial(
    jax.jit,
    static_argnames=("num_hypotheses", "subset_size", "gn_iters", "threshold_px"),
)
def pnp_ransac(
    K: CameraIntrinsics,
    Twc_prior: jnp.ndarray,  # (4, 4) prior world pose (last frame)
    Xw: jnp.ndarray,  # (N, 3)
    uv: jnp.ndarray,  # (N, 2) observed pixels in the current frame
    valid: jnp.ndarray,  # (N,) bool
    key: jax.Array,
    num_hypotheses: int = 128,
    subset_size: int = 4,
    gn_iters: int = 5,
    threshold_px: float = 20.0,
) -> PnPResult:
    N = Xw.shape[0]
    dtype = Xw.dtype
    Tcw_prior = se3.inverse(Twc_prior)

    # sample H subsets of valid indices (probability ∝ validity)
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, num_hypotheses)

    def one_hypothesis(k):
        idx = jax.random.categorical(k, logits, shape=(subset_size,))
        w = jnp.zeros((N,), dtype).at[idx].set(1.0)
        return _gn_refine(K, Tcw_prior, Xw, uv, w, gn_iters)

    Tcws = jax.vmap(one_hypothesis)(keys)  # (H, 4, 4)

    # score all hypotheses: (H, N) reprojection error
    def score(Tcw):
        Xc = res.transform_to_cam(Tcw, Xw)
        z = jnp.maximum(Xc[:, 2], 1e-6)
        u = K.fx * Xc[:, 0] / z + K.cx
        v = K.fy * Xc[:, 1] / z + K.cy
        err = jnp.linalg.norm(uv - jnp.stack([u, v], -1), axis=-1)
        inl = (err < threshold_px) & (Xc[:, 2] > 1e-6) & valid
        return jnp.sum(inl.astype(jnp.int32)), inl

    counts, inliers = jax.vmap(score)(Tcws)
    best = jnp.argmax(counts)
    Tcw_best = Tcws[best]
    inl_best = inliers[best]

    # final polish on the consensus set
    Tcw_final = _gn_refine(
        K, Tcw_best, Xw, uv, inl_best.astype(dtype), gn_iters
    )
    n_final, inl_final = score(Tcw_final)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    ok = (n_valid >= 8) & (n_final >= jnp.minimum(8, n_valid))
    return PnPResult(Tcw=Tcw_final, inlier=inl_final, num_inliers=n_final, ok=ok)
