"""Pose-only Levenberg–Marquardt solver — the jitted replacement for
``FrameOptimization`` (g2o_optimization.cc:256-397).

Reference semantics reproduced exactly:
- pose vertex is Tcw (inverse of the frame's world pose);
- information = identity, Huber δ = √chi²-threshold per constraint class;
- 4 rounds × 10 LM iterations; each round RESTARTS from the initial pose
  (g2o_optimization.cc:345) with the current inlier set;
- after each round every constraint is re-gated by chi² against its class
  threshold (mono_point / stereo_point) — outliers are excluded from the
  next round but re-checked every round;
- from round 3 on the Huber kernel is dropped (robust → plain quadratic,
  g2o_optimization.cc:365);
- returns the optimized pose + final inlier mask + inlier count.

TPU-first design: fixed-shape (N,) constraint arrays with a validity mask;
the whole 4×10 schedule is two nested ``lax.scan``s in ONE jit, so the
per-frame tracking cost is a single device dispatch. The 6×6 normal system
is built with one batched matmul (MXU) over constraints.
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

__all__ = ["PoseOnlyResult", "optimize_pose"]


class PoseOnlyResult(NamedTuple):
    Tcw: jnp.ndarray  # (4, 4) optimized camera-from-world
    inlier: jnp.ndarray  # (N,) bool final inlier mask
    num_inliers: jnp.ndarray  # () int32
    chi2: jnp.ndarray  # (N,) final per-constraint chi²


def _lm_rounds(
    K: CameraIntrinsics,
    Tcw0: jnp.ndarray,
    Xw: jnp.ndarray,
    meas: jnp.ndarray,
    is_stereo: jnp.ndarray,
    valid: jnp.ndarray,
    chi2_mono: float,
    chi2_stereo: float,
    rounds: int,
    iters: int,
):
    delta_mono = jnp.sqrt(chi2_mono)
    delta_stereo = jnp.sqrt(chi2_stereo)
    thr = jnp.where(is_stereo, chi2_stereo, chi2_mono)
    delta = jnp.where(is_stereo, delta_stereo, delta_mono)
    dtype = Tcw0.dtype

    def constraint_chi2(Tcw):
        r, z = res.point_residual(K, Tcw, Xw, meas, is_stereo)
        return jnp.sum(r * r, -1), r, z

    def lm_iteration(carry, _, use_huber, active):
        # residuals of the CURRENT (accepted) state ride in the carry, so
        # each iteration evaluates the objective only once — at the candidate
        Tcw, lam, chi2, r, z = carry
        w = jnp.where(use_huber, res.huber_weight(chi2, delta), 1.0)
        w = jnp.where(active & (z > 1e-6), w, 0.0)
        J = res.point_pose_jacobian(K, Tcw, Xw, is_stereo)  # (N, 3, 6)
        # H = Σ w Jᵀ J (6,6); b = Σ w Jᵀ r — one batched contraction each
        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J)
        g = jnp.einsum("nij,ni->j", Jw, r)
        # LM step with multiplicative damping on the diagonal (g2o-style)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-10 * jnp.eye(6, dtype=dtype)
        step = -glin.solve_spd(Hd, g)  # damped SPD: Cholesky, no pivot chain
        Tcw_new = se3.exp_se3(step) @ Tcw
        # accept if total weighted chi2 decreased. Active constraints with
        # non-positive (or non-finite) candidate depth are priced at
        # their chi² gate instead of dropping out — otherwise a divergent
        # step that throws the points behind the camera masks to cost 0
        # and gets "accepted" (the masked-LM degenerate attractor; the
        # same guard lives in local_ba._total_cost).
        pen = delta * delta
        cost_old = (
            jnp.sum(jnp.where(w > 0, chi2, 0.0) * jnp.minimum(w, 1.0))
            + jnp.sum((active & ~(z > 1e-6)).astype(dtype) * pen)
        )
        chi2_new, r_new, zn = constraint_chi2(Tcw_new)
        w_new = jnp.where(use_huber, res.huber_weight(chi2_new, delta), 1.0)
        w_new = jnp.where(active & (zn > 1e-6), w_new, 0.0)
        cost_new = (
            jnp.sum(jnp.where(w_new > 0, chi2_new, 0.0)
                    * jnp.minimum(w_new, 1.0))
            + jnp.sum((active & ~(zn > 1e-6)).astype(dtype) * pen)
        )
        accept = cost_new < cost_old
        Tcw = jnp.where(accept, Tcw_new, Tcw)
        chi2 = jnp.where(accept, chi2_new, chi2)
        r = jnp.where(accept, r_new, r)
        z = jnp.where(accept, zn, z)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-10, 1e6)
        return (Tcw, lam, chi2, r, z), None

    chi2_0, r_0, z_0 = constraint_chi2(Tcw0)

    def round_body(carry, round_idx):
        _, inlier = carry
        use_huber = round_idx < 2  # kernels dropped from the 3rd round on
        active = inlier & valid

        body = partial(lm_iteration, use_huber=use_huber, active=active)
        (Tcw, _, chi2, _, z), _ = jax.lax.scan(
            body, (Tcw0, jnp.asarray(1e-4, dtype), chi2_0, r_0, z_0),
            None, length=iters,
        )
        inlier = (chi2 <= thr) & (z > 1e-6) & valid
        return (Tcw, inlier), None

    inlier0 = valid
    (Tcw, inlier), _ = jax.lax.scan(
        round_body, (Tcw0, inlier0), jnp.arange(rounds)
    )
    chi2, _, _ = constraint_chi2(Tcw)
    return Tcw, inlier, chi2


@partial(jax.jit, static_argnames=("chi2_mono", "chi2_stereo", "rounds", "iters"))
def optimize_pose(
    K: CameraIntrinsics,
    Twc0: jnp.ndarray,  # (4, 4) initial world-from-camera pose
    Xw: jnp.ndarray,  # (N, 3) landmark world positions
    meas: jnp.ndarray,  # (N, 3) [uL, vL, uR] measurements
    is_stereo: jnp.ndarray,  # (N,) bool
    valid: jnp.ndarray,  # (N,) bool constraint validity (padding)
    chi2_mono: float = 50.0,
    chi2_stereo: float = 75.0,
    rounds: int = 4,
    iters: int = 10,
) -> PoseOnlyResult:
    """Drop-in functional equivalent of FrameOptimization. Returns the
    optimized world pose (inverted back from Tcw), inlier mask and count."""
    Tcw0 = se3.inverse(Twc0)
    Tcw, inlier, chi2 = _lm_rounds(
        K, Tcw0, Xw, meas, is_stereo, valid,
        chi2_mono, chi2_stereo, rounds, iters,
    )
    return PoseOnlyResult(
        Tcw=Tcw,
        inlier=inlier,
        num_inliers=jnp.sum(inlier.astype(jnp.int32)),
        chi2=chi2,
    )
