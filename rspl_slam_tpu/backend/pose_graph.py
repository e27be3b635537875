"""Global pose-graph optimization (PGO) over keyframe poses.

The reference has NO global backend at all — its map drifts without bound
because consistency ends at the ~9-keyframe covisibility window
(map.cc:471-525). This module adds the standard SLAM global layer the
driver's UMA config calls for: relative-pose constraints between covisible
keyframes, optimized by a jitted Levenberg-Marquardt solver on the SE3
manifold with fixed shapes.

Design (TPU-first):
- constraints are flat arrays (i, j, Z_ij, weight, valid) padded to a
  static capacity; residual r = log(Z_ij⁻¹ · Tcw_i · Twc_j) ∈ ℝ⁶;
- per-constraint 6×6 Jacobian blocks come from vmapped forward-mode
  autodiff of the retraction (12 tangent dims per constraint — cheap);
- the normal equations are assembled with one-hot MXU contractions (no
  scatter) and solved densely: 6F×6F for F keyframes is a single
  well-tiled Cholesky on the MXU up to hundreds of keyframes;
- LM with multiplicative damping and accept/reject on the true cost,
  anchor pose(s) held fixed via parameter masking.

Typical use: :func:`relative_constraints_from_covisibility` builds the
graph from the map store; :func:`optimize_pose_graph` solves it;
``MapStore.apply_pose_graph`` (slam.SLAMSystem.run_pose_graph) rigidly
re-anchors landmarks to their host keyframe's corrected pose.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rspl_slam_tpu.geometry import linalg as glin
from rspl_slam_tpu.geometry import se3

__all__ = ["PoseGraphProblem", "PoseGraphResult",
           "relative_constraints_from_covisibility", "optimize_pose_graph"]


class PoseGraphProblem(NamedTuple):
    Tcw: jnp.ndarray        # (F, 4, 4) camera-from-world poses
    fixed: jnp.ndarray      # (F,) bool — anchors excluded from the update
    c_i: jnp.ndarray        # (C,) int32 constraint endpoint i
    c_j: jnp.ndarray        # (C,) int32 constraint endpoint j
    c_Z: jnp.ndarray        # (C, 4, 4) measured relative pose Tcw_i·Twc_j
    c_w: jnp.ndarray        # (C,) constraint weight (≙ covisibility count)
    c_valid: jnp.ndarray    # (C,) bool


class PoseGraphResult(NamedTuple):
    Tcw: jnp.ndarray
    cost: jnp.ndarray
    iters: jnp.ndarray


def relative_constraints_from_covisibility(
    kf_pose: np.ndarray, covis: np.ndarray, n_kf: int,
    min_weight: int = 10, capacity: int | None = None,
    odometry: bool = True, loops=None, max_weight: float = 25.0,
):
    """Build PGO constraints from current keyframe poses + the covisibility
    matrix: one constraint per covisible pair (weight ≥ min_weight), plus
    consecutive-keyframe odometry constraints so the graph stays connected.
    ``kf_pose`` is world-from-camera (Twc) as stored by the map; measured
    relatives are taken from the CURRENT estimates.

    ``loops`` supplies EXTERNALLY-MEASURED constraints (e.g. verified
    loop closures from backend/loop_closure.py) as objects with fields
    ``i, j, Z, weight`` where Z = Tcw_i·Twc_j is the measured relative.
    Without at least one such constraint the covisibility/odometry graph
    is built at its own optimum and optimization is a no-op — callers
    should gate on ``loops`` (slam.SLAMSystem.run_pose_graph does).

    Covisibility/odometry weights are CLAMPED to ``max_weight``: they are
    estimate-derived rigidity priors, not independent measurements, so a
    raw shared-point count (often hundreds) must not be allowed to swamp
    a measured loop closure (weight ≙ geometric inlier count)."""
    # a measured loop supersedes the estimate-derived edge on the same pair
    loop_pairs = {(min(lc.i, lc.j), max(lc.i, lc.j)) for lc in (loops or [])}
    pairs = []
    weights = []
    for a in range(n_kf):
        for b in range(a + 1, n_kf):
            w = covis[a, b]
            if w >= min_weight and (a, b) not in loop_pairs:
                pairs.append((a, b))
                weights.append(min(float(w), max_weight))
    if odometry:
        have = set(pairs)
        for a in range(n_kf - 1):
            if (a, a + 1) not in have:
                pairs.append((a, a + 1))
                weights.append(float(min_weight))
    C = len(pairs)
    n_loops = len(loops) if loops else 0
    # pad to a power-of-two bucket: constraint count changes every call and
    # the solver is jitted — bucketing bounds recompiles to O(log C)
    cap = capacity or max(16, 1 << int(C + n_loops - 1).bit_length())
    c_i = np.zeros(cap, np.int32)
    c_j = np.zeros(cap, np.int32)
    c_Z = np.tile(np.eye(4), (cap, 1, 1))
    c_w = np.zeros(cap)
    c_valid = np.zeros(cap, bool)
    for k, ((a, b), w) in enumerate(zip(pairs[:cap], weights[:cap])):
        Tcw_a = np.linalg.inv(kf_pose[a])
        c_i[k] = a
        c_j[k] = b
        c_Z[k] = Tcw_a @ kf_pose[b]  # Tcw_i · Twc_j
        c_w[k] = w
        c_valid[k] = True
    if loops:
        for k, lc in enumerate(loops[: max(0, cap - C)]):
            c_i[C + k] = lc.i
            c_j[C + k] = lc.j
            c_Z[C + k] = lc.Z  # measured Tcw_i · Twc_j — NOT from estimates
            c_w[C + k] = lc.weight
            c_valid[C + k] = True
    Tcw = np.stack([np.linalg.inv(kf_pose[f]) for f in range(n_kf)])
    return PoseGraphProblem(
        Tcw=jnp.asarray(Tcw),
        fixed=jnp.asarray(np.arange(n_kf) == 0),
        c_i=jnp.asarray(c_i), c_j=jnp.asarray(c_j), c_Z=jnp.asarray(c_Z),
        c_w=jnp.asarray(c_w), c_valid=jnp.asarray(c_valid),
    )


def _residual(xi_i, xi_j, Tcw_i, Tcw_j, Z):
    """r = log(Z⁻¹ · (exp(ξi)·Tcw_i) · (exp(ξj)·Tcw_j)⁻¹) ∈ ℝ⁶."""
    Ti = se3.compose(se3.exp_se3(xi_i), Tcw_i)
    Tj = se3.compose(se3.exp_se3(xi_j), Tcw_j)
    rel = se3.compose(Ti, se3.inverse(Tj))
    return se3.log_se3(se3.compose(se3.inverse(Z), rel))


def _constraint_terms(Tcw, prob: PoseGraphProblem):
    """Per-constraint residuals r (C, 6) and Jacobian blocks Ji, Jj
    (C, 6, 6) at ξ = 0, by forward-mode autodiff of the retraction."""
    Ti = Tcw[prob.c_i]
    Tj = Tcw[prob.c_j]
    zero = jnp.zeros(6)

    def one(Ti, Tj, Z):
        r = _residual(zero, zero, Ti, Tj, Z)
        Ji = jax.jacfwd(lambda x: _residual(x, zero, Ti, Tj, Z))(zero)
        Jj = jax.jacfwd(lambda x: _residual(zero, x, Ti, Tj, Z))(zero)
        return r, Ji, Jj

    return jax.vmap(one)(Ti, Tj, prob.c_Z)


def _onehot_f(idx, n):
    return jax.nn.one_hot(idx, n, dtype=jnp.float32)


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(prob: PoseGraphProblem, iters: int = 20,
                        lam0: float = 1e-4) -> PoseGraphResult:
    """LM on the pose graph. Fixed poses are masked out of the update."""
    F = prob.Tcw.shape[0]

    def cost_fn(Tcw):
        r, _, _ = _constraint_terms(Tcw, prob)
        w = jnp.where(prob.c_valid, prob.c_w, 0.0)
        return jnp.sum(w * jnp.sum(r * r, -1))

    def build(Tcw):
        r, Ji, Jj = _constraint_terms(Tcw, prob)
        w = jnp.where(prob.c_valid, prob.c_w, 0.0)
        oh_i = _onehot_f(prob.c_i, F)            # (C, F)
        oh_j = _onehot_f(prob.c_j, F)
        Jtr_i = jnp.einsum("cab,ca->cb", Ji, w[:, None] * r)
        Jtr_j = jnp.einsum("cab,ca->cb", Jj, w[:, None] * r)
        g = (jnp.einsum("cf,cb->fb", oh_i, Jtr_i)
             + jnp.einsum("cf,cb->fb", oh_j, Jtr_j))           # (F, 6)
        Hii = jnp.einsum("cab,cad->cbd", Ji, w[:, None, None] * Ji)
        Hjj = jnp.einsum("cab,cad->cbd", Jj, w[:, None, None] * Jj)
        Hij = jnp.einsum("cab,cad->cbd", Ji, w[:, None, None] * Jj)
        # H[f,g] blocks via one-hot outer products (MXU, no scatter)
        H = (jnp.einsum("cf,cg,cbd->fbgd", oh_i, oh_i, Hii)
             + jnp.einsum("cf,cg,cbd->fbgd", oh_j, oh_j, Hjj)
             + jnp.einsum("cf,cg,cbd->fbgd", oh_i, oh_j, Hij)
             + jnp.einsum("cf,cg,cbd->fbgd", oh_j, oh_i,
                          jnp.swapaxes(Hij, 1, 2)))            # (F,6,F,6)
        return H, g

    def body(carry, _):
        Tcw, lam, cost = carry
        H, g = build(Tcw)
        # mask fixed poses: zero their rows/cols, identity on the diagonal
        mfree = (~prob.fixed).astype(jnp.float32)
        m2 = mfree[:, None, None, None] * mfree[None, None, :, None]
        Hm = H * m2
        Hd = Hm.reshape(6 * F, 6 * F)
        # relative damping floor: an isolated free pose (no constraints)
        # has a zero diagonal block, and an absolute 1e-9 boost is below
        # f32 roundoff of its neighbors — Cholesky could hit a non-positive
        # pivot. Scale the floor by the largest diagonal entry instead so
        # unconstrained poses stay safely PD and simply don't move.
        floor = 1e-6 * jnp.maximum(jnp.max(jnp.diag(Hd)), 1e-12) + 1e-12
        diag_boost = jnp.where(
            jnp.repeat(mfree, 6) > 0, lam * jnp.diag(Hd) + floor, 1.0
        )
        A = Hd + jnp.diag(diag_boost)
        b = (g * mfree[:, None]).reshape(6 * F)
        dx = -glin.solve_spd(A, b).reshape(F, 6)
        dx = dx * mfree[:, None]
        Tnew = jax.vmap(lambda x, T: se3.compose(se3.exp_se3(x), T))(dx, Tcw)
        new_cost = cost_fn(Tnew)
        accept = new_cost < cost
        Tcw = jnp.where(accept, Tnew, Tcw)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (Tcw, lam, cost), cost

    cost0 = cost_fn(prob.Tcw)
    (Tcw, _, cost), _ = jax.lax.scan(
        body, (prob.Tcw, jnp.asarray(lam0), cost0), None, length=iters
    )
    return PoseGraphResult(Tcw=Tcw, cost=cost, iters=jnp.asarray(iters))
