"""Local bundle adjustment — jitted Levenberg–Marquardt with explicit
Schur-complement reduction over marginalized landmarks.

Replaces ``LocalmapOptimization`` (g2o_optimization.cc:21-252). Reference
semantics reproduced:

- vertices: poses as Tcw (fixed flags honored), points marginalized,
  lines marginalized with the 4-DoF orthonormal update
  (vertex_line3d.h:26-29);
- constraints: mono point (2-d, info I), stereo point (3-d, info I),
  mono line (2-d, info 0.1·I), stereo line (4-d, info 0.1·I), Huber
  δ = √(class chi² threshold);
- schedule: 10 LM iterations → chi²/depth gate → drop ALL robust kernels →
  5 more iterations → final inlier flags → write back poses, points, lines
  (g2o_optimization.cc:180-252).

TPU-first structure (this is where the design diverges hard from g2o's
sparse-graph solver):

- every quantity is a fixed-shape dense array: F poses (≤ window size),
  P point slots, L line slots, Cp point constraints, Cl line constraints —
  all padded with validity masks;
- the reduced camera system is built as a dense (P, F, 6, dl) "W tensor"
  per landmark class, scatter-added from constraints and contracted with a
  single einsum into the (F·6, F·6) Schur complement S — batched matmuls
  that map straight onto the MXU instead of g2o's pointer-chasing sparse
  factorization;
- landmark Jacobians: analytic for points, forward-mode autodiff for the
  orthonormal line manifold;
- the whole 10+5 schedule runs inside one jit; multi-window batching is a
  vmap away (see parallel/dist_ba.py for the sharded version).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rspl_slam_tpu.backend import residuals as res
from rspl_slam_tpu.backend.residuals import CameraIntrinsics
from rspl_slam_tpu.geometry import linalg as glin
from rspl_slam_tpu.geometry import plucker, se3

__all__ = ["BAProblem", "BAResult", "optimize_local_map"]


class BAProblem(NamedTuple):
    """Fixed-shape BA window. All index arrays point into the window-local
    pose/point/line slots; invalid entries must have index 0 and valid=False.
    """

    Tcw: jnp.ndarray  # (F, 4, 4) camera-from-world
    pose_fixed: jnp.ndarray  # (F,) bool (includes padding slots)
    points: jnp.ndarray  # (P, 3)
    lines: jnp.ndarray  # (L, 6) Plücker (world)
    # point constraints
    p_pose: jnp.ndarray  # (Cp,) int32
    p_point: jnp.ndarray  # (Cp,) int32
    p_meas: jnp.ndarray  # (Cp, 3) [uL, vL, uR]
    p_stereo: jnp.ndarray  # (Cp,) bool
    p_valid: jnp.ndarray  # (Cp,) bool
    # line constraints
    l_pose: jnp.ndarray  # (Cl,) int32
    l_line: jnp.ndarray  # (Cl,) int32
    l_eps: jnp.ndarray  # (Cl, 2, 2) observed left endpoints
    l_eps_r: jnp.ndarray  # (Cl, 2, 2) observed right endpoints
    l_stereo: jnp.ndarray  # (Cl,) bool
    l_valid: jnp.ndarray  # (Cl,) bool


class BAResult(NamedTuple):
    Tcw: jnp.ndarray  # (F, 4, 4)
    points: jnp.ndarray  # (P, 3)
    lines: jnp.ndarray  # (L, 6)
    p_inlier: jnp.ndarray  # (Cp,) bool
    l_inlier: jnp.ndarray  # (Cl,) bool
    cost: jnp.ndarray  # () final robust cost


_LINE_INFO = 0.1  # line information scale (g2o_optimization.cc:138, 162)


def _reduce(x, axis_name):
    """Cross-device sum when running under shard_map (constraint-sharded
    distributed BA, parallel/dist_ba.py); identity single-device."""
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _onehot_sum(idx, num_segments, terms):
    """segment_sum as a one-hot MXU matmul — TPU scatters serialize, while
    einsum("cs,c...->s...") is one batched contraction on the systolic array
    (measured: the scatter path dominated the whole BA step)."""
    oh = jax.nn.one_hot(idx, num_segments, dtype=terms.dtype)  # (C, S)
    C = terms.shape[0]
    flat = terms.reshape(C, -1)
    out = jax.lax.dot_general(
        oh, flat, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST keeps the f32 `terms` operand un-truncated on TPU (the
        # one-hot operand is exact either way); matches segment_sum accuracy
        precision=jax.lax.Precision.HIGHEST,
    )  # (S, prod(rest))
    return out.reshape((num_segments,) + terms.shape[1:])


def _point_terms(K, Tcw_all, points, prob: BAProblem):
    """Residuals + Jacobians for every point constraint.

    Returns r (Cp,3), z (Cp,), Jp (Cp,3,6), Jx (Cp,3,3).
    """
    Tcw_c = Tcw_all[prob.p_pose]  # (Cp,4,4)
    Xw = points[prob.p_point]  # (Cp,3)

    def one(Tcw, X, meas, st):
        r, z = res.point_residual(K, Tcw, X[None], meas[None], st[None])
        Jp = res.point_pose_jacobian(K, Tcw, X[None], st[None])
        Jx = res.point_landmark_jacobian(K, Tcw, X[None], st[None])
        return r[0], z[0], Jp[0], Jx[0]

    return jax.vmap(one)(Tcw_c, Xw, prob.p_meas, prob.p_stereo)


def _line_terms(K, Tcw_all, lines, prob: BAProblem):
    """Residuals + Jacobians for line constraints. The line Jacobian is with
    respect to the 4-DoF orthonormal delta at zero (forward-mode autodiff —
    the manifold chart of VertexLine3D::oplusImpl).

    Returns r (Cl,4), Jp (Cl,4,6), Jl (Cl,4,4).
    """
    Tcw_c = Tcw_all[prob.l_pose]
    Lw = lines[prob.l_line]

    def r_fn(xi, delta, Tcw, L, eps, eps_r, st):
        T = se3.exp_se3(xi) @ Tcw
        L2 = plucker.orthonormal_update(L, delta)
        return res.line_residual(K, T, L2[None], eps[None], eps_r[None], st[None])[0]

    def one(Tcw, L, eps, eps_r, st):
        z6 = jnp.zeros(6, Tcw.dtype)
        z4 = jnp.zeros(4, Tcw.dtype)
        r = r_fn(z6, z4, Tcw, L, eps, eps_r, st)
        Jp = jax.jacfwd(r_fn, argnums=0)(z6, z4, Tcw, L, eps, eps_r, st)
        Jl = jax.jacfwd(r_fn, argnums=1)(z6, z4, Tcw, L, eps, eps_r, st)
        return r, Jp, Jl

    return jax.vmap(one)(Tcw_c, Lw, prob.l_eps, prob.l_eps_r, prob.l_stereo)


def _robust_weights(r, info, delta, active):
    """Per-constraint IRLS weight: info · huber'(chi2) · active."""
    chi2 = info * jnp.sum(r * r, -1)
    w = res.huber_weight(chi2, delta)
    return jnp.where(active, info * w, 0.0), chi2


def _build_and_solve(K, Tcw, points, lines, prob, p_active, l_active,
                     use_huber, deltas, lam, axis_name=None):
    """One LM step: assemble the Schur-reduced system and return updates.

    With ``axis_name`` set (under shard_map), the constraint arrays of
    ``prob`` are each device's shard; assembled blocks are psum-reduced so
    every device solves the identical replicated system — the distributed
    Schur reduction's only collective (O(F²·36 + P·F·18 + L·F·24) floats).
    """
    F = Tcw.shape[0]
    P = points.shape[0]
    L = lines.shape[0]
    dtype = Tcw.dtype
    d_p, d_sp, d_l, d_sl = deltas

    rp, z, Jp_p, Jx = _point_terms(K, Tcw, points, prob)
    rl, Jp_l, Jl = _line_terms(K, Tcw, lines, prob)

    p_ok = p_active & (z > 1e-6)
    delta_p = jnp.where(prob.p_stereo, d_sp, d_p)
    wp, chi2_p = _robust_weights(rp, 1.0, jnp.where(use_huber, delta_p, 1e9), p_ok)
    delta_l = jnp.where(prob.l_stereo, d_sl, d_l)
    wl, chi2_l = _robust_weights(rl, _LINE_INFO, jnp.where(use_huber, delta_l, 1e9), l_active)

    # --- assemble blocks ---------------------------------------------------
    # pose-diagonal: Hpp (F,6,6), gradient gp (F,6)
    JpW_p = Jp_p * wp[:, None, None]
    Hpp_terms = jnp.einsum("cij,cik->cjk", JpW_p, Jp_p)
    gp_terms = jnp.einsum("cij,ci->cj", JpW_p, rp)
    Hpp = _onehot_sum(prob.p_pose, F, Hpp_terms)
    gp = _onehot_sum(prob.p_pose, F, gp_terms)
    JpW_l = Jp_l * wl[:, None, None]
    Hpp = Hpp + _onehot_sum(
        prob.l_pose, F, jnp.einsum("cij,cik->cjk", JpW_l, Jp_l)
    )
    gp = gp + _onehot_sum(prob.l_pose, F, jnp.einsum("cij,ci->cj", JpW_l, rl))

    # landmark-diagonal: Hxx (P,3,3), gx (P,3); Hll (L,4,4), gl (L,4)
    JxW = Jx * wp[:, None, None]
    Hxx = _onehot_sum(prob.p_point, P, jnp.einsum("cij,cik->cjk", JxW, Jx))
    gx = _onehot_sum(prob.p_point, P, jnp.einsum("cij,ci->cj", JxW, rp))
    JlW = Jl * wl[:, None, None]
    Hll = _onehot_sum(prob.l_line, L, jnp.einsum("cij,cik->cjk", JlW, Jl))
    gl = _onehot_sum(prob.l_line, L, jnp.einsum("cij,ci->cj", JlW, rl))

    # cross terms: W tensor (landmark, pose, 6, dl) — expand the pose index
    # with a one-hot broadcast (F is small), then contract the constraint
    # axis against the landmark one-hot on the MXU
    Wx_terms = jnp.einsum("cij,cik->cjk", JpW_p, Jx)  # (Cp, 6, 3)
    oh_pose_p = jax.nn.one_hot(prob.p_pose, F, dtype=dtype)  # (Cp, F)
    Wx = _onehot_sum(
        prob.p_point, P, Wx_terms[:, None] * oh_pose_p[:, :, None, None]
    )  # (P, F, 6, 3)
    Wl_terms = jnp.einsum("cij,cik->cjk", JpW_l, Jl)  # (Cl, 6, 4)
    oh_pose_l = jax.nn.one_hot(prob.l_pose, F, dtype=dtype)
    Wl = _onehot_sum(
        prob.l_line, L, Wl_terms[:, None] * oh_pose_l[:, :, None, None]
    )  # (L, F, 6, 4)

    # cross-device reduction of the assembled normal-equation blocks: after
    # this, every device holds the full system and the solve is replicated
    Hpp, gp, Hxx, gx, Hll, gl, Wx, Wl = _reduce(
        (Hpp, gp, Hxx, gx, Hll, gl, Wx, Wl), axis_name
    )

    # --- damp landmark blocks and invert (batched 3×3 / 4×4) ---------------
    Hxx_d = Hxx + (lam * jnp.diagonal(Hxx, axis1=-2, axis2=-1))[..., :, None] * jnp.eye(3, dtype=dtype) + 1e-8 * jnp.eye(3, dtype=dtype)
    Hll_d = Hll + (lam * jnp.diagonal(Hll, axis1=-2, axis2=-1))[..., :, None] * jnp.eye(4, dtype=dtype) + 1e-8 * jnp.eye(4, dtype=dtype)
    # closed-form batched inverses: linalg.inv's pivoted LU costs ~430 us
    # for the (P, 3, 3) batch alone on v5e (geometry/linalg.py header)
    Hxx_inv = glin.inv3(Hxx_d)
    Hll_inv = glin.inv4_spd(Hll_d)

    # --- Schur complement over points and lines ----------------------------
    # S = Hpp_blockdiag − Σ_x Wx Hxx⁻¹ Wxᵀ − Σ_l Wl Hll⁻¹ Wlᵀ  (F,6,F,6)
    S = jnp.zeros((F, 6, F, 6), dtype)
    S = S.at[jnp.arange(F), :, jnp.arange(F), :].add(
        Hpp + lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1)[..., :, None] * jnp.eye(6, dtype=dtype)
        + 1e-8 * jnp.eye(6, dtype=dtype)
    )
    WxD = jnp.einsum("pfij,pjk->pfik", Wx, Hxx_inv)
    S = S - jnp.einsum("pfik,pgjk->figj", WxD, Wx)
    WlD = jnp.einsum("lfij,ljk->lfik", Wl, Hll_inv)
    S = S - jnp.einsum("lfik,lgjk->figj", WlD, Wl)
    # reduced gradient: g̃p = gp − Wx Hxx⁻¹ gx − Wl Hll⁻¹ gl
    gtilde = gp - jnp.einsum("pfik,pk->fi", WxD, gx) - jnp.einsum("lfik,lk->fi", WlD, gl)

    # --- fixed poses: identity rows/cols, zero rhs -------------------------
    free = (~prob.pose_fixed).astype(dtype)
    mask2 = free[:, None, None, None] * free[None, None, :, None]
    S = S * mask2
    S = S.at[jnp.arange(F), :, jnp.arange(F), :].add(
        (1.0 - free)[:, None, None] * jnp.eye(6, dtype=dtype)
    )
    gtilde = gtilde * free[:, None]

    dp = -glin.solve_spd(S.reshape(F * 6, F * 6), gtilde.reshape(F * 6)).reshape(F, 6)
    dp = dp * free[:, None]

    # --- back-substitute landmarks -----------------------------------------
    # δx = −Hxx⁻¹ (gx + Wxᵀ δp)
    dx = -jnp.einsum("pjk,pk->pj", Hxx_inv, gx + jnp.einsum("pfij,fi->pj", Wx, dp))
    dl = -jnp.einsum("ljk,lk->lj", Hll_inv, gl + jnp.einsum("lfij,fi->lj", Wl, dp))

    cost = jnp.sum(_huber_rho(chi2_p, delta_p) * p_ok) + jnp.sum(
        _huber_rho(chi2_l, delta_l) * l_active
    )
    return dp, dx, dl, _reduce(cost, axis_name)


def _huber_rho(chi2, delta):
    """Huber cost ρ(s) with threshold δ (g2o RobustKernelHuber::robustify)."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, chi2, 2.0 * delta * e - delta * delta)


def _total_cost(K, Tcw, points, lines, prob, p_active, l_active, deltas,
                use_huber, axis_name=None):
    """Robust cost + per-constraint chi². The scalar cost is psum-reduced
    under shard_map (so LM accept/reject is identical on every device); the
    chi² arrays stay shard-local, matching the sharded active masks."""
    d_p, d_sp, d_l, d_sl = deltas
    Tcw_c = Tcw[prob.p_pose]
    Xw = points[prob.p_point]

    def one_p(T, X, m, st):
        r, z = res.point_residual(K, T, X[None], m[None], st[None])
        return r[0], z[0]

    rp, z = jax.vmap(one_p)(Tcw_c, Xw, prob.p_meas, prob.p_stereo)
    # finite ceiling: an f32-overflowed chi² (inf) would propagate NaN
    # through masked sums (inf·0 = NaN) and poison the LM accept test
    chi2_p = jnp.minimum(jnp.sum(rp * rp, -1), 1e12)
    Tcw_l = Tcw[prob.l_pose]
    Lw = lines[prob.l_line]

    def one_l(T, L, eps, eps_r, st):
        return res.line_residual(K, T, L[None], eps[None], eps_r[None], st[None])[0]

    rl = jax.vmap(one_l)(Tcw_l, Lw, prob.l_eps, prob.l_eps_r, prob.l_stereo)
    chi2_l = jnp.minimum(_LINE_INFO * jnp.sum(rl * rl, -1), 1e12)
    delta_p = jnp.where(prob.p_stereo, d_sp, d_p)
    delta_l = jnp.where(prob.l_stereo, d_sl, d_l)
    dtype = Tcw.dtype
    ok_p = p_active & (z > 1e-6)
    cp = jnp.where(use_huber, _huber_rho(chi2_p, delta_p), chi2_p)
    cl = jnp.where(use_huber, _huber_rho(chi2_l, delta_l), chi2_l)
    # cheirality violations (active constraint, non-positive depth) cost
    # their chi² gate value rather than dropping out: a candidate that
    # throws ALL its points behind the camera would otherwise mask to
    # cost 0 and be "accepted" — the masked-LM degenerate attractor.
    # Pricing a behind-camera point like an outlier AT the gate keeps the
    # collapse attractor expensive (N·thr ≫ any converged cost) without
    # distorting legitimate outlier shedding (same cost either side of
    # the camera plane). where() (not multiply) also keeps inf·0 from
    # minting NaN.
    bad_p = (p_active & ~ok_p).astype(dtype)
    cost = (jnp.sum(jnp.where(ok_p, cp, 0.0))
            + jnp.sum(jnp.where(l_active, cl, 0.0))
            + jnp.sum(bad_p * delta_p * delta_p))
    return _reduce(cost, axis_name), chi2_p, chi2_l, z


def _lm_phase(K, state, prob, p_active, l_active, deltas, use_huber, iters,
              axis_name=None):
    Tcw0, points0, lines0, lam0 = state
    # cost of the incoming state, carried across iterations so each LM step
    # evaluates the objective only ONCE (at the candidate state)
    cost0, *_ = _total_cost(
        K, Tcw0, points0, lines0, prob, p_active, l_active, deltas, use_huber,
        axis_name,
    )

    def body(carry, _):
        Tcw, points, lines, lam, cost_old = carry
        dp, dx, dl, _ = _build_and_solve(
            K, Tcw, points, lines, prob, p_active, l_active, use_huber, deltas,
            lam, axis_name,
        )
        # f32 trust region: a near-singular Schur solve can emit a huge
        # (or non-finite) step whose candidate state still masks to a
        # finite cost — e.g. a landmark flung to 1e30 m keeps x/z ~ O(1)
        # so its reprojection looks plausible while its next-iteration
        # Hessian terms overflow. Clamp steps to generous physical bounds
        # (healthy steps are orders of magnitude smaller) and never accept
        # a non-finite candidate. g2o runs in f64 where this margin is
        # astronomically unlikely to bind; in f32 it is load-bearing.
        dp = jnp.clip(dp, -10.0, 10.0)
        dx = jnp.clip(dx, -50.0, 50.0)
        dl = jnp.clip(dl, -10.0, 10.0)
        Tcw_new = jax.vmap(lambda d, T: se3.exp_se3(d) @ T)(dp, Tcw)
        points_new = points + dx
        lines_new = jax.vmap(plucker.orthonormal_update)(lines, dl)
        cost_new, *_ = _total_cost(
            K, Tcw_new, points_new, lines_new, prob, p_active, l_active,
            deltas, use_huber, axis_name,
        )
        finite = (
            jnp.isfinite(cost_new)
            & jnp.all(jnp.isfinite(dp)) & jnp.all(jnp.isfinite(dx))
            & jnp.all(jnp.isfinite(dl))
        )
        accept = (cost_new < cost_old) & finite
        Tcw = jnp.where(accept, Tcw_new, Tcw)
        points = jnp.where(accept, points_new, points)
        lines = jnp.where(accept, lines_new, lines)
        cost = jnp.where(accept, cost_new, cost_old)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e8)
        return (Tcw, points, lines, lam, cost), None

    (Tcw, points, lines, _, _), _ = jax.lax.scan(
        body, (Tcw0, points0, lines0, lam0, cost0), None, length=iters
    )
    return Tcw, points, lines


@partial(
    jax.jit,
    static_argnames=("chi2_mono", "chi2_stereo", "chi2_mono_line",
                     "chi2_stereo_line", "iters1", "iters2", "axis_name"),
)
def optimize_local_map(
    K: CameraIntrinsics,
    prob: BAProblem,
    chi2_mono: float = 50.0,
    chi2_stereo: float = 75.0,
    chi2_mono_line: float = 50.0,
    chi2_stereo_line: float = 75.0,
    iters1: int = 10,
    iters2: int = 5,
    axis_name: str | None = None,
) -> BAResult:
    """Full local BA with the reference's 10 → gate → 5 schedule.

    ``axis_name``: when called inside shard_map with the constraint arrays
    sharded over that mesh axis (and poses/points/lines replicated), the
    SAME schedule runs distributed — see sharded_constraints_ba."""
    deltas = (
        jnp.sqrt(chi2_mono),
        jnp.sqrt(chi2_stereo),
        jnp.sqrt(chi2_mono_line),
        jnp.sqrt(chi2_stereo_line),
    )
    thr_p = jnp.where(prob.p_stereo, chi2_stereo, chi2_mono)
    thr_l = jnp.where(prob.l_stereo, chi2_stereo_line, chi2_mono_line)
    dtype = prob.Tcw.dtype

    state = (prob.Tcw, prob.points, prob.lines, jnp.asarray(1e-4, dtype))
    # phase 1: robust kernels on, all valid constraints active
    Tcw, points, lines = _lm_phase(
        K, state, prob, prob.p_valid, prob.l_valid, deltas, True, iters1,
        axis_name,
    )
    # gate (chi² + positive depth), kernels dropped
    _, chi2_p, chi2_l, z = _total_cost(
        K, Tcw, points, lines, prob, prob.p_valid, prob.l_valid, deltas, False,
        axis_name,
    )
    p_active = prob.p_valid & (chi2_p <= thr_p) & (z > 1e-6)
    l_active = prob.l_valid & (chi2_l <= thr_l)
    # phase 2: plain quadratic on inliers
    state2 = (Tcw, points, lines, jnp.asarray(1e-4, dtype))
    Tcw, points, lines = _lm_phase(
        K, state2, prob, p_active, l_active, deltas, False, iters2, axis_name
    )
    # final inlier flags
    cost, chi2_p, chi2_l, z = _total_cost(
        K, Tcw, points, lines, prob, p_active, l_active, deltas, False,
        axis_name,
    )
    p_inlier = prob.p_valid & (chi2_p <= thr_p) & (z > 1e-6)
    l_inlier = prob.l_valid & (chi2_l <= thr_l)
    return BAResult(
        Tcw=Tcw, points=points, lines=lines,
        p_inlier=p_inlier, l_inlier=l_inlier, cost=cost,
    )


@jax.jit
def _pack_result(res: BAResult) -> jnp.ndarray:
    """Flatten a BAResult into one f32 vector — fetching each field
    separately is a blocking host↔device round trip apiece on a tunneled
    device; this makes the whole result ONE download."""
    f32 = jnp.float32
    return jnp.concatenate([
        res.Tcw.reshape(-1).astype(f32),
        res.points.reshape(-1).astype(f32),
        res.lines.reshape(-1).astype(f32),
        res.p_inlier.astype(f32),
        res.l_inlier.astype(f32),
        res.cost.reshape(1).astype(f32),
    ])


def fetch_result(res: BAResult) -> BAResult:
    """Materialize a device BAResult as numpy with a single round trip."""
    import numpy as np

    if isinstance(res.Tcw, np.ndarray):
        return res  # already host-side
    F = res.Tcw.shape[0]
    P = res.points.shape[0]
    L = res.lines.shape[0]
    Cp = res.p_inlier.shape[0]
    Cl = res.l_inlier.shape[0]
    buf = np.asarray(_pack_result(res))
    o = 0

    def take(n, shape):
        nonlocal o
        out = buf[o: o + n].reshape(shape)
        o += n
        return out

    return BAResult(
        Tcw=take(16 * F, (F, 4, 4)),
        points=take(3 * P, (P, 3)),
        lines=take(6 * L, (L, 6)),
        p_inlier=take(Cp, (Cp,)) > 0.5,
        l_inlier=take(Cl, (Cl,)) > 0.5,
        cost=buf[o],
    )
