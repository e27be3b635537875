"""Distributed bundle adjustment over a device mesh.

Two scaling patterns, replacing the reference's single-threaded g2o solve
(g2o_optimization.cc:171-210) — these are the collectives the north star
asks for (BASELINE.json):

1. :func:`batched_windows_ba` — many independent BA windows vmapped and
   sharded over the ``data`` axis (multi-sequence / multi-window mapping).
   No cross-device coupling: XLA runs one window per device group; scaling
   is embarrassing.

2. :func:`sharded_constraints_ba` — ONE large window whose constraints are
   sharded over the ``data`` axis via ``shard_map``. Each device assembles
   partial Gauss-Newton blocks (Hpp, g, landmark diagonals, the W cross
   tensor) from its constraint shard; a ``psum`` over the mesh reduces the
   camera-block system; the small reduced solve is replicated. This is the
   distributed Schur reduction: the O(C) Jacobian/assembly work — the
   dominant cost — scales linearly with devices, and only O(F²·36 + P·18)
   bytes cross the interconnect per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rspl_slam_tpu.backend import local_ba
from rspl_slam_tpu.backend.local_ba import BAProblem, BAResult
from rspl_slam_tpu.backend.residuals import CameraIntrinsics
from rspl_slam_tpu.geometry import plucker, se3

__all__ = ["batched_windows_ba", "sharded_constraints_ba"]


def batched_windows_ba(K: CameraIntrinsics, probs: BAProblem, mesh: Mesh,
                       **kw) -> BAResult:
    """Optimize a BATCH of BA windows, one per leading-axis element, sharded
    over the mesh's ``data`` axis. ``probs`` fields all carry a leading W
    axis (use jax.tree.map(stack) to batch BAProblems)."""
    shard = NamedSharding(mesh, P("data"))
    probs = jax.tree.map(lambda x: jax.device_put(x, shard), probs)
    fn = jax.vmap(lambda p: local_ba.optimize_local_map(K, p, **kw))
    return jax.jit(fn)(probs)


@partial(jax.jit, static_argnames=("mesh", "iters"))
def sharded_constraints_ba(
    K: CameraIntrinsics,
    prob: BAProblem,
    mesh: Mesh,
    iters: int = 10,
) -> BAResult:
    """Gauss-Newton BA with the constraint dimension sharded over ``data``.

    Point-only path (lines ride along unchanged for now — line constraint
    counts are tiny compared to points; they stay replicated). The constraint
    arrays of ``prob`` must have length divisible by the data-axis size.
    """
    from rspl_slam_tpu.backend import residuals as res

    F = prob.Tcw.shape[0]
    Pn = prob.points.shape[0]
    dtype = prob.Tcw.dtype
    ndev = mesh.shape["data"]

    def partial_blocks(Tcw, points, p_pose, p_point, p_meas, p_stereo, p_valid):
        """Per-shard assembly of GN blocks — runs on each device with its
        local constraint shard, then psum-reduces over the mesh."""
        Tcw_c = Tcw[p_pose]
        Xw = points[p_point]

        def one(T, X, m, st):
            r, z = res.point_residual(K, T, X[None], m[None], st[None])
            Jp = res.point_pose_jacobian(K, T, X[None], st[None])
            Jx = res.point_landmark_jacobian(K, T, X[None], st[None])
            return r[0], z[0], Jp[0], Jx[0]

        r, z, Jp, Jx = jax.vmap(one)(Tcw_c, Xw, p_meas, p_stereo)
        w = (p_valid & (z > 1e-6)).astype(dtype)
        JpW = Jp * w[:, None, None]
        Hpp = jax.ops.segment_sum(
            jnp.einsum("cij,cik->cjk", JpW, Jp), p_pose, num_segments=F
        )
        gp = jax.ops.segment_sum(
            jnp.einsum("cij,ci->cj", JpW, r), p_pose, num_segments=F
        )
        JxW = Jx * w[:, None, None]
        Hxx = jax.ops.segment_sum(
            jnp.einsum("cij,cik->cjk", JxW, Jx), p_point, num_segments=Pn
        )
        gx = jax.ops.segment_sum(
            jnp.einsum("cij,ci->cj", JxW, r), p_point, num_segments=Pn
        )
        comb = p_point * F + p_pose
        W = jax.ops.segment_sum(
            jnp.einsum("cij,cik->cjk", JpW, Jx), comb, num_segments=Pn * F
        ).reshape(Pn, F, 6, 3)
        # reduce the camera-block system over the mesh — THE collective of
        # the distributed Schur BA
        Hpp = jax.lax.psum(Hpp, "data")
        gp = jax.lax.psum(gp, "data")
        Hxx = jax.lax.psum(Hxx, "data")
        gx = jax.lax.psum(gx, "data")
        W = jax.lax.psum(W, "data")
        return Hpp, gp, Hxx, gx, W

    pspec_rep = P()
    pspec_shard = P("data")
    assemble = shard_map(
        partial_blocks,
        mesh=mesh,
        in_specs=(pspec_rep, pspec_rep, pspec_shard, pspec_shard, pspec_shard,
                  pspec_shard, pspec_shard),
        out_specs=(pspec_rep,) * 5,
    )

    def gn_step(carry, _):
        Tcw, points = carry
        Hpp, gp, Hxx, gx, W = assemble(
            Tcw, points, prob.p_pose, prob.p_point, prob.p_meas,
            prob.p_stereo, prob.p_valid,
        )
        lam = jnp.asarray(1e-4, dtype)
        Hxx_d = Hxx + (lam * jnp.diagonal(Hxx, axis1=-2, axis2=-1))[..., :, None] \
            * jnp.eye(3, dtype=dtype) + 1e-8 * jnp.eye(3, dtype=dtype)
        Hxx_inv = jnp.linalg.inv(Hxx_d)
        S = jnp.zeros((F, 6, F, 6), dtype)
        S = S.at[jnp.arange(F), :, jnp.arange(F), :].add(
            Hpp + lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1)[..., :, None]
            * jnp.eye(6, dtype=dtype) + 1e-8 * jnp.eye(6, dtype=dtype)
        )
        WD = jnp.einsum("pfij,pjk->pfik", W, Hxx_inv)
        S = S - jnp.einsum("pfik,pgjk->figj", WD, W)
        gt = gp - jnp.einsum("pfik,pk->fi", WD, gx)
        free = (~prob.pose_fixed).astype(dtype)
        S = S * (free[:, None, None, None] * free[None, None, :, None])
        S = S.at[jnp.arange(F), :, jnp.arange(F), :].add(
            (1.0 - free)[:, None, None] * jnp.eye(6, dtype=dtype)
        )
        gt = gt * free[:, None]
        dp = -jnp.linalg.solve(S.reshape(F * 6, F * 6), gt.reshape(F * 6))
        dp = dp.reshape(F, 6) * free[:, None]
        dx = -jnp.einsum("pjk,pk->pj", Hxx_inv,
                         gx + jnp.einsum("pfij,fi->pj", W, dp))
        Tcw = jax.vmap(lambda d, T: se3.exp_se3(d) @ T)(dp, Tcw)
        return (Tcw, points + dx), None

    (Tcw, points), _ = jax.lax.scan(gn_step, (prob.Tcw, prob.points), None,
                                    length=iters)
    return BAResult(
        Tcw=Tcw, points=points, lines=prob.lines,
        p_inlier=prob.p_valid, l_inlier=prob.l_valid,
        cost=jnp.asarray(0.0, dtype),
    )
