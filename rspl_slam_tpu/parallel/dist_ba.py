"""Distributed bundle adjustment over a device mesh.

Two scaling patterns, replacing the reference's single-threaded g2o solve
(g2o_optimization.cc:171-210) — these are the collectives the north star
asks for (BASELINE.json):

1. :func:`batched_windows_ba` — many independent BA windows vmapped and
   sharded over the ``data`` axis (multi-sequence / multi-window mapping).
   No cross-device coupling: XLA runs one window per device group; scaling
   is embarrassing.

2. :func:`sharded_constraints_ba` — ONE large window whose constraints are
   sharded over the ``data`` axis via ``shard_map``, running the FULL
   ``optimize_local_map`` schedule (Huber IRLS, LM accept/reject,
   10 → chi² gate → 5, points AND lines). Each device assembles partial
   normal-equation blocks from its constraint shard; a ``psum`` reduces
   them and the small dense Schur solve is replicated. The O(C)
   Jacobian/assembly work — the dominant cost — scales linearly with
   devices, and only O(F²·36 + (P·3 + L·4)·(F·6 + dl)) floats cross the
   interconnect per LM step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rspl_slam_tpu.backend import local_ba
from rspl_slam_tpu.backend.local_ba import BAProblem, BAResult
from rspl_slam_tpu.backend.residuals import CameraIntrinsics

__all__ = ["batched_windows_ba", "sharded_constraints_ba", "pad_constraints"]


def batched_windows_ba(K: CameraIntrinsics, probs: BAProblem, mesh: Mesh,
                       **kw) -> BAResult:
    """Optimize a BATCH of BA windows, one per leading-axis element, sharded
    over the mesh's ``data`` axis. ``probs`` fields all carry a leading W
    axis (use jax.tree.map(stack) to batch BAProblems)."""
    shard = NamedSharding(mesh, P("data"))
    probs = jax.tree.map(lambda x: jax.device_put(x, shard), probs)
    fn = jax.vmap(lambda p: local_ba.optimize_local_map(K, p, **kw))
    return jax.jit(fn)(probs)


def pad_constraints(prob: BAProblem, ndev: int) -> BAProblem:
    """Pad the constraint dimensions of ``prob`` to multiples of ``ndev``
    (padding slots: index 0, valid=False) so they shard evenly."""
    def pad_to(x, n):
        c = x.shape[0]
        r = (-c) % n
        if r == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((r,) + x.shape[1:], x.dtype)], axis=0
        )

    return prob._replace(
        p_pose=pad_to(prob.p_pose, ndev), p_point=pad_to(prob.p_point, ndev),
        p_meas=pad_to(prob.p_meas, ndev), p_stereo=pad_to(prob.p_stereo, ndev),
        p_valid=pad_to(prob.p_valid, ndev),
        l_pose=pad_to(prob.l_pose, ndev), l_line=pad_to(prob.l_line, ndev),
        l_eps=pad_to(prob.l_eps, ndev), l_eps_r=pad_to(prob.l_eps_r, ndev),
        l_stereo=pad_to(prob.l_stereo, ndev),
        l_valid=pad_to(prob.l_valid, ndev),
    )


def sharded_constraints_ba(
    K: CameraIntrinsics,
    prob: BAProblem,
    mesh: Mesh,
    **kw,
) -> BAResult:
    """``optimize_local_map`` — the FULL reference schedule (Huber IRLS,
    LM accept/reject, 10 → chi² gate → 5, point AND line constraints;
    g2o_optimization.cc:21-252) — with the constraint dimension sharded over
    the mesh's ``data`` axis.

    Poses/points/lines are replicated; each device assembles normal-equation
    blocks from its constraint shard; one psum per LM step reduces them
    (see local_ba._build_and_solve) and the small dense Schur solve runs
    replicated. Semantics match the single-device solver exactly up to
    reduction order — same code path, parameterized by ``axis_name``.

    Constraint array lengths must divide by the data-axis size (use
    :func:`pad_constraints`). ``kw`` forwards chi² thresholds / iteration
    counts to ``optimize_local_map``.
    """
    ndev = mesh.shape["data"]
    for name in ("p_valid", "l_valid"):
        if getattr(prob, name).shape[0] % ndev:
            raise ValueError(
                f"{name} length {getattr(prob, name).shape[0]} not divisible "
                f"by data-axis size {ndev}; call pad_constraints first"
            )

    rep = P()
    shd = P("data")
    in_spec = BAProblem(
        Tcw=rep, pose_fixed=rep, points=rep, lines=rep,
        p_pose=shd, p_point=shd, p_meas=shd, p_stereo=shd, p_valid=shd,
        l_pose=shd, l_line=shd, l_eps=shd, l_eps_r=shd, l_stereo=shd,
        l_valid=shd,
    )
    out_spec = BAResult(
        Tcw=rep, points=rep, lines=rep, p_inlier=shd, l_inlier=shd, cost=rep,
    )

    fn = shard_map(
        lambda p: local_ba.optimize_local_map(K, p, axis_name="data", **kw),
        mesh=mesh, in_specs=(in_spec,), out_specs=out_spec,
    )
    return jax.jit(fn)(prob)
