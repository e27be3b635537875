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

__all__ = ["batched_windows_ba", "sharded_constraints_ba", "pad_constraints",
           "collective_traffic", "expected_collective_floats"]


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


def expected_collective_floats(F: int, P: int, L: int) -> int:
    """Floats psum-reduced per LM step by _build_and_solve's single
    collective — the exact sum over the reduced blocks:

      Hpp (F,6,6) + gp (F,6)            = F·42
      Hxx (P,3,3) + gx (P,3)            = P·12
      Hll (L,4,4) + gl (L,4)            = L·20
      Wx  (P,F,6,3)                     = P·F·18
      Wl  (L,F,6,4)                     = L·F·24
      cost ()                           = 1

    (The module docstring's earlier O(F²·36 + …) figure was conservative:
    the pose-pose Schur coupling S (F,6,F,6) is formed AFTER the psum on
    every device from the reduced blocks — only the BLOCK-diagonal Hpp
    crosses the interconnect, so the pose term is linear in F, not
    quadratic. Verified against the compiled HLO by collective_traffic.)"""
    return F * 42 + P * (12 + 18 * F) + L * (20 + 24 * F) + 1


def collective_traffic(K: CameraIntrinsics, prob: BAProblem, mesh: Mesh,
                       **kw) -> dict:
    """Compile the sharded solver and parse its HLO for cross-device
    collectives: returns {"ops": [(name, shapes, bytes)], "bytes_total",
    "per_occurrence_floats"} — the MEASURED per-LM-step interconnect
    volume, pinned against :func:`expected_collective_floats`. Collectives
    sit inside the LM while-loops, so each HLO occurrence fires once per
    LM step."""
    import re

    ndev = mesh.shape["data"]
    for name in ("p_valid", "l_valid"):
        if getattr(prob, name).shape[0] % ndev:
            prob = pad_constraints(prob, ndev)
            break
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
    txt = jax.jit(fn).lower(prob).compile().as_text()
    sizes = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
             "pred": 1, "s8": 1, "u8": 1}
    ops = []
    total = 0
    for m in re.finditer(
        r"= *((?:\([^)]*\))|(?:\w+\[[\d,]*\][^ ]*)) *"
        r"(all-reduce|all-reduce-start|reduce-scatter|all-gather)\(", txt
    ):
        restype, opname = m.group(1), m.group(2)
        shapes = re.findall(r"(\w+)\[([\d,]*)\]", restype)
        nbytes = 0
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * sizes.get(dt, 4)
        ops.append((opname, [f"{dt}[{dims}]" for dt, dims in shapes],
                    nbytes))
        total += nbytes
    return {
        "ops": ops,
        "bytes_total_per_step": total,
        "n_collectives": len(ops),
    }
