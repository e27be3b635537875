"""Multi-host initialization + mesh helpers.

The reference is single-process (SURVEY §2.2); here scaling past one host
uses jax.distributed: every host runs the same program, ICI carries
collectives within a slice and DCN across hosts — the mesh API is
identical either way, so the dist_ba/batched code paths need no changes.

Typical pod-slice launch (one command per host):

    python -c "from rspl_slam_tpu.parallel import multihost as mh; \
               mh.initialize(); ..."

with the coordinator address in JAX_COORDINATOR_ADDRESS (or passed
explicitly). On a single host :func:`initialize` is a no-op, so the same
entry point works everywhere.
"""

from __future__ import annotations

import os

import jax

__all__ = ["initialize", "global_mesh", "is_multihost", "local_batch_slice"]


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Init jax.distributed when a multi-process launch is configured —
    through explicit args, JAX_COORDINATOR_ADDRESS, or a TPU pod
    environment (auto-detected by jax). Safe to call unconditionally."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None
    )
    pid = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None
    )
    if coordinator is None and num is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num,
        process_id=pid,
    )


def is_multihost() -> bool:
    return jax.process_count() > 1


def global_mesh(n_model: int = 1):
    """Data×model mesh over ALL devices across hosts. XLA routes the
    ``data``-axis collectives over ICI within a slice and DCN across — this
    is where the distributed Schur psum (parallel/dist_ba.py) rides."""
    from rspl_slam_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=jax.device_count() // n_model, n_model=n_model,
                     devices=jax.devices())


def local_batch_slice(global_batch: int) -> slice:
    """Which slice of a globally-sharded leading axis this host should
    produce (keyframe/window sharding across hosts: each host feeds its own
    sequences/windows; per-host covisibility/culling stays local)."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
