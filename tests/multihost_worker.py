"""Worker for the 2-process jax.distributed test (test_multihost.py).

Each process: initialize the distributed runtime against a localhost
coordinator, build the SAME deterministic BA problem, construct globally
sharded arrays over the cross-process mesh, run the full sharded
constraint BA, and print the converged cost + pose checksum for the
parent test to compare against the single-process solver.

Run as:  python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (package import)
sys.path.insert(0, _HERE)  # tests dir (build_problem import)

from rspl_slam_tpu.backend.local_ba import BAProblem, BAResult  # noqa: E402
from rspl_slam_tpu.parallel import dist_ba, multihost as mh  # noqa: E402

mh.initialize(coordinator=f"localhost:{port}", num_processes=nproc,
              process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc, jax.device_count()
assert mh.is_multihost() == (nproc > 1)

from test_local_ba import K, build_problem  # noqa: E402

prob, Tcw_gt, pts_gt, lines_gt, bad = build_problem(
    seed=5, noise_px=0.4, perturb=True, with_lines=True, outlier_frac=0.2
)
mesh = mh.global_mesh()
ndev = mesh.shape["data"]
prob = dist_ba.pad_constraints(prob, ndev)

# every process holds the identical FULL problem; build global arrays by
# letting each process contribute the shards its local devices own
rep = P()
shd = P("data")
in_spec = BAProblem(
    Tcw=rep, pose_fixed=rep, points=rep, lines=rep,
    p_pose=shd, p_point=shd, p_meas=shd, p_stereo=shd, p_valid=shd,
    l_pose=shd, l_line=shd, l_eps=shd, l_eps_r=shd, l_stereo=shd,
    l_valid=shd,
)


def global_put(x, spec):
    x = np.asarray(x)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


gprob = BAProblem(*(global_put(x, s) for x, s in zip(prob, in_spec)))
res = dist_ba.sharded_constraints_ba(K, gprob, mesh)

# replicated outputs are fully addressable on every process
Tcw = np.asarray(jax.device_get(
    res.Tcw.addressable_shards[0].data if hasattr(res.Tcw, "addressable_shards")
    else res.Tcw))
cost = float(np.asarray(jax.device_get(
    res.cost.addressable_shards[0].data
    if hasattr(res.cost, "addressable_shards") else res.cost)))
pose_err = float(np.linalg.norm(Tcw[:, :3, 3] - Tcw_gt[:, :3, 3], axis=1).max())
print(f"RESULT pid={pid} cost={cost:.8e} pose_err={pose_err:.8e} "
      f"tsum={float(np.abs(Tcw).sum()):.8e}", flush=True)
