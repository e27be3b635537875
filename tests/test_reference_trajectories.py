"""Validate the TUM trajectory reader and the in-repo ATE tool against the
reference's ONLY quantitative artifacts: the nine checked-in OIVIO keyframe
trajectories (AirVO_output/oivio/our_oivio_*.txt — the inputs to
run_batch.py:29-48's `evo_ape tum ... -a` protocol).

These files are known-good TUM outputs of the reference system itself, so:

- our reader must parse every one (format parity with map.cc:1007-1024);
- write→read must round-trip bit-close (our writer emits the same layout);
- the ATE tool must score a trajectory against ITSELF as ~0;
- ATE must be invariant to an arbitrary SE(3) transform of the estimate
  (that is what `-a` / Umeyama alignment means);
- and quaternions must be unit-norm with orthonormal rotation blocks.
"""

import glob
import os

import numpy as np
import pytest

from rspl_slam_tpu.datasets import read_tum_trajectory, write_tum_trajectory
from rspl_slam_tpu.evaluation.ate import (absolute_trajectory_error,
                                          align_umeyama)

REF_DIR = "/root/reference/AirVO_output/oivio"
REF_FILES = sorted(glob.glob(os.path.join(REF_DIR, "our_oivio_*.txt")))

pytestmark = pytest.mark.skipif(
    not REF_FILES, reason="reference trajectory artifacts not mounted"
)


def _rand_se3(rng):
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    T = np.eye(4)
    T[:3, :3] = Q
    T[:3, 3] = rng.uniform(-5, 5, 3)
    return T


class TestReferenceTrajectories:
    def test_all_nine_parse(self):
        assert len(REF_FILES) == 9
        for f in REF_FILES:
            times, poses = read_tum_trajectory(f)
            assert len(times) >= 50, f
            # timestamps strictly increasing (keyframe insertion order)
            assert np.all(np.diff(times) > 0), f
            # rotation blocks orthonormal: RᵀR = I
            RtR = np.einsum("nij,nik->njk", poses[:, :3, :3],
                            poses[:, :3, :3])
            np.testing.assert_allclose(
                RtR, np.tile(np.eye(3), (len(times), 1, 1)), atol=1e-6
            )
            assert np.isfinite(poses).all(), f

    def test_first_pose_is_reference_init(self):
        """Every OIVIO run starts at the reference's hard-coded
        gravity-aligned init pose (map_builder.cc:368-371): t=(0,0,1),
        q=(x=-0.7071, w=0.7071) — i.e. the INIT_POSE our slam.py pins."""
        from rspl_slam_tpu.slam import INIT_POSE

        for f in REF_FILES:
            _, poses = read_tum_trajectory(f)
            np.testing.assert_allclose(poses[0], INIT_POSE, atol=1e-6)

    def test_round_trip_write_read(self, tmp_path):
        for f in REF_FILES[:3]:
            times, poses = read_tum_trajectory(f)
            out = str(tmp_path / os.path.basename(f))
            write_tum_trajectory(out, times, poses)
            t2, p2 = read_tum_trajectory(out)
            np.testing.assert_allclose(t2, times, rtol=0, atol=5e-7)
            np.testing.assert_allclose(p2[:, :3, 3], poses[:, :3, 3],
                                       atol=1e-8)
            # rotations equal up to quaternion double-cover
            np.testing.assert_allclose(p2[:, :3, :3], poses[:, :3, :3],
                                       atol=1e-6)

    def test_self_ate_is_zero(self):
        for f in REF_FILES:
            times, poses = read_tum_trajectory(f)
            p = poses[:, :3, 3]
            res = absolute_trajectory_error(times, p, times, p)
            assert res["n"] == len(times)
            assert res["rmse"] < 1e-9, (f, res)

    def test_ate_alignment_invariance(self):
        """ATE(T·traj, traj) ≈ 0 for any rigid T — the Umeyama alignment
        must absorb an arbitrary SE(3) offset, exactly like evo's -a."""
        rng = np.random.default_rng(0)
        for f in REF_FILES[:4]:
            times, poses = read_tum_trajectory(f)
            p = poses[:, :3, 3]
            T = _rand_se3(rng)
            p_moved = p @ T[:3, :3].T + T[:3, 3]
            res = absolute_trajectory_error(times, p_moved, times, p)
            assert res["rmse"] < 1e-7, (f, res)

    def test_ate_detects_known_perturbation(self):
        """Inject a known non-rigid error: RMSE must reflect it (the tool
        can't be fooled into reporting ~0 for a genuinely different path)."""
        rng = np.random.default_rng(1)
        times, poses = read_tum_trajectory(REF_FILES[0])
        p = poses[:, :3, 3]
        noise = rng.standard_normal(p.shape) * 0.05
        noise -= noise.mean(0)  # keep the centroid (alignment can't absorb)
        res = absolute_trajectory_error(times, p + noise, times, p)
        # rigid alignment cannot remove iid noise: expect ~N(0, 0.05) rmse
        assert 0.02 < res["rmse"] < 0.09, res

    def test_umeyama_recovers_known_transform(self):
        times, poses = read_tum_trajectory(REF_FILES[1])
        p = poses[:, :3, 3]
        rng = np.random.default_rng(2)
        T = _rand_se3(rng)
        moved = p @ T[:3, :3].T + T[:3, 3]
        s, R, t = align_umeyama(moved, p)
        np.testing.assert_allclose(s, 1.0)
        np.testing.assert_allclose(R @ T[:3, :3], np.eye(3), atol=1e-9)

    def test_cross_sequence_ate_protocol(self):
        """Run the full run_batch.py-equivalent scoring loop over all nine
        artifacts (each against itself, associating by timestamp) — the
        in-repo analogue of the reference's batch evo protocol."""
        scores = {}
        for f in REF_FILES:
            times, poses = read_tum_trajectory(f)
            res = absolute_trajectory_error(
                times, poses[:, :3, 3], times, poses[:, :3, 3]
            )
            scores[os.path.basename(f)] = res["rmse"]
        assert len(scores) == 9
        assert all(v < 1e-9 for v in scores.values())
