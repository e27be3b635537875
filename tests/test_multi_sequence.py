"""Multi-sequence batched mapping: N oracle sequences in lockstep with
batched BA; every map must reach single-sequence quality."""

import numpy as np
import pytest

from rspl_slam_tpu.config import PipelineConfig, SuperPointConfig, SystemConfig
from rspl_slam_tpu.evaluation import absolute_trajectory_error, synthetic
from rspl_slam_tpu.frontend.frontends import OracleFrontend
from rspl_slam_tpu.parallel import mesh as meshlib
from rspl_slam_tpu.parallel.multi_sequence import MultiSequenceSLAM
from rspl_slam_tpu.slam import INIT_POSE


def build_world(n_seq, n_frames):
    cfg = SystemConfig(
        superpoint=SuperPointConfig(max_keypoints=256),
        pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=8),
        use_lines=False,
    )
    fes, trajs = [], []
    for s in range(n_seq):
        scene = synthetic.make_scene(num_points=800, num_lines=0, seed=100 + s,
                                     extent=(10.0, 6.0, 16.0))
        traj = synthetic.make_trajectory(n_frames, step=0.05,
                                         yaw_rate=0.002 * (s + 1))
        fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=100 + s)
        fe.poses = traj
        fes.append(fe)
        trajs.append(traj)
    return cfg, fes, trajs


class TestMultiSequence:
    def test_four_sequences_batched_ba(self):
        n_seq, n_frames = 4, 30
        cfg, fes, trajs = build_world(n_seq, n_frames)
        mesh = meshlib.make_mesh(n_data=4)
        msq = MultiSequenceSLAM(cfg, fes, mesh=mesh)
        for i in range(n_frames):
            msq.step([(i, i * 0.05, None, None)] * n_seq)
        for s in range(n_seq):
            slam = msq.slams[s]
            est = np.stack([r.Twc for r in slam.records])
            ts = np.asarray([r.time for r in slam.records])
            gt = np.einsum("ij,njk->nik", INIT_POSE, trajs[s])
            res = absolute_trajectory_error(ts, est[:, :3, 3], ts, gt[:, :3, 3])
            assert res["rmse"] < 0.01, (s, res)
            assert slam.map.n_kf >= 2  # keyframes + batched BA ran

    def test_batched_neural_extraction_matches_serial(self):
        """extract_pairs_batched must produce the same features/matches as
        per-sequence extract_pair calls."""
        import jax

        from rspl_slam_tpu.config import CameraConfig
        from rspl_slam_tpu.frontend.frontends import NeuralFrontend

        cam = CameraConfig(image_width=96, image_height=64, fx=80.0, fy=80.0,
                           cx=48.0, cy=32.0, bf=8.0)
        cfg = SystemConfig(
            superpoint=SuperPointConfig(max_keypoints=64,
                                        keypoint_threshold=1e-4),
            camera=cam, use_lines=False,
        )
        fe0 = NeuralFrontend(cfg, matcher="cosine", seed=0)
        fe1 = NeuralFrontend(cfg, sp_params=fe0.sp_params,
                             sg_params=fe0.sg_params, matcher="cosine")
        rng = np.random.default_rng(0)
        pairs = [
            (rng.uniform(size=(64, 96)).astype(np.float32),
             rng.uniform(size=(64, 96)).astype(np.float32))
            for _ in range(2)
        ]
        batched = fe0.extract_pairs_batched(pairs, [fe0, fe1])
        for s in range(2):
            serial = fe0.extract_pair(*pairs[s])
            np.testing.assert_allclose(batched[s].xy, serial.xy, atol=1e-4)
            np.testing.assert_allclose(batched[s].meas, serial.meas, atol=1e-4)
            assert (batched[s].valid == serial.valid).all()

    def test_sequences_of_different_length(self):
        cfg, fes, trajs = build_world(2, 20)
        msq = MultiSequenceSLAM(cfg, fes)
        for i in range(20):
            frames = [(i, i * 0.05, None, None),
                      (i, i * 0.05, None, None) if i < 12 else None]
            recs = msq.step(frames)
            if i >= 12:
                assert recs[1] is None
        assert len(msq.slams[0].records) == 20
        assert len(msq.slams[1].records) == 12
