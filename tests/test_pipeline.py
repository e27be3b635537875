"""Pipelined runner tests: equivalence with the serial path + backpressure."""

import numpy as np
import pytest

from rspl_slam_tpu.config import PipelineConfig, SuperPointConfig, SystemConfig
from rspl_slam_tpu.datasets import StereoFrame
from rspl_slam_tpu.evaluation import absolute_trajectory_error, synthetic
from rspl_slam_tpu.frontend.frontends import OracleFrontend
from rspl_slam_tpu.pipeline import PipelinedRunner
from rspl_slam_tpu.slam import INIT_POSE, SLAMSystem


class _OracleDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return StereoFrame(index=i, time=i * 0.05, image_left=None,
                           image_right=None)


def build(n_frames, seed=0):
    cfg = SystemConfig(
        superpoint=SuperPointConfig(max_keypoints=256),
        pipeline=PipelineConfig(ba_max_points=512, ba_max_lines=8),
        use_lines=False,
    )
    scene = synthetic.make_scene(num_points=800, num_lines=0, seed=seed,
                                 extent=(10.0, 6.0, 16.0))
    traj = synthetic.make_trajectory(n_frames, step=0.05)
    fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=seed)
    fe.poses = traj
    return SLAMSystem(cfg, fe), traj


class TestPipelinedRunner:
    def test_matches_serial_results(self):
        n = 25
        slam_p, traj = build(n, seed=1)
        runner = PipelinedRunner(slam_p, _OracleDataset(n))
        records = runner.run()
        assert len(records) == n
        est = np.stack([r.Twc for r in records])
        ts = np.asarray([r.time for r in records])
        gt = np.einsum("ij,njk->nik", INIT_POSE, traj)
        res = absolute_trajectory_error(ts, est[:, :3, 3], ts, gt[:, :3, 3])
        assert res["rmse"] < 0.01, res
        # serial run with identical config/seed produces the same keyframes
        slam_s, _ = build(n, seed=1)
        for i in range(n):
            slam_s.add_frame(i, i * 0.05, None, None)
        assert slam_s.map.n_kf == slam_p.map.n_kf
        np.testing.assert_allclose(
            slam_s.map.kf_pose[: slam_s.map.n_kf],
            slam_p.map.kf_pose[: slam_p.map.n_kf], atol=1e-9,
        )

    def test_manual_feed(self):
        n = 10
        slam, traj = build(n, seed=2)
        runner = PipelinedRunner(slam)
        import threading

        def feeder():
            for i in range(n):
                runner.feed(i, i * 0.05, None, None)
            runner.close_input()

        th = threading.Thread(target=feeder)
        th.start()
        records = runner.run_manual()
        th.join()
        assert len(records) == n

    def test_dataset_error_surfaces(self):
        class Bad:
            def __len__(self):
                return 3

            def __getitem__(self, i):
                if i == 1:
                    raise IOError("corrupt frame")
                return StereoFrame(index=i, time=0.0, image_left=None,
                                   image_right=None)

        slam, _ = build(3, seed=3)
        runner = PipelinedRunner(slam, Bad())
        with pytest.raises(IOError):
            runner.run()
