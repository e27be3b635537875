"""Pipelined-driver tests: overlap throughput, per-frame publishing
(FramePublisher), and dataset-layout detection (EuRoC raw / left-right /
short filenames) — VERDICT round-1 items 5 and 8."""

import os
import threading
import time

import numpy as np
import pytest

from rspl_slam_tpu.datasets import EurocDataset, StereoFrame, open_dataset
from rspl_slam_tpu.pipeline import PipelinedRunner


# ---------------------------------------------------------------------------
# throughput: extract ∥ track overlap
# ---------------------------------------------------------------------------


class _StubFrontend:
    def __init__(self, delay):
        self.delay = delay

    def extract_pair(self, il, ir):
        time.sleep(self.delay)
        return object()


class _StubSLAM:
    """Minimal consumer: tracking stage is a fixed-cost sleep."""

    def __init__(self, extract_delay, track_delay):
        self.frontend = _StubFrontend(extract_delay)
        self.track_delay = track_delay

    def add_frame_features(self, index, t, feats):
        time.sleep(self.track_delay)
        return index


class _StubDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return StereoFrame(index=i, time=float(i), image_left=None,
                           image_right=None)


def test_pipeline_overlaps_extract_and_track():
    """With comparable per-stage latencies the pipelined runner must beat
    the serial loop by ≥1.3× (the reference's two-thread motivation,
    map_builder.cc:48-49)."""
    n, te, tt = 20, 0.02, 0.02
    slam = _StubSLAM(te, tt)
    t0 = time.perf_counter()
    for i in range(n):
        slam.add_frame_features(i, float(i), slam.frontend.extract_pair(None, None))
    serial = time.perf_counter() - t0

    slam = _StubSLAM(te, tt)
    runner = PipelinedRunner(slam, _StubDataset(n))
    t0 = time.perf_counter()
    records = runner.run()
    piped = time.perf_counter() - t0
    assert len(records) == n
    assert serial / piped >= 1.3, (serial, piped)


def test_on_record_hook_called_per_frame():
    seen = []
    slam = _StubSLAM(0.0, 0.0)
    runner = PipelinedRunner(slam, _StubDataset(7),
                             on_record=lambda rec, feats: seen.append(rec))
    runner.run()
    assert seen == list(range(7))


# ---------------------------------------------------------------------------
# FramePublisher: per-frame overlay + pose stream
# ---------------------------------------------------------------------------


def test_frame_publisher_writes_overlays_and_poses(tmp_path):
    from rspl_slam_tpu.config import SuperPointConfig, SystemConfig
    from rspl_slam_tpu.evaluation import synthetic
    from rspl_slam_tpu.frontend.frontends import OracleFrontend
    from rspl_slam_tpu.slam import SLAMSystem
    from rspl_slam_tpu.visualization import FramePublisher

    cfg = SystemConfig(superpoint=SuperPointConfig(max_keypoints=128),
                       use_lines=False)
    scene = synthetic.make_scene(num_points=400, num_lines=0, seed=0)
    traj = synthetic.make_trajectory(8, step=0.05)
    fe = OracleFrontend(cfg, scene, noise_px=0.3, seed=0)
    fe.poses = traj
    slam = SLAMSystem(cfg, fe)
    H, W = cfg.camera.image_height, cfg.camera.image_width
    pub = FramePublisher(str(tmp_path), overlay_stride=2)

    class _Ds:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return StereoFrame(index=i, time=i * 0.05, image_left=None,
                               image_right=None)

    def on_record(rec, feats):
        # the oracle frontend carries no pixels; attach a synthetic image
        # the way NeuralFrontend(keep_images=True) does
        feats.image = np.zeros((H, W), np.float32)
        pub(rec, feats)

    PipelinedRunner(slam, _Ds(), on_record=on_record).run()
    pub.close()
    with open(pub.pose_path) as f:
        lines = [ln for ln in f if ln.strip()]
    assert len(lines) == 8
    assert len(lines[0].split()) == 8  # TUM: t x y z qx qy qz qw
    pngs = sorted(p for p in os.listdir(tmp_path) if p.endswith(".png"))
    # stride 2 over 8 frames = 4 submissions; overlays MAY drop under a
    # full queue (by design — they never backpressure tracking)
    assert 2 <= len(pngs) <= 4


def test_quat_roundtrip():
    from rspl_slam_tpu.visualization import _quat_from_rot_np

    rng = np.random.default_rng(0)
    for _ in range(20):
        v = rng.standard_normal(3)
        th = np.linalg.norm(v)
        k = v / th
        Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
        w, x, y, z = _quat_from_rot_np(R)
        # rebuild R from quaternion and compare
        R2 = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(R2, R, atol=1e-9)


# ---------------------------------------------------------------------------
# dataset layout detection
# ---------------------------------------------------------------------------


def _write_png(path, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (8, 10), dtype=np.uint8)).save(path)


def _make_pair_dirs(root, left_sub, right_sub, names):
    ld = os.path.join(root, left_sub)
    rd = os.path.join(root, right_sub)
    os.makedirs(ld)
    os.makedirs(rd)
    for n in names:
        _write_png(os.path.join(ld, n))
        _write_png(os.path.join(rd, n))
    return ld, rd


def test_euroc_converted_layout(tmp_path):
    names = ["1403636579763555584.png", "1403636579813555456.png"]
    _make_pair_dirs(str(tmp_path), "cam0/data", "cam1/data", names)
    ds = open_dataset(str(tmp_path))
    assert len(ds) == 2
    assert abs(ds.timestamp(0) - 1403636579.763555584) < 1e-6
    fr = ds[0]
    assert fr.image_left.shape == (8, 10)


def test_euroc_raw_layout_with_csv(tmp_path):
    names = ["100.png", "101.png", "102.png"]
    root = str(tmp_path)
    _make_pair_dirs(os.path.join(root, "mav0"), "cam0/data", "cam1/data", names)
    with open(os.path.join(root, "mav0", "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i, n in enumerate(names):
            f.write(f"{1403636579763555584 + i * 50000000},{n}\n")
    ds = open_dataset(root)
    assert len(ds) == 3
    assert abs(ds.timestamp(1) - 1403636579.813555584) < 1e-6


def test_left_right_layout_short_names(tmp_path):
    names = ["000000.png", "000001.png", "000002.png"]
    _make_pair_dirs(str(tmp_path), "left", "right", names)
    ds = open_dataset(str(tmp_path))
    assert len(ds) == 3
    # short non-ns filenames → deterministic index-based time at 20 Hz
    assert ds.timestamp(2) == pytest.approx(0.1)


def test_missing_layout_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        open_dataset(str(tmp_path))
