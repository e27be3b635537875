"""Live ingestion driver (cli serve) — the ROS-free ros_main.cpp
equivalent: frames arriving in a watched directory are paired by filename
and fed through the pipelined runner while the producer keeps writing."""

import os
import threading
import time

import numpy as np
import pytest

from rspl_slam_tpu import cli
from rspl_slam_tpu.config import CameraConfig
from rspl_slam_tpu.evaluation import synthetic

W, H = 320, 240
CAM = CameraConfig(image_width=W, image_height=H, fx=240.0, fy=240.0,
                   cx=160.0, cy=120.0, bf=24.0, depth_upper_thr=20.0)


def _write_png(path, img):
    from PIL import Image

    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
        path, format="PNG")


def _render_frames(n=10):
    scene = synthetic.make_scene(num_points=500, num_lines=6, seed=1,
                                 extent=(6.0, 4.0, 6.0), on_line_frac=0.0)
    traj = synthetic.make_trajectory(n, step=0.06)
    return [synthetic.render_images(scene, CAM, traj[i], seed=i)
            for i in range(n)]


def test_serve_ingests_live_frames(tmp_path):
    d0 = tmp_path / "cam0" / "data"
    d1 = tmp_path / "cam1" / "data"
    d0.mkdir(parents=True)
    d1.mkdir(parents=True)
    cam_yaml = tmp_path / "cam.yaml"
    cam_yaml.write_text(
        f"image_width: {W}\nimage_height: {H}\nbf: 24.0\n"
        "depth_upper_thr: 20.0\n"
        "LEFT.P: [240.0, 0.0, 160.0, 0.0, 0.0, 240.0, 120.0, 0.0, "
        "0.0, 0.0, 1.0, 0.0]\n"
    )
    algo_yaml = tmp_path / "algo.yaml"
    algo_yaml.write_text(
        "superpoint:\n  max_keypoints: 400\n  keypoint_threshold: 0.0001\n"
        f"superglue:\n  image_width: {W}\n  image_height: {H}\n"
    )
    frames = _render_frames(10)

    def _drop(i):
        # write-then-rename so a listed file is complete
        il, ir = frames[i]
        name = f"{int(1e9 * (1.0 + 0.05 * i))}.png"
        for d, img in ((d0, il), (d1, ir)):
            tmp = d / (name + ".part")
            _write_png(tmp, img)
            os.rename(tmp, d / name)

    for i in range(4):  # a backlog exists before the driver starts
        _drop(i)

    def producer():
        for i in range(4, 10):
            time.sleep(0.25)
            _drop(i)
        (tmp_path / "stop").touch()

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    traj_path = tmp_path / "live.tum"
    cli.main([
        "serve", "--watch-dir", str(tmp_path),
        "--config", str(algo_yaml),
        "--camera-config", str(cam_yaml),
        "--traj-path", str(traj_path),
        "--matcher", "cosine", "--no-lines",
        "--idle-timeout", "60",
    ])
    th.join()
    assert traj_path.exists()
    rows = np.loadtxt(traj_path)
    rows = np.atleast_2d(rows)
    # all 10 pairs ingested; at least the init keyframe in the trajectory
    assert len(rows) >= 1
    # timestamps follow the filename-ns convention
    assert abs(rows[0, 0] - 1.0) < 0.3


def test_serve_idle_timeout(tmp_path):
    (tmp_path / "cam0" / "data").mkdir(parents=True)
    (tmp_path / "cam1" / "data").mkdir(parents=True)
    cam_yaml = tmp_path / "cam.yaml"
    cam_yaml.write_text(
        f"image_width: {W}\nimage_height: {H}\nbf: 24.0\n"
        "LEFT.P: [240.0, 0.0, 160.0, 0.0, 0.0, 240.0, 120.0, 0.0, "
        "0.0, 0.0, 1.0, 0.0]\n"
    )
    t0 = time.perf_counter()
    cli.main([
        "serve", "--watch-dir", str(tmp_path),
        "--camera-config", str(cam_yaml),
        "--traj-path", str(tmp_path / "t.tum"),
        "--matcher", "cosine", "--no-lines",
        "--idle-timeout", "1", "--poll-ms", "20",
    ])
    assert time.perf_counter() - t0 < 30  # shut down promptly, no frames
