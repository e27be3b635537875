"""Dataset readers + trajectory IO.

Replaces the reference's EuRoC-layout reader (dataset.cc:8-50) and the TUM
trajectory writer (map.cc:1007-1024). Image decoding uses PIL (grayscale);
the hot path hands numpy arrays to the JAX frontend.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

__all__ = [
    "StereoFrame", "EurocDataset", "write_tum_trajectory", "read_tum_trajectory",
]


@dataclass
class StereoFrame:
    """≙ InputData (utils.h:28-48)."""

    index: int
    time: float
    image_left: np.ndarray  # (H, W) float32 in [0, 1]
    image_right: np.ndarray


def _load_gray(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.float32) / 255.0


class EurocDataset:
    """EuRoC/OIVIO directory layout: ``<root>/cam0/data/*.png`` +
    ``<root>/cam1/data/*.png``, timestamp in nanoseconds parsed from the
    filename (dataset.cc:14-29)."""

    def __init__(self, dataroot: str):
        self.left_dir = os.path.join(dataroot, "cam0", "data")
        self.right_dir = os.path.join(dataroot, "cam1", "data")
        lefts = sorted(os.listdir(self.left_dir))
        rights = set(os.listdir(self.right_dir))
        self.names = [n for n in lefts if n in rights]

    def __len__(self) -> int:
        return len(self.names)

    def timestamp(self, idx: int) -> float:
        stem = os.path.splitext(self.names[idx])[0]
        return float(stem) * 1e-9

    def __getitem__(self, idx: int) -> StereoFrame:
        name = self.names[idx]
        return StereoFrame(
            index=idx,
            time=self.timestamp(idx),
            image_left=_load_gray(os.path.join(self.left_dir, name)),
            image_right=_load_gray(os.path.join(self.right_dir, name)),
        )

    def file_lists(self):
        """(left_paths, right_paths) for the native prefetcher."""
        lefts = [os.path.join(self.left_dir, n) for n in self.names]
        rights = [os.path.join(self.right_dir, n) for n in self.names]
        return lefts, rights


def write_tum_trajectory(path: str, times, poses) -> None:
    """TUM format ``t x y z qx qy qz qw`` (map.cc:1007-1024).

    ``poses``: (N, 4, 4) world-from-camera.
    """
    import numpy as np

    from rspl_slam_tpu.geometry import se3
    import jax.numpy as jnp

    poses = np.asarray(poses)
    qs = np.asarray(se3.quat_from_rot(jnp.asarray(poses[:, :3, :3])))  # wxyz
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for t, T, q in zip(times, poses, qs):
            x, y, z = T[:3, 3]
            w, qx, qy, qz = q
            f.write(
                f"{t:.9f} {x:.9f} {y:.9f} {z:.9f} {qx:.9f} {qy:.9f} {qz:.9f} {w:.9f}\n"
            )


def read_tum_trajectory(path: str):
    """Returns (times (N,), poses (N,4,4))."""
    import jax.numpy as jnp

    from rspl_slam_tpu.geometry import se3

    rows = np.loadtxt(path).reshape(-1, 8)
    times = rows[:, 0]
    t = rows[:, 1:4]
    q_xyzw = rows[:, 4:8]
    q_wxyz = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, :3]], 1)
    R = np.asarray(se3.rot_from_quat(jnp.asarray(q_wxyz)))
    poses = np.tile(np.eye(4, dtype=np.float64), (len(rows), 1, 1))
    poses[:, :3, :3] = R
    poses[:, :3, 3] = t
    return times, poses
