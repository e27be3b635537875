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
    "StereoFrame", "EurocDataset", "open_dataset", "write_tum_trajectory",
    "read_tum_trajectory",
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


# candidate (left, right) camera sub-directory pairs, tried in order:
# EuRoC/OIVIO converted layout, plain left/right (UMA conversions), KITTI
_CAM_DIR_PAIRS = [
    (os.path.join("cam0", "data"), os.path.join("cam1", "data")),
    ("left", "right"),
    ("image_0", "image_1"),
]


class EurocDataset:
    """Stereo sequence reader covering the layouts the reference's batch
    harness feeds (dataset.cc:14-29, run_batch.py):

    - converted EuRoC/OIVIO/UMA: ``<root>/cam0/data/*.png`` +
      ``<root>/cam1/data/*.png`` (the only layout the reference reads —
      UMA Bumblebee sequences are pre-converted to it);
    - raw EuRoC: the same nested one level under ``<root>/mav0/``, with
      ``cam0/data.csv`` (``timestamp_ns,filename``) supplying timestamps;
    - plain ``left/``+``right/`` or KITTI ``image_0/``+``image_1/`` dirs.

    Timestamps: data.csv when present, else nanoseconds parsed from the
    filename (dataset.cc:26), else frame index at 20 Hz (the reference used
    wall-clock time for short filenames — deterministic index time is
    strictly better for evaluation)."""

    def __init__(self, dataroot: str):
        if not os.path.isdir(os.path.join(dataroot, "cam0")) and os.path.isdir(
            os.path.join(dataroot, "mav0", "cam0")
        ):
            dataroot = os.path.join(dataroot, "mav0")  # raw EuRoC nesting
        self.dataroot = dataroot
        for left_sub, right_sub in _CAM_DIR_PAIRS:
            ld = os.path.join(dataroot, left_sub)
            rd = os.path.join(dataroot, right_sub)
            if os.path.isdir(ld) and os.path.isdir(rd):
                self.left_dir, self.right_dir = ld, rd
                break
        else:
            raise FileNotFoundError(
                f"no stereo image dirs under {dataroot} "
                f"(tried {_CAM_DIR_PAIRS})"
            )
        lefts = sorted(os.listdir(self.left_dir))
        rights = set(os.listdir(self.right_dir))
        self.names = [n for n in lefts if n in rights]
        self._csv_times = self._load_csv_times()

    def _load_csv_times(self):
        """EuRoC-raw ``cam0/data.csv``: ``timestamp_ns,filename`` rows."""
        csv = os.path.join(os.path.dirname(self.left_dir), "data.csv")
        if not os.path.exists(csv):
            return None
        times = {}
        with open(csv) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split(",")
                if len(parts) >= 2:
                    times[parts[1].strip()] = float(parts[0]) * 1e-9
        return times if times else None

    def __len__(self) -> int:
        return len(self.names)

    def timestamp(self, idx: int) -> float:
        name = self.names[idx]
        if self._csv_times is not None and name in self._csv_times:
            return self._csv_times[name]
        stem = os.path.splitext(name)[0]
        # ≥13 digits = at least ms-scale epoch in ns → filename timestamp
        # (dataset.cc:21 used length<18 as the cutoff)
        if stem.isdigit() and len(stem) >= 13:
            return float(stem) * 1e-9
        return idx / 20.0

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


def open_dataset(dataroot: str) -> EurocDataset:
    """Open a stereo sequence directory in any supported layout."""
    return EurocDataset(dataroot)


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
