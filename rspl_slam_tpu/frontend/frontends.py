"""Feature frontends: neural (SuperPoint+SuperGlue) and oracle (synthetic).

The SLAM core (slam.py) is frontend-agnostic: anything that can produce
fixed-K masked keypoints with descriptors and match two such sets will
drive it. Two implementations:

- :class:`NeuralFrontend` — the production path. One batched SuperPoint
  call over the stereo pair (the reference serialized left/right behind a
  GPU mutex — map_builder.cc:276-343), SuperGlue for stereo and temporal
  matching, RCF+line extraction plugged in when lines are enabled.
- :class:`OracleFrontend` — synthetic-scene features with per-landmark
  identity descriptors. Exercises every SLAM code path deterministically
  (matching runs through the same masked mutual-NN decode) without trained
  weights; used by tests and the correctness half of the benchmark.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from rspl_slam_tpu.config import SystemConfig
from rspl_slam_tpu.evaluation import synthetic as synth
from rspl_slam_tpu.models import superglue, superpoint

__all__ = ["FrameFeatures", "NeuralFrontend", "OracleFrontend"]


@dataclass
class FrameFeatures:
    """Left-image features + stereo association for one frame (host numpy).

    ``meas`` packs [uL, vL, uR] with uR = −1 for keypoints without a valid
    stereo match — the layout of Frame::AddRightFeatures' outputs
    (frame.cc:150-203) as one fixed-K array.
    """

    xy: np.ndarray  # (K, 2)
    score: np.ndarray  # (K,)
    desc: np.ndarray  # (K, D)
    valid: np.ndarray  # (K,)
    meas: np.ndarray  # (K, 3) [uL, vL, uR(−1=mono)]
    depth: np.ndarray  # (K,) stereo depth (0 = none)


def _stereo_associate(cfg: SystemConfig, xyL, xyR, validL, validR, i0):
    """Left-right matches → per-left-keypoint uR/depth with the disparity
    gate min_x_diff < uL−uR < max_x_diff, |vL−vR| ≤ max_y_diff
    (frame.cc:157-167, camera.cc:21-23)."""
    cam = cfg.camera
    K = xyL.shape[0]
    uR = np.full(K, -1.0, np.float32)
    depth = np.zeros(K, np.float32)
    for i in range(K):
        j = i0[i]
        if j < 0 or not validL[i] or not validR[j]:
            continue
        dx = xyL[i, 0] - xyR[j, 0]
        dy = abs(xyL[i, 1] - xyR[j, 1])
        if cam.min_x_diff < dx < cam.max_x_diff and dy <= cam.max_y_diff:
            uR[i] = xyR[j, 0]
            depth[i] = cam.bf / dx
    return uR, depth


class NeuralFrontend:
    def __init__(self, cfg: SystemConfig, sp_params=None, sg_params=None,
                 compute_dtype=jnp.bfloat16, seed: int = 0):
        self.cfg = cfg
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        if sp_params is None:
            if cfg.superpoint.weights_path:
                sp_params = superpoint.load_torch_weights(cfg.superpoint.weights_path)
            else:
                sp_params = superpoint.init_params(k1)
        if sg_params is None:
            if cfg.superglue.weights_path:
                sg_params = superglue.load_torch_weights(cfg.superglue.weights_path, cfg.superglue)
            else:
                sg_params = superglue.init_params(k2, cfg.superglue)
        self.sp_params = sp_params
        self.sg_params = sg_params
        self.compute_dtype = compute_dtype

    def extract_pair(self, img_l: np.ndarray, img_r: np.ndarray) -> FrameFeatures:
        imgs = jnp.asarray(np.stack([img_l, img_r]))
        feats = superpoint.extract(
            self.sp_params, imgs, self.cfg.superpoint, self.compute_dtype
        )
        res = superglue.match_pair(
            self.sg_params,
            feats.xy[:1], feats.score[:1], feats.desc[:1], feats.valid[:1],
            feats.xy[1:], feats.score[1:], feats.desc[1:], feats.valid[1:],
            self.cfg.superglue, self.compute_dtype,
        )
        xyL = np.asarray(feats.xy[0])
        xyR = np.asarray(feats.xy[1])
        validL = np.asarray(feats.valid[0])
        validR = np.asarray(feats.valid[1])
        i0 = np.asarray(res.indices0[0])
        uR, depth = _stereo_associate(self.cfg, xyL, xyR, validL, validR, i0)
        meas = np.concatenate([xyL, uR[:, None]], -1)
        return FrameFeatures(
            xy=xyL, score=np.asarray(feats.score[0]),
            desc=np.asarray(feats.desc[0]), valid=validL,
            meas=meas, depth=depth,
        )

    def match(self, fA: FrameFeatures, fB: FrameFeatures) -> np.ndarray:
        """Temporal matching A→B. Returns indices0 (K,) into B or −1."""
        res = superglue.match_pair(
            self.sg_params,
            jnp.asarray(fA.xy)[None], jnp.asarray(fA.score)[None],
            jnp.asarray(fA.desc)[None], jnp.asarray(fA.valid)[None],
            jnp.asarray(fB.xy)[None], jnp.asarray(fB.score)[None],
            jnp.asarray(fB.desc)[None], jnp.asarray(fB.valid)[None],
            self.cfg.superglue, self.compute_dtype,
        )
        return np.asarray(res.indices0[0])


class OracleFrontend:
    """Synthetic-scene frontend with known ground truth.

    Keypoints are exact projections of scene landmarks (+noise/outliers);
    descriptors are the per-landmark unit vectors from the scene, so
    mutual-NN cosine matching is exact. ``landmark_ids`` lets tests check
    data association against truth.
    """

    def __init__(self, cfg: SystemConfig, scene: synth.SyntheticScene,
                 noise_px: float = 0.3, outlier_frac: float = 0.0,
                 desc_noise: float = 0.02, seed: int = 0):
        self.cfg = cfg
        self.scene = scene
        self.noise_px = noise_px
        self.outlier_frac = outlier_frac
        self.desc_noise = desc_noise
        self.rng = np.random.default_rng(seed)
        self._frame_idx = 0
        self.poses = None  # set by tests: (N, 4, 4) GT trajectory

    def observe(self, Twc: np.ndarray) -> FrameFeatures:
        cfg = self.cfg
        K = cfg.superpoint.max_keypoints
        obs = synth.observe_points(
            self.scene, cfg.camera, Twc, noise_px=self.noise_px,
            outlier_frac=self.outlier_frac, seed=int(self.rng.integers(1 << 31)),
        )
        vis = np.nonzero(obs["visible"])[0]
        self.rng.shuffle(vis)
        vis = vis[:K]
        n = len(vis)
        xy = np.zeros((K, 2), np.float32)
        meas = np.full((K, 3), -1.0, np.float32)
        depth = np.zeros(K, np.float32)
        desc = np.zeros((K, self.scene.descriptors.shape[1]), np.float32)
        valid = np.zeros(K, bool)
        xy[:n] = obs["uv_left"][vis]
        meas[:n, :2] = obs["uv_left"][vis]
        meas[:n, 2] = obs["uv_right"][vis, 0]
        depth[:n] = obs["depth"][vis]
        d = self.scene.descriptors[vis] + self.rng.standard_normal(
            (n, self.scene.descriptors.shape[1])
        ).astype(np.float32) * self.desc_noise
        desc[:n] = d / np.linalg.norm(d, axis=1, keepdims=True)
        valid[:n] = True
        ff = FrameFeatures(
            xy=xy, score=valid.astype(np.float32) * 0.9, desc=desc,
            valid=valid, meas=meas, depth=depth,
        )
        ff.landmark_ids = np.full(K, -1, np.int64)
        ff.landmark_ids[:n] = vis
        return ff

    def extract_pair(self, img_l, img_r) -> FrameFeatures:
        """In oracle mode the 'images' are ignored; the pose comes from the
        preset trajectory by call order."""
        assert self.poses is not None, "OracleFrontend.poses must be set"
        ff = self.observe(self.poses[self._frame_idx])
        self._frame_idx += 1
        return ff

    def match(self, fA: FrameFeatures, fB: FrameFeatures) -> np.ndarray:
        """Mutual-NN cosine matching (exact for oracle descriptors)."""
        sim = fA.desc @ fB.desc.T
        sim[~fA.valid] = -2.0
        sim[:, ~fB.valid] = -2.0
        a2b = sim.argmax(1)
        b2a = sim.argmax(0)
        K = len(a2b)
        out = np.full(K, -1, np.int64)
        for i in range(K):
            j = a2b[i]
            if fA.valid[i] and fB.valid[j] and b2a[j] == i and sim[i, j] > 0.7:
                out[i] = j
        return out
