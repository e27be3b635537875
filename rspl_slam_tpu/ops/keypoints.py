"""Keypoint post-processing ops: NMS, border removal, top-K selection, and
descriptor sampling — the TPU-native replacement for the reference's CPU
post-process scan (super_point.cpp:154-319).

The reference walks the score map on the host (find_high_score_index) and
produces a dynamic-length keypoint list. Here everything is fixed-shape:
``top_k_keypoints`` always returns exactly K slots plus a validity mask, so
the whole extract step stays inside one XLA computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["simple_nms", "border_mask", "top_k_keypoints", "sample_descriptors"]


def _max_pool_same(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(B, H, W) max pool with kernel 2r+1, stride 1, SAME padding.

    Max is separable: a (k, k) window is two 1-D passes (k ops/px each
    instead of k² in one 2-D window). XLA's reduce_window emitter does not
    perform this decomposition itself; at the SuperPoint NMS shape
    (2×480×752, k=9, ×5 calls per frame) the split is ~4× cheaper, with
    bit-identical results."""
    k = 2 * radius + 1
    y = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, 1), (1, 1, 1), "SAME"
    )
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 1, k), (1, 1, 1), "SAME"
    )


def simple_nms(scores: jnp.ndarray, nms_radius: int = 4) -> jnp.ndarray:
    """Fast NMS via iterated max-pool suppression — mirrors the in-graph NMS
    of the reference's exported ONNX (convert2onnx/superpoint.py:16-33):
    keep local maxima, then twice expand the suppression mask and re-admit
    maxima of the suppressed-free residual."""
    zeros = jnp.zeros_like(scores)
    max_mask = scores == _max_pool_same(scores, nms_radius)
    for _ in range(2):
        supp_mask = _max_pool_same(max_mask.astype(scores.dtype), nms_radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == _max_pool_same(supp_scores, nms_radius)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, zeros)


def border_mask(H: int, W: int, border: int, dtype=jnp.bool_) -> jnp.ndarray:
    """(H, W) mask that is False within ``border`` px of the image edge
    (super_point.cpp:168-183)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    m = (
        (rows >= border)
        & (rows < H - border)
        & (cols >= border)
        & (cols < W - border)
    )
    return m.astype(dtype)


def top_k_keypoints(scores: jnp.ndarray, k: int, threshold: float, border: int = 4):
    """Dense (H, W) NMS'd score map → exactly-K keypoints.

    Returns (xy (K, 2) float32 in pixel coords, score (K,), valid (K,) bool).
    Invalid slots have score 0 at position (0, 0). Combines the reference's
    threshold scan + border removal + top-K (super_point.cpp:154-204) into
    one jittable op.
    """
    H, W = scores.shape
    masked = jnp.where(border_mask(H, W, border), scores, 0.0)
    flat = masked.reshape(-1)
    vals, idx = jax.lax.top_k(flat, k)
    valid = vals > threshold
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    xy = jnp.where(valid[:, None], jnp.stack([xs, ys], -1), 0.0)
    return xy, jnp.where(valid, vals, 0.0), valid


def sample_descriptors(
    xy: jnp.ndarray,  # (K, 2) pixel coords
    desc_map: jnp.ndarray,  # (C, Hc, Wc) dense descriptors at stride s
    s: int = 8,
) -> jnp.ndarray:
    """Bilinear sampling of the dense descriptor map at keypoint locations +
    L2 normalization — ≙ the align_corners grid_sample in
    super_point.cpp:224-283 / convert2onnx/superpoint.py:51-64.

    Returns (K, C) L2-normalized descriptors.
    """
    C, Hc, Wc = desc_map.shape
    # normalized grid coordinates, align_corners=True convention
    kx = (xy[:, 0] - s / 2 + 0.5) / (Wc * s - s / 2 - 0.5)
    ky = (xy[:, 1] - s / 2 + 0.5) / (Hc * s - s / 2 - 0.5)
    gx = kx * (Wc - 1)
    gy = ky * (Hc - 1)
    x0 = jnp.clip(jnp.floor(gx), 0, Wc - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(gy), 0, Hc - 2).astype(jnp.int32)
    wx = jnp.clip(gx - x0, 0.0, 1.0)
    wy = jnp.clip(gy - y0, 0.0, 1.0)
    d00 = desc_map[:, y0, x0]
    d01 = desc_map[:, y0, x0 + 1]
    d10 = desc_map[:, y0 + 1, x0]
    d11 = desc_map[:, y0 + 1, x0 + 1]
    d = (
        d00 * ((1 - wy) * (1 - wx))
        + d01 * ((1 - wy) * wx)
        + d10 * (wy * (1 - wx))
        + d11 * (wy * wx)
    )  # (C, K)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=0, keepdims=True), 1e-12)
    return d.T
