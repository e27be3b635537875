"""Match decode + keypoint normalization for the matcher.

Mirrors the reference's CPU decode (super_glue.cpp:339-367: mutual row/col
argmax with exp-score > threshold) and the PointMatching wrapper's keypoint
normalization `(x − w/2) / (0.7·max(w, h))` (point_matching.cc:50-62) —
expressed as fixed-shape masked array ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["normalize_keypoints", "mutual_match_decode", "match_distance"]


def normalize_keypoints(xy: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """(..., 2) pixels → matcher input coords (point_matching.cc:55-60)."""
    scale = 0.7 * max(width, height)
    cx = width / 2.0
    cy = height / 2.0
    return (xy - jnp.asarray([cx, cy], xy.dtype)) / scale


def mutual_match_decode(
    Z: jnp.ndarray,  # (B, M+1, N+1) log transport plan
    mask0: jnp.ndarray,  # (B, M)
    mask1: jnp.ndarray,  # (B, N)
    threshold: float = 0.2,
):
    """Mutual-max decode of the transport plan.

    Returns (indices0 (B, M) int32 — col matched to each row or −1,
    indices1 (B, N), mscores0 (B, M) = exp(Z) at the match or 0).

    ≙ super_glue.cpp decode: row argmax & col argmax mutual consistency +
    exp(score) > threshold gate.
    """
    S = Z[:, :-1, :-1]  # strip dustbins
    neg = -1e9
    S = jnp.where(mask0[:, :, None] & mask1[:, None, :], S, neg)
    max0 = jnp.argmax(S, axis=2)  # (B, M) best col per row
    max1 = jnp.argmax(S, axis=1)  # (B, N) best row per col
    m_idx = jnp.arange(S.shape[1])[None]
    n_idx = jnp.arange(S.shape[2])[None]
    mutual0 = jnp.take_along_axis(max1, max0, axis=1) == m_idx  # (B, M)
    mutual1 = jnp.take_along_axis(max0, max1, axis=1) == n_idx  # (B, N)
    sc0 = jnp.exp(jnp.take_along_axis(S, max0[:, :, None], axis=2)[..., 0])
    valid0 = mutual0 & (sc0 > threshold) & mask0
    valid1 = mutual1 & jnp.take_along_axis(valid0, max1, axis=1) & mask1
    indices0 = jnp.where(valid0, max0, -1).astype(jnp.int32)
    indices1 = jnp.where(valid1, max1, -1).astype(jnp.int32)
    mscores0 = jnp.where(valid0, sc0, 0.0)
    return indices0, indices1, mscores0


def match_distance(ms0: jnp.ndarray, ms1: jnp.ndarray) -> jnp.ndarray:
    """DMatch-style distance 1 − (ms0 + ms1)/2 (point_matching.cc:24-32)."""
    return 1.0 - 0.5 * (ms0 + ms1)


def cosine_mutual_match(
    desc0: jnp.ndarray,  # (B, M, C) L2-normalized
    mask0: jnp.ndarray,  # (B, M)
    desc1: jnp.ndarray,  # (B, N, C)
    mask1: jnp.ndarray,  # (B, N)
    min_similarity: float = 0.7,
    ratio: float = 0.95,
):
    """Masked mutual-nearest-neighbor cosine matching with a Lowe-style
    ratio test. Returns indices0 (B, M) int32 (−1 = no match).

    The matcher-free fallback: one batched (M, N) matmul + two argmaxes —
    used when SuperGlue weights are untrained/unavailable. The descriptor
    distance convention matches utils.cc:14-16 (2(1−cos)).
    """
    sim = jnp.einsum("bmc,bnc->bmn", desc0, desc1,
                     preferred_element_type=jnp.float32)
    neg = -2.0
    sim = jnp.where(mask0[:, :, None] & mask1[:, None, :], sim, neg)
    best0 = jnp.argmax(sim, axis=2)  # (B, M)
    best1 = jnp.argmax(sim, axis=1)  # (B, N)
    m_idx = jnp.arange(sim.shape[1])[None]
    mutual = jnp.take_along_axis(best1, best0, axis=1) == m_idx
    top = jnp.take_along_axis(sim, best0[:, :, None], axis=2)[..., 0]
    # second best for the ratio test
    sim2 = jnp.where(
        jax.nn.one_hot(best0, sim.shape[2], dtype=bool), neg, sim
    )
    second = jnp.max(sim2, axis=2)
    ok = (
        mutual & mask0 & (top > min_similarity)
        & ((1.0 - top) < ratio * (1.0 - second))
    )
    return jnp.where(ok, best0, -1).astype(jnp.int32)
