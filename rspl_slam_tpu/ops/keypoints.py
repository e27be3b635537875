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

__all__ = ["simple_nms", "border_mask", "top_k_keypoints", "sample_descriptors",
           "simple_nms_cell", "top_k_keypoints_cell", "cell_border_mask"]


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


# ---------------------------------------------------------------------------
# Cell-space NMS + top-K: operate directly on SuperPoint's pre-pixel-shuffle
# (B, Hc, Wc, 64) representation, channel c = 8·dy + dx. Measured on v5e, a
# stride-1 9-wide max window on the pixel-shuffled (B, H, W) layout costs
# ~17× more than on the cell layout (the shuffle's strided relayout dominates
# the whole NMS); computing NMS here is bit-identical and the full-res score
# map never materializes.
# ---------------------------------------------------------------------------


def _shift_cells(x5: jnp.ndarray, c: int, axis: int) -> jnp.ndarray:
    """out[..., Y, ...] = x5[..., Y+c, ...] along ``axis``, −inf beyond."""
    if c == 0:
        return x5
    neg = jnp.full_like(x5, -jnp.inf)
    slp = [slice(None)] * x5.ndim
    sln = [slice(None)] * x5.ndim
    if c > 0:
        slp[axis] = slice(c, None)
        sln[axis] = slice(0, c)
        return jnp.concatenate([x5[tuple(slp)], neg[tuple(sln)]], axis=axis)
    slp[axis] = slice(0, x5.shape[axis] + c)
    sln[axis] = slice(0, -c)
    return jnp.concatenate([neg[tuple(sln)], x5[tuple(slp)]], axis=axis)


def _pool1d_cell(x: jnp.ndarray, radius: int, axis: int, s: int = 8):
    """1-D full-resolution max window (2r+1, stride 1, SAME/−inf padding)
    along pixel axis ``axis`` (1 = rows, 2 = cols) of cell-layout
    (B, Hc, Wc, s·s). Pixel y = s·Y + dy lives at cell Y, sub-row dy."""
    assert radius <= s, f"radius {radius} needs shifts beyond ±1 cell"
    B, Hc, Wc, C = x.shape
    x5 = x.reshape(B, Hc, Wc, s, s)
    d = 3 if axis == 1 else 4  # the sub-axis within the cell
    shifted = {c: _shift_cells(x5, c, axis) for c in (-1, 0, 1)}
    outs = []
    for dy in range(s):
        acc = None
        for o in range(-radius, radius + 1):
            q = dy + o
            c, dyp = q // s, q % s
            sl = [slice(None)] * 5
            sl[d] = slice(dyp, dyp + 1)
            v = shifted[c][tuple(sl)]
            acc = v if acc is None else jnp.maximum(acc, v)
        outs.append(acc)
    return jnp.concatenate(outs, axis=d).reshape(B, Hc, Wc, C)


def _max_pool_cell(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    return _pool1d_cell(_pool1d_cell(x, radius, 1), radius, 2)


def simple_nms_cell(probs: jnp.ndarray, nms_radius: int = 4) -> jnp.ndarray:
    """:func:`simple_nms` computed on the (B, Hc, Wc, 64) cell layout —
    bit-identical output (still in cell layout)."""
    zeros = jnp.zeros_like(probs)
    max_mask = probs == _max_pool_cell(probs, nms_radius)
    for _ in range(2):
        supp_mask = _max_pool_cell(max_mask.astype(probs.dtype), nms_radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, probs)
        new_max_mask = supp_scores == _max_pool_cell(supp_scores, nms_radius)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, probs, zeros)


def cell_border_mask(Hc: int, Wc: int, border: int, s: int = 8) -> jnp.ndarray:
    """(Hc, Wc, s·s) border mask — :func:`border_mask` re-laid-out to cell
    space (compile-time constant)."""
    m = border_mask(Hc * s, Wc * s, border)
    return m.reshape(Hc, s, Wc, s).transpose(0, 2, 1, 3).reshape(Hc, Wc, s * s)


def top_k_keypoints_cell(scores: jnp.ndarray, k: int, threshold: float,
                         border: int = 4, s: int = 8, cell_k: int = 8):
    """:func:`top_k_keypoints` on a cell-layout (Hc, Wc, s·s) score map.

    Two-stage exact top-K: per-cell top-``cell_k`` along the channel axis
    (a radius-4 NMS leaves at most 4 survivors in an 8×8 cell — points
    pairwise >4 px Chebyshev apart; cell_k=8 leaves headroom for plateau
    ties), then a global top-K over the s²/cell_k-times-smaller candidate
    set — this avoids flattening the full cell layout, whose relayout cost
    dominated the single-stage version.

    Identical selection semantics to the pixel-space op (values, threshold,
    border); only the tie-breaking order of exactly-equal scores differs
    (real score maps tie only at suppressed zeros, which sit below any
    positive threshold)."""
    Hc, Wc, C = scores.shape
    masked = jnp.where(cell_border_mask(Hc, Wc, border, s), scores, 0.0)
    ck = min(cell_k, C)
    v1, c1 = jax.lax.top_k(masked, ck)  # (Hc, Wc, ck) + channel ids
    kk = min(k, Hc * Wc * ck)
    vals, i2 = jax.lax.top_k(v1.reshape(-1), kk)
    if kk < k:  # pad to fixed K (tiny images in tests)
        vals = jnp.concatenate([vals, jnp.zeros(k - kk, vals.dtype)])
        i2 = jnp.concatenate([i2, jnp.zeros(k - kk, i2.dtype)])
    cc = c1.reshape(-1)[i2]
    cell = i2 // ck
    Y, X = cell // Wc, cell % Wc
    valid = vals > threshold
    ys = (s * Y + cc // s).astype(jnp.float32)
    xs = (s * X + cc % s).astype(jnp.float32)
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
