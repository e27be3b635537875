"""Match decode + keypoint normalization for the matcher.

Mirrors the reference's CPU decode (super_glue.cpp:339-367: mutual row/col
argmax with exp-score > threshold) and the PointMatching wrapper's keypoint
normalization `(x − w/2) / (0.7·max(w, h))` (point_matching.cc:50-62) —
expressed as fixed-shape masked array ops.
"""

from __future__ import annotations

from functools import partial

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


@partial(jax.jit, static_argnames=("iters", "threshold_px"))
def fundamental_ransac_inliers(
    xy0: jnp.ndarray,  # (K, 2) pixels in image 0
    xy1: jnp.ndarray,  # (K, 2) matched pixels in image 1
    matched: jnp.ndarray,  # (K,) bool — which rows are real matches
    key: jax.Array,
    iters: int = 128,
    threshold_px: float = 3.0,
):
    """Epipolar outlier rejection ≙ the reference's optional
    ``cv::findFundamentalMat(FM_RANSAC, 3, 0.99)`` pass over SuperGlue
    matches (point_matching.cc:35-45; default OFF, exposed as a knob).

    TPU-native batched hypothesize-and-verify: ``iters`` random 8-point
    subsets each yield a fundamental matrix via the normalized 8-point
    algorithm (smallest eigenvector of AᵀA — a batched 9×9 eigh instead of
    a per-sample SVD loop), scored in one (H, K) Sampson-distance matrix;
    the winner is refit on its consensus set. Returns (K,) bool: True for
    matches within ``threshold_px`` Sampson distance of the best model
    (False wherever ``matched`` is False).
    """
    K = xy0.shape[0]
    m = matched.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m), 1.0)

    # Hartley normalization from the matched set's statistics
    def norm_T(xy):
        c = jnp.sum(xy * m[:, None], 0) / n
        d = jnp.sqrt(jnp.sum(jnp.sum((xy - c) ** 2, -1) * m) / n)
        s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-6)
        T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
        T = T.at[0, 0].set(s).at[1, 1].set(s)
        T = T.at[0, 2].set(-s * c[0]).at[1, 2].set(-s * c[1])
        return T, (xy - c) * s

    T0, q0 = norm_T(xy0)
    T1, q1 = norm_T(xy1)

    # constraint rows: [x1x0, x1y0, x1, y1x0, y1y0, y1, x0, y0, 1]
    x0, y0 = q0[:, 0], q0[:, 1]
    x1, y1 = q1[:, 0], q1[:, 1]
    A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                   x0, y0, jnp.ones_like(x0)], -1)  # (K, 9)

    def solve_f(w):
        """min ‖diag(w)·A·f‖: eigenvector of AᵀWA for the smallest
        eigenvalue, rank-2-projected."""
        M = jnp.einsum("ki,k,kj->ij", A, w, A)
        evals, evecs = jnp.linalg.eigh(M)
        f = evecs[:, 0]
        F = f.reshape(3, 3)
        # rank-2 enforcement via SVD (3×3 — tiny, batched by vmap)
        U, S, Vt = jnp.linalg.svd(F)
        F = (U * S.at[2].set(0.0)[None, :]) @ Vt
        return T1.T @ F @ T0  # denormalize to pixel coords

    logits = jnp.where(matched, 0.0, -1e9)
    keys = jax.random.split(key, iters)

    def hypothesis(k):
        # Gumbel-top-k: 8 DISTINCT matched indices per hypothesis —
        # categorical sampling draws WITH replacement, so duplicates make
        # the 8-point system underdetermined and waste iterations (and with
        # exactly 8 matches a valid all-distinct sample might never occur)
        g = logits + jax.random.gumbel(k, (K,))
        _, idx = jax.lax.top_k(g, 8)
        w = jnp.zeros((K,), jnp.float32).at[idx].set(1.0) * m
        return solve_f(w)

    Fs = jax.vmap(hypothesis)(keys)  # (H, 3, 3)

    h0 = jnp.concatenate([xy0, jnp.ones((K, 1))], -1)  # pixel homogeneous
    h1 = jnp.concatenate([xy1, jnp.ones((K, 1))], -1)

    def sampson(F):
        Fx0 = h0 @ F.T  # (K, 3) = F·x0
        Ftx1 = h1 @ F  # (K, 3) = Fᵀ·x1
        e = jnp.sum(h1 * Fx0, -1)
        denom = Fx0[:, 0] ** 2 + Fx0[:, 1] ** 2 \
            + Ftx1[:, 0] ** 2 + Ftx1[:, 1] ** 2
        return e * e / jnp.maximum(denom, 1e-12)

    d2 = jax.vmap(sampson)(Fs)  # (H, K)
    inl = (d2 < threshold_px ** 2) & matched[None]
    counts = jnp.sum(inl, -1)
    best = jnp.argmax(counts)
    # refit on the winning consensus and rescore (cv's final model is also
    # a least-squares fit over the RANSAC inliers)
    F_fin = solve_f(inl[best].astype(jnp.float32))
    ok = (sampson(F_fin) < threshold_px ** 2) & matched
    # degenerate guard: a hypothesis set with <8 usable matches can't
    # constrain F — keep the original matches untouched then
    return jnp.where(jnp.sum(matched) >= 8, ok, matched)
