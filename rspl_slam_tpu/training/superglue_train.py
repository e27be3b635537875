"""Synthetic SuperGlue training — the matcher counterpart of
superpoint_train / rcf_train (the reference ships a frozen TensorRT engine
and no training capability; convert2onnx/superglue.py is export-only).

Training problems are generated at the keypoint level, shaped exactly like
our SuperPoint output: two keypoint sets with unit descriptors, a known
partial assignment (shared "landmarks" with descriptor noise and a rigid
2D motion + jitter between the views), and distractor keypoints on both
sides. The loss is the public SuperGlue objective: negative log-likelihood
of the ground-truth assignment under the Sinkhorn transport plan —
matched pairs at Z[i, j(i)], unmatched keypoints at their dustbin entries
(superglue.py:269-325 builds the same plan; the reference never trains it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rspl_slam_tpu.config import SuperGlueConfig
from rspl_slam_tpu.models import superglue

__all__ = ["make_batch", "loss_fn", "train", "matching_accuracy"]


def make_batch(rng: np.random.Generator, batch: int, K: int,
               cfg: SuperGlueConfig, desc_dim: int = 256,
               match_frac: float = 0.65, desc_noise: float = 0.15,
               pos_noise: float = 1.0, cluster: float = 0.0,
               score_lo: float = 0.2, score_hi: float = 1.0):
    """Random matching problems with ground truth.

    Returns (xy0, sc0, d0, v0, xy1, sc1, d1, v1, gt0) — gt0 (B, K) int32:
    the index in set 1 matching keypoint i of set 0, or K for the dustbin.
    Invalid (padded) slots carry gt0 = −1 and are excluded from the loss.

    ``cluster`` > 0 compresses the descriptor space around a shared mean
    direction per batch item: d ← unit(μ + cluster·d). This reproduces the
    regime an UNTRAINED SuperPoint emits (weight-bias-dominated
    descriptors: distinct-pair cosine ≈ 1/(1+cluster²) ≈ 0.99, matched
    pairs a hair above) — the deployment distribution when no public
    checkpoint is available. ``score_lo/hi`` bound the keypoint scores
    (untrained SuperPoint scores sit near 0.02–0.1, not 0.2–1)."""
    W, H = cfg.image_width, cfg.image_height
    B = batch

    def unit(v):
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-9)

    def noisy(base, n_shape):
        """base + a noise vector of NORM desc_noise (per-component gaussian
        noise over 256 dims would have norm ~16× larger and swamp the unit
        landmark descriptor), re-normalized."""
        n = unit(rng.standard_normal(n_shape).astype(np.float32))
        return unit(base + desc_noise * n)

    xy0 = rng.uniform([8, 8], [W - 8, H - 8], (B, K, 2)).astype(np.float32)
    land = unit(rng.standard_normal((B, K, desc_dim)).astype(np.float32))
    d0 = noisy(land, (B, K, desc_dim))
    n_valid = rng.integers(K // 2, K + 1, B)
    v0 = np.arange(K)[None] < n_valid[:, None]
    v1 = np.arange(K)[None] < n_valid[:, None]

    matched = (rng.random((B, K)) < match_frac) & v0
    # rigid 2D motion between the views + per-point jitter
    shift = rng.uniform(-40, 40, (B, 1, 2))
    xy1_m = xy0 + shift + pos_noise * rng.standard_normal((B, K, 2))
    xy1 = rng.uniform([8, 8], [W - 8, H - 8], (B, K, 2)).astype(np.float32)
    d1 = unit(rng.standard_normal((B, K, desc_dim)).astype(np.float32))

    gt0 = np.full((B, K), K, np.int32)  # default: dustbin
    perm = np.stack([rng.permutation(K) for _ in range(B)])
    for b in range(B):
        for i in range(K):
            if not matched[b, i]:
                continue
            j = perm[b, i]
            if not v1[b, j]:
                continue
            x, y = xy1_m[b, i]
            if not (0 <= x < W and 0 <= y < H):
                continue
            xy1[b, j] = [x, y]
            d1[b, j] = noisy(land[b, i], desc_dim)
            gt0[b, i] = j
    gt0[~v0] = -1
    if cluster > 0:
        mu = unit(rng.standard_normal((B, 1, desc_dim)).astype(np.float32))
        d0 = unit(mu + cluster * d0)
        d1 = unit(mu + cluster * d1)
    sc0 = rng.uniform(score_lo, score_hi, (B, K)).astype(np.float32) * v0
    sc1 = rng.uniform(score_lo, score_hi, (B, K)).astype(np.float32) * v1
    return tuple(jnp.asarray(a) for a in (
        xy0, sc0, d0.astype(np.float32), v0, xy1, sc1,
        d1.astype(np.float32), v1, gt0,
    ))


def make_shift_pair_bank(images, sp_params, sp_cfg, n_pairs: int, K: int,
                         rng: np.random.Generator, crop_hw=(240, 376),
                         shift_range: float = 32.0, tol_px: float = 2.0,
                         extract_batch: int = 8, cell_aligned: int = 8):
    """Matching problems from the REAL feature distribution: sub-pixel
    crops of source ``images`` shifted by a known (dx, dy) give EXACT
    dense correspondence, so two SuperPoint extractions of a shifted pair
    label themselves — keypoint i of view A matches the mutually-nearest
    keypoint of view B within ``tol_px`` of the un-shifted position, else
    the dustbin. Whatever descriptor statistics the (possibly untrained)
    SuperPoint emits, the bank reproduces them by construction — the
    transfer a synthetic descriptor curriculum cannot guarantee.

    Returns a list of n_pairs problems shaped like :func:`make_batch`
    items (without the batch dim); stack subsets with ``bank_batch_fn``.
    """
    from rspl_slam_tpu.models import superpoint

    H, W = crop_hw

    def subcrop(img, oy, ox):
        ys = np.arange(H, dtype=np.float64) + oy
        xs = np.arange(W, dtype=np.float64) + ox
        y0 = np.clip(np.floor(ys).astype(int), 0, img.shape[0] - 2)
        x0 = np.clip(np.floor(xs).astype(int), 0, img.shape[1] - 2)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        return ((1 - fy) * (1 - fx) * img[np.ix_(y0, x0)]
                + (1 - fy) * fx * img[np.ix_(y0, x0 + 1)]
                + fy * (1 - fx) * img[np.ix_(y0 + 1, x0)]
                + fy * fx * img[np.ix_(y0 + 1, x0 + 1)]).astype(np.float32)

    crops = []
    shifts = []
    for _ in range(n_pairs):
        img = images[rng.integers(len(images))]
        my = img.shape[0] - H - 2 * shift_range - 2
        mx = img.shape[1] - W - 2 * shift_range - 2
        oy = shift_range + rng.uniform(0, max(my, 1))
        ox = shift_range + rng.uniform(0, max(mx, 1))
        if cell_aligned:
            # shifts in multiples of the detector cell: an UNTRAINED
            # SuperPoint snaps keypoints to the 8-px lattice, so only
            # cell-aligned content shifts keep the self-labeling exact
            # (sub-pixel shifts put the true correspondence up to half a
            # cell-diagonal away from every detected keypoint)
            q = int(shift_range) // cell_aligned
            sx, sy = cell_aligned * rng.integers(-q, q + 1, 2)
        else:
            sx, sy = rng.uniform(-shift_range, shift_range, 2)
        crops.append(subcrop(img, oy, ox))
        crops.append(subcrop(img, oy + sy, ox + sx))
        shifts.append((sx, sy))

    feats = []
    for i in range(0, len(crops), extract_batch):
        f = superpoint.extract(sp_params, np.stack(crops[i:i + extract_batch]),
                               sp_cfg)
        for b in range(f.xy.shape[0]):
            feats.append((np.asarray(f.xy[b]), np.asarray(f.score[b]),
                          np.asarray(f.desc[b]), np.asarray(f.valid[b])))

    bank = []
    for p in range(n_pairs):
        xy0, sc0, d0, v0 = feats[2 * p]
        xy1, sc1, d1, v1 = feats[2 * p + 1]
        sx, sy = shifts[p]
        Kc = min(K, len(xy0))
        # a view-A pixel (x, y) appears in view B at (x − sx, y − sy)
        pred = xy0 - [sx, sy]
        D = np.linalg.norm(pred[:, None, :] - xy1[None, :, :], axis=-1)
        D = np.where(v0[:, None] & v1[None, :], D, 1e9)
        j = D.argmin(1)
        i_back = D.argmin(0)
        gt0 = np.full(len(xy0), len(xy1), np.int32)  # dustbin
        ok = (D[np.arange(len(xy0)), j] < tol_px) & (i_back[j] == np.arange(len(xy0)))
        gt0[ok] = j[ok]
        gt0[~v0] = -1
        bank.append(tuple(a[:Kc] for a in (xy0, sc0, d0, v0)) +
                    tuple(a[:Kc] for a in (xy1, sc1, d1, v1)) +
                    (np.minimum(gt0[:Kc], Kc),))
    return bank


def label_by_landmarks(xy0, v0, xy1, v1, p0, p1, vis, tol_px: float = 5.0):
    """GT assignment between two detected keypoint sets via a SHARED
    landmark table: keypoint i of view 0 binds to the nearest landmark
    projection ``p0`` within ``tol_px``; likewise view 1 against ``p1``;
    two keypoints bound to the same (visible) landmark match. This labels
    the exact deployment tasks — stereo pairs (p1 = right-eye projections,
    per-point disparity) and temporal pairs (p1 = projections under the
    next pose) — which a uniform-shift crop bank cannot express.

    Returns gt0 (K0,) int32: matching index into view 1, K1 for dustbin,
    −1 for invalid rows."""
    K1 = len(xy1)
    lm = np.nonzero(vis)[0]
    gt0 = np.full(len(xy0), K1, np.int32)
    gt0[~v0] = -1
    if len(lm) == 0:
        return gt0
    P0 = np.asarray(p0)[lm]
    P1 = np.asarray(p1)[lm]

    def bind(xy, valid, P):
        D = np.linalg.norm(xy[:, None, :] - P[None], axis=-1)
        j = D.argmin(1)
        d = D[np.arange(len(xy)), j]
        return np.where(valid & (d < tol_px), j, -1), d

    b0, d0 = bind(np.asarray(xy0), np.asarray(v0, bool), P0)
    b1, d1 = bind(np.asarray(xy1), np.asarray(v1, bool), P1)
    # one keypoint per landmark per view: keep the closest claimant
    lm_to_k1 = np.full(len(lm), -1, np.int64)
    for j in np.argsort(d1):
        if b1[j] >= 0 and lm_to_k1[b1[j]] < 0:
            lm_to_k1[b1[j]] = j
    claimed0 = np.full(len(lm), False)
    for i in np.argsort(d0):
        if b0[i] < 0 or claimed0[b0[i]] or not v0[i]:
            continue
        claimed0[b0[i]] = True
        t = lm_to_k1[b0[i]]
        if t >= 0:
            gt0[i] = t
    return gt0


def bank_batch_fn(bank):
    """Adapter: a ``batch_fn(rng, batch, K, cfg)`` for :func:`train` that
    stacks a random subset of precomputed bank problems."""
    def fn(rng, batch, K, cfg):
        idx = rng.choice(len(bank), size=batch, replace=len(bank) < batch)
        cols = list(zip(*(bank[i] for i in idx)))
        return tuple(jnp.asarray(np.stack(c)) for c in cols)

    return fn


def loss_fn(params, batch, cfg: SuperGlueConfig, compute_dtype=jnp.float32):
    """−mean log P(gt assignment) over valid rows (matched → Z[i, j],
    unmatched-but-valid → dustbin column Z[i, K])."""
    xy0, sc0, d0, v0, xy1, sc1, d1, v1, gt0 = batch
    res = superglue.match_pair(params, xy0, sc0, d0, v0, xy1, sc1, d1, v1,
                               cfg, compute_dtype)
    Z = res.log_plan  # (B, K+1, K+1) log transport plan incl. dustbins
    B, K = gt0.shape
    rows = jnp.arange(K)
    take = jnp.where(gt0 >= 0, jnp.minimum(gt0, K), K)
    ll = Z[jnp.arange(B)[:, None], rows[None, :], take]
    w = (gt0 >= 0).astype(jnp.float32)
    return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)


def matching_accuracy(params, batch, cfg: SuperGlueConfig) -> float:
    """Fraction of ground-truth matches recovered by the mutual-max decode."""
    xy0, sc0, d0, v0, xy1, sc1, d1, v1, gt0 = batch
    res = superglue.match_pair(params, xy0, sc0, d0, v0, xy1, sc1, d1, v1,
                               cfg, jnp.float32)
    idx0 = np.asarray(res.indices0)
    gt = np.asarray(gt0)
    m = (gt >= 0) & (gt < gt0.shape[1])  # real matches only
    if m.sum() == 0:
        return 0.0
    return float((idx0[m] == gt[m]).mean())


def train(cfg: SuperGlueConfig | None = None, steps: int = 300,
          batch: int = 8, K: int = 64, lr: float = 1e-3, seed: int = 0,
          params=None, log_every: int = 25, verbose: bool = True,
          batch_fn=None):
    """Train SuperGlue on synthetic assignments. Returns (params, history).

    Defaults validated on a 2-layer/10-iteration config: 300 steps of Adam
    at 1e-3 reach 100% held-out mutual-decode accuracy on fresh problems
    (random weights decode ~0%). ``batch_fn(rng, batch, K, cfg)`` overrides
    the problem generator (tests use a fixed batch for a fast overfit)."""
    import optax

    cfg = cfg or SuperGlueConfig(image_width=320, image_height=240,
                                 num_gnn_layers=4, sinkhorn_iterations=20)
    if params is None:
        params = superglue.init_params(jax.random.PRNGKey(seed), cfg)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    rng = np.random.default_rng(seed)
    batch_fn = batch_fn or make_batch

    @jax.jit
    def step_fn(params, opt_state, *batch_arrays):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch_arrays, cfg)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for s in range(steps):
        b = batch_fn(rng, batch, K, cfg)
        params, opt_state, loss = step_fn(params, opt_state, *b)
        history.append(float(loss))
        if verbose and (s % log_every == 0 or s == steps - 1):
            print(f"step {s}: loss {history[-1]:.4f}", flush=True)
    return params, history
