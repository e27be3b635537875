"""Synthetic RCF edge-detection pretraining.

The reference's RCF is a frozen TensorRT engine (rcf.cpp) trained on
BSDS500+PASCAL; nothing in the reference can train or adapt it. Here the
JAX RCF (models/rcf.py) trains end-to-end on a synthetic renderer of
polygonal scenes with exact edge ground truth:

- **Scenes**: a smooth low-frequency background plus filled rotated
  rectangles of random intensity — step edges at every rectangle boundary,
  like man-made structure (door frames, windows) that FLD-based systems
  feed on.
- **Labels**: pixels within ~1 px of a rectangle outline.
- **Loss**: the class-balanced BCE of the RCF paper (edge pixels are rare,
  so positives are weighted by the negative fraction and vice versa),
  on the fused logit (models/rcf.edge_logits).

``width_mult < 1`` shrinks the VGG trunk for cheap pretraining/CI; the
resulting edge maps are realistic inputs for stress-testing the Hough
segment detector (ops/lines.detect_line_segments) — blurred ridges,
amplitude variation, false positives in textured regions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rspl_slam_tpu.models import rcf
from rspl_slam_tpu.training.superpoint_train import load_params, save_params

__all__ = ["render_edge_scene", "make_batch", "loss_fn", "train",
           "save_params", "load_params"]


def _smooth_background(rng, H, W, cells=5):
    """Bilinear upsample of a random coarse grid — low-frequency shading."""
    coarse = rng.uniform(0.2, 0.8, (cells, cells)).astype(np.float32)
    ys = np.linspace(0, cells - 1, H)
    xs = np.linspace(0, cells - 1, W)
    y0 = np.clip(ys.astype(int), 0, cells - 2)
    x0 = np.clip(xs.astype(int), 0, cells - 2)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    c00 = coarse[y0][:, x0]
    c01 = coarse[y0][:, x0 + 1]
    c10 = coarse[y0 + 1][:, x0]
    c11 = coarse[y0 + 1][:, x0 + 1]
    return (c00 * (1 - fy) * (1 - fx) + c01 * (1 - fy) * fx
            + c10 * fy * (1 - fx) + c11 * fy * fx)


def render_edge_scene(rng: np.random.Generator, H: int, W: int,
                      n_rects: int = 3, noise: float = 0.02):
    """→ (image (H, W) float32 [0,1], gt_edge (H, W) bool, segments (S, 4)).

    ``segments`` are the in-image rectangle outline pieces (for detector
    recall checks)."""
    img = _smooth_background(rng, H, W)
    gt = np.zeros((H, W), bool)
    yy, xx = np.mgrid[0:H, 0:W]
    segments = []
    for _ in range(n_rects):
        cx = rng.uniform(0.2 * W, 0.8 * W)
        cy = rng.uniform(0.2 * H, 0.8 * H)
        hw = rng.uniform(0.12 * W, 0.3 * W)
        hh = rng.uniform(0.12 * H, 0.3 * H)
        th = rng.uniform(0, np.pi)
        c, s = np.cos(th), np.sin(th)
        # local coords of every pixel
        u = (xx - cx) * c + (yy - cy) * s
        v = -(xx - cx) * s + (yy - cy) * c
        inside = (np.abs(u) < hw) & (np.abs(v) < hh)
        img = np.where(inside, np.clip(img + rng.uniform(-0.45, 0.45), 0, 1),
                       img)
        # outline = inside minus eroded inside (1.2 px band)
        band = ((np.abs(np.abs(u) - hw) < 1.2) & (np.abs(v) < hh)) | (
            (np.abs(np.abs(v) - hh) < 1.2) & (np.abs(u) < hw)
        )
        gt |= band
        # the 4 outline segments in image coords
        corners = np.array([
            [cx + hw * c - hh * (-s), cy + hw * s - hh * c],
            [cx + hw * c + hh * (-s), cy + hw * s + hh * c],
            [cx - hw * c + hh * (-s), cy - hw * s + hh * c],
            [cx - hw * c - hh * (-s), cy - hw * s - hh * c],
        ])
        for k in range(4):
            p0, p1 = corners[k], corners[(k + 1) % 4]
            segments.append([p0[0], p0[1], p1[0], p1[1]])
    img = np.clip(img + rng.standard_normal((H, W)) * noise, 0, 1)
    return img.astype(np.float32), gt, np.asarray(segments, np.float32)


def make_batch(H: int, W: int, batch: int, seed: int):
    rng = np.random.default_rng(seed)
    imgs, gts = [], []
    for _ in range(batch):
        img, gt, _ = render_edge_scene(rng, H, W)
        imgs.append(img)
        gts.append(gt)
    return jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(gts))


def loss_fn(params, imgs, gts, compute_dtype=jnp.float32):
    """Class-balanced sigmoid BCE on the fused edge logit (the RCF paper's
    loss, single annotator): positives weighted by the negative pixel
    fraction and negatives by the positive fraction."""
    logits = rcf.edge_logits(params, imgs, compute_dtype)
    y = gts.astype(jnp.float32)
    pos = jnp.sum(y)
    neg = y.size - pos
    alpha = neg / (pos + neg)
    beta = 1.1 * pos / (pos + neg)
    w = jnp.where(y > 0, alpha, beta)
    bce = jnp.maximum(logits, 0) - logits * y + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.sum(w * bce) / jnp.maximum(jnp.sum(w), 1.0)


def train(steps: int = 200, batch: int = 2, hw=(96, 128),
          width_mult: float = 0.25, lr: float = 3e-4, seed: int = 0,
          params=None, log_every: int = 25, verbose: bool = True):
    """Train (a reduced-width) RCF on synthetic polygon scenes. Returns the
    trained params (drop into NeuralFrontend(rcf_params=...))."""
    import optax

    H, W = hw
    if params is None:
        params = rcf.init_params(jax.random.PRNGKey(seed),
                                 width_mult=width_mult)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, imgs, gts):
        loss, grads = jax.value_and_grad(loss_fn)(params, imgs, gts)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    history = []
    for s in range(steps):
        imgs, gts = make_batch(H, W, batch, seed * 99991 + s)
        params, opt_state, loss = step_fn(params, opt_state, imgs, gts)
        history.append(float(loss))
        if verbose and (s % log_every == 0 or s == steps - 1):
            print(f"step {s}: loss {history[-1]:.4f}", flush=True)
    return params, history
