"""SuperPoint keypoint detector + descriptor as a pure-JAX convnet.

TPU-native replacement for the reference's TensorRT engine + CPU
post-process (super_point.cpp). Architecture follows the public SuperPoint
(VGG-style shared encoder, 65-ch score head with pixel-shuffle, 256-ch
descriptor head; convert2onnx/superpoint.py:72-167):

    conv1a/1b(64) → pool → conv2a/2b(64) → pool → conv3a/3b(128) → pool →
    conv4a/4b(128); heads: convPa(256)→convPb(65), convDa(256)→convDb(256).

Differences by design (TPU-first):
- batched over images (stereo pair or temporal batch in ONE call — the
  reference serialized frames behind a GPU mutex, map_builder.cc:276);
- post-processing (NMS → border mask → top-K → descriptor sampling) is part
  of the same jitted computation, emitting fixed-K masked feature arrays
  instead of the host-side dynamic scan (super_point.cpp:154-319);
- convs run in a configurable compute dtype (bfloat16 on TPU) with f32
  accumulation; score/descriptor outputs are cast back to f32.

Weights: random He init by default; :func:`load_torch_weights` maps the
public ``superpoint_v1.pth`` checkpoint (key names conv1a..convDb) into the
param pytree.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from rspl_slam_tpu.config import SuperPointConfig
from rspl_slam_tpu.ops.keypoints import (sample_descriptors, simple_nms,
                                         simple_nms_cell, top_k_keypoints,
                                         top_k_keypoints_cell)

__all__ = ["init_params", "load_torch_weights", "dense_heads", "extract", "Features"]

_LAYERS = [
    # name, in_ch, out_ch, kernel
    ("conv1a", 1, 64, 3),
    ("conv1b", 64, 64, 3),
    ("conv2a", 64, 64, 3),
    ("conv2b", 64, 64, 3),
    ("conv3a", 64, 128, 3),
    ("conv3b", 128, 128, 3),
    ("conv4a", 128, 128, 3),
    ("conv4b", 128, 128, 3),
    ("convPa", 128, 256, 3),
    ("convPb", 256, 65, 1),
    ("convDa", 128, 256, 3),
    ("convDb", 256, 256, 1),
]


def init_params(key: jax.Array, dtype=jnp.float32) -> dict:
    """He-initialized parameter pytree {name: {w: (kh,kw,cin,cout), b: (cout,)}}."""
    params = {}
    for name, cin, cout, k in _LAYERS:
        key, sub = jax.random.split(key)
        fan_in = cin * k * k
        w = jax.random.normal(sub, (k, k, cin, cout), dtype) * jnp.sqrt(2.0 / fan_in)
        params[name] = {"w": w, "b": jnp.zeros((cout,), dtype)}
    return params


def load_torch_weights(path: str) -> dict:
    """Map the public SuperPoint .pth (OIHW convs) into our pytree (HWIO)."""
    import torch  # local import: torch is optional, tooling-only

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = {}
    for name, cin, cout, k in _LAYERS:
        w = sd[f"{name}.weight"].numpy()  # (cout, cin, kh, kw)
        b = sd[f"{name}.bias"].numpy()
        params[name] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "b": jnp.asarray(b),
        }
    return params


def _conv(x, p, compute_dtype, out_dtype=None):
    """MXU accumulates in f32 regardless; ``out_dtype`` picks the dtype the
    activation is written back in — compute_dtype for trunk layers halves
    HBM traffic, f32 (default) for head outputs feeding softmax/L2-norm."""
    out = out_dtype or jnp.float32
    w = p["w"].astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out,
    )
    return y + p["b"].astype(out)


def _pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _forward_cell(
    params: dict,
    images: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    use_pallas_stem: bool | None = None,
):
    """Encoder + both heads, returning scores in the CELL layout:
    probs (B, H/8, W/8, 64) with channel c = 8·dy + dx, and desc
    (B, C, H/8, W/8). The pixel-shuffled (B, H, W) score map is a pure
    relayout of probs (see dense_heads); extract() avoids materializing it
    (the strided relayout dominated the NMS cost on v5e)."""
    B, H, W = images.shape
    relu = jax.nn.relu
    if use_pallas_stem is None:
        # allowlist: the kernel is Mosaic/TPU-only and has no VJP
        use_pallas_stem = (
            compute_dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
        )
    if use_pallas_stem:
        from rspl_slam_tpu.ops.conv_stem_pallas import superpoint_stem

        x = superpoint_stem(params, images)  # (B, H/2, W/2, 64) bf16 NHWC
    else:
        x = images[..., None]  # NHWC
        x = relu(_conv(x, params["conv1a"], compute_dtype, compute_dtype))
        x = relu(_conv(x, params["conv1b"], compute_dtype, compute_dtype))
        x = _pool2(x)
    x = relu(_conv(x, params["conv2a"], compute_dtype, compute_dtype))
    x = relu(_conv(x, params["conv2b"], compute_dtype, compute_dtype))
    x = _pool2(x)
    x = relu(_conv(x, params["conv3a"], compute_dtype, compute_dtype))
    x = relu(_conv(x, params["conv3b"], compute_dtype, compute_dtype))
    x = _pool2(x)
    x = relu(_conv(x, params["conv4a"], compute_dtype, compute_dtype))
    x = relu(_conv(x, params["conv4b"], compute_dtype, compute_dtype))

    cPa = relu(_conv(x, params["convPa"], compute_dtype, compute_dtype))
    logits = _conv(cPa, params["convPb"], compute_dtype)  # (B, H/8, W/8, 65)
    probs = jax.nn.softmax(logits, axis=-1)[..., :64]  # drop dustbin

    cDa = relu(_conv(x, params["convDa"], compute_dtype, compute_dtype))
    desc = _conv(cDa, params["convDb"], compute_dtype)  # (B, Hc, Wc, 256)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    desc = jnp.transpose(desc, (0, 3, 1, 2))  # (B, C, Hc, Wc)
    return probs, desc


def dense_heads(
    params: dict,
    images: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    use_pallas_stem: bool | None = None,
):
    """images (B, H, W) in [0,1] → (scores (B, H, W), desc (B, C, H/8, W/8)).

    The dense forward pass: encoder + both heads + softmax/pixel-shuffle for
    scores and L2 normalization for descriptors, all matching
    convert2onnx/superpoint.py:116-167. H, W must be multiples of 8.

    ``use_pallas_stem`` routes conv1a/conv1b (+ pool) through the fused
    Pallas row-matmul kernel (ops/conv_stem_pallas.py; 1.53× over XLA's
    conv emitter on v5e). Default: on when running on TPU with bf16
    compute, off elsewhere (the kernel is inference-only — no VJP).
    """
    B, H, W = images.shape
    probs, desc = _forward_cell(params, images, compute_dtype, use_pallas_stem)
    Hc, Wc = H // 8, W // 8
    # pixel shuffle (B, Hc, Wc, 8*8) → (B, H, W)
    scores = probs.reshape(B, Hc, Wc, 8, 8)
    scores = jnp.transpose(scores, (0, 1, 3, 2, 4)).reshape(B, H, W)
    return scores, desc


class Features:
    """Fixed-K feature bundle (the TPU-native analogue of the reference's
    259×N Eigen matrix, super_point.cpp:285-319): separate arrays instead of
    one packed matrix, each padded to K with ``valid``."""

    def __init__(self, xy, score, desc, valid):
        self.xy = xy  # (B, K, 2) float32 pixels
        self.score = score  # (B, K)
        self.desc = desc  # (B, K, C) L2-normalized
        self.valid = valid  # (B, K) bool

    def tree_flatten(self):
        return (self.xy, self.score, self.desc, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    Features, Features.tree_flatten, Features.tree_unflatten
)


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def extract(
    params: dict,
    images: jnp.ndarray,  # (B, H, W) float32 in [0, 1]
    cfg: SuperPointConfig,
    compute_dtype=jnp.bfloat16,
) -> Features:
    """Full extraction: dense heads → NMS → top-K → descriptor sampling.

    One jitted graph per (B, H, W); batch the stereo pair (B=2) to use the
    MXU efficiently where the reference ran left/right serially.

    NMS + top-K run on the pre-pixel-shuffle CELL layout (bit-identical
    selection, ops/keypoints.simple_nms_cell) — the full-res score map
    never materializes, which on v5e halves the whole post-dense cost.
    The cell path is exact only for 3 ≤ nms_radius ≤ 8 (≤4 NMS survivors
    per 8×8 cell and single-cell shift reach); other radii take the
    pixel-space path.
    """
    if 3 <= cfg.nms_radius <= 8:
        probs, desc_map = _forward_cell(params, images, compute_dtype)
        scores = simple_nms_cell(probs, cfg.nms_radius)
        topk = top_k_keypoints_cell
    else:
        scores, desc_map = dense_heads(params, images, compute_dtype)
        scores = simple_nms(scores, cfg.nms_radius)
        topk = top_k_keypoints

    def per_image(s, d):
        xy, sc, valid = topk(
            s, cfg.max_keypoints, cfg.keypoint_threshold, cfg.remove_borders
        )
        descs = sample_descriptors(xy, d, 8)
        return xy, sc, descs, valid

    xy, sc, descs, valid = jax.vmap(per_image)(scores, desc_map)
    return Features(xy, sc, descs, valid)
