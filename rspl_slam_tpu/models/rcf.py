"""RCF (Richer Convolutional Features) edge detection network in pure JAX.

TPU-native replacement for the reference's TensorRT RCF engine (rcf.cpp).
Architecture is the public RCF-on-VGG16: five conv stages; every conv in a
stage feeds a 21-channel 1×1 side branch; branch sums get a 1×1 score,
are bilinearly upsampled to input resolution, and the five stage scores are
fused by a final 1×1 ("output 230" in the reference's ONNX — rcf.cpp:137).

Behavior contract mirrored from the reference wrapper:
- input is a grayscale image replicated to 3 channels and **not** divided
  by 255 (rcf.cpp:161-192) — the net consumes 0..255-range values;
- :func:`edge_map` returns sigmoid(fuse) ∈ [0,1] (edge probability). The
  reference then inverts to uint8 (255 − 255·p) only because OpenCV's FLD
  wants dark edges; our line extractor consumes the probability directly.

Weights load from the public ``bsds500_pascal_model.pth`` via
:func:`load_torch_weights`; random init otherwise (shape-compatible).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_params", "load_torch_weights", "edge_map", "edge_logits"]

# (stage, convs): VGG16 layout with dilation-free convs; stage 5 pool has
# stride 1 in RCF (keeps 1/8 resolution), per the public implementation.
_STAGES = [
    ("conv1", [(3, 64), (64, 64)]),
    ("conv2", [(64, 128), (128, 128)]),
    ("conv3", [(128, 256), (256, 256), (256, 256)]),
    ("conv4", [(256, 512), (512, 512), (512, 512)]),
    ("conv5", [(512, 512), (512, 512), (512, 512)]),
]
_SIDE_CH = 21


def init_params(key: jax.Array, dtype=jnp.float32,
                width_mult: float = 1.0) -> dict:
    """``width_mult`` scales every stage's channel count (min 8) — reduced
    widths make synthetic pretraining (training/rcf_train.py) and CI cheap;
    the architecture and edge_map are width-agnostic (shapes come from the
    params). The public checkpoint requires width_mult=1."""
    params: dict = {}

    def scale(c):
        return c if width_mult == 1.0 else max(8, int(round(c * width_mult)))

    def conv_init(key, cin, cout, k):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (k, k, cin, cout), dtype) * jnp.sqrt(
            2.0 / (cin * k * k)
        )
        return key, {"w": w, "b": jnp.zeros((cout,), dtype)}

    for sname, convs in _STAGES:
        for i, (cin, cout) in enumerate(convs):
            cin_s = cin if cin == 3 else scale(cin)
            key, p = conv_init(key, cin_s, scale(cout), 3)
            params[f"{sname}_{i + 1}"] = p
            key, p = conv_init(key, scale(cout), _SIDE_CH, 1)
            params[f"{sname}_{i + 1}_down"] = p
        key, p = conv_init(key, _SIDE_CH, 1, 1)
        params[f"{sname}_score"] = p
    key, p = conv_init(key, 5, 1, 1)
    params["fuse"] = p
    return params


def load_torch_weights(path: str) -> dict:
    """Map the public RCF checkpoint (conv1_1..conv5_3, *_down, score_dsn*,
    score_final naming) into our pytree."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v.numpy() for k, v in sd.items()}

    def conv(name_w, name_b):
        w = sd[name_w]
        return {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "b": jnp.asarray(sd[name_b]),
        }

    params = {}
    for si, (sname, convs) in enumerate(_STAGES, start=1):
        for i in range(len(convs)):
            params[f"{sname}_{i + 1}"] = conv(
                f"conv{si}_{i + 1}.weight", f"conv{si}_{i + 1}.bias"
            )
            params[f"{sname}_{i + 1}_down"] = conv(
                f"conv{si}_{i + 1}_down.weight", f"conv{si}_{i + 1}_down.bias"
            )
        params[f"{sname}_score"] = conv(
            f"score_dsn{si}.weight", f"score_dsn{si}.bias"
        )
    params["fuse"] = conv("score_final.weight", "score_final.bias")
    return params


def _conv(x, p, compute_dtype, dilation=1, out_dtype=None):
    """``out_dtype`` controls the materialized activation dtype: the MXU
    accumulates in f32 either way, but trunk activations written back at
    compute_dtype (bf16 on TPU) halve the HBM traffic of the full-res
    stages — the memory-bound part of RCF. Score/fuse outputs stay f32."""
    out = out_dtype or jnp.float32
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        (1, 1),
        "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out,
    )
    return y + p["b"].astype(out)


def _pool2(x, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, stride, stride, 1), "SAME"
    )


def _upsample_bilinear(x, H, W):
    return jax.image.resize(x, (x.shape[0], H, W, x.shape[3]), "bilinear")


def _side_weight(params, sname, i):
    """Folded per-conv side weight: (W_down_i · w_score) as a (C,) vector
    (all 1×1 convs with no nonlinearity between — see edge_logits)."""
    ws = params[f"{sname}_score"]["w"]  # (1, 1, SIDE, 1)
    wd = params[f"{sname}_{i + 1}_down"]["w"]  # (1, 1, C, SIDE)
    return jnp.einsum("cs,s->c", wd[0, 0], ws[0, 0, :, 0])


def _stage_bias(params, sname, n_convs):
    ws = params[f"{sname}_score"]["w"][0, 0, :, 0].astype(jnp.float32)
    bias = params[f"{sname}_score"]["b"].astype(jnp.float32)
    for i in range(n_convs):
        bias = bias + params[f"{sname}_{i + 1}_down"]["b"].astype(
            jnp.float32
        ) @ ws
    return bias


def _stem_pallas(params, x255, compute_dtype, interpret=False):
    """Stage 1 through the fused Pallas conv path (channel-major rows →
    one deep MXU matmul per row — ops/conv_stem_pallas.py). RCF's input is
    grayscale replicated ×3, so conv1_1 collapses to a cin=1 conv with
    channel-summed weights; conv1_2 runs in the fused kernel with the row
    half of the 2×2 pool AND the stage-1 side contribution computed
    in-kernel, so the full-resolution activations never round-trip HBM.
    Stages 2-5 run in the generic XLA conv loop — measured on v5e, XLA's
    conv emitter beats the row-matmul kernel at the half-res shapes
    (conv2_2 128ch: 0.40 ms XLA vs 0.76 ms Pallas for the stereo pair)
    while the kernel wins at the full-res 64-channel layer (1.29 vs 1.65).
    Returns (x_nhwc_half, [s1])."""
    from rspl_slam_tpu.ops.conv_stem_pallas import (conv3x3_cin1_nhcw,
                                                    conv3x3_nhcw)

    p = params
    w11 = p["conv1_1"]["w"].sum(axis=2, keepdims=True)  # replicated gray
    x11 = conv3x3_cin1_nhcw(w11, p["conv1_1"]["b"], x255)  # (B, H, 64, W)
    s1a = jnp.einsum("bhcw,c->bhw", x11,
                     _side_weight(p, "conv1", 0).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    x12p, s1b = conv3x3_nhcw(
        x11, p["conv1_2"]["w"], p["conv1_2"]["b"], pool=True,
        col_pool=False, side_w=_side_weight(p, "conv1", 1),
        interpret=interpret,
    )  # (B, H/2, 64, W) rows pooled, (B, H, W) full-res side score
    s1 = s1a + s1b + _stage_bias(p, "conv1", 2)
    # NHWC + the column half of the pool (W is a sublane dim in NHWC, so
    # the strided window is cheap here; in NHCW it is lane-strided — slow)
    x = jnp.transpose(x12p, (0, 1, 3, 2))  # (B, H/2, W, 64)
    x = jax.lax.reduce_window(
        x, jnp.asarray(-jnp.inf, x.dtype), jax.lax.max,
        (1, 1, 2, 1), (1, 1, 2, 1), "VALID",
    )
    return x.astype(compute_dtype), [s1]


@partial(jax.jit, static_argnames=("compute_dtype", "use_pallas_stem"))
def edge_logits(params: dict, images: jnp.ndarray, compute_dtype=jnp.bfloat16,
                use_pallas_stem: bool | None = None):
    """images (B, H, W) grayscale in [0, 1] → fused edge logits (B, H, W).

    Internally scales to 0..255 and replicates to 3 channels to match the
    reference's feeding convention (rcf.cpp:161-192).
    """
    B, H, W = images.shape
    if use_pallas_stem is None:
        # allowlist: Mosaic/TPU-only, inference-only (no VJP), full width
        use_pallas_stem = (
            compute_dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and params["conv1_1"]["w"].shape[3] == 64
            and H % 4 == 0 and W % 4 == 0
        )
    relu = jax.nn.relu
    side_scores = []
    if use_pallas_stem:
        x, stem_scores = _stem_pallas(params, images * 255.0, compute_dtype)
        for s in stem_scores:
            side_scores.append(
                _upsample_bilinear(s[..., None], H, W)
            )
        stages = _STAGES[1:]
    else:
        x = (images * 255.0)[..., None].repeat(3, -1)
        stages = _STAGES
    for sname, convs in stages:
        # public RCF: pool4 has stride 1 and conv5 uses dilation 2 so stage 5
        # stays at 1/8 resolution with an enlarged receptive field
        dil = 2 if sname == "conv5" else 1
        # the per-conv 21-ch side branches and the stage score are all 1×1
        # convs with NO nonlinearity between them, so score(Σ down_i(x_i))
        # folds into Σ x_i·(W_down_i·w_score): one 1-ch map per conv instead
        # of materializing (H, W, 21) f32 intermediates at full resolution
        # (an HBM-bandwidth win; numerically identical up to f32 rounding)
        ws = params[f"{sname}_score"]["w"]  # (1, 1, SIDE, 1)
        score = None
        bias = params[f"{sname}_score"]["b"].astype(jnp.float32)
        for i in range(len(convs)):
            x = relu(_conv(x, params[f"{sname}_{i + 1}"], compute_dtype, dil,
                           out_dtype=compute_dtype))
            pd = params[f"{sname}_{i + 1}_down"]
            wf = jnp.einsum("abcs,abst->abct", pd["w"], ws)
            contrib = _conv(x, {"w": wf, "b": jnp.zeros(1, wf.dtype)},
                            compute_dtype)
            score = contrib if score is None else score + contrib
            bias = bias + pd["b"].astype(jnp.float32) @ ws[0, 0, :, 0].astype(
                jnp.float32
            )
        score = score + bias
        side_scores.append(_upsample_bilinear(score, H, W))
        if sname != "conv5":
            x = _pool2(x, 2 if sname != "conv4" else 1)
    fused = _conv(jnp.concatenate(side_scores, -1), params["fuse"], compute_dtype)
    return fused[..., 0]


@partial(jax.jit, static_argnames=("compute_dtype",))
def edge_map(params: dict, images: jnp.ndarray, compute_dtype=jnp.bfloat16):
    """images (B, H, W) grayscale in [0, 1] → edge probability (B, H, W)
    (sigmoid of the fused side-output score — "output 230", rcf.cpp:137)."""
    return jax.nn.sigmoid(edge_logits(params, images, compute_dtype))
