"""SuperGlue graph matcher as pure JAX — attention GNN + masked Sinkhorn.

TPU-native replacement for the reference's TensorRT SuperGlue engine
(super_glue.cpp) with the architecture of the public model
(convert2onnx/superglue.py:212-325):

- KeypointEncoder: MLP [3 → 32 → 64 → 128 → 256] over (x, y, score), with
  BatchNorm in the reference; here BN is folded to scale+shift (inference
  semantics) so the op is a plain fused matmul chain.
- AttentionalGNN: 18 alternating self/cross attention layers, 4 heads,
  d=256, message MLP [512 → 512 → 256] with residual update.
- Final 1×1 projection, similarity = ⟨mdesc0, mdesc1⟩/√256, masked
  log-Sinkhorn OT with learned dustbin (100 iters).

TPU-first design choices:
- everything is batched over pairs (B axis); the frame-to-keyframe and
  left-right matching calls can share one compiled graph;
- padded keypoints carry a mask through attention (additive −1e9 bias) and
  Sinkhorn (zero marginal mass) — the reference used true dynamic shapes
  which would force XLA recompilation every frame;
- attention uses plain einsum — XLA's cross-layer fusion runs the whole
  18-layer chain near-optimally at K≈400 (measured ≈0.06 ms/layer inside
  the jit vs 0.38 ms for a standalone fused-Pallas layer dispatch, see
  ops/attention_pallas.py). The Pallas kernels remain as validated
  building blocks for much larger keypoint counts, where per-layer
  tiling control starts to matter.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rspl_slam_tpu.config import SuperGlueConfig
from rspl_slam_tpu.ops.matching import mutual_match_decode, normalize_keypoints
from rspl_slam_tpu.ops.sinkhorn import log_optimal_transport_masked

__all__ = ["init_params", "load_torch_weights", "match_pair", "MatchResult"]


def _mlp_shapes(channels):
    return list(zip(channels[:-1], channels[1:]))


def init_params(key: jax.Array, cfg: SuperGlueConfig, dtype=jnp.float32) -> dict:
    """Random-init parameter pytree with the public architecture shapes."""
    d = cfg.descriptor_dim
    params: dict[str, Any] = {}

    def dense(key, cin, cout):
        k1, key = jax.random.split(key)
        w = jax.random.normal(k1, (cin, cout), dtype) * jnp.sqrt(1.0 / cin)
        return key, {"w": w, "b": jnp.zeros((cout,), dtype)}

    # keypoint encoder: [3] + list(cfg.keypoint_encoder) + [d]; BN folded to
    # identity at init (scale=1, shift=0).
    kenc = []
    chans = [3, *cfg.keypoint_encoder, d]
    for cin, cout in _mlp_shapes(chans):
        key, lin = dense(key, cin, cout)
        lin["bn_scale"] = jnp.ones((cout,), dtype)
        lin["bn_shift"] = jnp.zeros((cout,), dtype)
        kenc.append(lin)
    params["kenc"] = kenc

    layers = []
    for _ in range(cfg.num_gnn_layers):
        layer = {}
        for nm in ("q", "k", "v", "merge"):
            key, lin = dense(key, d, d)
            layer[nm] = lin
        mlp = []
        for cin, cout in _mlp_shapes([2 * d, 2 * d, d]):
            key, lin = dense(key, cin, cout)
            lin["bn_scale"] = jnp.ones((cout,), dtype)
            lin["bn_shift"] = jnp.zeros((cout,), dtype)
            mlp.append(lin)
        layer["mlp"] = mlp
        layers.append(layer)
    params["gnn"] = layers

    key, fp = dense(key, d, d)
    params["final_proj"] = fp
    params["bin_score"] = jnp.asarray(1.0, dtype)
    return params


def load_torch_weights(path: str, cfg: SuperGlueConfig | None = None) -> dict:
    """Map the public superglue_{indoor,outdoor}.pth into our pytree.

    Torch layout: Conv1d(k=1) weights (cout, cin, 1); BatchNorm running
    stats are folded into scale/shift: y = γ·(x−μ)/√(σ²+ε) + β.
    """
    import torch

    cfg = cfg or SuperGlueConfig()
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}

    def lin(prefix):
        w = sd[f"{prefix}.weight"]  # (cout, cin, 1) conv1d or (cout, cin)
        w = w.reshape(w.shape[0], w.shape[1])
        return {"w": jnp.asarray(w.T), "b": jnp.asarray(sd[f"{prefix}.bias"])}

    # Head-layout permutation: the public model splits the channel axis as
    # view(B, head_dim, num_heads, N) — head_dim-major — while our attention
    # reshapes (B, K, num_heads, head_dim) — num_heads-major
    # (convert2onnx/superglue.py:139-142 vs _attention above). Absorb the
    # difference at load time by permuting q/k/v OUTPUT channels and merge
    # INPUT channels so the compiled attention math is identical.
    d = cfg.descriptor_dim
    dh = d // cfg.num_heads
    head_perm = np.arange(d).reshape(dh, cfg.num_heads).T.ravel()

    def lin_qkv(prefix):
        p = lin(prefix)
        return {"w": p["w"][:, head_perm], "b": p["b"][head_perm]}

    def lin_merge(prefix):
        p = lin(prefix)
        return {"w": p["w"][head_perm, :], "b": p["b"]}

    def fold_bn(prefix, eps=1e-5):
        g = sd[f"{prefix}.weight"]
        b = sd[f"{prefix}.bias"]
        mu = sd[f"{prefix}.running_mean"]
        var = sd[f"{prefix}.running_var"]
        scale = g / np.sqrt(var + eps)
        return jnp.asarray(scale), jnp.asarray(b - mu * scale)

    params: dict[str, Any] = {}
    # kenc.encoder: Sequential[Conv1d, BN, ReLU, Conv1d, BN, ReLU, ..., Conv1d]
    kenc = []
    n_mlp = len(cfg.keypoint_encoder) + 1
    seq_idx = 0
    for i in range(n_mlp):
        layer = lin(f"kenc.encoder.{seq_idx}")
        seq_idx += 1
        if i < n_mlp - 1:
            s, sh = fold_bn(f"kenc.encoder.{seq_idx}")
            layer["bn_scale"], layer["bn_shift"] = s, sh
            seq_idx += 2  # BN + ReLU
        else:
            layer["bn_scale"] = jnp.ones_like(layer["b"])
            layer["bn_shift"] = jnp.zeros_like(layer["b"])
        kenc.append(layer)
    params["kenc"] = kenc

    layers = []
    for li in range(cfg.num_gnn_layers):
        base = f"gnn.layers.{li}"
        layer = {
            "q": lin_qkv(f"{base}.attn.proj.0"),
            "k": lin_qkv(f"{base}.attn.proj.1"),
            "v": lin_qkv(f"{base}.attn.proj.2"),
            "merge": lin_merge(f"{base}.attn.merge"),
        }
        mlp = []
        m0 = lin(f"{base}.mlp.0")
        s, sh = fold_bn(f"{base}.mlp.1")
        m0["bn_scale"], m0["bn_shift"] = s, sh
        mlp.append(m0)
        m1 = lin(f"{base}.mlp.3")
        m1["bn_scale"] = jnp.ones_like(m1["b"])
        m1["bn_shift"] = jnp.zeros_like(m1["b"])
        mlp.append(m1)
        layer["mlp"] = mlp
        layers.append(layer)
    params["gnn"] = layers
    params["final_proj"] = lin("final_proj")
    params["bin_score"] = jnp.asarray(float(sd["bin_score"]))
    return params


def _apply_mlp(mlp, x, compute_dtype, final_act=False):
    """x: (B, K, C). Linear → (folded BN) → ReLU chain; last layer linear."""
    n = len(mlp)
    for i, layer in enumerate(mlp):
        w = layer["w"].astype(compute_dtype)
        x = (
            jnp.einsum("bkc,cd->bkd", x.astype(compute_dtype), w,
                       preferred_element_type=jnp.float32)
            + layer["b"]
        )
        if i < n - 1 or final_act:
            x = x * layer["bn_scale"] + layer["bn_shift"]
            x = jax.nn.relu(x)
    return x


def _proj(lin, t, compute_dtype):
    return (
        jnp.einsum("bkc,cd->bkd", t.astype(compute_dtype),
                   lin["w"].astype(compute_dtype),
                   preferred_element_type=jnp.float32)
        + lin["b"]
    )


def _attention(layer, x, source, src_mask, num_heads, compute_dtype):
    """Multi-head attention x ← attend(x → source) with masked keys.

    x: (B, K, C); source: (B, S, C); src_mask: (B, S) bool.
    """
    B, K, C = x.shape
    dh = C // num_heads
    q = _proj(layer["q"], x, compute_dtype).reshape(B, K, num_heads, dh)
    k = _proj(layer["k"], source, compute_dtype).reshape(B, -1, num_heads, dh)
    v = _proj(layer["v"], source, compute_dtype).reshape(B, -1, num_heads, dh)
    msg = _attend(q, k, v, src_mask, compute_dtype).reshape(B, K, C)
    return _proj(layer["merge"], msg, compute_dtype)


def _attend(q, k, v, src_mask, compute_dtype):
    """Masked softmax attention on (B, K, H, dh) tensors → (B, K, H, dh)."""
    dh = q.shape[-1]
    logits = jnp.einsum("bqhd,bshd->bhqs", q.astype(compute_dtype),
                        k.astype(compute_dtype),
                        preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(dh, jnp.float32)
    )
    logits = jnp.where(src_mask[:, None, None, :], logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqs,bshd->bqhd", probs.astype(compute_dtype),
                      v.astype(compute_dtype),
                      preferred_element_type=jnp.float32)


class MatchResult:
    def __init__(self, indices0, indices1, mscores0, log_plan):
        self.indices0 = indices0  # (B, M) int32, −1 = unmatched
        self.indices1 = indices1  # (B, N)
        self.mscores0 = mscores0  # (B, M)
        self.log_plan = log_plan  # (B, M+1, N+1)

    def tree_flatten(self):
        return (self.indices0, self.indices1, self.mscores0, self.log_plan), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    MatchResult, MatchResult.tree_flatten, MatchResult.tree_unflatten
)


@partial(jax.jit, static_argnames=("cfg", "compute_dtype", "sinkhorn_iters"))
def match_pair(
    params: dict,
    xy0: jnp.ndarray,  # (B, M, 2) pixels
    score0: jnp.ndarray,  # (B, M)
    desc0: jnp.ndarray,  # (B, M, C)
    mask0: jnp.ndarray,  # (B, M) bool
    xy1: jnp.ndarray,
    score1: jnp.ndarray,
    desc1: jnp.ndarray,
    mask1: jnp.ndarray,
    cfg: SuperGlueConfig,
    compute_dtype=jnp.bfloat16,
    sinkhorn_iters: int | None = None,
) -> MatchResult:
    """Full SuperGlue matching of batched padded keypoint sets."""
    kxy0 = normalize_keypoints(xy0, cfg.image_width, cfg.image_height)
    kxy1 = normalize_keypoints(xy1, cfg.image_width, cfg.image_height)

    enc_in0 = jnp.concatenate([kxy0, score0[..., None]], -1)  # (B, M, 3)
    enc_in1 = jnp.concatenate([kxy1, score1[..., None]], -1)

    B, M, _ = desc0.shape
    N = desc1.shape[1]
    if M == N:
        # Both sides share every weight (kenc, q/k/v/merge, mlp, final_proj),
        # so stack them along the batch axis and run each projection as ONE
        # matmul on (2B, K, C) instead of two on (B, K, C) — at K≈400 the
        # per-layer matmuls are latency-bound, so halving the dispatch count
        # nearly halves GNN time. Self layers attend within each half; cross
        # layers just swap the halves of the (pointwise) k/v projections.
        H = cfg.num_heads
        x = jnp.concatenate([desc0, desc1], 0) + _apply_mlp(
            params["kenc"], jnp.concatenate([enc_in0, enc_in1], 0),
            compute_dtype,
        )  # (2B, K, C)
        masks = jnp.concatenate([mask0, mask1], 0)  # (2B, K)
        flip = lambda t: jnp.concatenate([t[B:], t[:B]], 0)
        masks_flip = flip(masks)
        for li, layer in enumerate(params["gnn"]):
            cross = li % 2 == 1
            C = x.shape[-1]
            q = _proj(layer["q"], x, compute_dtype).reshape(2 * B, M, H, -1)
            k = _proj(layer["k"], x, compute_dtype).reshape(2 * B, M, H, -1)
            v = _proj(layer["v"], x, compute_dtype).reshape(2 * B, M, H, -1)
            if cross:  # pointwise projections commute with the half-swap
                k, v = flip(k), flip(v)
            msg = _attend(
                q, k, v, masks_flip if cross else masks, compute_dtype
            ).reshape(2 * B, M, C)
            msg = _proj(layer["merge"], msg, compute_dtype)
            x = x + _apply_mlp(
                layer["mlp"], jnp.concatenate([x, msg], -1), compute_dtype
            )
        md = _proj(params["final_proj"], x, compute_dtype)
        md0, md1 = md[:B], md[B:]
    else:
        d0 = desc0 + _apply_mlp(params["kenc"], enc_in0, compute_dtype)
        d1 = desc1 + _apply_mlp(params["kenc"], enc_in1, compute_dtype)
        for li, layer in enumerate(params["gnn"]):
            cross = li % 2 == 1  # layers alternate self, cross, self, ...
            src0, sm0 = (d1, mask1) if cross else (d0, mask0)
            src1, sm1 = (d0, mask0) if cross else (d1, mask1)
            delta0 = _apply_mlp(
                layer["mlp"],
                jnp.concatenate(
                    [d0, _attention(layer, d0, src0, sm0, cfg.num_heads,
                                    compute_dtype)], -1
                ),
                compute_dtype,
            )
            delta1 = _apply_mlp(
                layer["mlp"],
                jnp.concatenate(
                    [d1, _attention(layer, d1, src1, sm1, cfg.num_heads,
                                    compute_dtype)], -1
                ),
                compute_dtype,
            )
            d0 = d0 + delta0
            d1 = d1 + delta1
        md0 = _proj(params["final_proj"], d0, compute_dtype)
        md1 = _proj(params["final_proj"], d1, compute_dtype)
    sim = jnp.einsum("bmc,bnc->bmn", md0.astype(compute_dtype),
                     md1.astype(compute_dtype),
                     preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.asarray(cfg.descriptor_dim, jnp.float32)
    )
    iters = cfg.sinkhorn_iterations if sinkhorn_iters is None else sinkhorn_iters
    Z = log_optimal_transport_masked(sim, mask0, mask1, params["bin_score"], iters)
    idx0, idx1, ms0 = mutual_match_decode(Z, mask0, mask1, cfg.match_threshold)
    return MatchResult(idx0, idx1, ms0, Z)
