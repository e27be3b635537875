"""Pallas TPU kernel: fused SuperGlue attentional-propagation layer.

One GNN layer of the matcher is: Q/K/V projections → 4-head attention →
merge projection → concat[x, message] → 2-layer MLP (folded BN + ReLU) →
residual delta. XLA runs this as ~10 separate ops per layer × 18 layers ×
2 keypoint sets; at K≈400 every matmul is tiny (400×256) so the chain is
latency-bound, not FLOP-bound.

This kernel runs the ENTIRE layer for one keypoint set in a single Pallas
dispatch with everything resident in VMEM (activations 400×256 ≈ 0.4 MB,
weights ≈ 2.3 MB — far under the 16 MB budget). Heads are unrolled; all
matmuls hit the MXU with f32 accumulation.

Masking: invalid source keypoints get −1e9 attention logits, identical to
the XLA path (models/superglue.py:_attention).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["attention_layer_fused"]


def _layer_kernel(num_heads: int):
    def kernel(x_ref, src_ref, smask_ref,
               wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
               wm_ref, bm_ref,
               w1a_ref, w1b_ref, b1_ref, s1_ref, t1_ref,
               w2_ref, b2_ref,
               out_ref):
        x = x_ref[:]  # (K, C)
        src = src_ref[:]  # (S, C)
        smask = smask_ref[:]  # (1, S) float (1 valid / 0 pad) — lane-major
        # so masking logits (K, S) is a plain lane broadcast (no transpose)
        C = x.shape[1]
        dh = C // num_heads

        def proj(t, w_ref, b_ref):
            return (
                jnp.dot(t, w_ref[:], preferred_element_type=jnp.float32)
                + b_ref[:]
            )

        q = proj(x, wq_ref, bq_ref)  # (K, C)
        k = proj(src, wk_ref, bk_ref)  # (S, C)
        v = proj(src, wv_ref, bv_ref)
        scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        neg = jnp.asarray(-1e9, jnp.float32)

        msg_parts = []
        for h in range(num_heads):
            qh = q[:, h * dh:(h + 1) * dh]
            kh = k[:, h * dh:(h + 1) * dh]
            vh = v[:, h * dh:(h + 1) * dh]
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (K, S)
            logits = jnp.where(smask > 0, logits, neg)
            m = jnp.max(logits, axis=1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            msg_parts.append(
                jnp.dot(p, vh, preferred_element_type=jnp.float32)
            )
        msg = jnp.concatenate(msg_parts, axis=1)  # (K, C)
        msg = proj(msg, wm_ref, bm_ref)

        # MLP over concat[x, msg]: split the (2C, 2C) first weight into two
        # (C, 2C) halves so no concat buffer is needed.
        h1 = (
            jnp.dot(x, w1a_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(msg, w1b_ref[:], preferred_element_type=jnp.float32)
            + b1_ref[:]
        )
        h1 = jnp.maximum(h1 * s1_ref[:] + t1_ref[:], 0.0)  # folded BN + ReLU
        delta = (
            jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
            + b2_ref[:]
        )
        out_ref[:] = x + delta

    return kernel


@partial(jax.jit, static_argnames=("num_heads", "interpret"))
def attention_layer_fused(
    x: jnp.ndarray,  # (K, C) target set descriptors
    source: jnp.ndarray,  # (S, C)
    src_mask: jnp.ndarray,  # (S,) bool
    layer: dict,  # q/k/v/merge {w,b} + mlp [..]
    num_heads: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + AttentionalPropagation(x ← source), fused. f32 in/out."""
    K, C = x.shape
    S = source.shape[0]
    f32 = jnp.float32

    def g(p):
        return p.astype(f32)

    mlp0, mlp1 = layer["mlp"]
    w1 = g(mlp0["w"])  # (2C, 2C)
    w1a, w1b = w1[:C], w1[C:]
    w2 = g(mlp1["w"])  # (2C, C)

    smask = src_mask.astype(f32)[None, :]
    out = pl.pallas_call(
        _layer_kernel(num_heads),
        out_shape=jax.ShapeDtypeStruct((K, C), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 18,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        g(x), g(source), smask,
        g(layer["q"]["w"]), g(layer["q"]["b"]),
        g(layer["k"]["w"]), g(layer["k"]["b"]),
        g(layer["v"]["w"]), g(layer["v"]["b"]),
        g(layer["merge"]["w"]), g(layer["merge"]["b"]),
        w1a, w1b, g(mlp0["b"]), g(mlp0["bn_scale"]), g(mlp0["bn_shift"]),
        w2, g(mlp1["b"]),
    )
    return out
