"""Masked log-domain Sinkhorn optimal transport.

The matching-layer core of SuperGlue (convert2onnx/superglue.py:178-205 and
the CPU reference in super_glue.cpp:369-435). TPU-native differences:

- a validity mask per keypoint set — padded slots must not receive transport
  mass, which the reference never needed (it had true dynamic N);
- runs under ``lax.scan`` with static iteration count so it compiles once;
- batched over pairs (the reference matched one pair per GPU call).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["log_optimal_transport_masked"]

_NEG = -1e9


def log_optimal_transport_masked(
    scores: jnp.ndarray,  # (B, M, N) similarity matrix
    mask0: jnp.ndarray,  # (B, M) bool valid rows
    mask1: jnp.ndarray,  # (B, N) bool valid cols
    bin_score: jnp.ndarray,  # scalar dustbin logit α
    iters: int = 100,
) -> jnp.ndarray:
    """Returns (B, M+1, N+1) log transport plan Z (incl. dustbins), scaled by
    M+N like the reference (``Z - norm``), where M, N are the *valid* counts.

    Invalid rows/cols get their similarity clamped to −1e9 so all their mass
    flows to the dustbin and they cannot soak up matches from valid slots.
    """
    B, M, N = scores.shape
    f32 = scores.dtype
    m0 = mask0.astype(f32)
    m1 = mask1.astype(f32)
    ms = jnp.sum(m0, -1)  # (B,) valid row count
    ns = jnp.sum(m1, -1)

    valid2d = mask0[:, :, None] & mask1[:, None, :]
    couplings = jnp.where(valid2d, scores, _NEG)
    bins0 = jnp.where(mask0, bin_score, _NEG)[:, :, None]  # (B, M, 1)
    bins1 = jnp.where(mask1, bin_score, _NEG)[:, None, :]  # (B, 1, N)
    alpha = jnp.broadcast_to(bin_score, (B, 1, 1)).astype(f32)
    Z0 = jnp.concatenate(
        [jnp.concatenate([couplings, bins0], -1), jnp.concatenate([bins1, alpha], -1)],
        1,
    )  # (B, M+1, N+1)

    norm = -jnp.log(ms + ns)  # (B,)
    # log marginals: each valid keypoint has mass 1/(M+N); dustbin row gets
    # N/(M+N), dustbin col M/(M+N); invalid slots get -inf (no mass).
    log_mu = jnp.concatenate(
        [
            jnp.where(mask0, norm[:, None], _NEG),
            (jnp.log(ns) + norm)[:, None],
        ],
        -1,
    )  # (B, M+1)
    log_nu = jnp.concatenate(
        [
            jnp.where(mask1, norm[:, None], _NEG),
            (jnp.log(ms) + norm)[:, None],
        ],
        -1,
    )  # (B, N+1)

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(Z0 + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z0 + u[:, :, None], axis=1)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=iters)
    Z = Z0 + u[:, :, None] + v[:, None, :]
    return Z - norm[:, None, None]
