"""Pallas TPU kernel: fused log-domain Sinkhorn.

The XLA path (ops/sinkhorn.py) emits ~2 reduction kernels per iteration —
at the reference's 100 iterations that is ~200 small dispatches over a
(401, 401) matrix that fits in VMEM ~40×. This kernel keeps the coupling
matrix resident in VMEM and runs the entire u/v iteration loop on-chip:
one dispatch per matcher call.

Masking contract matches log_optimal_transport_masked: padded slots carry
−1e9 in couplings and log-marginals, so they take no transport mass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["log_optimal_transport_masked_pallas"]

_NEG = -1e9


def _sinkhorn_kernel(iters: int):
    def kernel(z0_ref, mu_ref, nu_ref, out_ref):
        Z0 = z0_ref[0]  # (M1p, N1p)
        log_mu = mu_ref[0]  # (M1p, 1)
        log_nu = nu_ref[0]  # (1, N1p)

        def lse_rows(A):  # logsumexp over lanes (axis 1) → (M1p, 1)
            m = jnp.max(A, axis=1, keepdims=True)
            return m + jnp.log(jnp.sum(jnp.exp(A - m), axis=1, keepdims=True))

        def lse_cols(A):  # logsumexp over sublanes (axis 0) → (1, N1p)
            m = jnp.max(A, axis=0, keepdims=True)
            return m + jnp.log(jnp.sum(jnp.exp(A - m), axis=0, keepdims=True))

        def body(_, carry):
            u, v = carry
            u = log_mu - lse_rows(Z0 + v)
            v = log_nu - lse_cols(Z0 + u)
            return u, v

        u0 = jnp.zeros_like(log_mu)
        v0 = jnp.zeros_like(log_nu)
        u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
        out_ref[0] = Z0 + u + v

    return kernel


def _pad_to(x, rows, cols, fill):
    r, c = x.shape
    return jnp.pad(x, ((0, rows - r), (0, cols - c)), constant_values=fill)


@partial(jax.jit, static_argnames=("iters", "interpret"))
def log_optimal_transport_masked_pallas(
    scores: jnp.ndarray,  # (B, M, N)
    mask0: jnp.ndarray,  # (B, M)
    mask1: jnp.ndarray,  # (B, N)
    bin_score: jnp.ndarray,
    iters: int = 100,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for log_optimal_transport_masked (same output,
    (B, M+1, N+1) log-plan). Builds the padded coupling matrix in XLA,
    iterates fully inside one Pallas kernel per batch element."""
    B, M, N = scores.shape
    f32 = jnp.float32
    m0 = mask0
    m1 = mask1
    ms = jnp.sum(m0.astype(f32), -1)
    ns = jnp.sum(m1.astype(f32), -1)

    valid2d = m0[:, :, None] & m1[:, None, :]
    couplings = jnp.where(valid2d, scores, _NEG)
    bins0 = jnp.where(m0, bin_score, _NEG)[:, :, None]
    bins1 = jnp.where(m1, bin_score, _NEG)[:, None, :]
    alpha = jnp.broadcast_to(bin_score, (B, 1, 1)).astype(f32)
    Z0 = jnp.concatenate(
        [jnp.concatenate([couplings, bins0], -1),
         jnp.concatenate([bins1, alpha], -1)], 1,
    )  # (B, M+1, N+1)
    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate(
        [jnp.where(m0, norm[:, None], _NEG), (jnp.log(ns) + norm)[:, None]], -1
    )  # (B, M+1)
    log_nu = jnp.concatenate(
        [jnp.where(m1, norm[:, None], _NEG), (jnp.log(ms) + norm)[:, None]], -1
    )

    # pad to TPU tiles: sublanes ×8, lanes ×128. Padding rows/cols carry −1e9
    # marginals and couplings → mathematically inert (no mass).
    M1, N1 = M + 1, N + 1
    Mp = ((M1 + 7) // 8) * 8
    Np = ((N1 + 127) // 128) * 128
    Z0p = jax.vmap(lambda z: _pad_to(z, Mp, Np, _NEG))(Z0)
    mup = jax.vmap(lambda m: _pad_to(m[:, None], Mp, 1, _NEG))(log_mu)
    nup = jax.vmap(lambda n: _pad_to(n[None, :], 1, Np, _NEG))(log_nu)

    kernel = _sinkhorn_kernel(iters)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Mp, Np), f32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Mp, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Mp, Np), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Z0p, mup, nup)
    return out[:, :M1, :N1] - norm[:, None, None]
