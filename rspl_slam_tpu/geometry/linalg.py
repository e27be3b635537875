"""Closed-form small-matrix linear algebra for the jitted solvers.

On TPU, ``jnp.linalg.inv`` / ``jnp.linalg.solve`` lower to a pivoted-LU
routine built from sequential scalar steps — correct, but catastrophically
slow for the *batched tiny* systems SLAM solves everywhere. Measured on
v5e at the local-BA shapes (tools/profile_linalg.py, chained on-device
scan):

    inv of (512, 3, 3)  : 428.6 us (linalg.inv)  →   ~0 us (adjugate)
    inv of (L, 4, 4)    :  10.8 us (linalg.inv)  →    5 us (block Schur)
    solve 60×60         :  43.8 us (linalg.solve) →  ~0 us (Cholesky)

The adjugate/cofactor forms are pure VPU elementwise math that XLA fuses
into the surrounding assembly; Cholesky replaces LU's per-column pivot
chain with triangular solves. One local-BA LM iteration spends ~0.44 ms
of its 0.85 ms in these three calls (tools/profile_ba.py), so this module
roughly halves the bundle-adjustment step.

Numerics: the BA/pose systems are damped SPD normal equations (H = JᵀWJ +
λ·diag + εI), exactly the regime where the closed forms are stable. The
general 3×3 adjugate is also used for the non-symmetric V-matrix inverse
in the SE(3) exponential chart (se3.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["inv3", "inv4_spd", "solve3", "solve_spd", "eigvalsh3"]


def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form inverse of (..., 3, 3) via the adjugate.

    Precondition: A must be nonsingular — the adjugate form divides by
    det(A) with no guard, so a singular input yields inf/NaN silently
    (matching what an unpivoted solve would do). In-repo callers satisfy
    this by construction: damped SPD normal-equation blocks, and the
    V(w) matrix of the SE(3) exponential chart, which is invertible for
    ‖w‖ < 2π (the domain log_se3 produces).
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched (..., 3, 3) @ x = (..., 3) solve via the adjugate inverse.

    Same precondition as :func:`inv3`: A nonsingular (no det guard).
    """
    return jnp.einsum("...ij,...j->...i", inv3(A), b)


def _inv2(M: jnp.ndarray) -> jnp.ndarray:
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    det = a * d - b * c
    row0 = jnp.stack([d, -b], -1)
    row1 = jnp.stack([-c, a], -1)
    return jnp.stack([row0, row1], -2) / det[..., None, None]


def inv4_spd(A: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of symmetric positive-definite (..., 4, 4) matrices
    by 2×2 block inversion (Schur complement) with closed-form 2×2s.

    SPD guarantees both the top-left block and its Schur complement are
    invertible. Not valid for general (indefinite) matrices.
    """
    P = A[..., :2, :2]
    Q = A[..., :2, 2:]
    R = A[..., 2:, :2]
    S = A[..., 2:, 2:]
    Pi = _inv2(P)
    Mi = _inv2(S - R @ Pi @ Q)
    PiQ = Pi @ Q
    TL = Pi + PiQ @ Mi @ R @ Pi
    TR = -PiQ @ Mi
    BL = -Mi @ R @ Pi
    top = jnp.concatenate([TL, TR], -1)
    bot = jnp.concatenate([BL, Mi], -1)
    return jnp.concatenate([top, bot], -2)


def eigvalsh3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric (..., 3, 3) matrices, ascending — the
    closed-form trigonometric (Cardano) solution of the characteristic
    cubic, replacing ``jnp.linalg.eigvalsh``'s iterative TPU path for the
    batched rank checks in multi-view triangulation."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    ps = jnp.maximum(p, 1e-30)  # A ≈ q·I ⇒ all eigenvalues q (r moot)
    # r = det((A − q·I)/p) / 2, clamped for acos
    B00, B11, B22 = d0 / ps, d1 / ps, d2 / ps
    B01, B02, B12 = a01 / ps, a02 / ps, a12 / ps
    detB = (
        B00 * (B11 * B22 - B12 * B12)
        - B01 * (B01 * B22 - B12 * B02)
        + B02 * (B01 * B12 - B11 * B02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lmax = q + 2.0 * p * jnp.cos(phi)
    lmin = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lmid = 3.0 * q - lmax - lmin
    return jnp.stack([lmin, lmid, lmax], -1)


def solve_spd(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for symmetric positive-definite A (batched ok) via
    Cholesky + two triangular solves — no pivoting chain.

    ``b`` may be (..., N) or (..., N, K).
    """
    L = jax.lax.linalg.cholesky(A)
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    y = jax.lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=False
    )
    x = jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )
    return x[..., 0] if vec else x
