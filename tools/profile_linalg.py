#!/usr/bin/env python
"""Micro-benchmark: batched small-matrix inverse + dense solve strategies
on the chip, at the local-BA shapes (512 3x3, 8 4x4, one 60x60 SPD)."""

import time

import numpy as np


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def adjugate_inv3(A):
    import jax.numpy as jnp

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


def blockwise_inv4(A):
    """4x4 inverse via 2x2 block inversion (Schur), closed-form 2x2s."""
    import jax.numpy as jnp

    def inv2(M):
        a, b = M[..., 0, 0], M[..., 0, 1]
        c, d = M[..., 1, 0], M[..., 1, 1]
        det = a * d - b * c
        row0 = jnp.stack([d, -b], -1)
        row1 = jnp.stack([-c, a], -1)
        return jnp.stack([row0, row1], -2) / det[..., None, None]

    P = A[..., :2, :2]
    Q = A[..., :2, 2:]
    R = A[..., 2:, :2]
    S = A[..., 2:, 2:]
    Pi = inv2(P)
    M = S - R @ Pi @ Q  # Schur complement
    Mi = inv2(M)
    TL = Pi + Pi @ Q @ Mi @ R @ Pi
    TR = -Pi @ Q @ Mi
    BL = -Mi @ R @ Pi
    BR = Mi
    top = jnp.concatenate([TL, TR], -1)
    bot = jnp.concatenate([BL, BR], -1)
    return jnp.concatenate([top, bot], -2)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/rspl_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    A3 = rng.standard_normal((512, 3, 3))
    A3 = A3 @ A3.transpose(0, 2, 1) + 3 * np.eye(3)
    A4 = rng.standard_normal((8, 4, 4))
    A4 = A4 @ A4.transpose(0, 2, 1) + 3 * np.eye(4)
    S = rng.standard_normal((60, 60))
    S = S @ S.T + 60 * np.eye(60)
    g = rng.standard_normal(60)
    A3j, A4j, Sj, gj = map(jnp.asarray, (A3, A4, S, g))

    def chained(stage, args, iters=100):
        @jax.jit
        def run(*a):
            def body(carry, _):
                out = stage(*carry)
                live = sum(
                    jnp.sum(o.astype(jnp.float32))
                    for o in jax.tree_util.tree_leaves(out)
                ) * 1e-12
                new = tuple(x + live * 1e-9 for x in carry)
                return new, live

            _, ts = jax.lax.scan(body, a, None, length=iters)
            return ts.sum()

        return run, args

    @jax.jit
    def noop(x):
        return x + 1.0

    float(noop(jnp.zeros(())))
    rtt = min(_timed(lambda: float(noop(jnp.zeros(())))) for _ in range(5))

    cho = jax.scipy.linalg.cho_factor
    chos = jax.scipy.linalg.cho_solve

    cases = [
        ("inv3 linalg.inv", lambda A: (jnp.linalg.inv(A),), (A3j,)),
        ("inv3 adjugate", lambda A: (adjugate_inv3(A),), (A3j,)),
        ("inv4 linalg.inv", lambda A: (jnp.linalg.inv(A),), (A4j,)),
        ("inv4 blockwise", lambda A: (blockwise_inv4(A),), (A4j,)),
        ("solve60 lu", lambda S, b: (jnp.linalg.solve(S, b),), (Sj, gj)),
        ("solve60 chol", lambda S, b: (chos(cho(S), b),), (Sj, gj)),
        (
            "solve60 cho_lax",
            lambda S, b: (
                jax.lax.linalg.triangular_solve(
                    jax.lax.linalg.cholesky(S),
                    jax.lax.linalg.triangular_solve(
                        jax.lax.linalg.cholesky(S), b[:, None],
                        left_side=True, lower=True, transpose_a=False,
                    ),
                    left_side=True, lower=True, transpose_a=True,
                )[:, 0],
            ),
            (Sj, gj),
        ),
    ]
    for name, stage, args in cases:
        run, a = chained(stage, args)
        float(run(*a))
        wall = min(_timed(lambda: float(run(*a))) for _ in range(3))
        t = max(wall - rtt, 0.0) / 100 * 1e3
        print(f"{name:>18}: {t * 1e3:8.1f} us")

    # correctness spot checks
    err3 = float(jnp.max(jnp.abs(adjugate_inv3(A3j) - jnp.linalg.inv(A3j))))
    err4 = float(jnp.max(jnp.abs(blockwise_inv4(A4j) - jnp.linalg.inv(A4j))))
    errs = float(
        jnp.max(jnp.abs(chos(cho(Sj), gj) - jnp.linalg.solve(Sj, gj)))
    )
    print(f"adjugate3 err {err3:.2e}  blockwise4 err {err4:.2e}  chol err {errs:.2e}")


if __name__ == "__main__":
    main()
