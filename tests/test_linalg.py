"""Closed-form small-matrix linalg vs the LAPACK-path reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspl_slam_tpu.geometry import linalg as glin


def _spd(rng, n, k, boost=3.0):
    A = rng.standard_normal((n, k, k))
    return (A @ A.transpose(0, 2, 1) + boost * np.eye(k)).astype(np.float32)


def test_inv3_general_matches_lu():
    rng = np.random.default_rng(0)
    # general (non-symmetric) well-conditioned matrices, e.g. se3's V(w)
    A = rng.standard_normal((64, 3, 3)).astype(np.float32)
    A += 3.0 * np.eye(3, dtype=np.float32)
    got = np.asarray(glin.inv3(jnp.asarray(A)))
    want = np.linalg.inv(A)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_inv3_spd_ba_blocks():
    rng = np.random.default_rng(1)
    A = _spd(rng, 512, 3)
    got = np.asarray(glin.inv3(jnp.asarray(A)))
    np.testing.assert_allclose(got @ A, np.tile(np.eye(3), (512, 1, 1)),
                               rtol=0, atol=5e-5)


def test_inv4_spd():
    rng = np.random.default_rng(2)
    A = _spd(rng, 64, 4)
    got = np.asarray(glin.inv4_spd(jnp.asarray(A)))
    np.testing.assert_allclose(got @ A, np.tile(np.eye(4), (64, 1, 1)),
                               rtol=0, atol=5e-4)


def test_solve3():
    rng = np.random.default_rng(3)
    A = _spd(rng, 16, 3)
    b = rng.standard_normal((16, 3)).astype(np.float32)
    got = np.asarray(glin.solve3(jnp.asarray(A), jnp.asarray(b)))
    want = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


@pytest.mark.parametrize("n", [6, 60, 128])
def test_solve_spd_sizes(n):
    rng = np.random.default_rng(4)
    A = rng.standard_normal((n, n))
    A = (A @ A.T + n * np.eye(n)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(glin.solve_spd(jnp.asarray(A), jnp.asarray(b)))
    want = np.linalg.solve(A, b)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4 * n)


def test_solve_spd_batched_matrix_rhs():
    rng = np.random.default_rng(5)
    A = _spd(rng, 8, 6, boost=6.0)
    B = rng.standard_normal((8, 6, 2)).astype(np.float32)
    got = np.asarray(glin.solve_spd(jnp.asarray(A), jnp.asarray(B)))
    want = np.linalg.solve(A, B)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


def test_eigvalsh3_matches_lapack():
    rng = np.random.default_rng(7)
    A = _spd(rng, 256, 3, boost=1.0)
    got = np.asarray(glin.eigvalsh3(jnp.asarray(A)))
    want = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-4)
    # near-singular (rank-2) matrices: the rank-check regime
    v = rng.standard_normal((32, 3, 1)).astype(np.float32)
    A2 = (np.eye(3) - v @ v.transpose(0, 2, 1)
          / np.sum(v * v, axis=1, keepdims=True))
    A2 = (A2 + A2.transpose(0, 2, 1)) / 2
    got2 = np.asarray(glin.eigvalsh3(jnp.asarray(A2.astype(np.float32))))
    want2 = np.linalg.eigvalsh(A2)
    # f32 Cardano splits a repeated eigenvalue by ~1e-4 (sqrt-eps regime,
    # same for any root-finder); the rank check uses the min/max ratio,
    # where this is noise
    np.testing.assert_allclose(got2, want2, rtol=0, atol=5e-4)
    # isotropic A = q*I: all eigenvalues q, no NaNs from the p=0 guard
    iso = np.tile(2.5 * np.eye(3, dtype=np.float32), (4, 1, 1))
    got3 = np.asarray(glin.eigvalsh3(jnp.asarray(iso)))
    np.testing.assert_allclose(got3, np.full((4, 3), 2.5), atol=1e-6)


def test_jittable_and_differentiable():
    # the solvers run under jit and (for training paths) under grad
    rng = np.random.default_rng(6)
    A = jnp.asarray(_spd(rng, 4, 3))

    @jax.jit
    def f(A):
        return jnp.sum(glin.inv3(A))

    g = jax.grad(lambda A: f(A))(A)
    assert np.all(np.isfinite(np.asarray(g)))
