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


def test_jittable_and_differentiable():
    # the solvers run under jit and (for training paths) under grad
    rng = np.random.default_rng(6)
    A = jnp.asarray(_spd(rng, 4, 3))

    @jax.jit
    def f(A):
        return jnp.sum(glin.inv3(A))

    g = jax.grad(lambda A: f(A))(A)
    assert np.all(np.isfinite(np.asarray(g)))
