"""Tests for hand-rolled batched linear algebra (povar_tpu.ops.linalg)."""

import jax.numpy as jnp
import numpy as np

from povar_tpu.ops import linalg


def _spd(rng, batch, n):
    a = rng.standard_normal((batch, n, n))
    return a @ a.transpose(0, 2, 1) + n * np.eye(n)


def test_inv3x3():
    rng = np.random.default_rng(0)
    m = _spd(rng, 16, 3)
    inv = np.asarray(linalg.inv3x3(jnp.asarray(m)))
    np.testing.assert_allclose(inv @ m, np.broadcast_to(np.eye(3), inv.shape), atol=1e-9)


def test_inv3x3_nonsymmetric():
    rng = np.random.default_rng(1)
    m = rng.standard_normal((8, 3, 3)) + 3 * np.eye(3)
    inv = np.asarray(linalg.inv3x3(jnp.asarray(m)))
    np.testing.assert_allclose(inv @ m, np.broadcast_to(np.eye(3), inv.shape), atol=1e-9)


def test_cholesky_small_matches_numpy():
    rng = np.random.default_rng(2)
    for n in (3, 11, 12):
        a = _spd(rng, 4, n)
        l = np.asarray(linalg.cholesky_small(jnp.asarray(a)))
        np.testing.assert_allclose(
            l @ l.transpose(0, 2, 1), a, rtol=1e-10, atol=1e-10
        )
        np.testing.assert_allclose(np.triu(l, 1), 0.0, atol=0.0)


def test_solve_psd_small():
    rng = np.random.default_rng(3)
    for n in (3, 11, 12):
        a = _spd(rng, 5, n)
        b = rng.standard_normal((5, n))
        x = np.asarray(linalg.solve_psd_small(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", a, x), b, rtol=1e-9, atol=1e-9
        )


def test_solve_psd_small_matrix_rhs():
    rng = np.random.default_rng(4)
    a = _spd(rng, 5, 12)
    b = rng.standard_normal((5, 12, 3))
    x = np.asarray(linalg.solve_psd_small(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(a @ x, b, rtol=1e-9, atol=1e-9)


def test_inv_psd_small():
    rng = np.random.default_rng(5)
    a = _spd(rng, 7, 11)
    inv = np.asarray(linalg.inv_psd_small(jnp.asarray(a)))
    np.testing.assert_allclose(inv @ a, np.broadcast_to(np.eye(11), inv.shape), atol=1e-8)


def test_nullspace_of_row():
    rng = np.random.default_rng(6)
    for n in (4, 12):
        v = rng.standard_normal((10, n))
        k = np.asarray(linalg.nullspace_of_row(jnp.asarray(v)))
        assert k.shape == (10, n, n - 1)
        # columns orthonormal
        gram = np.einsum("bik,bil->bkl", k, k)
        np.testing.assert_allclose(gram, np.broadcast_to(np.eye(n - 1), gram.shape), atol=1e-12)
        # v in the left nullspace
        np.testing.assert_allclose(
            np.einsum("bi,bik->bk", v, k), 0.0, atol=1e-12
        )


def test_nullspace_negative_leading():
    # sign handling: v[0] < 0 must not cancel catastrophically
    v = jnp.asarray([[-5.0, 1.0, 2.0, 0.5]])
    k = np.asarray(linalg.nullspace_of_row(v))
    np.testing.assert_allclose(
        np.einsum("bi,bik->bk", np.asarray(v), k), 0.0, atol=1e-12
    )


def test_frobenius_normalize():
    rng = np.random.default_rng(7)
    m = rng.standard_normal((5, 3, 4))
    out = np.asarray(linalg.frobenius_normalize(jnp.asarray(m)))
    norms = np.sqrt((out**2).sum(axis=(1, 2)))
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)
