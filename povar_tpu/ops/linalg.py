"""Hand-rolled small batched linear algebra for TPU.

LAPACK-style custom calls (LU `jnp.linalg.solve`, f32 SVD, ...) are not
reliably available in f64 on TPU, and for tiny fixed-size blocks (3x3,
11x11, 12x12) a loop-free / short-fori formulation out of elementwise ops
and matmuls is both portable and much faster than emulated LAPACK.

These replace, in the reference implementation:
  - Eigen `Mat3::inverse()` (adjugate)      -> inv3x3
  - per-camera 12x12 / 11x11 `selfadjointView<Upper>().llt().solve(I)`
    (sc/linearization_power_varproj.hpp:141-188)  -> cholesky_small / inv_psd_small
  - `CompleteOrthogonalDecomposition` nullspace `kernel_COD`
    (bal/bal_bundle_adjustment_helper.cpp:199-216) -> nullspace_of_row
      (any orthonormal basis of the nullspace is mathematically
       equivalent; we use a closed-form Householder basis instead of COD)
  - per-landmark thin-SVD least squares `bdcSvd(...).solve`
    (helper.cpp:94) -> solved via normal equations + inv3x3 at the
    call site (the reference itself documents v*(u0) = (G^T G)^-1 G^T z,
    helper.cpp:218-219)

All functions operate on the *last two* axes and broadcast over leading
batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp
from povar_tpu.ops.small_einsum import small_einsum
from jax import lax


def _pow2_norm(s: jnp.ndarray) -> jnp.ndarray:
    """Exact power-of-two magnitude normalizer: 2^floor(log2(s)), or 1
    where s is zero/non-finite. Dividing a matrix by it is EXACT in
    IEEE arithmetic (mantissas unchanged), so prescaling the adjugate
    inverse below changes no bits in the normal range — it only
    prevents the cofactor (~|m|^2) and determinant (~|m|^3) products
    from overflowing the f32 exponent when the matrix carries a huge
    LM damping term (lambda > ~1.8e19 => lambda^2 > f32 max; the
    post-convergence backtracking spiral reaches lambda ~ 1e32 before
    the trust-region floor terminates, bal_bundle_adjustment.cpp
    min radius 1e-32)."""
    ok = jnp.isfinite(s) & (s > 0)
    return jnp.where(ok, jnp.exp2(jnp.floor(jnp.log2(jnp.where(ok, s, 1.0)))), 1.0)


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse via the adjugate.

    Matches Eigen's `Mat3::inverse()` used for Hll^-1
    (sc/landmark_block.hpp add_Hb_pOSE / get_Hll_inv_add_Hpp_b_pOSE),
    with exact power-of-two prescaling for f32 exponent headroom
    (see _pow2_norm).
    """
    scale = _pow2_norm(jnp.max(jnp.abs(m), axis=(-2, -1)))
    m = m / scale[..., None, None]
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / det

    adj = jnp.stack(
        [
            jnp.stack([co_a, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([co_b, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([co_c, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * (inv_det / scale)[..., None, None]


def solve3x3(m: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 solve m @ x = rhs via the adjugate inverse."""
    return small_einsum("...ij,...j->...i", inv3x3(m), rhs)


def cholesky_small(a: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky of small SPD matrices [..., n, n], n static.

    Left-looking column algorithm with n unrolled steps; each step is
    vectorized over the batch (VPU-friendly, no custom calls).
    """
    n = a.shape[-1]
    l = jnp.zeros_like(a)
    for j in range(n):
        # l[j, j] = sqrt(a[j, j] - sum_k l[j, k]^2)
        s = small_einsum("...k,...k->...", l[..., j, :j], l[..., j, :j])
        d = jnp.sqrt(a[..., j, j] - s)
        l = l.at[..., j, j].set(d)
        if j + 1 < n:
            # l[i, j] = (a[i, j] - sum_k l[i, k] l[j, k]) / d  for i > j
            s2 = small_einsum("...ik,...k->...i", l[..., j + 1 :, :j], l[..., j, :j])
            col = (a[..., j + 1 :, j] - s2) / d[..., None]
            l = l.at[..., j + 1 :, j].set(col)
    return l


def solve_lower_tri(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve l @ x = b for lower-triangular l; b is [..., n] or [..., n, m]."""
    n = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    x = jnp.zeros_like(b)
    for i in range(n):
        s = small_einsum("...k,...km->...m", l[..., i, :i], x[..., :i, :])
        x = x.at[..., i, :].set((b[..., i, :] - s) / l[..., i, i][..., None])
    return x[..., 0] if vec else x


def solve_upper_from_lower(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve l.T @ x = b for lower-triangular l (i.e. upper solve)."""
    n = l.shape[-1]
    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    x = jnp.zeros_like(b)
    for i in reversed(range(n)):
        s = small_einsum("...k,...km->...m", l[..., i + 1 :, i], x[..., i + 1 :, :])
        x = x.at[..., i, :].set((b[..., i, :] - s) / l[..., i, i][..., None])
    return x[..., 0] if vec else x


def solve_psd_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD solve via hand-rolled Cholesky (a x = b)."""
    l = cholesky_small(a)
    return solve_upper_from_lower(l, solve_lower_tri(l, b))


def inv_psd_small(a: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD inverse: llt().solve(Identity), as the reference's
    per-camera B^-1 blocks (sc/linearization_power_varproj.hpp:178-183)."""
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    return solve_psd_small(a, eye)


def nullspace_of_row(v: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal basis of the nullspace of a row vector.

    v: [..., n]  ->  [..., n, n-1] with columns spanning v-perp.

    Replaces `kernel_COD(v^T)` (helper.cpp:199-216): the tangent-space
    projector of the quotient manifold for a 1-dimensional constraint.
    Any orthonormal basis of v-perp is valid; we take columns 1..n-1 of
    the Householder reflector H = I - 2 w w^T / (w^T w) with
    w = v + sign(v_0) |v| e_0, for which H e_0 = -sign(v_0) v / |v|,
    hence H e_1, ..., H e_{n-1} span v-perp exactly.
    """
    n = v.shape[-1]
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    sign0 = jnp.where(v[..., :1] >= 0, 1.0, -1.0).astype(v.dtype)
    w = jnp.concatenate([v[..., :1] + sign0 * norm, v[..., 1:]], axis=-1)
    beta = 2.0 / jnp.sum(w * w, axis=-1, keepdims=True)
    # H[:, 1:] = I[:, 1:] - beta * w (w[1:])^T
    h_cols = -beta[..., None] * w[..., :, None] * w[..., None, 1:]
    eye_cols = jnp.eye(n, dtype=v.dtype)[:, 1:]
    return h_cols + eye_cols


# ---------------------------------------------------------------------
# Front-indexed ("batch-last") variants: matrix dims are the FIRST two
# axes, the batch axis is last. This is the TPU-native layout for large
# batches of tiny matrices ([3,3,M], [12,12,N]): XLA tiles the last two
# dimensions onto (sublane, lane) registers, so batch-last arrays pad to
# ~1x while batch-first [M,3,3] arrays pad the 3-wide minor dim to 128
# lanes (a 40x memory blowup). Same algorithms as above, indexing from
# the front.
# ---------------------------------------------------------------------


def inv3x3f(m: jnp.ndarray) -> jnp.ndarray:
    """Adjugate 3x3 inverse of m [3, 3, ...] -> [3, 3, ...], with
    exact power-of-two prescaling for f32 exponent headroom
    (see _pow2_norm)."""
    scale = _pow2_norm(jnp.max(jnp.abs(m), axis=(0, 1)))
    m = m / scale[None, None]
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    inv_det = 1.0 / (a * co_a + b * co_b + c * co_c)
    adj = jnp.stack(
        [
            jnp.stack([co_a, c * h - b * i, b * f - c * e], axis=0),
            jnp.stack([co_b, a * i - c * g, c * d - a * f], axis=0),
            jnp.stack([co_c, b * g - a * h, a * e - b * d], axis=0),
        ],
        axis=0,
    )
    return adj * (inv_det / scale)[None, None]


def solve3x3f(m: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve m @ x = rhs with m [3,3,...], rhs [3,...] -> [3,...]."""
    return small_einsum("ij...,j...->i...", inv3x3f(m), rhs)


def cholesky_smallf(a: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of a [n, n, ...] SPD batch-last array, n static."""
    n = a.shape[0]
    rows = []
    for i in range(n):
        rows.append([jnp.zeros_like(a[0, 0])] * n)
    for j in range(n):
        s = sum(rows[j][k] * rows[j][k] for k in range(j)) if j else 0.0
        d = jnp.sqrt(a[j, j] - s)
        rows[j][j] = d
        for i in range(j + 1, n):
            s2 = sum(rows[i][k] * rows[j][k] for k in range(j)) if j else 0.0
            rows[i][j] = (a[i, j] - s2) / d
    return jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)


def solve_lower_trif(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve l @ x = b with l [n,n,...] lower-tri, b [n,...]."""
    n = l.shape[0]
    x = [None] * n
    for i in range(n):
        s = sum(l[i, k] * x[k] for k in range(i)) if i else 0.0
        x[i] = (b[i] - s) / l[i, i]
    return jnp.stack(x, axis=0)


def solve_upper_from_lowerf(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve l.T @ x = b with l [n,n,...] lower-tri, b [n,...]."""
    n = l.shape[0]
    x = [None] * n
    for i in reversed(range(n)):
        s = (
            sum(l[k, i] * x[k] for k in range(i + 1, n))
            if i + 1 < n
            else 0.0
        )
        x[i] = (b[i] - s) / l[i, i]
    return jnp.stack(x, axis=0)


def solve_psd_smallf(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    l = cholesky_smallf(a)
    return solve_upper_from_lowerf(l, solve_lower_trif(l, b))


def inv_psd_smallf(a: jnp.ndarray) -> jnp.ndarray:
    """SPD inverse of a [n, n, ...] batch-last array: one Cholesky, n
    unit-column triangular solves."""
    n = a.shape[0]
    l = cholesky_smallf(a)
    batch_shape = a.shape[2:]
    cols = []
    for j in range(n):
        e = jnp.stack(
            [
                jnp.ones(batch_shape, a.dtype)
                if i == j
                else jnp.zeros(batch_shape, a.dtype)
                for i in range(n)
            ],
            axis=0,
        )
        cols.append(solve_upper_from_lowerf(l, solve_lower_trif(l, e)))
    return jnp.stack(cols, axis=1)


def nullspace_of_rowf(v: jnp.ndarray) -> jnp.ndarray:
    """Householder nullspace basis of v [n, ...] -> [n, n-1, ...]
    (batch-last variant of nullspace_of_row)."""
    n = v.shape[0]
    norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
    sign0 = jnp.where(v[:1] >= 0, 1.0, -1.0).astype(v.dtype)
    w = jnp.concatenate([v[:1] + sign0 * norm, v[1:]], axis=0)
    beta = 2.0 / jnp.sum(w * w, axis=0)
    h_cols = -beta[None, None] * w[:, None] * w[None, 1:]
    eye_cols = jnp.eye(n, dtype=v.dtype)[:, 1:].reshape(
        (n, n - 1) + (1,) * (v.ndim - 1)
    )
    return h_cols + eye_cols


def frobenius_normalize(m: jnp.ndarray) -> jnp.ndarray:
    """Normalize over the last two axes (Eigen `Matrix::normalize()` on a
    Mat34 normalizes the full coefficient vector, used for the step-2
    camera retraction, bal_bundle_adjustment.cpp:700-702)."""
    norm = jnp.sqrt(jnp.sum(m * m, axis=(-2, -1), keepdims=True))
    return m / norm
