"""Finite-difference Jacobian checks for the residual math, mirroring
the reference's test_jacobian.hpp strategy (central differences against
analytic Jacobians, double-precision tolerances)."""

import jax.numpy as jnp
import numpy as np

from povar_tpu.ops import pose_math

ALPHA = 0.01


def _central_diff(f, x0, eps=1e-7):
    x0 = np.asarray(x0, dtype=np.float64)
    f0 = np.asarray(f(x0))
    jac = np.zeros(f0.shape + x0.shape)
    for idx in np.ndindex(x0.shape):
        xp = x0.copy()
        xm = x0.copy()
        xp[idx] += eps
        xm[idx] -= eps
        jac[(...,) + idx] = (np.asarray(f(xp)) - np.asarray(f(xm))) / (
            2 * eps
        )
    return jac


def _random_setup(seed=0):
    rng = np.random.default_rng(seed)
    P = rng.standard_normal((3, 4))
    x = rng.standard_normal(3)
    uv = rng.standard_normal(2)
    return P, x, uv


def test_pose_jacobian_wrt_landmark():
    P, x, uv = _random_setup(0)
    r, Jp, Jl = pose_math.pose_jacobians(
        jnp.asarray(P)[None], jnp.asarray(x)[None], jnp.asarray(uv)[None],
        ALPHA,
    )
    num = _central_diff(
        lambda xx: pose_math.pose_residual(
            jnp.asarray(P)[None], jnp.asarray(xx)[None],
            jnp.asarray(uv)[None], ALPHA,
        )[0],
        x,
    )
    np.testing.assert_allclose(np.asarray(Jl)[0], num, atol=1e-6)


def test_pose_jacobian_wrt_camera():
    P, x, uv = _random_setup(1)

    def f(p12):
        return pose_math.pose_residual(
            jnp.asarray(p12.reshape(3, 4))[None],
            jnp.asarray(x)[None],
            jnp.asarray(uv)[None],
            ALPHA,
        )[0]

    _, Jp, _ = pose_math.pose_jacobians(
        jnp.asarray(P)[None], jnp.asarray(x)[None], jnp.asarray(uv)[None],
        ALPHA,
    )
    num = _central_diff(f, P.reshape(12))
    np.testing.assert_allclose(np.asarray(Jp)[0], num, atol=1e-6)


def test_pose_residual_affine_in_landmark():
    # VarProj exactness depends on the pOSE residual being affine in x
    P, x, uv = _random_setup(2)
    x2 = x + np.array([0.3, -0.2, 0.7])
    r1, _, Jl = pose_math.pose_jacobians(
        jnp.asarray(P)[None], jnp.asarray(x)[None], jnp.asarray(uv)[None],
        ALPHA,
    )
    r2 = pose_math.pose_residual(
        jnp.asarray(P)[None], jnp.asarray(x2)[None], jnp.asarray(uv)[None],
        ALPHA,
    )
    np.testing.assert_allclose(
        np.asarray(r2)[0],
        np.asarray(r1)[0] + np.asarray(Jl)[0] @ (x2 - x),
        atol=1e-12,
    )


def test_homogeneous_jacobian_wrt_landmark():
    P, x, uv = _random_setup(3)
    xh = np.append(x, 1.3)
    r, Jp, Jl, valid = pose_math.homogeneous_jacobians(
        jnp.asarray(P)[None], jnp.asarray(xh)[None], jnp.asarray(uv)[None]
    )
    num = _central_diff(
        lambda xx: pose_math.homogeneous_residual(
            jnp.asarray(P)[None], jnp.asarray(xx)[None],
            jnp.asarray(uv)[None],
        )[0][0],
        xh,
    )
    np.testing.assert_allclose(np.asarray(Jl)[0], num, atol=1e-5)


def test_homogeneous_jacobian_wrt_camera():
    P, x, uv = _random_setup(4)
    xh = np.append(x, 0.8)

    def f(p12):
        return pose_math.homogeneous_residual(
            jnp.asarray(p12.reshape(3, 4))[None],
            jnp.asarray(xh)[None],
            jnp.asarray(uv)[None],
        )[0][0]

    _, Jp, _, _ = pose_math.homogeneous_jacobians(
        jnp.asarray(P)[None], jnp.asarray(xh)[None], jnp.asarray(uv)[None]
    )
    num = _central_diff(f, P.reshape(12))
    np.testing.assert_allclose(np.asarray(Jp)[0], num, atol=1e-5)


def test_homogeneous_validity():
    # z ~ 0 => invalid projection flag
    P = np.zeros((3, 4))
    P[2, 2] = 1e-12  # tiny z row
    xh = np.array([1.0, 1.0, 1.0, 1.0])
    uv = np.zeros(2)
    _, valid = pose_math.homogeneous_residual(
        jnp.asarray(P)[None], jnp.asarray(xh)[None], jnp.asarray(uv)[None]
    )
    assert not bool(valid[0])


def test_robust_weights():
    rs = jnp.asarray([0.25, 100.0])
    # NONE
    err, w = pose_math.robust_error_and_weight(rs, pose_math.ROBUST_NONE, 1.0)
    np.testing.assert_allclose(np.asarray(err), [0.125, 50.0])
    np.testing.assert_allclose(np.asarray(w), [1.0, 1.0])
    # HUBER threshold 1.0: r2 < 1 => w=1; else w = 1/sqrt(r2)
    err, w = pose_math.robust_error_and_weight(
        rs, pose_math.ROBUST_HUBER, 1.0
    )
    np.testing.assert_allclose(np.asarray(w), [1.0, 0.1])
    np.testing.assert_allclose(
        np.asarray(err), [0.125, 0.5 * (2 - 0.1) * 0.1 * 100.0]
    )
    # CAUCHY
    err, w = pose_math.robust_error_and_weight(
        rs, pose_math.ROBUST_CAUCHY, 1.0
    )
    np.testing.assert_allclose(np.asarray(err), np.log1p([0.25, 100.0]))


def test_varproj_init_single_obs_consistency():
    # residual written via (G, z): r(x) = G x - z must equal pose_residual
    P, x, uv = _random_setup(5)
    gtg, gtz = pose_math.varproj_init_normal_eq(
        jnp.asarray(P)[None], jnp.asarray(uv)[None], ALPHA
    )
    A = np.asarray(
        pose_math.pose_matrix_tilde(
            jnp.asarray(P)[None], jnp.asarray(uv)[None], ALPHA
        )
    )[0]
    G = A[:, :3]
    r = np.asarray(
        pose_math.pose_residual(
            jnp.asarray(P)[None], jnp.asarray(x)[None],
            jnp.asarray(uv)[None], ALPHA,
        )
    )[0]
    z = G @ x - r
    np.testing.assert_allclose(np.asarray(gtg)[0], G.T @ G, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gtz)[0], G.T @ z, atol=1e-12)
