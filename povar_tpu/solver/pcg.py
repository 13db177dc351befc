"""Preconditioned conjugate gradients as a `lax.while_loop`.

Re-derivation of the Ceres-style CG in cg/conjugate_gradient.hpp:83-493:
q-tolerance (Nash truncated-Newton zeta test), optional r-tolerance,
residual refresh every `residual_reset_period` iterations, and the same
failure conditions (rho == 0/inf, indefinite p'q <= 0). The 12-block
`solve` and 11-block `solve_joint` duplication of the reference
collapses into one generic function over pytree vectors.

The operator and preconditioner are closures (matrix-free), so the same
code serves explicit-SC PCG and the implicit Schur-Jacobi variants.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# termination codes (ConjugateGradientsSolver::Summary::TerminationType)
NO_CONVERGENCE = 0
SUCCESS = 1
FAILURE = 2


class CgResult(NamedTuple):
    x: jnp.ndarray
    num_iterations: jnp.ndarray  # int
    termination: jnp.ndarray  # int code


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def _norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(_dot(a, a))


def conjugate_gradients(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: jnp.ndarray,
    precond: Callable[[jnp.ndarray], jnp.ndarray],
    max_iterations: int,
    min_iterations: int = 0,
    q_tolerance: float = 1e-2,
    r_tolerance: float = -1.0,
    residual_reset_period: int = 10,
) -> CgResult:
    """Solve matvec(x) = b. Mirrors conjugate_gradient.hpp:114-301."""
    dtype = b.dtype
    norm_b = _norm(b)
    tol_r = jnp.asarray(r_tolerance, dtype) * norm_b

    r0 = b - matvec(x0)
    q0_init = -_dot(x0, b + r0)

    class State(NamedTuple):
        x: jnp.ndarray
        r: jnp.ndarray
        p: jnp.ndarray
        rho: jnp.ndarray
        q0: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray
        term: jnp.ndarray

    init = State(
        x=x0,
        r=r0,
        p=jnp.zeros_like(b),
        rho=jnp.asarray(1.0, dtype),
        q0=q0_init,
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        term=jnp.asarray(NO_CONVERGENCE, jnp.int32),
    )

    def cond(s: State):
        return jnp.logical_and(~s.done, s.it < max_iterations)

    def body(s: State) -> State:
        it = s.it + 1
        z = precond(s.r)
        last_rho = s.rho
        rho = _dot(s.r, z)
        # NaN included: the reference's IsZeroOrInfinity breaks on
        # inf but a NaN (singular preconditioner block on degenerate
        # data) would otherwise sail through every comparison and run
        # the loop to max_iterations with a NaN iterate
        rho_bad = jnp.logical_or(rho == 0.0, ~jnp.isfinite(rho))

        beta = rho / last_rho
        p = jnp.where(it == 1, z, z + beta * s.p)

        q = matvec(p)
        pq = _dot(p, q)
        pq_bad = jnp.logical_or(pq <= 0.0, ~jnp.isfinite(pq))
        alpha = rho / pq

        x = s.x + alpha * p
        # periodic residual refresh (conjugate_gradient.hpp:228-240);
        # lax.cond so the extra matvec only runs on refresh iterations
        refresh = (it % residual_reset_period) == 0
        r = lax.cond(
            refresh,
            lambda operands: b - matvec(operands[0]),
            lambda operands: operands[1] - alpha * q,
            (x, s.r),
        )

        q1 = -_dot(x, b + r)
        zeta = it.astype(dtype) * (q1 - s.q0) / q1
        norm_r = _norm(r)

        q_conv = jnp.logical_and(zeta < q_tolerance, it >= min_iterations)
        r_conv = jnp.logical_and(norm_r <= tol_r, it >= min_iterations)
        converged = jnp.logical_or(q_conv, r_conv)
        failed = jnp.logical_or(rho_bad, pq_bad)

        term = jnp.where(
            failed,
            jnp.asarray(FAILURE, jnp.int32),
            jnp.where(
                converged, jnp.asarray(SUCCESS, jnp.int32), s.term
            ),
        )
        done = jnp.logical_or(converged, failed)
        # on failure keep the previous iterate (reference breaks before
        # updating x on rho/pq failure)
        x_out = jnp.where(failed, s.x, x)
        r_out = jnp.where(failed, s.r, r)
        return State(x_out, r_out, p, rho, q1, it, done, term)

    # |b| == 0 early exit (conjugate_gradient.hpp:129-135)
    zero_b = norm_b == 0.0
    # initial r-tolerance exit (hpp:147-157)
    init_conv = jnp.logical_and(min_iterations == 0, _norm(r0) <= tol_r)

    final = lax.while_loop(cond, body, init)
    x = jnp.where(zero_b, jnp.zeros_like(b), final.x)
    x = jnp.where(jnp.logical_and(init_conv, ~zero_b), x0, x)
    skip = jnp.logical_or(zero_b, init_conv)
    return CgResult(
        x=x,
        num_iterations=jnp.where(skip, 0, final.it),
        termination=jnp.where(
            skip, jnp.asarray(SUCCESS, jnp.int32), final.term
        ),
    )


def power_series(
    b_inv_apply: Callable[[jnp.ndarray], jnp.ndarray],
    e0_apply: Callable[[jnp.ndarray], jnp.ndarray],
    neg_b: jnp.ndarray,
    max_terms: int,
    q_tolerance: float,
    r_tolerance: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Power-series expansion of the inverse Schur complement:

        x = sum_{i=0..m} (B^-1 E0)^i B^-1 (-b)

    with the reference's q/r-tolerance early exit
    (sc/linearization_power_varproj.hpp:191-237). Returns (x, num_terms).
    """
    dtype = neg_b.dtype
    accum0 = b_inv_apply(neg_b)
    norm_0 = _norm(accum0)

    class State(NamedTuple):
        accum: jnp.ndarray
        tmp: jnp.ndarray
        i: jnp.ndarray
        done: jnp.ndarray

    def cond(s: State):
        return jnp.logical_and(~s.done, s.i < max_terms)

    def body(s: State) -> State:
        i = s.i + 1
        tmp = b_inv_apply(e0_apply(s.tmp))
        accum = s.accum + tmp
        iter_norm = _norm(tmp)
        zeta = i.astype(dtype) * iter_norm / _norm(accum)
        q_conv = jnp.logical_and(q_tolerance > 0, zeta < q_tolerance)
        r_conv = jnp.logical_and(
            r_tolerance > 0, iter_norm / norm_0 < r_tolerance
        )
        return State(accum, tmp, i, jnp.logical_or(q_conv, r_conv))

    init = State(
        accum=accum0,
        tmp=accum0,
        i=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(max_terms == 0),
    )
    final = lax.while_loop(cond, body, init)
    return final.accum, final.i
