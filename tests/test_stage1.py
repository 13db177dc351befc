"""Step-1 (pOSE VarProj) solver tests: closed-form init optimality,
solver equivalence (power series vs PCG vs dense Cholesky on the same
linearization, SURVEY.md §4 test (c)), and LM convergence."""

import jax.numpy as jnp
import numpy as np
import pytest

from povar_tpu.options import SolverOptions, SolverType
from povar_tpu.problem.synthetic import synthetic_bal_problem
from povar_tpu.solver.common import ResidualInfo
from povar_tpu.solver.lm import optimize_step1
from povar_tpu.solver.stage1 import Stage1Solver
from povar_tpu.utils.summary import SolverSummary
from povar_tpu.utils.timer import Timer

ALPHA = 0.01


def _make(seed=0, **kw):
    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=5, seed=seed, **kw
    )
    opts = SolverOptions()
    opts.alpha = ALPHA
    opts.mixed_precision_solves = False  # exact-agreement tests
    solver = Stage1Solver(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        opts,
    )
    return problem, solver, opts


def test_varproj_init_is_least_squares_optimum():
    """v*(u0) must minimize the pOSE cost per landmark given cameras:
    perturbing any landmark must not decrease the cost."""
    problem, solver, _ = _make(0)
    cams = jnp.asarray(problem.cam_space)
    lms0 = solver.initialize_varproj(cams)
    e0 = solver.compute_error(cams, lms0)
    base = float(e0["error_all"])
    rng = np.random.default_rng(1)
    for _ in range(3):
        delta = rng.standard_normal(lms0.shape) * 1e-3
        e = solver.compute_error(cams, lms0 + jnp.asarray(delta))
        assert float(e["error_all"]) >= base - 1e-12


def test_varproj_init_gradient_zero():
    """At v*(u0) the landmark gradient Jl^T r must vanish."""
    problem, solver, _ = _make(2)
    cams = jnp.asarray(problem.cam_space)
    lms = solver.initialize_varproj(cams)
    from povar_tpu.ops import pose_math
    from povar_tpu.solver.common import segment_sum

    P = cams[solver.obs_cam]
    x = lms[solver.obs_lm]
    r, _, Jl = pose_math.pose_jacobians(P, x, solver.obs_uv, ALPHA)
    if solver.obs.weight is not None:  # drop slot/tile padding rows
        r = r * (solver.obs.weight > 0)[:, None]
    g = segment_sum(
        jnp.einsum("oki,ok->oi", Jl, r), solver.obs_lm, solver.n_lms
    )
    scale = 1.0 + np.abs(np.asarray(g)).max()
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8 * scale)


def _dense_schur_reference(solver, lin, lam):
    """Build S and b densely with numpy from the linearization, the
    brute-force way, for validating all fast paths."""
    Jp = np.asarray(lin.Jp).transpose(2, 0, 1)  # [O, 4, 12]
    Jl = np.asarray(lin.Jl).transpose(2, 0, 1)  # [O, 4, 3]
    r = np.asarray(lin.r).T  # [O, 4]
    oc = np.asarray(solver.obs_cam)
    ol = np.asarray(solver.obs_lm)
    N, M = solver.n_cams, solver.n_lms
    O = Jp.shape[0]

    # full J [4O, 12N + 3M]
    J = np.zeros((4 * O, 12 * N + 3 * M))
    res = np.zeros(4 * O)
    for o in range(O):
        J[4 * o : 4 * o + 4, 12 * oc[o] : 12 * oc[o] + 12] = Jp[o]
        J[4 * o : 4 * o + 4, 12 * N + 3 * ol[o] : 12 * N + 3 * ol[o] + 3] = (
            Jl[o]
        )
        res[4 * o : 4 * o + 4] = r[o]
    H = J.T @ J
    g = J.T @ res
    Hpp = H[: 12 * N, : 12 * N]
    Hpl = H[: 12 * N, 12 * N :]
    Hll = H[12 * N :, 12 * N :]
    S = Hpp - Hpl @ np.linalg.inv(Hll) @ Hpl.T + lam * np.eye(12 * N)
    b = g[: 12 * N] - Hpl @ np.linalg.inv(Hll) @ g[12 * N :]
    return S, b


def test_solver_equivalence_power_pcg_cholesky():
    """Power series (high order), PCG (tight tol) and dense Cholesky
    must agree with the brute-force dense Schur solve."""
    problem, solver, opts = _make(3)
    cams = jnp.asarray(problem.cam_space)
    lms = solver.initialize_varproj(cams)
    lin = solver.linearize(cams, lms)
    lam = 1e-4

    S, b = _dense_schur_reference(solver, lin, lam)
    inc_ref = -np.linalg.solve(S, b).reshape(solver.n_cams, 12).T

    # dense Cholesky path
    inc_chol, _ = solver.solve_cholesky(lin, jnp.asarray(lam))
    np.testing.assert_allclose(np.asarray(inc_chol), inc_ref, atol=1e-8)

    # PCG with tight tolerance
    opts_tight = SolverOptions()
    opts_tight.alpha = ALPHA
    opts_tight.mixed_precision_solves = False
    opts_tight.eta = 1e-14
    opts_tight.max_linear_solver_iterations = 2000
    s2 = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts_tight,
    )
    inc_pcg, iters = s2.solve_pcg(lin, jnp.asarray(lam))
    # PCG converges to the q-tolerance floor; with cond(S) ~ 1e4 the
    # attainable solution accuracy is ~1e-3 relative
    np.testing.assert_allclose(
        np.asarray(inc_pcg), inc_ref, atol=2e-3 * np.abs(inc_ref).max()
    )

    # power series with many terms approaches the same solution when the
    # spectral radius of B^-1 E0 is < 1 (guaranteed for lam > 0 on SPD)
    opts_pow = SolverOptions()
    opts_pow.alpha = ALPHA
    opts_pow.mixed_precision_solves = False
    opts_pow.power_sc_iterations = 400
    opts_pow.eta = 1e-13
    s3 = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts_pow,
    )
    inc_pow, terms = s3.solve_power(lin, jnp.asarray(1e-1))
    S2, b2 = _dense_schur_reference(solver, lin, 1e-1)
    inc_ref2 = -np.linalg.solve(S2, b2).reshape(solver.n_cams, 12).T
    np.testing.assert_allclose(
        np.asarray(inc_pow), inc_ref2, atol=1e-4 * np.abs(inc_ref2).max()
    )


def test_power_series_identity_when_no_coupling():
    """With E0 = 0 (each landmark seen by isolated cameras is impossible
    with >=2 obs; instead check term-0 = B^-1(-b) numerically)."""
    problem, solver, opts = _make(5)
    cams = jnp.asarray(problem.cam_space)
    lms = solver.initialize_varproj(cams)
    lin = solver.linearize(cams, lms)
    lam = jnp.asarray(0.5)
    b, hpp, hll_inv = solver._prepare_hb(solver.obs, lin, lam, False)
    from povar_tpu.ops import linalg

    b_inv = linalg.inv_psd_smallf(
        hpp + lam.astype(hpp.dtype) * jnp.eye(12, dtype=hpp.dtype)[:, :, None]
    )
    # m = 0 => inc = B^-1 (-b)
    opts0 = SolverOptions()
    opts0.alpha = ALPHA
    opts0.mixed_precision_solves = False
    opts0.power_sc_iterations = 0
    s0 = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts0,
    )
    inc0, terms = s0.solve_power(lin, lam)
    expect = -jnp.einsum("ijn,jn->in", b_inv, b)
    np.testing.assert_allclose(
        np.asarray(inc0), np.asarray(expect), atol=1e-12
    )
    assert int(terms) == 0


@pytest.mark.parametrize(
    "solver_type",
    [SolverType.POWER_VARPROJ, SolverType.PCG, SolverType.CHOLESKY,
     SolverType.POWER_SCHUR_COMPLEMENT],
)
def test_lm_step1_decreases_cost(solver_type):
    """The LM loop must strictly reduce the pOSE cost from the random
    initialization for every solver variant."""
    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=5, seed=7
    )
    opts = SolverOptions()
    opts.alpha = ALPHA
    opts.solver_type_step_1 = solver_type
    opts.max_num_iterations_step_1 = 12
    solver = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    summary = SolverSummary()
    cams, lms = optimize_step1(
        solver,
        jnp.asarray(problem.cam_space),
        jnp.asarray(problem.lm_p),
        opts,
        summary,
        Timer(),
        log=lambda s: None,
    )
    costs = [it.cost.all.error for it in summary.iterations]
    assert costs[-1] < costs[0] * 0.9, costs
    # successful iterations decrease monotonically
    succ = [
        it.cost.all.error
        for it in summary.iterations
        if it.step_is_successful
    ]
    assert all(b <= a * (1 + 1e-12) for a, b in zip(succ, succ[1:])), succ


def test_lm_step1_noise_free_reaches_tiny_cost():
    """On noise-free synthetic data a projective reconstruction exists;
    step 1 must reach the basin (cost << initial). Note: like the
    reference, the model-cost used for the lambda schedule mixes scaled
    and unscaled quantities (back_substitute_pOSE combines the fresh
    unscaled Jacobian with the scaled increment), which makes the
    trust region conservative — full refinement is step 2's job, so the
    expectation here is 'deep into the basin', not machine precision."""
    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=5, seed=11, noise=0.0
    )
    opts = SolverOptions()
    opts.alpha = ALPHA
    opts.max_num_iterations_step_1 = 50
    solver = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    summary = SolverSummary()
    optimize_step1(
        solver,
        jnp.asarray(problem.cam_space),
        jnp.asarray(problem.lm_p),
        opts,
        summary,
        Timer(),
        log=lambda s: None,
    )
    costs = [it.cost.all.error for it in summary.iterations]
    assert costs[-1] < costs[0] * 1e-2, (costs[0], costs[-1])


def test_mixed_precision_solve_within_forcing_tolerance():
    """The f32 inner solve (mixed_precision_solves=True, the default)
    must agree with the f64 solve to far better than the LM forcing
    tolerance eta (1e-2), so accept/reject decisions are unaffected."""
    problem, solver, opts = _make(13)  # mixed OFF solver
    cams = jnp.asarray(problem.cam_space)
    lms = solver.initialize_varproj(cams)
    lin = solver.linearize(cams, lms)
    lam = jnp.asarray(1e-2)
    inc64, _ = solver.solve_power(lin, lam)

    opts_mixed = SolverOptions()
    opts_mixed.alpha = ALPHA
    assert opts_mixed.mixed_precision_solves
    s_mixed = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts_mixed,
    )
    inc32, _ = s_mixed.solve_power(lin, lam)
    assert inc32.dtype == jnp.float64  # cast back to state dtype
    scale = np.abs(np.asarray(inc64)).max()
    np.testing.assert_allclose(
        np.asarray(inc32), np.asarray(inc64), atol=1e-4 * scale
    )


def test_pcg_preconditioner_types_agree():
    """IDENTITY / JACOBI / SCHUR_JACOBI preconditioners change CG's
    path, not its limit: converged increments must agree (the reference
    exposes all three enum values, cg/preconditioner.hpp:46-144)."""
    from povar_tpu.options import PreconditionerType

    incs = {}
    for pt in PreconditionerType:
        problem, solver, opts = _make(11)
        opts.preconditioner_type = pt
        opts.eta = 1e-10  # drive CG to convergence
        opts.max_linear_solver_iterations = 500
        cams = jnp.asarray(problem.cam_space)
        lms = solver.initialize_varproj(cams)
        lin = solver.linearize(cams, lms)
        inc, iters = solver.solve_pcg(lin, jnp.asarray(1e-3))
        assert int(iters) > 0
        incs[pt] = np.asarray(inc)
    ref = incs[PreconditionerType.SCHUR_JACOBI]
    for pt, inc in incs.items():
        # each run stops at its own q-tolerance truncation point, so
        # agreement is to the forcing tolerance, not machine precision
        np.testing.assert_allclose(
            inc, ref, rtol=0, atol=1e-2, err_msg=str(pt)
        )


@pytest.mark.quick
@pytest.mark.parametrize(
    "st",
    [
        SolverType.POWER_VARPROJ,
        SolverType.POWER_SCHUR_COMPLEMENT,
        SolverType.PCG,
    ],
)
def test_fused_trial_matches_staged_sequence(st):
    """Stage1Solver.trial (solve+apply+cost in ONE executable, the
    default LM backtracking path) must reproduce the staged
    solve/apply/compute_error sequence bit-for-bit at the same state:
    it composes the identical private graphs under one jit."""
    problem, solver, opts = _make(seed=4)
    opts.solver_type_step_1 = st
    lam = jnp.asarray(1e-3, solver.dtype)

    cams = jnp.asarray(problem.cam_space)
    lms = solver.lm_pack(solver.initialize_varproj(cams))
    lin = solver.linearize(cams, lms)

    assert solver.supports_trial
    nc_f, nl_f, ok, iters, ld_f, err_f = solver.trial(cams, lms, lin, lam)

    inc, iters_s = solver.solve(lin, lam)
    if st == SolverType.POWER_SCHUR_COMPLEMENT:
        nc_s, nl_s, ld_s = solver.apply_poba(cams, lms, lin, inc, lam)
    else:
        nc_s, nl_s, ld_s = solver.apply(cams, lms, lin, inc)
    err_s = solver.compute_error(nc_s, nl_s)

    assert bool(ok)
    assert int(iters) == int(iters_s)
    np.testing.assert_allclose(
        np.asarray(nc_f), np.asarray(nc_s), rtol=1e-12, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(solver.lm_unpack(nl_f)),
        np.asarray(solver.lm_unpack(nl_s)),
        rtol=1e-12,
        atol=0,
    )
    assert abs(float(ld_f) - float(ld_s)) <= 1e-12 * abs(float(ld_s))
    for k in err_s:
        a, b = float(err_f[k]), float(err_s[k])
        assert abs(a - b) <= 1e-12 * max(abs(b), 1.0), k


@pytest.mark.quick
def test_fused_trial_lm_trajectory_matches_staged():
    """optimize_step1 with the fused trial (detailed_timing=False,
    the default) must walk the same LM trajectory as the staged path
    (detailed_timing=True): same per-iteration costs and accept flags."""
    summaries = {}
    for detailed in (False, True):
        problem, solver, opts = _make(seed=7)
        opts.detailed_timing = detailed
        opts.max_num_iterations_step_1 = 8
        summary = SolverSummary()
        optimize_step1(
            solver,
            jnp.asarray(problem.cam_space),
            jnp.asarray(problem.lm_p),
            opts,
            summary,
            Timer(),
            log=lambda s: None,
        )
        summaries[detailed] = summary
    a, b = summaries[False], summaries[True]
    assert len(a.iterations) == len(b.iterations)
    for ia, ib in zip(a.iterations, b.iterations):
        assert ia.step_is_successful == ib.step_is_successful
        assert np.isclose(
            ia.cost.all.error, ib.cost.all.error, rtol=1e-12, atol=0
        )
