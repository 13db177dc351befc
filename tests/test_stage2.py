"""Step-2 (Riemannian joint refinement) tests: tangent-space geometry,
RIPOBA/RIPCG solver agreement, and LM convergence to reprojection
optimum on noise-free data."""

import jax.numpy as jnp
import numpy as np
import pytest

from povar_tpu.options import SolverOptions, SolverTypeRiemannian
from povar_tpu.problem.synthetic import synthetic_bal_problem
from povar_tpu.solver.lm import optimize_step2
from povar_tpu.solver.stage2 import Stage2Solver, create_homogeneous
from povar_tpu.utils.summary import SolverSummary
from povar_tpu.utils.timer import Timer


def _make(seed=0, noise=0.0, perturb=0.0):
    """Problem at (possibly perturbed) ground truth, homogenized."""
    problem, gt = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=5, seed=seed, noise=noise,
        random_cameras=False,
    )
    rng = np.random.default_rng(seed + 100)
    cams = problem.cam_space + perturb * rng.standard_normal(
        problem.cam_space.shape
    )
    lms = problem.lm_p + perturb * rng.standard_normal(problem.lm_p.shape)
    cams_h, lms_h = create_homogeneous(
        jnp.asarray(cams), jnp.asarray(lms)
    )
    opts = SolverOptions()
    opts.mixed_precision_solves = False  # exact-agreement tests
    solver = Stage2Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    return problem, solver, opts, cams_h, lms_h


def test_error_zero_at_ground_truth():
    _, solver, _, cams, lms_h = _make(0, noise=0.0)
    e = solver.compute_error(cams, lms_h)
    assert float(e["error_all"]) < 1e-20


def test_projective_gauge_invariance():
    """The reprojection error is invariant to per-camera scale and
    per-landmark scale (the quotient structure step 2 optimizes on)."""
    _, solver, _, cams, lms_h = _make(1, noise=0.01)
    e0 = float(solver.compute_error(cams, lms_h)["error_all"])
    e1 = float(
        solver.compute_error(cams * 3.7, lms_h * 0.2)["error_all"]
    )
    np.testing.assert_allclose(e0, e1, rtol=1e-12)


def test_tangent_jacobian_consistency():
    """Directional derivative along a tangent increment must match the
    nullspace-projected Jacobian: moving cameras by kernel_cam @ delta
    changes residuals by ~ Jp_ns @ delta (for unscaled storage compare
    via the full Jp and the kernel)."""
    _, solver, _, cams, lms_h = _make(2, noise=0.01)
    lin = solver.linearize(cams, lms_h)
    rng = np.random.default_rng(3)
    delta = rng.standard_normal((11, solver.n_cams)) * 1e-7

    # physical camera motion corresponding to the tangent step,
    # accounting for the pose column scaling (storage is scaled)
    inc12 = np.einsum(
        "ijn,jn->in", np.asarray(lin.kernel_cam), delta
    ) * np.asarray(lin.pose_scale)  # [12, N]
    cams2 = cams + jnp.asarray(inc12.T.reshape(solver.n_cams, 3, 4))

    from povar_tpu.ops import pose_math

    P1 = cams[solver.obs_cam]
    P2 = cams2[solver.obs_cam]
    xh = lms_h[solver.obs_lm]
    r1, _ = pose_math.homogeneous_residual(P1, xh, solver.obs_uv)
    r2, _ = pose_math.homogeneous_residual(P2, xh, solver.obs_uv)
    dr_actual = np.asarray(r2 - r1)
    if solver.obs.weight is not None:  # drop slot/tile padding rows
        dr_actual = dr_actual * (np.asarray(solver.obs.weight) > 0)[:, None]
    dr_pred = np.einsum(
        "ijo,jo->oi",
        np.asarray(lin.Jp_ns),
        delta[:, np.asarray(solver.obs_cam)],
    )
    np.testing.assert_allclose(
        dr_actual, dr_pred, atol=1e-11 + 1e-4 * np.abs(dr_pred).max()
    )


def test_ripoba_vs_ripcg_increments_agree():
    """High-order power series and tight PCG must produce the same
    tangent increment on the same linearization."""
    problem, solver, opts, cams, lms_h = _make(4, noise=0.01, perturb=1e-3)
    lin = solver.linearize(cams, lms_h)
    # strong damping keeps the spectral radius of B^-1 E0 small so the
    # truncated series is tight (at small lambda it converges but slowly)
    lam = jnp.asarray(1.0)

    opts_pow = SolverOptions()
    opts_pow.mixed_precision_solves = False
    opts_pow.power_sc_iterations = 300
    opts_pow.eta = 1e-13
    s_pow = Stage2Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts_pow,
    )
    inc_pow, _ = s_pow.solve_power(lin, lam)

    opts_cg = SolverOptions()
    opts_cg.mixed_precision_solves = False
    opts_cg.eta = 1e-14
    opts_cg.max_linear_solver_iterations = 3000
    s_cg = Stage2Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts_cg,
    )
    inc_cg, _ = s_cg.solve_pcg(lin, lam)

    scale = np.abs(np.asarray(inc_cg)).max()
    np.testing.assert_allclose(
        np.asarray(inc_pow), np.asarray(inc_cg), atol=2e-5 * scale
    )


@pytest.mark.parametrize(
    "solver_type", [SolverTypeRiemannian.RIPOBA, SolverTypeRiemannian.RIPCG]
)
def test_lm_step2_converges_from_perturbation(solver_type):
    """From a perturbed ground truth, step 2 must drive the reprojection
    error down by orders of magnitude (noise-free => optimum ~0)."""
    problem, _, _, cams, lms_h = _make(5, noise=0.0, perturb=1e-4)
    opts = SolverOptions()
    # deep convergence below the f32 step floor: test the pure-f64 path
    opts.mixed_precision_solves = False
    opts.solver_type_step_2 = solver_type
    opts.max_num_iterations_step_2 = 30
    solver = Stage2Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    summary = SolverSummary()
    optimize_step2(
        solver, cams, lms_h, opts, summary, Timer(), log=lambda s: None
    )
    costs = [it.cost.all.error for it in summary.iterations]
    assert costs[-1] < costs[0] * 1e-3, (costs[0], costs[-1])


def test_retraction_preserves_constraints():
    """After apply: camera matrices unit Frobenius norm, landmarks
    dehomogenized (w == 1)."""
    _, solver, opts, cams, lms_h = _make(6, noise=0.01, perturb=1e-3)
    lin = solver.linearize(cams, lms_h)
    lam = jnp.asarray(1e-2)
    inc, _ = solver.solve_power(lin, lam)
    nc, nl, l_diff = solver.apply(cams, lms_h, lin, inc, lam)
    norms = np.sqrt((np.asarray(nc) ** 2).sum(axis=(1, 2)))
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(nl)[:, 3], 1.0, atol=1e-12)
    assert float(l_diff) > 0  # step-2 validity gate requires l_diff > 0


@pytest.mark.quick
@pytest.mark.parametrize(
    "st", [SolverTypeRiemannian.RIPOBA, SolverTypeRiemannian.RIPCG]
)
def test_fused_trial_matches_staged_sequence(st):
    """Stage2Solver.trial (solve+apply+cost in ONE executable, the
    default LM backtracking path) must reproduce the staged
    solve/apply/compute_error sequence bit-for-bit at the same state:
    it composes the identical private graphs under one jit (the
    stage-1 fused trial's mirror)."""
    problem, _, _, cams, lms_h = _make(7, noise=0.01, perturb=1e-3)
    opts = SolverOptions()
    opts.mixed_precision_solves = False
    opts.solver_type_step_2 = st
    solver = Stage2Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    lam = jnp.asarray(1e-3, solver.dtype)
    lms = solver.lm_pack(lms_h)
    lin = solver.linearize(cams, lms)

    assert solver.supports_trial
    nc_f, nl_f, ok, iters, ld_f, err_f = solver.trial(cams, lms, lin, lam)

    inc, iters_s = solver.solve(lin, lam)
    nc_s, nl_s, ld_s = solver.apply(cams, lms, lin, inc, lam)
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
    """optimize_step2 with the fused trial (detailed_timing=False,
    the default) must walk the same LM trajectory as the staged path
    (detailed_timing=True): same per-iteration costs and accept flags."""
    summaries = {}
    for detailed in (False, True):
        problem, _, _, cams, lms_h = _make(8, noise=0.01, perturb=1e-3)
        opts = SolverOptions()
        opts.mixed_precision_solves = False
        opts.detailed_timing = detailed
        opts.max_num_iterations_step_2 = 8
        solver = Stage2Solver(
            problem.obs_cam, problem.obs_lm, problem.obs_uv,
            problem.num_cameras, problem.num_landmarks, opts,
        )
        summary = SolverSummary()
        optimize_step2(
            solver, cams, lms_h, opts, summary, Timer(),
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
