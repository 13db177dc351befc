"""Full stratified pipeline test: random projective init -> pOSE VarProj
-> homogenize -> Riemannian refinement (bundle_adjust_manual parity,
solver/bal_bundle_adjustment.cpp:848-892)."""

import jax.numpy as jnp
import numpy as np

from povar_tpu import SolverOptions, bundle_adjust
from povar_tpu.options import RobustNorm, SolverType, SolverTypeRiemannian
from povar_tpu.problem.synthetic import synthetic_bal_problem


def test_full_pipeline_initialization_free():
    """From N(0,1) random cameras the two-step pipeline must produce a
    projective reconstruction with tiny reprojection error on noise-free
    synthetic data (the paper's initialization-free claim)."""
    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=5, seed=21, noise=0.0
    )
    opts = SolverOptions()
    opts.max_num_iterations_step_1 = 25
    opts.max_num_iterations_step_2 = 25
    problem, s1, s2 = bundle_adjust(problem, opts, log=lambda s: None)

    assert s1.final_cost is not None and s2.final_cost is not None
    # step-2 reprojection error must be far below 1 pixel^2 equivalent
    final = s2.final_cost.all.error
    initial = s2.initial_cost.all.error
    assert final < initial, (initial, final)
    assert final < 1e-4, final
    # optimized state was written back
    assert problem.lm_p_h is not None
    np.testing.assert_allclose(
        np.sqrt((problem.cam_space**2).sum(axis=(1, 2))), 1.0, atol=1e-9
    )


def test_full_pipeline_huber():
    """Robust norm variant end-to-end (HUBER)."""
    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=50, obs_per_lm=5, seed=22, noise=0.001
    )
    opts = SolverOptions()
    opts.residual.robust_norm = RobustNorm.HUBER
    opts.residual.huber_parameter = 0.1
    opts.max_num_iterations_step_1 = 10
    opts.max_num_iterations_step_2 = 10
    problem, s1, s2 = bundle_adjust(problem, opts, log=lambda s: None)
    assert s2.final_cost.all.error < s1.initial_cost.all.error


def test_full_pipeline_pcg_ripcg():
    """PCG + RIPCG variant end-to-end."""
    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=50, obs_per_lm=5, seed=23, noise=0.0
    )
    opts = SolverOptions()
    opts.solver_type_step_1 = SolverType.PCG
    opts.solver_type_step_2 = SolverTypeRiemannian.RIPCG
    opts.max_num_iterations_step_1 = 10
    opts.max_num_iterations_step_2 = 20
    problem, s1, s2 = bundle_adjust(problem, opts, log=lambda s: None)
    assert s2.final_cost.all.error < s2.initial_cost.all.error * 0.2


def test_summaries_have_iteration_records():
    problem, _ = synthetic_bal_problem(
        n_cams=6, n_lms=40, obs_per_lm=4, seed=24
    )
    opts = SolverOptions()
    opts.max_num_iterations_step_1 = 5
    opts.max_num_iterations_step_2 = 5
    _, s1, s2 = bundle_adjust(problem, opts, log=lambda s: None)
    assert len(s1.iterations) >= 2
    assert len(s2.iterations) >= 2
    assert s1.iterations[0].iteration == 0
    assert s1.solver_type == "power_variable_projection"
    assert s1.num_linear_solves > 0
    it = s1.iterations[1]
    assert it.trust_region_radius > 0
    assert it.cumulative_time_in_seconds > 0
