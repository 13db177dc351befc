"""Configurable-precision tests: the solver must run end-to-end in f32
(TPU-preferred dtype; the reference gates float behind
ROOTBA_INSTANTIATIONS_FLOAT, CMakeLists.txt:23-31)."""

import jax.numpy as jnp
import numpy as np

from povar_tpu.options import SolverOptions
from povar_tpu.problem.synthetic import synthetic_bal_problem
from povar_tpu.solver.lm import optimize_step1
from povar_tpu.solver.stage1 import Stage1Solver
from povar_tpu.utils.summary import SolverSummary
from povar_tpu.utils.timer import Timer


def test_stage1_f32_converges():
    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=5, seed=51
    )
    opts = SolverOptions()
    opts.max_num_iterations_step_1 = 8
    solver = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
        dtype=jnp.float32,
    )
    summary = SolverSummary()
    cams, lms = optimize_step1(
        solver,
        jnp.asarray(problem.cam_space, jnp.float32),
        jnp.asarray(problem.lm_p, jnp.float32),
        opts,
        summary,
        Timer(),
        log=lambda s: None,
    )
    assert cams.dtype == jnp.float32
    costs = [it.cost.all.error for it in summary.iterations]
    assert costs[-1] < costs[0] * 0.5, costs


def test_f32_f64_agree_initially():
    problem, _ = synthetic_bal_problem(
        n_cams=6, n_lms=40, obs_per_lm=4, seed=52
    )
    opts = SolverOptions()
    s64 = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    s32 = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
        dtype=jnp.float32,
    )
    cams64 = jnp.asarray(problem.cam_space)
    cams32 = jnp.asarray(problem.cam_space, jnp.float32)
    e64 = float(s64.compute_error(cams64, s64.initialize_varproj(cams64))[
        "error_all"])
    e32 = float(s32.compute_error(cams32, s32.initialize_varproj(cams32))[
        "error_all"])
    np.testing.assert_allclose(e64, e32, rtol=1e-3)
