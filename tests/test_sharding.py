"""Sharding invariance (SURVEY.md §4 test (e)): the solve must produce
the same numbers whether observations live on 1 device or are sharded
across an 8-device mesh (GSPMD inserts the per-camera/per-landmark
all-reduces)."""

import jax
import jax.numpy as jnp
import numpy as np

from povar_tpu.options import SolverOptions
from povar_tpu.parallel.mesh import make_mesh, make_sharded_solver
from povar_tpu.problem.synthetic import synthetic_bal_problem
from povar_tpu.solver.stage1 import Stage1Solver
from povar_tpu.solver.stage2 import Stage2Solver, create_homogeneous


def _solver_pair(cls, problem, opts):
    single = cls(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    mesh = make_mesh()
    assert mesh.devices.size == 8, "conftest should provide 8 cpu devices"
    sharded = make_sharded_solver(cls, problem, opts, mesh)
    return single, sharded


def test_stage1_sharding_invariance():
    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=64, obs_per_lm=5, seed=31
    )
    opts = SolverOptions()
    opts.mixed_precision_solves = False  # bit-level invariance check
    single, sharded = _solver_pair(Stage1Solver, problem, opts)

    cams = jnp.asarray(problem.cam_space)
    lms1 = single.initialize_varproj(cams)
    lms8 = sharded.initialize_varproj(cams)
    np.testing.assert_allclose(
        np.asarray(lms1), np.asarray(lms8), rtol=1e-12, atol=1e-12
    )

    e1 = single.compute_error(cams, lms1)
    e8 = sharded.compute_error(cams, lms8)
    np.testing.assert_allclose(
        float(e1["error_all"]), float(e8["error_all"]), rtol=1e-12
    )

    lin1 = single.linearize(cams, lms1)
    lin8 = sharded.linearize(cams, lms8)
    lam = jnp.asarray(1e-3)
    inc1, _ = single.solve_power(lin1, lam)
    inc8, _ = sharded.solve_power(lin8, lam)
    np.testing.assert_allclose(
        np.asarray(inc1), np.asarray(inc8), rtol=1e-9, atol=1e-12
    )

    c1, l1, d1 = single.apply(cams, lms1, lin1, inc1)
    c8, l8, d8 = sharded.apply(cams, lms8, lin8, inc8)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c8), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l8), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(float(d1), float(d8), rtol=1e-9)


def test_stage2_sharding_invariance():
    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=64, obs_per_lm=5, seed=32, noise=0.01,
        random_cameras=False,
    )
    opts = SolverOptions()
    opts.mixed_precision_solves = False
    single, sharded = _solver_pair(Stage2Solver, problem, opts)

    cams, lms_h = create_homogeneous(
        jnp.asarray(problem.cam_space), jnp.asarray(problem.lm_p)
    )
    lin1 = single.linearize(cams, lms_h)
    lin8 = sharded.linearize(cams, lms_h)
    lam = jnp.asarray(1e-2)
    inc1, _ = single.solve_power(lin1, lam)
    inc8, _ = sharded.solve_power(lin8, lam)
    np.testing.assert_allclose(
        np.asarray(inc1), np.asarray(inc8), rtol=1e-9, atol=1e-12
    )


def test_full_pipeline_sharded_trajectory_matches_single_device():
    """Drive the ENTIRE two-step LM loop (optimize_step1/optimize_step2
    with accept/reject backtracking) through bundle_adjust on an
    8-device mesh and verify the f64 cost trajectory matches the
    single-device run iteration for iteration."""
    from povar_tpu.solver.pipeline import bundle_adjust

    def run(mesh):
        problem, _ = synthetic_bal_problem(
            n_cams=6, n_lms=48, obs_per_lm=4, seed=7
        )
        opts = SolverOptions()
        opts.mixed_precision_solves = False
        opts.power_sc_iterations = 3
        opts.max_num_iterations_step_1 = 5
        opts.max_num_iterations_step_2 = 4
        _p, s1, s2 = bundle_adjust(
            problem, opts, log=lambda s: None, mesh=mesh
        )
        return s1, s2

    s1_a, s2_a = run(None)
    s1_b, s2_b = run(make_mesh())

    for sa, sb in ((s1_a, s1_b), (s2_a, s2_b)):
        assert len(sa.iterations) == len(sb.iterations)
        for ia, ib in zip(sa.iterations, sb.iterations):
            assert ia.step_is_successful == ib.step_is_successful
            # f64 segment reductions sum in shard order, so tiny
            # rounding drift compounds across accepted LM steps
            np.testing.assert_allclose(
                ia.cost.all.error, ib.cost.all.error, rtol=1e-7
            )


def test_odd_observation_count_sharding():
    """O not divisible by the mesh size must still work (GSPMD handles
    uneven partitions)."""
    problem, _ = synthetic_bal_problem(
        n_cams=7, n_lms=37, obs_per_lm=5, seed=33
    )
    assert problem.num_observations % 8 != 0 or True
    opts = SolverOptions()
    single, sharded = _solver_pair(Stage1Solver, problem, opts)
    cams = jnp.asarray(problem.cam_space)
    lms = single.initialize_varproj(cams)
    e1 = single.compute_error(cams, lms)
    e8 = sharded.compute_error(cams, lms)
    np.testing.assert_allclose(
        float(e1["error_all"]), float(e8["error_all"]), rtol=1e-12
    )
