"""Two-step stratified solve (bundle_adjust_manual,
solver/bal_bundle_adjustment.cpp:848-892):

  step 1: pOSE VarProj from random projective cameras
  boundary: homogenize landmarks + normalize cameras
  step 2: Riemannian joint refinement

Returns the optimized problem plus both step summaries.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from povar_tpu.options import SolverOptions
from povar_tpu.problem.problem import BalProblem
from povar_tpu.solver.lm import optimize_step1, optimize_step2
from povar_tpu.solver.stage1 import Stage1Solver
from povar_tpu.solver.stage2 import Stage2Solver, create_homogeneous
from povar_tpu.utils.summary import SolverSummary
from povar_tpu.utils.timer import Timer


def _make_solver(solver_cls, problem, options, dtype, mesh):
    """Build a stage solver, sharded over `mesh`'s observation axis when
    a mesh is given (the multi-chip analogue of the reference's TBB
    landmark loops + mutex scatter, SURVEY.md §2.7)."""
    if mesh is not None:
        from povar_tpu.parallel.mesh import make_sharded_solver

        return make_sharded_solver(
            solver_cls, problem, options, mesh, dtype=dtype
        )
    return solver_cls(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        options,
        dtype=dtype,
    )


def bundle_adjust(
    problem: BalProblem,
    options: Optional[SolverOptions] = None,
    log: Callable[[str], None] = print,
    dtype=jnp.float64,
    mesh=None,
) -> Tuple[BalProblem, SolverSummary, SolverSummary]:
    """Run the full stratified pipeline; mutates and returns `problem`
    with optimized cam_space / lm_p / lm_p_h, plus the per-step
    summaries (step-1 summary, step-2 summary).

    With `mesh` (a jax.sharding.Mesh), both stages run with the
    observation axis sharded across the mesh devices and camera/landmark
    state replicated — every LM iteration (linearize, solve,
    backtracking, error evaluation) executes as a GSPMD program whose
    per-camera/per-landmark reductions ride the mesh collectives."""
    options = options or SolverOptions()
    timer_total = Timer()
    n_mesh = mesh.size if mesh is not None else 1

    s1 = _make_solver(Stage1Solver, problem, options, dtype, mesh)
    summary1 = SolverSummary(
        num_threads_given=n_mesh, num_threads_used=n_mesh
    )
    cams = jnp.asarray(problem.cam_space, dtype)
    lms = jnp.asarray(problem.lm_p, dtype)
    if mesh is not None:
        from povar_tpu.parallel.mesh import replicate

        cams, lms = replicate(mesh, cams, lms)
    cams, lms = optimize_step1(
        s1, cams, lms, options, summary1, timer_total, log
    )

    cams, lms_h = create_homogeneous(cams, lms)

    s2 = _make_solver(Stage2Solver, problem, options, dtype, mesh)
    summary2 = SolverSummary(
        num_threads_given=n_mesh, num_threads_used=n_mesh
    )
    cams, lms_h = optimize_step2(
        s2, cams, lms_h, options, summary2, timer_total, log
    )

    problem.cam_space = np.asarray(cams)
    problem.lm_p_h = np.asarray(lms_h)
    problem.lm_p = np.asarray(lms_h[:, :3] / lms_h[:, 3:4])
    return problem, summary1, summary2
