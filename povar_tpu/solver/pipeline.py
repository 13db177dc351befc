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


def _spmd_eligible(options, dtype) -> bool:
    """Whether the fast SPMD windowed path (parallel/spmd.py) covers
    this configuration: f64 LM state (inner solves in f32 under
    mixed_precision_solves, in f64 otherwise — the per-observation
    kernels dispatch to XLA mirrors for f64, ops/xla_pose.py), fused
    iterations, and an iterative step-1 solver. Anything else falls
    back to the GSPMD-sharded XLA lowering (parallel/mesh.py)."""
    import jax.numpy as jnp

    from povar_tpu.options import SolverType

    return (
        dtype == jnp.float64
        and not options.detailed_timing
        and options.pallas_kernels != "off"
        and options.solver_type_step_1 != SolverType.CHOLESKY
    )


def _make_spmd_plan(problem, mesh):
    """Build (and cache on the problem) the sharded windowed plan
    shared by both stage solvers."""
    from povar_tpu.ops.pallas_pose import PART_ALIGN
    from povar_tpu.parallel.spmd import build_spmd_plan

    n_dev = int(mesh.devices.size)
    cache = getattr(problem, "_spmd_plan_cache", None)
    if cache is not None and cache[0] == n_dev:
        return cache[1]
    plan = build_spmd_plan(
        problem.obs_cam,
        problem.obs_lm,
        problem.num_cameras,
        problem.num_landmarks,
        n_dev,
        PART_ALIGN,
    )
    problem._spmd_plan_cache = (n_dev, plan)
    return plan


def _make_solver(solver_cls, problem, options, dtype, mesh):
    """Build a stage solver; on a mesh, prefer the SPMD windowed path
    (whole-window device ownership, landmark reductions device-local,
    per-camera accumulators all-reduced over ICI — the multi-chip
    analogue of the reference's TBB landmark loops + mutex scatter,
    SURVEY.md §2.7), falling back to GSPMD over the XLA lowering for
    configurations the fast path does not cover."""
    from povar_tpu.solver.stage1 import Stage1Solver

    if mesh is not None:
        if _spmd_eligible(options, dtype):
            from povar_tpu.parallel.spmd import (
                get_spmd_solver_classes,
            )

            s1_cls, s2_cls = get_spmd_solver_classes()
            cls = s1_cls if solver_cls is Stage1Solver else s2_cls
            return cls(
                _make_spmd_plan(problem, mesh),
                problem.obs_uv,
                problem.num_cameras,
                problem.num_landmarks,
                options,
                mesh,
                dtype=dtype,
            )
        import warnings

        from povar_tpu.parallel.mesh import make_sharded_solver

        reasons = []
        if dtype != jnp.float64:
            reasons.append("dtype != float64")
        if options.detailed_timing:
            reasons.append("detailed_timing=True")
        if options.pallas_kernels == "off":
            reasons.append("pallas_kernels='off'")
        from povar_tpu.options import SolverType

        if options.solver_type_step_1 == SolverType.CHOLESKY:
            reasons.append("solver_type_step_1=CHOLESKY")
        warnings.warn(
            "multi-chip run falls back to the GSPMD XLA lowering "
            "(~20x slower per observation than the windowed shard_map "
            "fast path, docs/PERFORMANCE.md) because: "
            + ", ".join(reasons or ["unknown configuration"])
            + ". Use an f64 LM state + fused timing with an iterative "
            "step-1 solver for the fast path (mixed or pure-f64 "
            "precision both qualify).",
            RuntimeWarning,
            stacklevel=2,
        )
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
    spmd = hasattr(s1, "pad_landmarks")  # SPMD windowed solver
    summary1 = SolverSummary(
        num_threads_given=n_mesh, num_threads_used=n_mesh
    )
    cams = jnp.asarray(problem.cam_space, dtype)
    if spmd:
        # landmark state lives in the device-major padded order; the
        # canonical order is restored at the pipeline boundary
        lms = s1.pad_landmarks(problem.lm_p)
        from povar_tpu.parallel.mesh import replicate

        cams = replicate(mesh, cams)
    elif mesh is not None:
        from povar_tpu.parallel.mesh import replicate

        lms = jnp.asarray(problem.lm_p, dtype)
        cams, lms = replicate(mesh, cams, lms)
    else:
        lms = jnp.asarray(problem.lm_p, dtype)
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
    lms_h_np = (
        s1.unpad_landmarks(lms_h) if spmd else np.asarray(lms_h)
    )
    problem.lm_p_h = lms_h_np
    problem.lm_p = lms_h_np[:, :3] / lms_h_np[:, 3:4]
    return problem, summary1, summary2
