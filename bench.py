"""Benchmark: pOSE Power-VarProj LM iteration at venice-89 scale.

Times the framework's hot path — one FULL step-1 LM iteration
(linearize + prepare_Hb + 10-term power-series solve + camera update +
VarProj back-substitution + the f64 cost evaluation that gates LM
accept/reject) — on a synthetic problem matching the BAL
venice problem-89-110973 scale used by the reference README
(89 cameras, 110,973 landmarks, ~5 observations per landmark).

Baseline: the reference (tum-vision/povar) cannot be built in this
environment (Eigen/Sophus/abseil submodules are empty and there is no
network), so `vs_baseline` is computed against a MEASUREMENT-ANCHORED
model of the reference's 64-thread CPU wall time for the same
iteration. The anchor is csrc/ref_hotloop_bench.cpp: the reference's
hot-loop algorithm (same per-landmark storage and pass structure,
sc/linearization_power_varproj.hpp:124-287) in Eigen f64 measured
MEASURED_1T_GFLOPS = 2.64 GFLOP/s on one thread of this host's Xeon
(0.893 s/iteration at venice-89). The modeled 64-thread sustained rate
of 60 GFLOP/s is 22.7x that single-thread floor (~36% parallel
efficiency — generous for this memory-bound, per-camera-mutex-scattered
workload, landmark_block.hpp:383-410). vs_baseline > 1 means the TPU
solve beats that 64-thread CPU estimate; vs_one_thread compares
against the measured single-thread floor directly.

Beyond the headline per-iteration number, the same JSON line carries
the OPERATIVE baseline metric from BASELINE.md:53-64 — the end-to-end
two-step solve at reference defaults (POWER_VARPROJ then RIPOBA, ftol
1e-6, <=50 LM iterations per step):

  * e2e_seconds        wall time of the full warm two-step solve
                       (executables pre-compiled; the persistent XLA
                       cache amortizes compiles in production)
  * e2e_vs_baseline    modeled 64-thread reference CPU wall for the
                       SAME executed trajectory / e2e_seconds. Because
                       the framework reproduces the reference's LM
                       trajectories decision-for-decision
                       (tests/test_reference_parity.py), modeling the
                       reference's cost per executed iteration
                       (tools/num_ops.py, 60 GFLOP/s sustained) on our
                       trajectory IS the time-to-same-cost comparison.
  * step2_s_per_iteration / step2_vs_baseline  the RIPOBA mirror of
                       the headline step-1 measurement
  * measured_gflops    step-1 f64 FLOPs (analytic model below) / wall —
                       roofline context for the single-chip claim

Prints one JSON line:
{"metric", "value", "unit", "vs_baseline", "vs_one_thread", ...}.
"""

import json
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from povar_tpu.options import SolverOptions  # noqa: E402
from povar_tpu.problem.synthetic import synthetic_bal_problem_fast  # noqa: E402
from povar_tpu.solver.stage1 import Stage1Solver  # noqa: E402

N_CAMS = 89
N_LMS = 110_973
OBS_PER_LM = 5
POWER_M = 10
REF_CPU_GFLOPS = 60.0
# measured by csrc/ref_hotloop_bench.cpp on this host (see BASELINE.md)
MEASURED_1T_GFLOPS = 2.64


def flops_per_iteration(n_obs: int, n_lms: int, n_cams: int, m: int) -> float:
    """Analytic f64 FLOPs of one fused LM iteration (linearize + prepare
    + m power terms + back-substitution), counted the same way the
    reference's scripts/num_ops model counts (2 flops per MAC)."""
    jac = n_obs * (4 * 12 + 4 * 3) * 4  # residual+J eval, scaling passes
    hll = n_lms * (2 * 9 * 4 + 42)  # Jl^T Jl + 3x3 inverses
    hpp = n_obs * 2 * 4 * 12 * 12 + n_cams * (12**3)  # Jp^T Jp + LLT inv
    b = n_obs * 2 * 4 * (12 + 3) * 2
    per_term = n_obs * 2 * 4 * (12 + 3) * 2 + n_lms * 18 + n_cams * 2 * 144
    bsub = n_obs * (2 * 4 * 3 * 2 + 2 * 4 * 12) + n_lms * 60
    # per-iteration cost evaluation (compute_error_pOSE, the accept/
    # reject gate the LM loop pays every iteration): residual eval +
    # robust error + squared-norm reduce
    cost = n_obs * (2 * 4 * 4 + 12)
    return float(jac + hll + hpp + b + m * per_term + bsub + cost)


def bench_step2(problem) -> dict:
    """RIPOBA step-2 LM iteration at venice-89 scale (the step-1
    measurement's mirror: linearize + fused trial in one executable,
    eta=0 pins all m power terms)."""
    from povar_tpu.solver.stage2 import Stage2Solver, create_homogeneous
    from povar_tpu.tools import num_ops

    opts = SolverOptions()
    opts.power_sc_iterations = POWER_M
    opts.eta = 0.0
    opts.r_tolerance = -1.0
    solver = Stage2Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )

    @jax.jit
    def step(cams, lms, lam):
        lin = solver._linearize(solver.obs, cams, lms)
        new_cams, new_lms, _ok, _it, _ld, err = solver._trial(
            solver.obs, cams, lms, lin, lam
        )
        return new_cams, new_lms, err["error_all"]

    from povar_tpu.solver.stage1 import Stage1Solver as _S1

    s1 = _S1(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    cams = jnp.asarray(problem.cam_space)
    cams_h, lms_h = create_homogeneous(
        cams, s1.initialize_varproj(cams)
    )
    lam = jnp.asarray(1e-4, cams_h.dtype)
    lms = solver.lm_pack(lms_h)
    out = step(cams_h, lms, lam)
    _ = float(np.asarray(out[2]))

    reps = 50
    t0 = time.perf_counter()
    c, l = cams_h, lms
    for _ in range(reps):
        c, l, err = step(c, l, lam)
    _ = float(np.asarray(err))
    t = (time.perf_counter() - t0) / reps

    d = num_ops.ProblemDims(
        n_poses=problem.num_cameras,
        n_landmarks=problem.num_landmarks,
        n_obs=problem.num_observations,
    )
    flops = num_ops.stage2_solve_flops(
        d, "ripoba", power_terms=POWER_M, relinearize=True
    )
    return {
        "step2_s_per_iteration": t,
        "step2_vs_baseline": (flops / (REF_CPU_GFLOPS * 1e9)) / t,
    }


def _modeled_cpu_seconds(summary1, summary2, dims) -> float:
    """Reference 64-thread CPU wall modeled over the EXECUTED
    two-step trajectory (same iterations, same inner-iteration
    counts; relinearization only after accepted steps, matching
    bal_bundle_adjustment.cpp's driver)."""
    from povar_tpu.tools import num_ops

    total = 0.0
    for summary, fn, method in (
        (summary1, num_ops.stage1_trial_flops, "power_varproj"),
        (summary2, num_ops.stage2_solve_flops, "ripoba"),
    ):
        its = summary.iterations
        for k, it in enumerate(its):
            if k == 0:  # initial cost-only evaluation
                total += dims.n_obs * 50
                continue
            relin = k == 1 or its[k - 1].step_is_successful
            kw = (
                {"inner_iterations": it.linear_solver_iterations}
                if fn is num_ops.stage1_trial_flops
                else {"power_terms": it.linear_solver_iterations}
            )
            total += fn(dims, method, relinearize=relin, **kw)
    return total / (REF_CPU_GFLOPS * 1e9)


def bench_e2e(problem) -> dict:
    """Full two-step solve at reference defaults — the operative
    baseline (BASELINE.md:53-64). Builds the two stage solvers ONCE
    and times the second solve through the same instances, so the
    measurement is the warm production path (every executable traced
    and compiled on the first run; jit caches are per solver
    instance) rather than re-trace overhead."""
    from povar_tpu.solver.lm import optimize_step1, optimize_step2
    from povar_tpu.solver.stage2 import (
        Stage2Solver,
        create_homogeneous,
    )
    from povar_tpu.tools import num_ops
    from povar_tpu.utils.summary import SolverSummary
    from povar_tpu.utils.timer import Timer

    opts = SolverOptions()
    s1 = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    s2 = Stage2Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )

    def run():
        # mirrors pipeline.bundle_adjust (single-chip) with persistent
        # solver instances
        sum1, sum2 = SolverSummary(), SolverSummary()
        timer = Timer()
        t0 = time.perf_counter()
        cams = jnp.asarray(problem.cam_space, jnp.float64)
        lms = jnp.asarray(problem.lm_p, jnp.float64)
        cams, lms = optimize_step1(
            s1, cams, lms, opts, sum1, timer, log=lambda s: None
        )
        cams_h, lms_h = create_homogeneous(cams, lms)
        optimize_step2(
            s2, cams_h, lms_h, opts, sum2, timer, log=lambda s: None
        )
        return time.perf_counter() - t0, sum1, sum2

    run()  # warm all executables
    wall, s1sum, s2sum = run()
    s1, s2 = s1sum, s2sum

    dims = num_ops.ProblemDims(
        n_poses=problem.num_cameras,
        n_landmarks=problem.num_landmarks,
        n_obs=problem.num_observations,
    )
    cpu = _modeled_cpu_seconds(s1, s2, dims)
    return {
        "e2e_seconds": wall,
        "e2e_iterations": len(s1.iterations) + len(s2.iterations),
        "e2e_final_cost_step1": s1.final_cost.all.error,
        "e2e_final_cost_step2": s2.final_cost.all.error,
        "e2e_modeled_cpu_seconds": cpu,
        "e2e_vs_baseline": cpu / wall,
    }


def main() -> None:
    problem = synthetic_bal_problem_fast(
        N_CAMS, N_LMS, OBS_PER_LM, seed=0
    )
    opts = SolverOptions()
    opts.power_sc_iterations = POWER_M
    opts.eta = 0.0  # run all m terms: benchmark fixed work
    opts.r_tolerance = -1.0
    solver = Stage1Solver(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        opts,
    )

    @jax.jit
    def step(cams, lms, lam):
        # one full LM iteration as ONE executable: linearize + the
        # fused trial (solve + apply + f64 cost) — the same graphs the
        # LM driver dispatches per accepted iteration
        # (solver/lm.py: linearize() then trial(); the fused trial is
        # the driver's default backtracking path,
        # bal_bundle_adjustment.cpp:337-448)
        lin = solver._linearize(solver.obs, cams, lms)
        new_cams, new_lms, _ok, _it, _ld, err = solver._trial(
            solver.obs, cams, lms, lin, lam
        )
        return new_cams, new_lms, err["error_all"]

    cams = jnp.asarray(problem.cam_space)
    lms = solver.initialize_varproj(cams)
    lms.block_until_ready()
    lam = jnp.asarray(1e-4, lms.dtype)
    # thread the landmark state in L space, like the LM driver
    # (solver/lm.py): canonical<->slot-order takes happen per stage,
    # not per iteration
    lms = solver.lm_pack(lms)

    # warmup/compile
    out = step(cams, lms, lam)
    _ = float(np.asarray(out[2]))

    # Iterations are chained THROUGH DEVICE STATE (the updated
    # cameras/landmarks feed the next step, exactly like the LM loop)
    # and synced to the host once, so the measurement amortizes the
    # remote-tunnel round trip (~30 ms on tunneled backends — which a
    # production host does not pay per iteration). eta=0/r_tol<0 pin
    # the work per iteration regardless of the evolving state.
    reps = 50
    t0 = time.perf_counter()
    c, l = cams, lms
    for _ in range(reps):
        c, l, err = step(c, l, lam)
    # force full execution: pull the cost scalar to the host
    # (block_until_ready alone can return before remote execution
    # completes on tunneled TPU backends)
    _ = float(np.asarray(err))
    t = (time.perf_counter() - t0) / reps

    n_obs = problem.num_observations
    flops = flops_per_iteration(n_obs, N_LMS, N_CAMS, POWER_M)
    ref_time = flops / (REF_CPU_GFLOPS * 1e9)
    ref_time_1t = flops / (MEASURED_1T_GFLOPS * 1e9)
    record = {
        "metric": (
            "pOSE POWER_VARPROJ full LM-iteration wall time "
            "incl. f64 cost evaluation, venice-89 scale "
            f"(89 cams, 110973 lms, {n_obs} obs, m={POWER_M}, "
            "f64)"
        ),
        "value": t,
        "unit": "s/iteration",
        "vs_baseline": ref_time / t,
        "vs_one_thread": ref_time_1t / t,
        "measured_gflops": flops / t / 1e9,
    }
    # secondary metrics (step-2 per-iteration + operative end-to-end
    # baseline); degrade gracefully — the headline line must print
    import traceback

    try:
        record.update(bench_step2(problem))
    except Exception:  # pragma: no cover - defensive
        traceback.print_exc()
    try:
        record.update(bench_e2e(problem))
    except Exception:  # pragma: no cover - defensive
        traceback.print_exc()
    print(json.dumps(record))


if __name__ == "__main__":
    main()
