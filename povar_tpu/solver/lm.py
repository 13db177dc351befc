"""Levenberg-Marquardt trust-region drivers for the two-step pipeline.

Faithful re-implementation of the reference LM control flow
(solver/bal_bundle_adjustment.cpp):
  optimize_lm_ours_pOSE       (cpp:252-542)  -> optimize_step1
  optimize_homogeneous_joint  (cpp:557-843)  -> optimize_step2

Semantics preserved exactly:
  - lambda = 1 / trust_region_radius in [1/max_tr, 1/min_tr]
  - vee-factor backtracking: on reject lambda *= lambda_vee,
    lambda_vee *= vee_factor; on success lambda *= max(1/3,
    1 - (2 rho - 1)^3) clamped to min_lambda, lambda_vee reset
  - non-finite increment => invalid step, raise lambda, count iteration
  - step-1 accepts iff f_diff > 0 (cpp:445-448); step-2 requires
    l_diff > 0 AND step_quality > min_relative_decrease (cpp:744-747)
  - function_tolerance on |cost_change| <= ftol * cost of the selected
    optimized_cost channel (cpp:179-205)
  - iteration 0 is error evaluation + logging only
  - unlimited inner backtracking per linearization point, with the outer
    iteration counter advancing every inner trial (MAX_INNER_IT loop)

The outer loop runs host-side (it drives logging and data-dependent
termination, like the reference); each stage is one fused jit call, so
per-iteration host work is O(1) scalars.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from povar_tpu.options import OptimizedCost, SolverOptions, SolverType
from povar_tpu.solver.common import ResidualInfo, error_summary_oneline
from povar_tpu.solver.stage1 import Stage1Solver
from povar_tpu.solver.stage2 import Stage2Solver, create_homogeneous
from povar_tpu.utils.summary import (
    CONVERGENCE,
    NO_CONVERGENCE,
    IterationSummary,
    SolverSummary,
    finish_iteration,
    finish_solve,
)
from povar_tpu.utils.timer import Timer


def _compute_cost_decrease(
    before: ResidualInfo, after: ResidualInfo, optimized_cost: OptimizedCost
) -> float:
    """bal_bundle_adjustment.cpp:163-176."""
    if optimized_cost == OptimizedCost.ERROR:
        return before.all.error - after.all.error
    if optimized_cost == OptimizedCost.ERROR_VALID:
        return before.valid.error - after.valid.error
    return before.valid.error_avg() - after.valid.error_avg()


def _function_tolerance_reached(
    cost: ResidualInfo,
    prev_cost: Optional[ResidualInfo],
    options: SolverOptions,
) -> Tuple[bool, str]:
    """bal_bundle_adjustment.cpp:179-205. `prev_cost` is the cost of
    the previous RECORDED trial (finish_iteration computes cost_change
    against summary.iterations.back(), cpp:74-78) — after backtracking
    that is the last rejected trial's evaluated cost, NOT the
    linearization-point cost. A NaN-increment record carries no cost
    (the reference default-constructs ResidualInfo to zeros), mapped
    here to prev_cost=None -> change = cost itself."""
    prev_all = prev_cost.all.error if prev_cost is not None else 0.0
    prev_valid = prev_cost.valid.error if prev_cost is not None else 0.0
    if options.optimized_cost == OptimizedCost.ERROR:
        c = cost.all.error
        change = abs(prev_all - cost.all.error)
    else:
        c = cost.valid.error
        change = abs(prev_valid - cost.valid.error)
    if change <= options.function_tolerance * c:
        return True, (
            f"Function tolerance reached. |cost_change|/cost: "
            f"{change / c} <= {options.function_tolerance}"
        )
    return False, ""


_TIMING_FIELDS = {
    "jacobian_evaluation": "jacobian_evaluation_time_in_seconds",
    "scale_landmark_jacobian": "scale_landmark_jacobian_time_in_seconds",
    "scale_pose_jacobian": "scale_pose_jacobian_time_in_seconds",
    "perform_qr": "perform_qr_time_in_seconds",
    "stage2": "stage2_time_in_seconds",
    "landmark_damping": "landmark_damping_time_in_seconds",
    "prepare": "prepare_time_in_seconds",
    "compute_preconditioner": "compute_preconditioner_time_in_seconds",
    "solve_reduced_system": "solve_reduced_system_time_in_seconds",
    "back_substitution": "back_substitution_time_in_seconds",
    "update_cameras": "update_cameras_time_in_seconds",
}


def _set_timings(it_summary: IterationSummary, tdict) -> None:
    """Copy staged per-stage wall times into the iteration summary
    (field names follow solver_summary.hpp:186-212)."""
    if not tdict:
        return
    for k, v in tdict.items():
        setattr(it_summary, _TIMING_FIELDS[k], float(v))


def _optimize_lm_loop(
    *,
    options: SolverOptions,
    max_lm_iter: int,
    compute_error: Callable[[], ResidualInfo],
    linearize: Callable[[], Optional[dict]],
    solve: Callable[[float], Tuple[np.ndarray, int, Optional[dict]]],
    apply_step: Callable[[np.ndarray], Tuple[float, Optional[dict]]],
    accept: Callable[[], None],
    reject: Callable[[], None],
    accept_rule: str,  # "step1" (f_diff > 0) or "step2" (quality gate)
    summary: SolverSummary,
    timer_total: Timer,
    log: Callable[[str], None],
    initialize: Optional[Callable[[], None]] = None,
    trial: Optional[Callable] = None,
) -> None:
    """Shared LM loop skeleton for both steps (the reference duplicates
    this ~300-line loop twice; the accept rule and stage callbacks are
    the only differences)."""
    min_lambda = 1.0 / options.max_trust_region_radius
    max_lambda = 1.0 / options.min_trust_region_radius
    lam = 1.0 / options.initial_trust_region_radius
    lambda_vee = options.initial_vee

    valid_first = options.use_projection_validity_check()
    terminated = False
    it = 0
    first = True
    cached_ri = None  # error of the current state from the last accept

    while it <= max_lm_iter and not terminated:
        it_summary = IterationSummary(iteration=it)
        timer_iteration = Timer()

        if first and initialize is not None:
            initialize()
        # the reference re-evaluates the cost at the top of every outer
        # iteration (bal_bundle_adjustment.cpp:301-305); after an accept
        # the state is unchanged since ri2, so reuse it
        ri = cached_ri if cached_ri is not None else compute_error()
        first = False
        log(f"Iteration {it}, {error_summary_oneline(ri, valid_first)}")
        if not ri.is_numerically_valid:
            raise FloatingPointError(
                "did not expect numerical failure during linearization"
            )

        if it == 0:
            it_summary.cost = ri
            it_summary.trust_region_radius = 1.0 / lam
            it_summary.iteration_time_in_seconds = timer_iteration.elapsed()
            it_summary.cumulative_time_in_seconds = timer_total.elapsed()
            it_summary.step_is_successful = True
            it_summary.step_is_valid = True
            finish_iteration(summary, it_summary)
            it += 1
            continue

        t_stage1 = Timer()
        t_lin = linearize()
        it_summary.stage1_time_in_seconds = t_stage1.elapsed()
        if t_lin is None:
            it_summary.jacobian_evaluation_time_in_seconds = (
                it_summary.stage1_time_in_seconds
            )
        else:
            _set_timings(it_summary, t_lin)
        summary.num_jacobian_evaluations += 1

        # inner backtracking loop (unlimited, cpp:337-340)
        j = 0
        while it <= max_lm_iter and not terminated:
            if j > 0:
                log(f"Iteration {it}, backtracking")
                it_summary = IterationSummary(iteration=it)
                timer_iteration = Timer()
            j += 1

            if trial is not None:
                # fused path: solve + apply + cost in ONE device
                # executable (stage1.Stage1Solver.trial) — one dispatch
                # and one host sync per backtracking trial instead of
                # three dispatches with a [12, N] increment round-trip.
                # The whole span lands in solve_reduced_system_time
                # (the stages are one device program; detailed_timing
                # gives the per-stage split on the staged path).
                t_solve = Timer()
                step_ok, lin_iters, l_diff, ri2 = trial(lam)
                it_summary.solve_reduced_system_time_in_seconds = (
                    t_solve.elapsed()
                )
            else:
                t_solve = Timer()
                inc, lin_iters, t_sol = solve(lam)
                if t_sol is None:
                    it_summary.solve_reduced_system_time_in_seconds = (
                        t_solve.elapsed()
                    )
                else:
                    _set_timings(it_summary, t_sol)
                step_ok = bool(np.all(np.isfinite(inc)))
            it_summary.linear_solver_iterations = int(lin_iters)
            summary.num_linear_solves += 1

            if not step_ok:
                # NaN increment: invalid step (cpp:362-401)
                it_summary.step_is_valid = False
                it_summary.step_is_successful = False
                log(
                    f"\t[Invalid] Numeric issues when computing increment "
                    f"(contains NaNs), lambda: {lam:.1e}"
                )
                lam = lambda_vee * lam
                lambda_vee *= options.vee_factor
                it_summary.trust_region_radius = 1.0 / lam
                it_summary.iteration_time_in_seconds = (
                    timer_iteration.elapsed()
                )
                it_summary.cumulative_time_in_seconds = timer_total.elapsed()
                finish_iteration(summary, it_summary)
                it += 1
                if lam > max_lambda:
                    terminated = True
                    summary.termination_type = NO_CONVERGENCE
                    summary.message = (
                        "Solver did not converge and reached maximum "
                        f"damping lambda of {max_lambda}"
                    )
                continue

            if trial is None:
                t_bsub = Timer()
                l_diff, t_app = apply_step(inc)
                if t_app is None:
                    it_summary.back_substitution_time_in_seconds = (
                        t_bsub.elapsed()
                    )
                else:
                    _set_timings(it_summary, t_app)

                t_res = Timer()
                ri2 = compute_error()
                it_summary.residual_evaluation_time_in_seconds = (
                    t_res.elapsed()
                )
            summary.num_residual_evaluations += 1
            it_summary.cost = ri2

            if not ri2.is_numerically_valid:
                it_summary.step_is_valid = False
                it_summary.step_is_successful = False
                log(
                    "\t[EVAL] failed to evaluate cost: "
                    + error_summary_oneline(ri2, valid_first)
                )
            else:
                f_diff = _compute_cost_decrease(
                    ri, ri2, options.optimized_cost
                )
                if options.optimized_cost == OptimizedCost.ERROR_VALID_AVG:
                    l_diff = l_diff / ri.valid.num_obs
                step_quality = f_diff / l_diff if l_diff != 0 else math.inf
                log(
                    f"\t[EVAL] f_diff {f_diff:.4e} l_diff {l_diff:.4e} "
                    f"ri1 {ri.valid.error:.4e} ri2 {ri2.valid.error:.4e}"
                )
                it_summary.relative_decrease = step_quality
                if accept_rule == "step1":
                    # cpp:445-448
                    it_summary.step_is_valid = True
                    it_summary.step_is_successful = f_diff > 0
                else:
                    # cpp:741-747
                    it_summary.step_is_valid = l_diff > 0
                    it_summary.step_is_successful = (
                        it_summary.step_is_valid
                        and step_quality > options.min_relative_decrease
                    )

            if it_summary.step_is_successful:
                accept()
                log(
                    f"\t[Success] error: {ri2.all.error:.4e}, "
                    f"lambda: {lam:.1e}, it_time: "
                    f"{timer_iteration.elapsed():.3f}s, total_time: "
                    f"{timer_total.elapsed():.3f}s"
                )
                # evaluated through the shared traced expression so
                # the host and device drivers' lambda schedules are
                # bit-identical (device_loop.lm_damping_factor)
                from povar_tpu.solver.device_loop import (
                    host_damping_factor,
                )

                lam *= host_damping_factor(
                    it_summary.relative_decrease
                )
                lam = max(min_lambda, lam)
                lambda_vee = options.initial_vee

                it_summary.trust_region_radius = 1.0 / lam
                it_summary.iteration_time_in_seconds = (
                    timer_iteration.elapsed()
                )
                it_summary.cumulative_time_in_seconds = timer_total.elapsed()
                # the ftol check compares against the cost of the
                # previous RECORDED trial (cpp:476/776 pass
                # summary.iterations.back() whose cost_change was
                # computed in finish_iteration, cpp:74-78) — after
                # backtracking that is the last rejected trial, not
                # the linearization point ri
                prev_rec_cost = (
                    summary.iterations[-1].cost
                    if summary.iterations
                    else None
                )
                finish_iteration(summary, it_summary)
                it += 1

                cached_ri = ri2
                reached, msg = _function_tolerance_reached(
                    ri2, prev_rec_cost, options
                )
                if reached:
                    terminated = True
                    summary.termination_type = CONVERGENCE
                    summary.message = msg
                break  # leave inner loop
            else:
                reason = "Reject" if it_summary.step_is_valid else "Invalid"
                log(
                    f"\t[{reason}] error: {ri2.all.error:.4e}, "
                    f"lambda: {lam:.1e}, it_time: "
                    f"{timer_iteration.elapsed():.3f}s, total_time: "
                    f"{timer_total.elapsed():.3f}s"
                )
                lam = lambda_vee * lam
                lambda_vee *= options.vee_factor

                it_summary.trust_region_radius = 1.0 / lam
                it_summary.iteration_time_in_seconds = (
                    timer_iteration.elapsed()
                )
                it_summary.cumulative_time_in_seconds = timer_total.elapsed()
                it_summary.step_is_successful = False
                finish_iteration(summary, it_summary)
                reject()
                it += 1
                if lam > max_lambda:
                    terminated = True
                    summary.termination_type = NO_CONVERGENCE
                    summary.message = (
                        "Solver did not converge and reached maximum "
                        f"damping lambda of {max_lambda}"
                    )

    if not terminated:
        summary.termination_type = NO_CONVERGENCE
        summary.message = (
            "Solver did not converge after maximum number of "
            f"{max_lm_iter} iterations"
        )


def _use_device_loop(options: SolverOptions, solver, detailed) -> bool:
    """Whole-solve-on-device eligibility (solver/device_loop.py): the
    fused trial must exist and per-stage host timing must be off."""
    mode = getattr(options, "device_lm_loop", "off")
    capable = (
        (not detailed)
        and getattr(solver, "supports_trial", False)
        and getattr(solver, "supports_device_loop", False)
    )
    if mode == "on" and not capable:
        raise ValueError(
            "device_lm_loop='on' requires the fused trial "
            "(supports_trial) and detailed_timing=False"
        )
    return mode in ("auto", "on") and capable


def _run_device_loop(
    solver, state, options, accept_rule, max_lm_iter, summary,
    timer_total, log,
) -> None:
    """Single-dispatch device LM loop. The initial error evaluation is
    dispatched asynchronously and fetched TOGETHER with the loop's
    trace arrays (one device_get, one tunnel round trip); the
    iteration-0 record is reconstructed afterwards like every other
    log line in this mode."""
    from povar_tpu.solver import device_loop

    err0 = solver.compute_error(state.cams, state.lms)
    run = device_loop.build_device_lm_run(
        solver, options, accept_rule, max_lm_iter
    )
    jit_run = solver._jit_cached(
        f"device_lm_run_{accept_rule}_{max_lm_iter}_"
        f"{options.device_loop_cache_token()}",
        run,
    )
    device_loop.drive_device_loop(
        solver, state, options, accept_rule, max_lm_iter, summary,
        timer_total, log, err0, jit_run,
    )


_SOLVER_TYPE_NAMES = {
    SolverType.PCG: "bal_pcg",
    SolverType.POWER_SCHUR_COMPLEMENT: "bal_power_sc",
    SolverType.POWER_VARPROJ: "power_variable_projection",
    SolverType.CHOLESKY: "variable_projection",
}


class _State:
    """Mutable {current, trial} state pair replacing the reference's
    in-place update + backup/restore (bal_problem.cpp:647-708)."""

    def __init__(self, cams, lms):
        self.cams = cams
        self.lms = lms
        self.trial = None  # (cams, lms)

    def stage(self, cams, lms):
        self.trial = (cams, lms)

    # the reference applies the step to the problem in place, evaluates
    # the cost, and restores on reject; "current" is therefore the trial
    # state while one is staged
    @property
    def cur_cams(self):
        return self.trial[0] if self.trial is not None else self.cams

    @property
    def cur_lms(self):
        return self.trial[1] if self.trial is not None else self.lms

    def accept(self):
        self.cams, self.lms = self.trial
        self.trial = None

    def reject(self):
        self.trial = None


def optimize_step1(
    solver: Stage1Solver,
    cam_space: jnp.ndarray,
    lm_p: jnp.ndarray,
    options: SolverOptions,
    summary: SolverSummary,
    timer_total: Timer,
    log: Callable[[str], None] = print,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Step 1: pOSE VarProj LM (optimize_lm_ours_pOSE, cpp:252-542).
    Returns the optimized (cam_space, lm_p)."""
    state = _State(cam_space, lm_p)
    lin_box = {}
    is_poba = (
        options.solver_type_step_1 == SolverType.POWER_SCHUR_COMPLEMENT
    )
    detailed = options.detailed_timing

    def initialize():
        # thread the landmark state through the loop in L space
        # (stage1.LmState): the canonical<->slot-order takes then
        # happen once per stage instead of several times per iteration
        state.lms = solver.lm_pack(
            solver.initialize_varproj(state.cams)
        )

    def compute_error():
        return ResidualInfo.from_device(jax.device_get(
            solver.compute_error(state.cur_cams, state.cur_lms)
        ))

    def linearize():
        if detailed:
            lin_box["lin"], t = solver.linearize_timed(
                state.cams, state.lms
            )
            return t
        lin_box["lin"] = solver.linearize(state.cams, state.lms)
        return None

    def solve_with_lam(lam):
        # poBA needs the damping lambda inside apply; thread via the box
        lin_box["lam"] = lam
        if detailed:
            inc, iters, t = solver.solve_timed(lin_box["lin"], lam)
            return np.asarray(inc), np.asarray(iters), t
        inc, iters = solver.solve(
            lin_box["lin"], jnp.asarray(lam, solver.dtype)
        )
        return np.asarray(inc), np.asarray(iters), None

    def apply_step(inc):
        inc = jnp.asarray(inc)
        if detailed:
            new_cams, new_lms, l_diff, t = solver.apply_timed(
                state.cams, state.lms, lin_box["lin"], inc,
                lam=lin_box["lam"],
            )
            state.stage(new_cams, new_lms)
            return float(l_diff), t
        if is_poba:
            new_cams, new_lms, l_diff = solver.apply_poba(
                state.cams, state.lms, lin_box["lin"], inc,
                jnp.asarray(lin_box["lam"], solver.dtype),
            )
        else:
            new_cams, new_lms, l_diff = solver.apply(
                state.cams, state.lms, lin_box["lin"], inc
            )
        state.stage(new_cams, new_lms)
        return float(l_diff), None

    def trial_step(lam):
        # fused solve+apply+cost (stage1.Stage1Solver.trial); stage the
        # new state only when the increment is finite — a NaN trial is
        # discarded exactly like the staged path's pre-apply check
        new_cams, new_lms, ok, iters, l_diff, err = solver.trial(
            state.cams, state.lms, lin_box["lin"],
            jnp.asarray(lam, solver.dtype),
        )
        # one batched host transfer for the decision scalars + cost
        # buckets (separate pulls pay ~10 tunnel round trips per trial)
        ok, iters, l_diff, err = jax.device_get(
            (ok, iters, l_diff, err)
        )
        ok = bool(ok)
        ri2 = ResidualInfo.from_device(err)
        if ok:
            state.stage(new_cams, new_lms)
        return ok, int(iters), float(l_diff), ri2

    use_trial = (not detailed) and solver.supports_trial

    if _use_device_loop(options, solver, detailed):
        initialize()
        _run_device_loop(
            solver, state, options, "step1",
            options.max_num_iterations_step_1, summary, timer_total,
            log,
        )
    else:
        _optimize_lm_loop(
            options=options,
            max_lm_iter=options.max_num_iterations_step_1,
            compute_error=compute_error,
            linearize=linearize,
            solve=solve_with_lam,
            apply_step=apply_step,
            accept=state.accept,
            reject=state.reject,
            accept_rule="step1",
            summary=summary,
            timer_total=timer_total,
            log=log,
            initialize=initialize,
            trial=trial_step if use_trial else None,
        )
    summary.minimizer_time_in_seconds = timer_total.elapsed()
    finish_solve(summary, _SOLVER_TYPE_NAMES[options.solver_type_step_1])
    return state.cams, solver.lm_unpack(state.lms)


def optimize_step2(
    solver: Stage2Solver,
    cam_space: jnp.ndarray,
    lm_p_h: jnp.ndarray,
    options: SolverOptions,
    summary: SolverSummary,
    timer_total: Timer,
    log: Callable[[str], None] = print,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Step 2: Riemannian joint refinement (optimize_homogeneous_joint,
    cpp:557-843). Returns optimized (cam_space, lm_p_h)."""
    state = _State(cam_space, solver.lm_pack(lm_p_h))
    lin_box = {}
    detailed = options.detailed_timing

    def compute_error():
        return ResidualInfo.from_device(jax.device_get(
            solver.compute_error(state.cur_cams, state.cur_lms)
        ))

    def linearize():
        if detailed:
            lin_box["lin"], t = solver.linearize_timed(
                state.cams, state.lms
            )
            return t
        lin_box["lin"] = solver.linearize(state.cams, state.lms)
        return None

    def solve(lam):
        lin_box["lam"] = lam
        if detailed:
            inc, iters, t = solver.solve_timed(lin_box["lin"], lam)
            return np.asarray(inc), np.asarray(iters), t
        inc, iters = solver.solve(
            lin_box["lin"], jnp.asarray(lam, solver.dtype)
        )
        return np.asarray(inc), np.asarray(iters), None

    def apply_step(inc):
        if detailed:
            new_cams, new_lms, l_diff, t = solver.apply_timed(
                state.cams, state.lms, lin_box["lin"],
                jnp.asarray(inc), jnp.asarray(lin_box["lam"]),
            )
            state.stage(new_cams, new_lms)
            return float(l_diff), t
        new_cams, new_lms, l_diff = solver.apply(
            state.cams,
            state.lms,
            lin_box["lin"],
            jnp.asarray(inc),
            jnp.asarray(lin_box["lam"], solver.dtype),
        )
        state.stage(new_cams, new_lms)
        return float(l_diff), None

    def trial_step(lam):
        # fused solve+apply+cost (stage2.Stage2Solver.trial); same
        # contract as step 1's trial_step
        new_cams, new_lms, ok, iters, l_diff, err = solver.trial(
            state.cams, state.lms, lin_box["lin"],
            jnp.asarray(lam, solver.dtype),
        )
        # batched transfer (see step 1's trial_step)
        ok, iters, l_diff, err = jax.device_get(
            (ok, iters, l_diff, err)
        )
        ok = bool(ok)
        ri2 = ResidualInfo.from_device(err)
        if ok:
            state.stage(new_cams, new_lms)
        return ok, int(iters), float(l_diff), ri2

    use_trial = (
        (not detailed) and getattr(solver, "supports_trial", False)
    )

    if _use_device_loop(options, solver, detailed):
        _run_device_loop(
            solver, state, options, "step2",
            options.max_num_iterations_step_2, summary, timer_total,
            log,
        )
    else:
        _optimize_lm_loop(
            options=options,
            max_lm_iter=options.max_num_iterations_step_2,
            compute_error=compute_error,
            linearize=linearize,
            solve=solve,
            apply_step=apply_step,
            accept=state.accept,
            reject=state.reject,
            accept_rule="step2",
            summary=summary,
            timer_total=timer_total,
            log=log,
            trial=trial_step if use_trial else None,
        )
    summary.minimizer_time_in_seconds = timer_total.elapsed()
    summary.total_time_in_seconds = timer_total.elapsed()
    finish_solve(
        summary,
        "riemannian_" + options.solver_type_step_2.value.lower(),
    )
    return state.cams, solver.lm_unpack(state.lms)
