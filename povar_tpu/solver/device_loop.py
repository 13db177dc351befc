"""Whole-solve-on-device LM driver.

The reference's trust-region loop is a CPU driver
(bal_bundle_adjustment.cpp:252-542 / 557-843): linearize, solve, apply,
evaluate, accept/reject, repeat — with the control-flow scalars
(lambda, vee factor, cost decreases, tolerances) living in host
registers between device calls. The host-driven port of that loop
(solver/lm.py:_optimize_lm_loop) pays 2 dispatches plus ~6 scalar
device->host syncs per backtracking trial; on a remote/tunneled TPU
that overhead (~0.5-0.8 s/iteration) dwarfs the trial itself
(~5 ms at venice-89).

This module expresses the SAME algorithm as one XLA executable: a
`lax.while_loop` whose body is the fused trial (solve + apply + f64
cost, stage1.Stage1Solver._trial) plus the accept/reject arithmetic,
with `lax.cond`-guarded relinearization after accepted steps. The
loop carries the LM state (cameras, landmarks, linearization, lambda,
vee) and writes per-iteration TRACE arrays (cost channels, decisions,
inner-iteration counts, trust-region radii) from which the host
reconstructs the exact iteration log after the single dispatch
returns.

Exactness: every control-flow quantity is computed by the same IEEE
f64 operations as the host loop (the lambda schedule literally shares
one traced expression, lm_damping_factor below). The residual
difference is fusion-context rounding: XLA fuses the trial graphs
differently inside a while-loop body than as standalone executables,
and LLVM contracts mul+add chains into FMAs per context (piercing HLO
optimization barriers), so per-iteration values drift by ~1 ulp —
amplified through ill-conditioned steps to <=1e-8 relative in
practice. Trajectories are DECISION-identical with exact
inner-iteration counts (tests/test_device_loop.py); algorithm-level
ground truth remains pinned by the host loop against the Eigen
harnesses (tests/test_reference_parity.py).

What is NOT available in this mode (documented trade-offs):
  * per-iteration wall times: one executable has no host timestamps
    between iterations; the host assigns the uniform mean
    (total / n_trials) to each record. Stage-level spans require
    `detailed_timing`, which forces the host loop anyway.
  * live per-iteration log lines: the same text is emitted after the
    dispatch returns (replayed from the traces).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from povar_tpu.options import OptimizedCost, SolverOptions
from povar_tpu.solver.common import ResidualInfo, error_summary_oneline
from povar_tpu.utils.summary import (
    CONVERGENCE,
    NO_CONVERGENCE,
    IterationSummary,
    SolverSummary,
    finish_iteration,
)
from povar_tpu.utils.timer import Timer

# trace column order for the f64 cost channels
_ERR_COLS = (
    "error_all",
    "residual_sum_all",
    "error_valid",
    "residual_sum_valid",
)
_NUM_COLS = ("num_obs_all", "num_obs_valid")


def lm_damping_factor(q):
    """The LM lambda multiplier on an accepted step,
    max(1/3, 1 - (2 rho - 1)^3) (bal_bundle_adjustment.cpp:452-455).

    BOTH drivers evaluate this one traced expression — the device loop
    inline in its while-body, the host loop through the tiny jit below
    — because XLA's LLVM backend contracts the mul+sub chain into an
    FMA (one rounding fewer than separate Python float ops, ~1 ulp),
    and the contraction pierces HLO optimization barriers. Sharing the
    traced expression keeps the two drivers' lambda schedules
    bit-identical."""
    t = 2.0 * q - 1.0
    return jnp.maximum(jnp.float64(1.0 / 3), 1.0 - t * t * t)


_factor_jit = None


def host_damping_factor(q: float) -> float:
    """Host-loop entry to lm_damping_factor (see its docstring)."""
    global _factor_jit
    if _factor_jit is None:
        _factor_jit = jax.jit(lm_damping_factor)
    return float(_factor_jit(jnp.float64(q)))


def _err_to_rows(err):
    f = jnp.stack([err[k].astype(jnp.float64) for k in _ERR_COLS])
    n = jnp.stack([err[k].astype(jnp.int64) for k in _NUM_COLS])
    return f, n


def _rows_to_info(f_row, n_row, nv) -> ResidualInfo:
    from povar_tpu.solver.common import ResidualItem

    return ResidualInfo(
        all=ResidualItem(
            num_obs=int(n_row[0]),
            error=float(f_row[0]),
            residual_sum=float(f_row[1]),
        ),
        valid=ResidualItem(
            num_obs=int(n_row[1]),
            error=float(f_row[2]),
            residual_sum=float(f_row[3]),
        ),
        is_numerically_valid=bool(nv),
    )


def build_device_lm_run(
    solver,
    options: SolverOptions,
    accept_rule: str,  # "step1" | "step2"
    max_lm_iter: int,
):
    """Build the traced whole-solve function
    run(obs, cams, lms, err0) -> (cams, lms, n_trials, term, traces).

    `err0` is the accumulate_residual_info dict of the START state
    (the host computed it anyway for the iteration-0 record). `term`:
    0 = max-iterations exhausted, 1 = function-tolerance convergence,
    2 = max-lambda reached. Trace arrays are length max_lm_iter; rows
    [n_trials:] are unwritten padding."""
    min_lambda = 1.0 / options.max_trust_region_radius
    max_lambda = 1.0 / options.min_trust_region_radius
    ftol = options.function_tolerance
    min_rel_dec = options.min_relative_decrease
    vee_factor = options.vee_factor
    initial_vee = options.initial_vee
    oc = options.optimized_cost
    is_step1 = accept_rule == "step1"
    T = int(max_lm_iter)
    is_poba = False
    try:  # pragma: no cover - trivial
        from povar_tpu.options import SolverType

        is_poba = (
            is_step1
            and options.solver_type_step_1
            == SolverType.POWER_SCHUR_COMPLEMENT
        )
    except Exception:
        pass
    del is_poba  # the trial already dispatches on solver type

    def cost_channel(f_row, n_row):
        # _compute_cost_decrease channel (cpp:163-176)
        if oc == OptimizedCost.ERROR:
            return f_row[0]
        if oc == OptimizedCost.ERROR_VALID:
            return f_row[2]
        n = jnp.maximum(n_row[1], 1).astype(jnp.float64)
        return f_row[2] / n

    def ftol_channel(f_row):
        # _function_tolerance_reached channel (cpp:179-205)
        return f_row[0] if oc == OptimizedCost.ERROR else f_row[2]

    def run(obs, cams, lms, err0):
        lin0 = solver._linearize(obs, cams, lms)
        f0, n0 = _err_to_rows(err0)

        traces = {
            "err_f": jnp.zeros((T, 4), jnp.float64),
            "err_n": jnp.zeros((T, 2), jnp.int64),
            "has_cost": jnp.zeros((T,), bool),
            "nv": jnp.zeros((T,), bool),
            "valid": jnp.zeros((T,), bool),
            "accept": jnp.zeros((T,), bool),
            "lin_iters": jnp.zeros((T,), jnp.int32),
            "radius": jnp.zeros((T,), jnp.float64),
            "rel_dec": jnp.zeros((T,), jnp.float64),
            "f_diff": jnp.zeros((T,), jnp.float64),
            "l_diff": jnp.zeros((T,), jnp.float64),
            "relin": jnp.zeros((T,), bool),
            "lam": jnp.zeros((T,), jnp.float64),
        }
        lam0 = jnp.float64(1.0 / options.initial_trust_region_radius)
        vee0 = jnp.float64(initial_vee)
        carry0 = (
            jnp.int32(1),  # it
            jnp.int32(0),  # term
            lam0,
            vee0,
            cams,
            lms,
            lin0,
            (f0, n0),  # current-state cost rows
            (f0, n0),  # previous RECORDED trial's cost rows
            traces,
        )

        def cond(c):
            it, term = c[0], c[1]
            return (it <= T) & (term == 0)

        def body(c):
            (it, term, lam, vee, cams, lms, lin, cur, prev_rec, tr) = c
            k = it - 1  # trace row

            new_cams, new_lms, ok, iters, l_diff, err2 = solver._trial(
                obs, cams, lms, lin, lam.astype(solver.dtype)
            )
            f2, n2 = _err_to_rows(err2)
            nv = err2["is_numerically_valid"]
            l_diff = jnp.asarray(l_diff, jnp.float64)

            f_diff = cost_channel(*cur) - cost_channel(f2, n2)
            if oc == OptimizedCost.ERROR_VALID_AVG:
                l_eff = l_diff / jnp.maximum(cur[1][1], 1).astype(
                    jnp.float64
                )
            else:
                l_eff = l_diff
            quality = jnp.where(
                l_eff != 0.0, f_diff / l_eff, jnp.float64(math.inf)
            )

            if is_step1:
                # cpp:445-448: any finite-cost step is "valid"
                valid = ok & nv
                accept = valid & (f_diff > 0)
            else:
                # cpp:741-747
                valid = ok & nv & (l_eff > 0)
                accept = valid & (quality > min_rel_dec)

            # lambda schedule (identical arithmetic to the host loop)
            # lambda schedule — the shared traced expression (see
            # lm_damping_factor) keeps host/device bit-identical
            lam_acc = jnp.maximum(
                jnp.float64(min_lambda),
                lam * lm_damping_factor(quality),
            )
            lam_rej = vee * lam
            lam2 = jnp.where(accept, lam_acc, lam_rej)
            vee2 = jnp.where(
                accept, jnp.float64(initial_vee), vee * vee_factor
            )

            # termination: ftol on accept (vs the previous RECORDED
            # trial, cpp:476/776 + 74-78), max-lambda on reject
            c_new = ftol_channel(f2)
            change = jnp.abs(ftol_channel(prev_rec[0]) - c_new)
            ftol_reached = accept & (change <= ftol * c_new)
            lam_overflow = (~accept) & (lam2 > max_lambda)
            term2 = jnp.where(
                ftol_reached,
                jnp.int32(1),
                jnp.where(lam_overflow, jnp.int32(2), jnp.int32(0)),
            )

            # state selects
            cams2 = jnp.where(accept, new_cams, cams)
            lms2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), new_lms, lms
            )
            cur2 = (
                jnp.where(accept, f2, cur[0]),
                jnp.where(accept, n2, cur[1]),
            )
            # a NaN-increment trial records no cost (host: it_summary
            # .cost stays None -> prev_cost None -> channels 0.0)
            prev2 = (
                jnp.where(ok, f2, jnp.zeros_like(f2)),
                jnp.where(ok, n2, jnp.zeros_like(n2)),
            )

            # relinearize only when the loop will actually continue
            # from the new point (host: outer-loop linearize)
            relin = accept & (term2 == 0) & (it < T)
            lin2 = lax.cond(
                relin,
                lambda args: solver._linearize(obs, args[0], args[1]),
                lambda args: lin,
                (cams2, lms2),
            )

            tr2 = dict(tr)
            tr2["err_f"] = tr["err_f"].at[k].set(f2)
            tr2["err_n"] = tr["err_n"].at[k].set(n2)
            tr2["has_cost"] = tr["has_cost"].at[k].set(ok)
            tr2["nv"] = tr["nv"].at[k].set(nv)
            tr2["valid"] = tr["valid"].at[k].set(valid)
            tr2["accept"] = tr["accept"].at[k].set(accept)
            tr2["lin_iters"] = tr["lin_iters"].at[k].set(
                jnp.asarray(iters, jnp.int32)
            )
            tr2["radius"] = tr["radius"].at[k].set(1.0 / lam2)
            tr2["rel_dec"] = tr["rel_dec"].at[k].set(
                jnp.where(ok & nv, quality, 0.0)
            )
            tr2["f_diff"] = tr["f_diff"].at[k].set(
                jnp.where(ok & nv, f_diff, 0.0)
            )
            tr2["l_diff"] = tr["l_diff"].at[k].set(
                jnp.where(ok, l_eff, 0.0)
            )
            tr2["relin"] = tr["relin"].at[k].set(relin)
            tr2["lam"] = tr["lam"].at[k].set(lam2)

            return (
                it + 1, term2, lam2, vee2, cams2, lms2, lin2, cur2,
                prev2, tr2,
            )

        out = lax.while_loop(cond, body, carry0)
        it, term = out[0], out[1]
        cams_f, lms_f, traces_f = out[4], out[5], out[9]
        return cams_f, lms_f, it - 1, term, traces_f

    return run


def drive_device_loop(
    solver,
    state,  # lm._State
    options: SolverOptions,
    accept_rule: str,
    max_lm_iter: int,
    summary: SolverSummary,
    timer_total: Timer,
    log: Callable[[str], None],
    err0,
    jit_run,
) -> None:
    """Run the device loop and reconstruct the host-identical summary
    records + log lines from the traces — including the iteration-0
    record: `err0` arrives as device arrays and rides the same batched
    device_get as the traces, so the whole step costs exactly one
    blocking host<->device round trip."""
    valid_first = options.use_projection_validity_check()

    t0 = Timer()
    cams_f, lms_f, n_trials, term, tr = jit_run(
        solver.obs, state.cams, state.lms, err0
    )
    # ONE batched host transfer for scalars + every trace array + the
    # initial error buckets: each separate int()/np.asarray() fetch
    # pays a full tunnel round trip (~10-20 ms on a remote TPU), and
    # there are ~15 of them — more wall time than the 25-iteration
    # loop's compute itself
    n, term, tr, err0_host = jax.device_get((n_trials, term, tr, err0))
    n = int(n)
    term = int(term)
    wall = t0.elapsed()
    state.cams = cams_f
    state.lms = lms_f
    state.trial = None

    ri0 = ResidualInfo.from_device(err0_host)
    log(f"Iteration 0, {error_summary_oneline(ri0, valid_first)}")
    if not ri0.is_numerically_valid:
        # same exception as the host loop; in this mode it surfaces
        # after the (wasted) dispatch, which only matters on inputs
        # that are already NaN/Inf at iteration 0
        raise FloatingPointError(
            "did not expect numerical failure during linearization"
        )
    it0 = IterationSummary(iteration=0)
    it0.cost = ri0
    it0.trust_region_radius = options.initial_trust_region_radius
    it0.step_is_successful = True
    it0.step_is_valid = True
    it0.cumulative_time_in_seconds = timer_total.elapsed() - wall
    finish_iteration(summary, it0)

    it_time = wall / max(n, 1)
    cur_f, cur_n = np.asarray(tr["err_f"]), np.asarray(tr["err_n"])
    # replay state-cost for the "Iteration N," header lines
    ri_cur = ri0
    new_outer = True
    for k in range(n):
        it = k + 1
        if new_outer:
            log(
                f"Iteration {it}, "
                + error_summary_oneline(ri_cur, valid_first)
            )
            summary.num_jacobian_evaluations += 1
        else:
            log(f"Iteration {it}, backtracking")
        summary.num_linear_solves += 1

        it_summary = IterationSummary(iteration=it)
        it_summary.linear_solver_iterations = int(tr["lin_iters"][k])
        it_summary.trust_region_radius = float(tr["radius"][k])
        it_summary.iteration_time_in_seconds = it_time
        it_summary.cumulative_time_in_seconds = (
            timer_total.elapsed() - wall + it_time * it
        )
        it_summary.solve_reduced_system_time_in_seconds = it_time

        lam_pre = _pre_reject_lambda(tr, k, options)
        if not tr["has_cost"][k]:
            # NaN increment (cpp:362-401)
            it_summary.step_is_valid = False
            it_summary.step_is_successful = False
            log(
                f"\t[Invalid] Numeric issues when computing increment "
                f"(contains NaNs), lambda: {lam_pre:.1e}"
            )
            finish_iteration(summary, it_summary)
            new_outer = False
            continue

        summary.num_residual_evaluations += 1
        ri2 = _rows_to_info(cur_f[k], cur_n[k], tr["nv"][k])
        it_summary.cost = ri2
        it_summary.step_is_valid = bool(tr["valid"][k])
        it_summary.step_is_successful = bool(tr["accept"][k])
        it_summary.relative_decrease = float(tr["rel_dec"][k])

        if not ri2.is_numerically_valid:
            log(
                "\t[EVAL] failed to evaluate cost: "
                + error_summary_oneline(ri2, valid_first)
            )
        else:
            log(
                f"\t[EVAL] f_diff {tr['f_diff'][k]:.4e} "
                f"l_diff {tr['l_diff'][k]:.4e} "
                f"ri1 {ri_cur.valid.error:.4e} "
                f"ri2 {ri2.valid.error:.4e}"
            )
        if it_summary.step_is_successful:
            log(
                f"\t[Success] error: {ri2.all.error:.4e}, "
                f"lambda: {lam_pre:.1e}, it_time: {it_time:.3f}s, "
                f"total_time: "
                f"{it_summary.cumulative_time_in_seconds:.3f}s"
            )
            ri_cur = ri2
            new_outer = True
        else:
            reason = "Reject" if it_summary.step_is_valid else "Invalid"
            log(
                f"\t[{reason}] error: {ri2.all.error:.4e}, "
                f"lambda: {lam_pre:.1e}, it_time: {it_time:.3f}s, "
                f"total_time: "
                f"{it_summary.cumulative_time_in_seconds:.3f}s"
            )
            new_outer = False
        finish_iteration(summary, it_summary)

    if term == 1:
        summary.termination_type = CONVERGENCE
        summary.message = (
            "Function tolerance reached. |cost_change|/cost <= "
            f"{options.function_tolerance}"
        )
    elif term == 2:
        summary.termination_type = NO_CONVERGENCE
        summary.message = (
            "Solver did not converge and reached maximum damping "
            f"lambda of {1.0 / options.min_trust_region_radius}"
        )
    else:
        summary.termination_type = NO_CONVERGENCE
        summary.message = (
            "Solver did not converge after maximum number of "
            f"{max_lm_iter} iterations"
        )


def _pre_reject_lambda(tr, k, options) -> float:
    """The lambda the trial was SOLVED with (the host loop logs it
    before the post-trial update): radius traces store the post-update
    value, so the solved-with lambda is the previous row's post-update
    value (or the initial lambda for the first trial)."""
    if k == 0:
        return 1.0 / options.initial_trust_region_radius
    return 1.0 / float(tr["radius"][k - 1])
