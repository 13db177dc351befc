"""Whole-solve-on-device LM driver (solver/device_loop.py): the single
lax.while_loop executable must walk the HOST loop's trajectory in pure
f64 — identical decisions and inner-iteration counts at every
iteration, costs/radii equal to ~1 ulp (XLA fuses the trial graphs
differently inside the while-loop body than as standalone executables,
and LLVM's FMA contraction of fused regions is context-dependent —
measured <= 2 ulp per iteration), and the same log-line content."""

import jax.numpy as jnp
import numpy as np
import pytest

from povar_tpu.options import (
    SolverOptions,
    SolverType,
    SolverTypeRiemannian,
)
from povar_tpu.problem.synthetic import synthetic_bal_problem
from povar_tpu.solver.lm import optimize_step1, optimize_step2
from povar_tpu.solver.stage1 import Stage1Solver
from povar_tpu.solver.stage2 import Stage2Solver, create_homogeneous
from povar_tpu.utils.summary import SolverSummary
from povar_tpu.utils.timer import Timer


def _problem(seed=7, noise=0.01):
    p, _ = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=5, seed=seed, noise=noise
    )
    return p


def _opts(device, **kw):
    opts = SolverOptions()
    opts.mixed_precision_solves = False  # bit-exactness tier
    opts.device_lm_loop = device
    for k, v in kw.items():
        setattr(opts, k, v)
    return opts


def _run1(p, opts, logs=None):
    s = Stage1Solver(
        p.obs_cam, p.obs_lm, p.obs_uv, p.num_cameras, p.num_landmarks,
        opts,
    )
    summ = SolverSummary()
    log = logs.append if logs is not None else (lambda s_: None)
    cams, lms = optimize_step1(
        s, jnp.asarray(p.cam_space), jnp.asarray(p.lm_p), opts, summ,
        Timer(), log=log,
    )
    return summ, np.asarray(cams), np.asarray(lms)


def _run2(p, cams_h, lms_h, opts, logs=None):
    s = Stage2Solver(
        p.obs_cam, p.obs_lm, p.obs_uv, p.num_cameras, p.num_landmarks,
        opts,
    )
    summ = SolverSummary()
    log = logs.append if logs is not None else (lambda s_: None)
    optimize_step2(s, cams_h, lms_h, opts, summ, Timer(), log=log)
    return summ


def _assert_trajectory_identical(a, b, rel=1e-6):
    # Decisions and inner-iteration counts must be EXACT at every
    # iteration. Float values are asserted only on ACCEPTED iterations
    # (state-anchored): the two drivers' graphs fuse differently, so
    # the ~1-ulp rounding differences get amplified through rejected
    # WILD trial steps (a rejected state is discarded, so its cost is
    # chaos-amplified and carries no invariant).
    assert len(a.iterations) == len(b.iterations), (
        len(a.iterations), len(b.iterations),
    )
    for ia, ib in zip(a.iterations, b.iterations):
        k = ia.iteration
        assert ia.step_is_successful == ib.step_is_successful, k
        assert ia.step_is_valid == ib.step_is_valid, k
        assert ia.linear_solver_iterations == (
            ib.linear_solver_iterations
        ), k
        assert (ia.cost is None) == (ib.cost is None), k
        if ia.cost is not None:
            assert ia.cost.all.num_obs == ib.cost.all.num_obs, k
        if not ia.step_is_successful:
            continue
        assert ia.cost.all.error == pytest.approx(
            ib.cost.all.error, rel=rel
        ), k
        assert ia.cost.valid.error == pytest.approx(
            ib.cost.valid.error, rel=rel
        ), k
        assert ia.trust_region_radius == pytest.approx(
            ib.trust_region_radius, rel=rel
        ), k
        assert ia.relative_decrease == pytest.approx(
            ib.relative_decrease, rel=rel, abs=1e-15
        ), k
    assert a.termination_type == b.termination_type
    assert a.num_successful_steps == b.num_successful_steps
    assert a.num_unsuccessful_steps == b.num_unsuccessful_steps


@pytest.mark.quick
@pytest.mark.parametrize(
    "st",
    [
        SolverType.POWER_VARPROJ,
        SolverType.POWER_SCHUR_COMPLEMENT,
        SolverType.PCG,
    ],
)
def test_step1_device_loop_matches_host(st):
    p = _problem()
    runs = {}
    for mode in ("off", "on"):
        opts = _opts(
            mode, solver_type_step_1=st, max_num_iterations_step_1=15
        )
        runs[mode] = _run1(p, opts)
    _assert_trajectory_identical(runs["off"][0], runs["on"][0])
    np.testing.assert_allclose(
        runs["off"][1], runs["on"][1], rtol=1e-7, atol=1e-10
    )
    np.testing.assert_allclose(
        runs["off"][2], runs["on"][2], rtol=1e-7, atol=1e-8
    )
    # the trajectory must exercise real dynamics
    accepts = [
        it.step_is_successful for it in runs["on"][0].iterations[1:]
    ]
    assert sum(accepts) >= 5


@pytest.mark.quick
@pytest.mark.parametrize(
    "st", [SolverTypeRiemannian.RIPOBA, SolverTypeRiemannian.RIPCG]
)
def test_step2_device_loop_matches_host(st):
    p = _problem(seed=9)
    opts1 = _opts("off", max_num_iterations_step_1=8)
    _, cams, lms = _run1(p, opts1)
    cams_h, lms_h = create_homogeneous(
        jnp.asarray(cams), jnp.asarray(lms)
    )
    runs = {}
    for mode in ("off", "on"):
        opts = _opts(
            mode, solver_type_step_2=st, max_num_iterations_step_2=12
        )
        runs[mode] = _run2(p, cams_h, lms_h, opts)
    _assert_trajectory_identical(runs["off"], runs["on"])


@pytest.mark.quick
def test_device_loop_ftol_termination_matches():
    """Function-tolerance termination fires at the same iteration in
    both drivers. A loose ftol makes the crossing decisive (relative
    decreases drop orders of magnitude per iteration there); at the
    default 1e-6 on noise-free data the stopping test compares pure
    rounding noise, which is not driver-stable by design."""
    p = _problem(seed=3, noise=0.01)
    runs = {}
    for mode in ("off", "on"):
        opts = _opts(mode, max_num_iterations_step_1=60)
        opts.function_tolerance = 1e-2
        runs[mode] = _run1(p, opts)
    a, b = runs["off"][0], runs["on"][0]
    _assert_trajectory_identical(a, b)
    assert a.termination_type == "CONVERGENCE"


def test_device_loop_log_replay_matches():
    """The replayed log lines must carry the same content as the live
    host-loop lines (up to per-iteration wall times, which a single
    executable cannot measure)."""
    p = _problem(seed=5)

    def strip(lines):
        out = []
        for ln in lines:
            out.append(ln.split(", it_time:")[0])
        return out

    logs = {}
    for mode in ("off", "on"):
        opts = _opts(mode, max_num_iterations_step_1=10)
        lines = []
        _run1(p, opts, logs=lines)
        logs[mode] = strip(lines)
    assert logs["off"] == logs["on"]


def test_device_loop_mixed_precision_converges():
    """Production mode (mixed precision): the device loop's f32
    fusion context may round differently from the host loop's
    standalone executables, so exact trajectory identity is not
    guaranteed — but convergence quality must match."""
    p = _problem(seed=11)
    finals = {}
    for mode in ("off", "on"):
        opts = SolverOptions()
        opts.device_lm_loop = mode
        opts.max_num_iterations_step_1 = 15
        finals[mode] = _run1(p, opts)[0].final_cost.all.error
    assert finals["on"] == pytest.approx(finals["off"], rel=5e-3)
