"""Stage-2 structured kernels (ops/pallas_pose2.py).

Equivalence strategy: the structured path accumulates per-camera sums
in the UNPROJECTED 12-dof frame and folds the tangent lifts (Kps)
afterwards, while the XLA path projects per observation before
summing. The two differ by f32 summation order amplified through the
fold, so raw operator entries are compared against the same-solver XLA
reference at fold precision (~1e-2 of the max entry on ill-conditioned
random states), while the per-observation kernel outputs (prepare2)
are tight. End-to-end, both paths must converge the full two-step
pipeline equivalently (the LM loop's f64 accept/reject gate absorbs
inner-solve perturbations — the same argument as
mixed_precision_solves)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from povar_tpu.options import SolverOptions
from povar_tpu.problem.synthetic import synthetic_bal_problem
from povar_tpu.solver.stage1 import Stage1Solver, _mask_rows
from povar_tpu.solver.stage2 import Lin2S, Stage2Solver, create_homogeneous


def _stage2_solver(mode, seed=0, **opt_kw):
    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=4, seed=seed
    )
    opts = SolverOptions()
    s1 = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    cams = jnp.asarray(problem.cam_space)
    lms = s1.initialize_varproj(cams)
    cams_h, lms_h = create_homogeneous(cams, lms)
    o = SolverOptions()
    o.pallas_kernels = mode
    for k, v in opt_kw.items():
        setattr(o, k, v)
    s = Stage2Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, o,
    )
    return s, cams_h, lms_h


@pytest.mark.slow
def test_prepare2_matches_xla_reference():
    """Per-observation outputs of the fused linearization pass agree
    with the dense pose_math forms on the same solver state."""
    from povar_tpu.ops import pose_math

    s, cams_h, lms_h = _stage2_solver("on")
    lin = s.linearize(cams_h, lms_h)
    assert isinstance(lin, Lin2S)
    f32 = jnp.float32
    obs = s.obs
    P = s._gather_cams(obs, cams_h.astype(f32))
    xh = s._gather_lm_x(obs, lms_h.astype(f32).T)
    r, Jp, Jl, _valid = pose_math.homogeneous_jacobians_t(
        P, xh, obs.uv.astype(f32)
    )
    r = _mask_rows(obs, r)
    Jp = _mask_rows(obs, Jp)
    live = (
        np.asarray(obs.weight) > 0
        if obs.weight is not None
        else np.ones(np.asarray(obs.cam).shape, bool)
    )
    # residuals (robust NONE: r_w == r on live rows)
    np.testing.assert_allclose(
        np.asarray(lin.r_w)[:, live], np.asarray(r)[:, live],
        rtol=0, atol=2e-6 * float(jnp.abs(r).max()),
    )
    # projection cache mx = r0 + u
    mx_ref = np.asarray(r[0] + obs.uv.astype(f32)[0])
    np.testing.assert_allclose(
        np.asarray(lin.mm)[0][live], mx_ref[live],
        rtol=0, atol=2e-6 * max(abs(mx_ref[live]).max(), 1.0),
    )
    # per-camera Jp column norms -> pose_scale
    jp_sq_ref = np.zeros((12, s.n_cams), np.float32)
    contrib = np.asarray(jnp.sum(Jp * Jp, axis=0))
    np.add.at(jp_sq_ref.T, np.asarray(obs.cam), contrib.T)
    ps_ref = 1.0 / (s.jacobi_eps + np.sqrt(jp_sq_ref))
    np.testing.assert_allclose(
        np.asarray(lin.pose_scale), ps_ref, rtol=1e-4
    )


@pytest.mark.slow
def test_stage2_operators_match_at_fold_precision():
    """hpp11/b11/E0 from the structured kernels track the XLA path's
    values to the fold precision (see module docstring)."""
    out = {}
    for mode in ["off", "on"]:
        s, cams_h, lms_h = _stage2_solver(mode)
        lin = s.linearize(cams_h, lms_h)
        lam = jnp.asarray(1e-3, s.dtype)
        pieces = jax.jit(s._prep_hll)(s.obs, lin, lam)
        b, hpp, W = jax.jit(s._pcg_prep)(s.obs, lin, pieces)
        v = jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (11, s.n_cams)
            ),
            jnp.float32,
        )
        if mode == "on":
            ev = jax.jit(
                lambda v: s._e0_apply_s(s.obs, lin, pieces[2])(v)
            )(v)
        else:
            ev = jax.jit(
                lambda v: s._e0_w_matvec(v, s.obs, W)
            )(v)
        out[mode] = (np.asarray(b), np.asarray(hpp), np.asarray(ev))
    for name, a, b in zip(
        ["b11", "hpp11", "e0"], out["off"], out["on"]
    ):
        d = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert d < 2e-2, (name, d)


@pytest.mark.slow
def test_stage2_structured_lm_trajectory_matches_xla():
    """LM decision-trajectory parity: from one shared stage-2 state,
    the structured kernels must drive the SAME accept/reject sequence
    as the XLA lowering, with per-iteration costs agreeing to 1e-6 of
    the initial cost and final costs to 1e-6 relative. (The state is
    a consistent geometry near its optimum — random states make the
    projective division chaotic, where ANY f32 reordering diverges
    trajectories; that regime is exercised by the convergence checks
    in test_golden.)"""
    from povar_tpu.problem.synthetic import _ring_cameras
    from povar_tpu.solver.lm import optimize_step2
    from povar_tpu.utils.summary import SolverSummary
    from povar_tpu.utils.timer import Timer

    rng = np.random.default_rng(2)
    n_cams, n_lms = 12, 80
    gt_cams = _ring_cameras(n_cams, radius=10.0, rng=rng)
    pts = rng.standard_normal((n_lms, 3)) * 2.0
    obs_cam = np.concatenate(
        [rng.choice(n_cams, 4, replace=False) for _ in range(n_lms)]
    ).astype(np.int32)
    obs_lm = np.repeat(np.arange(n_lms, dtype=np.int32), 4)
    xh = np.concatenate([pts, np.ones((n_lms, 1))], axis=1)
    p = np.einsum("oij,oj->oi", gt_cams[obs_cam], xh[obs_lm])
    # measurement noise keeps the optimum cost well above the f64
    # floor, so relative cost comparisons are meaningful
    obs_uv = p[:, :2] / p[:, 2:3] + 1e-3 * rng.standard_normal(
        (len(obs_cam), 2)
    )
    cam0 = gt_cams + 1e-2 * rng.standard_normal(gt_cams.shape)
    lm0 = pts + 1e-2 * rng.standard_normal(pts.shape)
    cams_h, lms_h = create_homogeneous(
        jnp.asarray(cam0), jnp.asarray(lm0)
    )

    trajs = {}
    for mode in ["off", "on"]:
        o = SolverOptions()
        o.pallas_kernels = mode
        o.max_num_iterations_step_2 = 8
        s = Stage2Solver(
            obs_cam, obs_lm, obs_uv, n_cams, n_lms, o
        )
        summary = SolverSummary()
        optimize_step2(
            s, cams_h, lms_h, o, summary, Timer(), log=lambda x: None
        )
        trajs[mode] = [
            (
                it.step_is_successful,
                it.cost.all.error if it.cost is not None else None,
            )
            for it in summary.iterations
        ]
    ta, tb = trajs["on"], trajs["off"]
    assert len(ta) == len(tb)
    c_init = tb[0][1]
    for (ok_a, c_a), (ok_b, c_b) in zip(ta, tb):
        assert ok_a == ok_b, (ta, tb)
        if c_a is not None and c_b is not None:
            assert abs(c_a - c_b) <= max(
                1e-6 * c_init, 1e-6 * abs(c_b)
            ), (ta, tb)
    # final costs to 1e-6 relative
    fa = [c for _ok, c in ta if c is not None][-1]
    fb = [c for _ok, c in tb if c is not None][-1]
    assert abs(fa - fb) <= 1e-6 * abs(fb), (fa, fb)


@pytest.mark.slow
def test_error2_df32_matches_f64():
    """The double-float homogeneous cost (incl. df division) must agree
    with the f64 path to ~f64 precision; the valid bucket and counts
    must match exactly."""
    vals = {}
    for mode in ["off", "on"]:
        s, cams_h, lms_h = _stage2_solver(mode)
        e = s.compute_error(cams_h, lms_h)
        vals[mode] = {k: np.asarray(v) for k, v in e.items()}
    a, b = vals["off"], vals["on"]
    np.testing.assert_allclose(
        float(b["error_all"]), float(a["error_all"]), rtol=1e-13
    )
    np.testing.assert_allclose(
        float(b["error_valid"]), float(a["error_valid"]), rtol=1e-13
    )
    np.testing.assert_allclose(
        float(b["residual_sum_all"]), float(a["residual_sum_all"]),
        rtol=1e-7,
    )
    assert int(b["num_obs_valid"]) == int(a["num_obs_valid"])
    assert int(b["num_obs_all"]) == int(a["num_obs_all"])
    assert bool(b["is_numerically_valid"])
