"""Structured pOSE kernels vs the dense reference math (ops/pose_math).

Runs the Pallas kernels in interpreter mode (CPU) on small problems and
checks every structured identity against explicit Jp/Jl assembly:
  ata/atr  == slot inputs of Hll / bl
  jpsq     == per-camera Jp column norms
  h (x) xh (.) ps == W = L^T Jl_s^T Jp_s
  hpp_b_structured == per-camera Jp_s^T Jp_s (up to the ps outer) and b
  e0 matvec == dense E0 matvec
  apply_ldiff == the dense model-cost decrease
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import pytest

from povar_tpu.ops import pallas_pose as pp
from povar_tpu.ops import pose_math

ALPHA = 0.01
O, N, M = 1024, 13, 64  # obs padded to the 512 quantum


@pytest.fixture(scope="module")
def prob():
    rng = np.random.default_rng(7)
    cam = rng.integers(0, N, O).astype(np.int32)
    lm = np.repeat(np.arange(M), O // M).astype(np.int32)
    cams = rng.standard_normal((N, 3, 4)).astype(np.float32)
    lms = rng.standard_normal((M, 3)).astype(np.float32)
    uv = rng.standard_normal((2, O)).astype(np.float32)
    mask = (rng.uniform(size=O) > 0.05).astype(np.float32)
    x = lms[lm].T.copy()  # [3, O]
    return cam, lm, cams, lms, uv, mask, x


def dense_parts(prob, weighted=True):
    """Reference quantities via ops/pose_math (f32)."""
    cam, lm, cams, lms, uv, mask, x = prob
    P = jnp.asarray(cams.transpose(1, 2, 0)[:, :, cam])
    r, Jp, Jl = pose_math.pose_jacobians_t(
        P, jnp.asarray(x), jnp.asarray(uv), ALPHA
    )
    keep = jnp.asarray(mask)[None] > 0
    r = jnp.where(keep, r, 0.0)
    Jp = jnp.where(keep[:, None], Jp, 0.0)
    Jl = jnp.where(keep[:, None], Jl, 0.0)
    if weighted:
        res_sq = jnp.sum(r * r, axis=0)
        _e, w = pose_math.robust_error_and_weight(res_sq, 0, 1.0)
    else:
        w = jnp.ones(O, jnp.float32)
    w = jnp.where(keep[0], w, 0.0)
    sw = jnp.sqrt(w)
    return (np.asarray(r), np.asarray(Jp), np.asarray(Jl),
            np.asarray(sw))


def test_prepare_matches_dense(prob):
    cam, lm, cams, lms, uv, mask, x = prob
    ct = jnp.asarray(cams.reshape(N, 12).T)
    rw, sw, ata, atr, jpsq = pp.prepare(
        jnp.asarray(cam), ct, jnp.asarray(x), jnp.asarray(uv),
        jnp.asarray(mask).reshape(1, O),
        alpha=ALPHA, robust=0, huber=1.0,
    )
    r, Jp, Jl, sw_ref = dense_parts(prob)
    np.testing.assert_allclose(np.asarray(sw)[0], sw_ref, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rw), r * sw_ref[None], rtol=1e-4, atol=1e-5
    )
    w = sw_ref**2
    ata_ref = np.einsum("kio,kjo->ijo", Jl, Jl) * w
    np.testing.assert_allclose(
        np.asarray(ata).reshape(3, 3, O), ata_ref, rtol=1e-3, atol=1e-4
    )
    atr_ref = np.einsum("kio,ko->io", Jl, r) * w
    np.testing.assert_allclose(
        np.asarray(atr), atr_ref, rtol=1e-3, atol=1e-4
    )
    jpsq_ref = np.zeros((12, N), np.float32)
    col = np.einsum("kjo,kjo->jo", Jp, Jp) * w
    np.add.at(jpsq_ref.T, cam, col.T)
    np.testing.assert_allclose(
        np.asarray(jpsq), jpsq_ref, rtol=1e-3, atol=1e-4
    )


def _scales(prob):
    """(jls [3,M], ps [12,N], Jl_s, Jp_s, r_w) the dense way."""
    cam, lm, cams, lms, uv, mask, x = prob
    r, Jp, Jl, sw = dense_parts(prob)
    r_w = r * sw[None]
    Jp_w = Jp * sw[None, None]
    Jl_w = Jl * sw[None, None]
    eps = float(np.sqrt(np.finfo(np.float32).eps))
    jl_sq = np.zeros((3, M), np.float32)
    np.add.at(jl_sq.T, lm, np.einsum("kio,kio->io", Jl_w, Jl_w).T)
    jls = 1.0 / (eps + np.sqrt(jl_sq))
    jp_sq = np.zeros((12, N), np.float32)
    np.add.at(jp_sq.T, cam, np.einsum("kjo,kjo->jo", Jp_w, Jp_w).T)
    ps = 1.0 / (eps + np.sqrt(jp_sq))
    Jl_s = Jl_w * jls[:, lm][None]
    Jp_s = Jp_w * ps[:, cam][None]
    return jls, ps, Jl_s, Jp_s, r_w


def _hll_inv_chol(prob, Jl_s):
    _c, lm, *_ = prob[0], prob[1]
    lm = prob[1]
    hll = np.zeros((M, 3, 3), np.float64)
    pr = np.einsum("kio,kjo->oij", Jl_s, Jl_s)
    np.add.at(hll, lm, pr)
    hll_inv = np.linalg.inv(hll + 1e-12 * np.eye(3))
    L = np.linalg.cholesky(hll_inv)
    return hll_inv.astype(np.float32), L.astype(np.float32)


def test_h_factor_matches_dense_W(prob):
    cam, lm, cams, lms, uv, mask, x = prob
    jls, ps, Jl_s, Jp_s, r_w = _scales(prob)
    hll_inv, L = _hll_inv_chol(prob, Jl_s)

    A = np.einsum("kio,kjo->ijo", Jl_s, Jp_s)  # [3, 12, O]
    W_ref = np.einsum("kim,kjo->ijo", np.zeros((1, 1, 1)), A[:0])  # dummy
    Lg = L[lm].transpose(1, 2, 0)  # [3, 3c, O]
    W_ref = np.einsum("kco,kjo->cjo", Lg, A)

    _r, _jp, _jl, sw = dense_parts(prob)
    w = (sw**2).reshape(1, O)
    ct = jnp.asarray(cams.reshape(N, 12).T)
    h = pp.e0_factor(
        jnp.asarray(cam), ct, jnp.asarray(uv), jnp.asarray(w),
        jnp.asarray(jls[:, lm]),
        jnp.asarray(L.reshape(M, 9).T[:, lm]),
        alpha=ALPHA,
    )
    # W[c, 4a+j, o] = h[c*3+a, o] * xh[j, o] * ps[4a+j, cam(o)]
    xh = np.concatenate([x, np.ones((1, O), np.float32)], 0)
    h_np = np.asarray(h).reshape(3, 3, O)
    W_h = (
        h_np[:, :, None, :] * xh[None, None, :, :]
    ).reshape(3, 12, O) * ps[:, cam][None]
    np.testing.assert_allclose(W_h, W_ref, rtol=2e-3, atol=2e-4)


def test_hpp_b_structured_matches_dense(prob):
    cam, lm, cams, lms, uv, mask, x = prob
    jls, ps, Jl_s, Jp_s, r_w = _scales(prob)
    hll_inv, L = _hll_inv_chol(prob, Jl_s)
    bl = np.zeros((M, 3), np.float32)
    np.add.at(bl, lm, np.einsum("kio,ko->oi", Jl_s, r_w))
    hib = np.einsum("mij,mj->mi", hll_inv, bl)  # [M, 3]
    r_t = r_w - np.einsum("ijo,jo->io", Jl_s, hib.T[:, lm])

    b_ref = np.zeros((N, 12), np.float32)
    np.add.at(b_ref, cam, np.einsum("kjo,ko->oj", Jp_s, r_t))
    hpp_ref = np.zeros((N, 12, 12), np.float32)
    np.add.at(hpp_ref, cam, np.einsum("kio,kjo->oij", Jp_s, Jp_s))

    _r, _jp, _jl, sw = dense_parts(prob)
    ct = jnp.asarray(cams.reshape(N, 12).T)
    hpp_raw, b_raw = pp.hpp_b_structured(
        jnp.asarray(cam), ct, jnp.asarray(x), jnp.asarray(uv),
        jnp.asarray(sw).reshape(1, O), jnp.asarray(r_w),
        jnp.asarray(jls[:, lm]), jnp.asarray(hib.T[:, lm]),
        N, alpha=ALPHA,
    )
    hpp = np.asarray(hpp_raw).reshape(12, 12, N) * (
        ps[:, None, :] * ps[None, :, :]
    )
    b = np.asarray(b_raw) * ps
    np.testing.assert_allclose(
        b, b_ref.T, rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        hpp, hpp_ref.transpose(1, 2, 0), rtol=2e-3, atol=1e-4
    )


def test_e0_matvec_matches_dense(prob):
    cam, lm, cams, lms, uv, mask, x = prob
    jls, ps, Jl_s, Jp_s, r_w = _scales(prob)
    hll_inv, L = _hll_inv_chol(prob, Jl_s)
    _r, _jp, _jl, sw = dense_parts(prob)
    w = (sw**2).reshape(1, O)
    ct = jnp.asarray(cams.reshape(N, 12).T)
    h = pp.e0_factor(
        jnp.asarray(cam), ct, jnp.asarray(uv), jnp.asarray(w),
        jnp.asarray(jls[:, lm]),
        jnp.asarray(L.reshape(M, 9).T[:, lm]),
        alpha=ALPHA,
    )
    rng = np.random.default_rng(3)
    xv = rng.standard_normal((12, N)).astype(np.float32)

    # dense E0 xv
    A = np.einsum("kio,kjo->ijo", Jl_s, Jp_s)
    Lg = L[lm].transpose(1, 2, 0)
    W = np.einsum("kco,kjo->cjo", Lg, A)
    xc = xv[:, cam]
    u_ref = np.einsum("cjo,jo->co", W, xc)
    s = np.zeros((M, 3), np.float32)
    np.add.at(s, lm, u_ref.T)
    v = np.einsum("cjo,co->jo", W, s.T[:, lm])
    e0_ref = np.zeros((N, 12), np.float32)
    np.add.at(e0_ref, cam, v.T)

    zt = jnp.asarray(ps * xv)
    u = pp.e0_u_structured(jnp.asarray(cam), jnp.asarray(x), h, zt)
    np.testing.assert_allclose(
        np.asarray(u), u_ref, rtol=2e-3, atol=2e-4
    )
    s2 = np.zeros((M, 3), np.float32)
    np.add.at(s2, lm, np.asarray(u).T)
    out_raw = pp.e0_scatter_structured(
        jnp.asarray(cam), jnp.asarray(x), h, jnp.asarray(s2.T[:, lm]), N
    )
    out = np.asarray(out_raw) * ps
    np.testing.assert_allclose(out, e0_ref.T, rtol=2e-3, atol=2e-4)


def test_apply_ldiff_matches_dense(prob):
    cam, lm, cams, lms, uv, mask, x = prob
    jls, ps, Jl_s, Jp_s, r_w = _scales(prob)
    _r, _jp, _jl, sw = dense_parts(prob)
    rng = np.random.default_rng(5)
    inc = rng.standard_normal((12, N)).astype(np.float32)
    inc_lm = rng.standard_normal((3, M)).astype(np.float32)
    new_cams = cams + (inc * ps).T.reshape(N, 3, 4)

    # dense: fresh unscaled Jp at new cams, stored scaled Jl
    P_new = jnp.asarray(new_cams.transpose(1, 2, 0)[:, :, cam])
    _rn, Jp_new, _jl = pose_math.pose_jacobians_t(
        P_new, jnp.asarray(x), jnp.asarray(uv), ALPHA
    )
    keep = jnp.asarray(mask)[None] > 0
    Jp_new = np.asarray(jnp.where(keep[:, None], Jp_new, 0.0))
    j_inc = np.einsum("kjo,jo->ko", Jp_new, inc[:, cam]) + np.einsum(
        "kio,io->ko", Jl_s, inc_lm[:, lm]
    )
    ld_ref = -np.sum(j_inc * (0.5 * j_inc + r_w))

    ct_old = jnp.asarray(cams.reshape(N, 12).T)
    part = pp.apply_ldiff(
        jnp.asarray(cam), jnp.asarray(x), jnp.asarray(uv),
        jnp.asarray(sw).reshape(1, O), jnp.asarray(r_w),
        jnp.asarray(jls[:, lm]), jnp.asarray(inc_lm[:, lm]),
        ct_old, jnp.asarray(inc), alpha=ALPHA,
    )
    ld = -float(np.asarray(part).sum())
    np.testing.assert_allclose(ld, ld_ref, rtol=5e-4)


def test_stage1_structured_solver_equivalence():
    """Full structured path ('on', interpreter) vs the XLA mixed-f32
    lowering ('off'), both anchored to a pure-f64 run: the structured
    kernels must not deviate from f64 materially more than the existing
    validated f32 path does (PCG with eta=0 drifts ~equally for both on
    this deliberately ill-conditioned random problem).

    apply/apply_poba are evaluated at the SAME increment (the f64
    solve's, downcast) in every mode: the back-substitution re-solves
    the landmarks at the updated cameras, which on this problem
    amplifies *any* f32 increment's rounding direction ~50x, so chaining
    each mode's own solve into apply would compare direction-dependent
    amplified noise, not kernel accuracy (at a matched increment both
    f32 paths sit ~4.6% from f64, within 3% of each other)."""
    from povar_tpu.options import SolverOptions
    from povar_tpu.problem.synthetic import synthetic_bal_problem
    from povar_tpu.solver.stage1 import Stage1Solver

    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=4, seed=0
    )
    out = {}
    inc_common = inc2_common = None
    for mode, mixed in [("f64", False), ("off", True), ("on", True)]:
        opts = SolverOptions()
        opts.power_sc_iterations = 5
        opts.eta = 0.0
        opts.r_tolerance = -1.0
        opts.pallas_kernels = "on" if mode == "on" else "off"
        opts.mixed_precision_solves = mixed
        s = Stage1Solver(
            problem.obs_cam, problem.obs_lm, problem.obs_uv,
            problem.num_cameras, problem.num_landmarks, opts,
        )
        assert s.use_pallas == (mode == "on")
        cams = jnp.asarray(problem.cam_space)
        lms = s.initialize_varproj(cams)
        lam = jnp.asarray(1e-4, lms.dtype)
        lin = s.linearize(cams, lms)
        inc, _ = s.solve_power(lin, lam)
        incp, _ = s.solve_pcg(lin, lam)
        inc2, _ = s.solve_power(lin, lam, landmark_damping=True)
        if mode == "f64":
            inc_common, inc2_common = inc, inc2
        nc, nl, ld = s.apply(
            cams, lms, lin, inc_common.astype(lms.dtype)
        )
        nc2, nl2, ld2 = s.apply_poba(
            cams, lms, lin, inc2_common.astype(lms.dtype), lam
        )
        err = s.compute_error(nc, nl)
        out[mode] = [
            np.asarray(v)
            for v in (lms, inc, nc, nl, ld, incp, inc2, nc2, nl2, ld2)
        ] + [np.asarray(float(err["error_all"]))]
    names = [
        "lms0", "inc", "new_cam", "new_lm", "l_diff", "pcg_inc",
        "poba_inc", "poba_cam", "poba_lm", "poba_ldiff", "err",
    ]
    for i, name in enumerate(names):
        f = out["f64"][i]
        denom = np.abs(f).max() + 1e-30
        r_off = np.abs(out["off"][i] - f).max() / denom
        r_on = np.abs(out["on"][i] - f).max() / denom
        assert r_on < max(3.0 * r_off, 1e-5), (name, r_on, r_off)


def test_compute_error_df32_matches_f64():
    """The double-float cost evaluation must agree with the f64 path to
    ~f64 precision (the LM accept/reject decisions hang on it)."""
    from povar_tpu.options import SolverOptions
    from povar_tpu.problem.synthetic import synthetic_bal_problem
    from povar_tpu.solver.stage1 import Stage1Solver

    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=4, seed=0
    )
    vals = {}
    for mode in ["off", "on"]:
        opts = SolverOptions()
        opts.pallas_kernels = mode
        s = Stage1Solver(
            problem.obs_cam, problem.obs_lm, problem.obs_uv,
            problem.num_cameras, problem.num_landmarks, opts,
        )
        cams = jnp.asarray(problem.cam_space)
        lms = s.initialize_varproj(cams)
        e = s.compute_error(cams, lms)
        vals[mode] = {k: np.asarray(v) for k, v in e.items()}
    a, b = vals["off"], vals["on"]
    np.testing.assert_allclose(
        float(b["error_all"]), float(a["error_all"]), rtol=1e-13
    )
    # residual_sum takes a single-f32 sqrt per observation (display
    # only); the double-float accumulation keeps the sum at ~1e-9 rel
    np.testing.assert_allclose(
        float(b["residual_sum_all"]), float(a["residual_sum_all"]),
        rtol=1e-7,
    )
    assert int(b["num_obs_all"]) == int(a["num_obs_all"])
    assert bool(b["is_numerically_valid"])


def test_stage1_lm_trajectory_structured_matches_f64_decisions():
    """Six LM iterations on the structured path: every accept/reject
    decision and the cost sequence must track the XLA path (costs to
    the mixed-precision tolerance)."""
    from povar_tpu.options import SolverOptions
    from povar_tpu.problem.synthetic import synthetic_bal_problem
    from povar_tpu.solver.lm import optimize_step1
    from povar_tpu.solver.stage1 import Stage1Solver
    from povar_tpu.utils.summary import SolverSummary
    from povar_tpu.utils.timer import Timer

    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=5, seed=7
    )
    traj = {}
    for mode in ["off", "on"]:
        opts = SolverOptions()
        opts.max_num_iterations_step_1 = 6
        opts.pallas_kernels = mode
        s = Stage1Solver(
            problem.obs_cam, problem.obs_lm, problem.obs_uv,
            problem.num_cameras, problem.num_landmarks, opts,
        )
        cams = jnp.asarray(problem.cam_space)
        lms = s.initialize_varproj(cams)
        summary = SolverSummary()
        optimize_step1(
            s, cams, lms, opts, summary, Timer(), log=lambda s_: None
        )
        traj[mode] = [
            (it.step_is_successful, it.cost.all.error)
            for it in summary.iterations
        ]
    assert len(traj["off"]) == len(traj["on"])
    for (ok_a, c_a), (ok_b, c_b) in zip(traj["off"], traj["on"]):
        assert ok_a == ok_b
        np.testing.assert_allclose(c_b, c_a, rtol=1e-3)
