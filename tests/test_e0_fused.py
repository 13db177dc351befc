"""Fused single-kernel power-series E0 term (pallas_pose.e0_term_parts).

The fused kernel computes gather + per-landmark slot reduce + re-expand
+ scatter of one E0 power term in a single pass; it must produce the
same per-camera sums (up to f32 summation-order noise) and the same
power-series solves as the composed three-step pipeline
(e0_u_structured -> _seg_lm_reexpand -> e0_scatter_structured), on both
narrow-part-only layouts and layouts with a wide-part suffix falling
back to the composed kernels (stage1._e0_suffix_apply).

Reference semantics being reproduced: right_mul_e0
(sc/linearization_power_varproj.hpp:364-453).
"""

import numpy as np
import jax.numpy as jnp

from povar_tpu.options import SolverOptions
from povar_tpu.problem.synthetic import synthetic_bal_problem_fast
from povar_tpu.solver.stage1 import Stage1Solver


def _build(p, fused, obs=None):
    o = SolverOptions()
    o.pallas_kernels = "on"  # interpreter mode on CPU
    o.fused_power_term = fused
    o.power_sc_iterations = 4
    o.eta = 0.0
    o.r_tolerance = -1.0
    oc, ol, uv = obs if obs is not None else (
        p.obs_cam, p.obs_lm, p.obs_uv
    )
    return Stage1Solver(
        oc, ol, uv, p.num_cameras, p.num_landmarks, o
    )


def _compare_solvers(p, s0, s1):
    cams = jnp.asarray(p.cam_space)
    lms = s0.initialize_varproj(cams)
    lam = jnp.asarray(1e-4, lms.dtype)
    lin0 = s0.linearize(cams, lms)
    lin1 = s1.linearize(cams, lms)

    # the E0 operator itself
    e0_0 = s0._e0_apply_s  # noqa: SLF001 - white-box equivalence test
    rng = np.random.default_rng(0)
    v = jnp.asarray(
        rng.standard_normal((12, p.num_cameras)), jnp.float32
    )
    h0 = s0._h_factor_s(
        s0.obs, lin0, *_hll_pieces(s0, lin0, lam)
    )
    h1 = s1._h_factor_s(
        s1.obs, lin1, *_hll_pieces(s1, lin1, lam)
    )
    y0 = e0_0(s0.obs, lin0, h0)(v)
    y1 = s1._e0_apply_s(s1.obs, lin1, h1)(v)
    scale = float(jnp.max(jnp.abs(y0))) + 1e-30
    assert float(jnp.max(jnp.abs(y0 - y1))) / scale < 1e-5

    # the full power solve
    i0, n0 = s0.solve_power(lin0, lam)
    i1, n1 = s1.solve_power(lin1, lam)
    assert int(n0) == int(n1)
    rel = float(
        jnp.max(jnp.abs(i0 - i1)) / (jnp.max(jnp.abs(i0)) + 1e-30)
    )
    assert rel < 1e-5, rel


def _hll_pieces(s, lin, lam):
    pieces = s._hll_pieces_s(s.obs, lin, lam.astype(jnp.float32), False)
    _hll_inv, _hib, jls_obs, lh_obs = pieces
    return jls_obs, lh_obs


def test_fused_term_matches_composed_narrow():
    """All real parts narrow (w <= E0_TERM_MAX_W): the fused kernel
    covers every live observation; the pad tail is statically dead."""
    p = synthetic_bal_problem_fast(23, 400, 4, seed=1)
    s1 = _build(p, True)
    s0 = _build(p, False)
    assert s1._e0_meta is not None
    assert s1._e0_suffix is None  # the pad tail carries zero weight
    assert s0._e0_meta is None
    _compare_solvers(p, s0, s1)


def _build2(p, fused, obs=None):
    from povar_tpu.solver.stage2 import Stage2Solver

    o = SolverOptions()
    o.pallas_kernels = "on"
    o.fused_power_term = fused
    o.power_sc_iterations = 4
    o.eta = 0.0
    o.r_tolerance = -1.0
    oc, ol, uv = obs if obs is not None else (
        p.obs_cam, p.obs_lm, p.obs_uv
    )
    return Stage2Solver(
        oc, ol, uv, p.num_cameras, p.num_landmarks, o
    )


def _compare_solvers2(p, s0, s1):
    from povar_tpu.solver.stage2 import create_homogeneous

    cams, lmh = create_homogeneous(
        jnp.asarray(p.cam_space), jnp.asarray(p.lm_p)
    )
    lam = jnp.asarray(1e-4, jnp.float64)
    lin0 = s0.linearize(cams, lmh)
    lin1 = s1.linearize(cams, lmh)
    i0, n0 = s0.solve_power(lin0, lam)
    i1, n1 = s1.solve_power(lin1, lam)
    assert int(n0) == int(n1)
    rel = float(
        jnp.max(jnp.abs(i0 - i1)) / (jnp.max(jnp.abs(i0)) + 1e-30)
    )
    assert rel < 1e-5, rel


def test_fused_term2_matches_composed_narrow():
    """Stage-2 fused term (pallas_pose2.e0_term2_parts) on an
    all-narrow layout."""
    p = synthetic_bal_problem_fast(23, 400, 4, seed=1)
    s1 = _build2(p, True)
    s0 = _build2(p, False)
    assert s1._e0_meta is not None
    assert s1._e0_suffix is None
    _compare_solvers2(p, s0, s1)


def test_fused_term2_matches_composed_wide_suffix():
    """Stage-2 hybrid: a wide landmark routes through the composed
    suffix (stage2._e0_suffix_apply2)."""
    from povar_tpu.ops.pallas_pose import E0_TERM_MAX_W

    p = synthetic_bal_problem_fast(23, 300, 4, seed=2)
    rng = np.random.default_rng(3)
    extra = 2 * E0_TERM_MAX_W + 5
    oc = np.concatenate(
        [np.asarray(p.obs_cam), rng.integers(0, 23, extra)]
    )
    ol = np.concatenate(
        [np.asarray(p.obs_lm), np.zeros(extra, np.int64)]
    )
    uv = np.concatenate(
        [np.asarray(p.obs_uv), rng.standard_normal((extra, 2)) * 0.3]
    )
    s1 = _build2(p, True, obs=(oc, ol, uv))
    s0 = _build2(p, False, obs=(oc, ol, uv))
    assert s1._e0_meta is not None
    assert s1._e0_suffix is not None
    _compare_solvers2(p, s0, s1)


def test_fused_term_matches_composed_wide_suffix():
    """A landmark with more observations than the unroll cap routes
    through the composed-kernel suffix; sums must still agree."""
    from povar_tpu.ops.pallas_pose import E0_TERM_MAX_W

    p = synthetic_bal_problem_fast(23, 300, 4, seed=2)
    rng = np.random.default_rng(3)
    extra = 2 * E0_TERM_MAX_W + 5  # width 64 part (> cap)
    oc = np.concatenate(
        [np.asarray(p.obs_cam), rng.integers(0, 23, extra)]
    )
    ol = np.concatenate(
        [np.asarray(p.obs_lm), np.zeros(extra, np.int64)]
    )
    uv = np.concatenate(
        [np.asarray(p.obs_uv), rng.standard_normal((extra, 2)) * 0.3]
    )
    s1 = _build(p, True, obs=(oc, ol, uv))
    s0 = _build(p, False, obs=(oc, ol, uv))
    assert s1._e0_meta is not None
    assert s1._e0_suffix is not None
    widths = [w for _, w in s1.lm_shapes]
    assert max(widths) > E0_TERM_MAX_W
    _compare_solvers(p, s0, s1)


def test_fused_plan_declined_when_suffix_dominates():
    """If the wide-part suffix carries >= 50% of the live work, the
    fused path is disabled entirely (_e0_meta is None) and the composed
    path still computes the same solve (advisor r3: pin the planning
    cutoff)."""
    from povar_tpu.ops.pallas_pose import E0_TERM_MAX_W

    p = synthetic_bal_problem_fast(23, 50, 4, seed=4)  # 200 narrow obs
    rng = np.random.default_rng(5)
    extra = 300  # one wide landmark dominating the live work
    oc = np.concatenate(
        [np.asarray(p.obs_cam), rng.integers(0, 23, extra)]
    )
    ol = np.concatenate(
        [np.asarray(p.obs_lm), np.zeros(extra, np.int64)]
    )
    uv = np.concatenate(
        [np.asarray(p.obs_uv), rng.standard_normal((extra, 2)) * 0.3]
    )
    s1 = _build(p, True, obs=(oc, ol, uv))
    s0 = _build(p, False, obs=(oc, ol, uv))
    assert max(w for _, w in s1.lm_shapes) > E0_TERM_MAX_W
    assert s1._e0_meta is None  # heuristic declined the fused plan
    _compare_solvers(p, s0, s1)


def test_fused_plan_degenerate_all_dead():
    """An all-dead layout (every observation weight zero) keeps the
    composed path instead of planning kernels that compute only zeros
    (advisor r3)."""
    import jax.numpy as jnp

    p = synthetic_bal_problem_fast(8, 60, 4, seed=5)
    s = _build(p, True)
    assert s._e0_meta is not None
    w = (
        jnp.zeros(s.obs.cam.shape[0], jnp.float32)
        if s.obs.weight is None
        else jnp.zeros_like(s.obs.weight)
    )
    s.obs = s.obs._replace(weight=w)
    s._e0_meta = s._e0_cam2 = s._e0_suffix = None
    s._plan_e0_fused()
    assert s._e0_meta is None


def test_e0_term_geometry_budgets_retained_onehots():
    """The geometry accounts for the w retained one-hot matrices
    [gt, n_pad]: tiles shrink as the camera count grows, and the
    fused path is declined outright when even a 128-lane tile would
    blow the VMEM frame (advisor r3)."""
    from povar_tpu.ops.pallas_pose import _E0_TERM_VMEM, e0_term_geometry
    from povar_tpu.ops.pallas_cam import _n_pad

    gt_small, _ = e0_term_geometry(16, 4096, 89)
    gt_large, _ = e0_term_geometry(16, 4096, 500)
    assert gt_large < gt_small
    for w, n_cams in [(4, 89), (16, 89), (4, 1000), (16, 500)]:
        geo = e0_term_geometry(w, 4096, n_cams)
        assert geo is not None
        gt, _ = geo
        assert 4 * w * gt * (13 + _n_pad(n_cams)) <= _E0_TERM_VMEM
    # w=16 at n_cams=1000 fits in a gt=128 tile (measured on a real
    # v5e chip, round 5: compiles and runs at 2.2 ms/term; the 14 MiB
    # frame is well under the 128 MiB VMEM) -> accepted, minimum tile
    geo = e0_term_geometry(16, 4096, 1000)
    assert geo is not None and geo[0] == 128
    # wide slots at a very large camera count: even gt=128 cannot fit
    # the w retained one-hots -> decline (composed kernels take over)
    assert e0_term_geometry(4, 4096, 16000) is None
