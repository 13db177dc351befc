"""Camera-window (large-N) structured path: plan correctness and
kernel equivalence against the plain one-hot kernels.

The windowed layout (segments.build_window_plan +
build_slot_plan_windowed + the `win=` mode of ops/pallas_pose) must
produce exactly the same per-camera sums and solves as the global
one-hot mode — windows only restructure WHERE the one-hot runs."""

import numpy as np
import jax.numpy as jnp
import pytest

import jax.numpy as jnp  # noqa: F811 (explicit for helpers below)

from povar_tpu.options import SolverOptions
from povar_tpu.solver.segments import (
    build_slot_plan_windowed,
    build_window_plan,
    padded_segment_sum,
    _build_padded_reduce,
    slot_expand,
    slot_part_sums,
    slot_segment_sum,
)


def _local_problem(rng, n_cams, n_lms, spread=30, k=4):
    centers = rng.integers(0, n_cams - spread, n_lms)
    obs_lm, obs_cam, obs_uv = [], [], []
    for m in range(n_lms):
        cams = np.unique(centers[m] + rng.integers(0, spread, k))
        while len(cams) < 2:
            cams = np.unique(centers[m] + rng.integers(0, spread, k))
        for c in cams:
            obs_lm.append(m)
            obs_cam.append(c)
            obs_uv.append(rng.standard_normal(2) * 0.3)
    return (
        np.array(obs_lm),
        np.array(obs_cam),
        np.array(obs_uv),
    )


def test_choose_window_width_cost_model():
    """A 5% medium-span landmark population must NOT force the widest
    window on everyone: the lanes(w)*w cost model routes them through
    grid-overflow sub-rows at width 128 instead (the round-2
    overflow-budget rule picked 512 here — a 4x one-hot tax on the
    95% of tight-span observations)."""
    from povar_tpu.solver.segments import choose_window_width

    rng = np.random.default_rng(3)
    n_cams, n_lms, k = 1600, 4000, 6
    centers = rng.integers(0, n_cams - 400, n_lms)
    span = np.where(rng.random(n_lms) < 0.05, 384, 24)
    obs_lm = np.repeat(np.arange(n_lms), k)
    obs_cam = (
        centers[obs_lm] + rng.integers(0, span[obs_lm], k * n_lms)
    ).astype(np.int64)
    w = choose_window_width(obs_cam, obs_lm, n_lms)
    assert w == 128

    # all-tight spans still pick the tightest width
    w2 = choose_window_width(
        (centers[obs_lm] + rng.integers(0, 24, k * n_lms)),
        obs_lm,
        n_lms,
    )
    assert w2 == 128


def test_window_plan_covers_and_splits_overflow():
    rng = np.random.default_rng(0)
    obs_lm, obs_cam, _ = _local_problem(rng, 900, 200)
    obs_row, row_win, row_lm, starts = build_window_plan(
        obs_cam, obs_lm, 200, width=128
    )
    # normal landmarks: one row each, window covers every camera
    assert len(row_lm) == 200
    for o in range(len(obs_lm)):
        s = starts[row_win[obs_row[o]]]
        assert s <= obs_cam[o] < s + 128
        assert row_lm[obs_row[o]] == obs_lm[o]
    # a landmark spanning more than the width splits into grid-cell
    # sub-rows instead of making the plan infeasible
    obs_lm2 = np.concatenate([obs_lm, [0, 0, 0]])
    obs_cam2 = np.concatenate([obs_cam, [1, 500, 570]])
    obs_row2, row_win2, row_lm2, starts2 = build_window_plan(
        obs_cam2, obs_lm2, 200, width=128
    )
    rows_of_0 = np.unique(obs_row2[obs_lm2 == 0])
    assert len(rows_of_0) >= 2  # split across grid cells
    assert (row_lm2[rows_of_0] == 0).all()
    for o in range(len(obs_lm2)):
        s = starts2[row_win2[obs_row2[o]]]
        assert s <= obs_cam2[o] < s + 128


def test_windowed_slot_plan_sums_and_blocks():
    rng = np.random.default_rng(1)
    obs_lm, obs_cam, _ = _local_problem(rng, 900, 150)
    # inject a loop-closure landmark spanning the whole camera range
    obs_lm = np.concatenate([obs_lm, [149, 149, 149, 149]])
    obs_cam = np.concatenate([obs_cam, [3, 299, 601, 877]])
    obs_row, row_win, row_lm, starts = build_window_plan(
        obs_cam, obs_lm, 150, width=128
    )
    pad = 256
    sp = build_slot_plan_windowed(
        obs_row, row_win, row_lm, 150, len(starts), pad_to=pad
    )
    perm, pw, shapes, blk = sp.perm, sp.pad_weight, sp.shapes, sp.block_window
    assert sp.has_duplicates
    assert len(perm) % pad == 0 and len(blk) == len(perm) // pad
    # every live lane in an aligned block belongs to the block's window
    lane_win = row_win[obs_row[perm]]
    for b in range(len(blk)):
        sl = slice(b * pad, (b + 1) * pad)
        live = pw[sl] > 0
        assert (lane_win[sl][live] == blk[b]).all()
    assert (np.diff(blk) >= 0).all()  # kmap monotone (init-once rule)
    # combined slot sum agrees with direct accumulation (duplicate
    # overflow rows re-merge through the lm_combine reduce)
    x = rng.standard_normal(len(obs_lm))
    rows = slot_part_sums(jnp.asarray((x[perm] * pw)[None]), shapes)
    combine = _build_padded_reduce(sp.row_lm_ext, 151)
    s = padded_segment_sum(rows, combine)[..., :150]
    ref = np.zeros(150)
    np.add.at(ref, obs_lm, x)
    np.testing.assert_allclose(np.asarray(s)[0], ref, rtol=1e-12)
    vals = rng.standard_normal(150)
    e = slot_expand(jnp.asarray(vals[None]), shapes, jnp.asarray(sp.lm_order))
    live = pw > 0
    np.testing.assert_allclose(
        np.asarray(e)[0][live], vals[obs_lm[perm]][live], rtol=1e-12
    )


@pytest.mark.slow
def test_windowed_solver_matches_plain_kernels():
    """Same solver, same linearization point: the windowed kernels must
    match the global one-hot kernels bit-for-bit (modulo f32 summation
    order) across init, linearize, power solve, apply, and error."""
    from povar_tpu.solver.stage1 import Stage1Solver

    rng = np.random.default_rng(3)
    n_cams, n_lms = 1300, 120
    obs_lm, obs_cam, obs_uv = _local_problem(rng, n_cams, n_lms)
    cam_space = rng.standard_normal((n_cams, 3, 4))
    cam_space[:, 2, :] = [0, 0, 0, 1.0]

    opts = SolverOptions()
    opts.pallas_kernels = "on"
    opts.power_sc_iterations = 3
    opts.eta = 0.0
    opts.r_tolerance = -1.0
    s = Stage1Solver(
        obs_cam, obs_lm, obs_uv, n_cams, n_lms, opts
    )
    assert s.n_win > 0 and s.win_w in (128, 256, 512)
    cams = jnp.asarray(cam_space)

    def run():
        lms = s.initialize_varproj(cams)
        lin = s.linearize(cams, lms)
        lam = jnp.asarray(1e-3, s.dtype)
        inc, _ = s.solve_power(lin, lam)
        nc, nl, ld = s.apply(cams, lms, lin, inc)
        err = s.compute_error(nc, nl)
        inc2, _ = s.solve_power(lin, lam, landmark_damping=True)
        _, nl2, ld2 = s.apply_poba(cams, lms, lin, inc2, lam)
        return dict(
            lms=np.asarray(lms), inc=np.asarray(inc),
            nl=np.asarray(nl), ld=float(ld),
            err=float(err["error_all"]), inc2=np.asarray(inc2),
            nl2=np.asarray(nl2), ld2=float(ld2),
        )

    win_out = run()
    # same solver/data with the window machinery bypassed: global ids
    # + full-table one-hot (n_win=0 routes every kernel to plain mode)
    s.n_win = 0
    plain_out = run()

    for k in win_out:
        a, b = plain_out[k], win_out[k]
        if isinstance(a, float):
            assert abs(a - b) <= 1e-6 * max(abs(a), 1e-12), (k, a, b)
        else:
            d = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
            assert d < 1e-6, (k, d)


@pytest.mark.slow
def test_windowed_lm_trajectory_matches_plain():
    """The LM loop driven through the windowed kernels must make the
    same accept/reject decisions as the plain kernels on the same
    solver (window machinery bypassed via n_win=0)."""
    from povar_tpu.solver.lm import optimize_step1
    from povar_tpu.utils.summary import SolverSummary
    from povar_tpu.utils.timer import Timer
    from povar_tpu.solver.stage1 import Stage1Solver

    rng = np.random.default_rng(7)
    n_cams, n_lms = 1300, 100
    obs_lm, obs_cam, obs_uv = _local_problem(rng, n_cams, n_lms)
    cam_space = rng.standard_normal((n_cams, 3, 4))
    cam_space[:, 2, :] = [0, 0, 0, 1.0]

    opts = SolverOptions()
    opts.pallas_kernels = "on"
    opts.max_num_iterations_step_1 = 5
    s = Stage1Solver(obs_cam, obs_lm, obs_uv, n_cams, n_lms, opts)
    assert s.n_win > 0

    def run():
        summary = SolverSummary()
        cams = jnp.asarray(cam_space)
        lms = s.initialize_varproj(cams)
        optimize_step1(
            s, cams, lms, opts, summary, Timer(), log=lambda _: None
        )
        return [
            (it.step_is_successful, it.cost.all.error)
            for it in summary.iterations
        ]

    traj_win = run()
    s.n_win = 0
    traj_plain = run()
    assert len(traj_win) == len(traj_plain)
    for (ok_a, c_a), (ok_b, c_b) in zip(traj_plain, traj_win):
        assert ok_a == ok_b
        np.testing.assert_allclose(c_b, c_a, rtol=1e-6)


@pytest.mark.slow
def test_windowed_rcm_overflow_solver_matches_plain():
    """Adversarial structure: camera ids globally SCRAMBLED (windowing
    must recover locality via RCM reordering) and ~2% loop-closure
    landmarks spanning the full camera range (must split into grid
    sub-rows instead of dropping the whole problem to the XLA path).
    The windowed kernels must still match plain-kernel results."""
    from povar_tpu.solver.stage1 import Stage1Solver

    rng = np.random.default_rng(11)
    n_cams, n_lms = 1300, 120
    obs_lm, obs_cam, obs_uv = _local_problem(rng, n_cams, n_lms)
    # loop closures: landmarks observing evenly-spaced cameras across
    # the whole trajectory — incompressible by ANY camera reordering
    # (the 120-landmark local backbone pins the order, and ~65 cameras
    # per loop landmark evenly cover it), so these MUST overflow
    extra_lm, extra_cam, extra_uv = [], [], []
    n_loop = 6
    for m in range(n_loop):
        cams = np.arange(m * 3, n_cams, 20)
        for c in cams:
            extra_lm.append(n_lms + m)
            extra_cam.append(c)
            extra_uv.append(rng.standard_normal(2) * 0.3)
    obs_lm = np.concatenate([obs_lm, extra_lm])
    obs_cam = np.concatenate([obs_cam, extra_cam])
    obs_uv = np.concatenate([obs_uv, np.asarray(extra_uv)])
    n_lms += n_loop
    # scramble camera ids (destroys index locality, not structure)
    scramble = rng.permutation(n_cams)
    obs_cam = scramble[obs_cam]
    cam_space = rng.standard_normal((n_cams, 3, 4))
    cam_space[:, 2, :] = [0, 0, 0, 1.0]

    opts = SolverOptions()
    opts.pallas_kernels = "on"
    opts.power_sc_iterations = 3
    opts.eta = 0.0
    opts.r_tolerance = -1.0
    s = Stage1Solver(obs_cam, obs_lm, obs_uv, n_cams, n_lms, opts)
    assert s.n_win > 0
    # RCM must recover the hidden locality: a tight width, not 512
    assert s.win_w in (128, 256)
    # the loop closures must ride the overflow combine
    assert s.obs.lm_combine is not None
    cams = jnp.asarray(cam_space)

    def run():
        lms = s.initialize_varproj(cams)
        lin = s.linearize(cams, lms)
        lam = jnp.asarray(1e-3, s.dtype)
        inc, _ = s.solve_power(lin, lam)
        nc, nl, ld = s.apply(cams, lms, lin, inc)
        err = s.compute_error(nc, nl)
        return dict(
            lms=np.asarray(lms), inc=np.asarray(inc),
            nl=np.asarray(nl), ld=float(ld),
            err=float(err["error_all"]),
        )

    win_out = run()
    s.n_win = 0
    plain_out = run()
    for k in win_out:
        a, b = plain_out[k], win_out[k]
        if isinstance(a, float):
            assert abs(a - b) <= 1e-6 * max(abs(a), 1e-12), (k, a, b)
        else:
            d = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
            assert d < 1e-6, (k, d)


@pytest.mark.slow
@pytest.mark.parametrize("adversarial", [False, True])
def test_windowed_stage2_matches_plain_kernels(adversarial):
    """Stage-2 structured kernels under the camera-window layout match
    the same solver's global one-hot mode — including on adversarial
    structure (scrambled camera ids + loop-closure landmarks riding
    the grid-overflow combine), mirroring the stage-1 RCM test."""
    from povar_tpu.solver.stage2 import Stage2Solver

    rng = np.random.default_rng(5)
    n_cams, n_lms = 1300, 100
    obs_lm, obs_cam, obs_uv = _local_problem(rng, n_cams, n_lms)
    if adversarial:
        extra_lm, extra_cam, extra_uv = [], [], []
        for m in range(5):
            for c in np.arange(m * 3, n_cams, 20):
                extra_lm.append(n_lms + m)
                extra_cam.append(c)
                extra_uv.append(rng.standard_normal(2) * 0.3)
        obs_lm = np.concatenate([obs_lm, extra_lm])
        obs_cam = np.concatenate([obs_cam, extra_cam])
        obs_uv = np.concatenate([obs_uv, np.asarray(extra_uv)])
        n_lms += 5
        scramble = rng.permutation(n_cams)
        obs_cam = scramble[obs_cam]
    cam_space = rng.standard_normal((n_cams, 3, 4))
    lm_h = np.concatenate(
        [rng.standard_normal((n_lms, 3)), np.ones((n_lms, 1))], axis=1
    )

    opts = SolverOptions()
    opts.pallas_kernels = "on"
    opts.power_sc_iterations = 3
    opts.eta = 0.0
    opts.r_tolerance = -1.0
    s = Stage2Solver(obs_cam, obs_lm, obs_uv, n_cams, n_lms, opts)
    assert s.n_win > 0
    if adversarial:
        assert s.obs.lm_combine is not None
    cams = jnp.asarray(cam_space)
    lms_h = jnp.asarray(lm_h)

    def run():
        lin = s.linearize(cams, lms_h)
        lam = jnp.asarray(1e-3, s.dtype)
        inc, _ = s.solve_power(lin, lam)
        nc, nl, ld = s.apply(cams, lms_h, lin, inc, lam)
        err = s.compute_error(cams, lms_h)
        return dict(
            inc=np.asarray(inc), nl=np.asarray(nl), nc=np.asarray(nc),
            ld=float(ld), err=float(err["error_all"]),
        )

    win_out = run()
    s.n_win = 0
    plain_out = run()
    for k in win_out:
        a, b = plain_out[k], win_out[k]
        if isinstance(a, float):
            assert abs(a - b) <= 1e-6 * max(abs(a), 1e-12), (k, a, b)
        else:
            d = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
            assert d < 1e-5, (k, d)


def test_lmstate_packed_trajectory_bit_identical():
    """The L-space state threading (stage1.LmState) must reproduce the
    canonical-state results exactly: the pack take commutes with every
    elementwise state operation, so linearize/apply/compute_error at a
    packed state are bit-identical to the canonical flow."""
    import jax.numpy as jnp

    from povar_tpu.options import SolverOptions
    from povar_tpu.problem.synthetic import synthetic_bal_problem
    from povar_tpu.solver.stage1 import LmState, Stage1Solver
    from povar_tpu.solver.stage2 import Stage2Solver, create_homogeneous

    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=60, obs_per_lm=4, seed=3
    )
    opts = SolverOptions()
    opts.power_sc_iterations = 4
    opts.eta = 0.0
    opts.r_tolerance = -1.0
    opts.pallas_kernels = "on"
    s = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    cams = jnp.asarray(problem.cam_space)
    lms = s.initialize_varproj(cams)
    lam = jnp.asarray(1e-4, lms.dtype)
    packed = s.lm_pack(lms)
    assert isinstance(packed, LmState)
    np.testing.assert_array_equal(
        np.asarray(s.lm_unpack(packed)), np.asarray(lms)
    )

    # two chained iterations in both representations
    def iterate(lm_state):
        lin = s.linearize(cams, lm_state)
        inc, _ = s.solve_power(lin, lam)
        nc, nl, ld = s.apply(cams, lm_state, lin, inc)
        err = s.compute_error(nc, nl)
        return nc, nl, float(ld), float(err["error_all"])

    nc_c, nl_c, ld_c, e_c = iterate(lms)
    nc_p, nl_p, ld_p, e_p = iterate(packed)
    _, nl_c2, _, e_c2 = iterate(nl_c)
    _, nl_p2, _, e_p2 = iterate(nl_p)
    np.testing.assert_array_equal(np.asarray(nc_c), np.asarray(nc_p))
    np.testing.assert_array_equal(
        np.asarray(nl_c), np.asarray(s.lm_unpack(nl_p))
    )
    np.testing.assert_array_equal(
        np.asarray(nl_c2), np.asarray(s.lm_unpack(nl_p2))
    )
    assert ld_c == ld_p and e_c == e_p and e_c2 == e_p2

    # stage 2: packed flow through linearize/solve/apply/error
    cams2, lms_h = create_homogeneous(cams, s.lm_unpack(nl_p))
    s2 = Stage2Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    lam2 = jnp.asarray(1e-4, s2.dtype)

    def iterate2(lm_state):
        lin = s2.linearize(cams2, lm_state)
        inc, _ = s2.solve_power(lin, lam2)
        nc, nl, ld = s2.apply(cams2, lm_state, lin, inc, lam2)
        err = s2.compute_error(nc, nl)
        return nl, float(ld), float(err["error_all"])

    nl2_c, ld2_c, e2_c = iterate2(lms_h)
    nl2_p, ld2_p, e2_p = iterate2(s2.lm_pack(lms_h))
    np.testing.assert_array_equal(
        np.asarray(nl2_c), np.asarray(s2.lm_unpack(nl2_p))
    )
    assert ld2_c == ld2_p and e2_c == e2_p
