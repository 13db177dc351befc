"""SPMD windowed path (parallel/spmd.py): plan/reduce correctness and
solver equivalence against the single-chip solvers on a virtual
8-device mesh.

These tests run the REAL sharded program: shard_map over the mesh with
the windowed Pallas-layout kernels (interpret mode off-TPU), device-
local landmark reductions, and psum'd camera accumulators — the fast
multi-chip path the driver's dryrun exercises."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from povar_tpu.options import SolverOptions, SolverType
from povar_tpu.ops.pallas_pose import PART_ALIGN
from povar_tpu.parallel.spmd import (
    build_spmd_plan,
    build_uniform_combine,
    get_spmd_solver_classes,
    spmd_expand_rows,
    spmd_part_sums,
)
from povar_tpu.solver.segments import PaddedReduce, padded_segment_sum

D = 8


def _mesh():
    devs = jax.devices()
    assert len(devs) >= D, "conftest provides 8 virtual cpu devices"
    return Mesh(np.asarray(devs[:D]), ("obs",))


def _local_problem(rng, n_cams, n_lms, spread=30, loops=3):
    """Locality-structured problem + incompressible loop closures +
    scrambled camera ids (the adversarial windowing structure)."""
    centers = rng.integers(0, n_cams - spread, n_lms)
    obs_lm, obs_cam, obs_uv = [], [], []
    for m in range(n_lms):
        k = rng.integers(2, 7)
        cams = np.unique(centers[m] + rng.integers(0, spread, k))
        while len(cams) < 2:
            cams = np.unique(centers[m] + rng.integers(0, spread, k))
        for c in cams:
            obs_lm.append(m)
            obs_cam.append(c)
            obs_uv.append(rng.standard_normal(2) * 0.3)
    for m in range(loops):
        for c in np.arange(m * 7, n_cams, 23):
            obs_lm.append(n_lms + m)
            obs_cam.append(c)
            obs_uv.append(rng.standard_normal(2) * 0.3)
    n_lms += loops
    obs_lm, obs_cam, obs_uv = map(
        np.asarray, (obs_lm, obs_cam, obs_uv)
    )
    scramble = rng.permutation(n_cams)
    return scramble[obs_cam], obs_lm, obs_uv, n_lms


def _dev_combine(combine, d):
    """Slice one device's combine reduce out of the stacked arrays."""
    return PaddedReduce(
        idx=tuple(
            i.reshape(D, -1, i.shape[-1])[d] for i in combine.idx
        ),
        mask=tuple(
            m.reshape(D, -1, m.shape[-1])[d] for m in combine.mask
        ),
        inv_order=combine.inv_order.reshape(D, -1)[d],
    )


def test_spmd_plan_and_reduces():
    """Host-side plan invariants + the vectorized per-class reduces
    against direct numpy accumulation (incl. overflow sub-rows)."""
    rng = np.random.default_rng(0)
    n_cams = 700
    obs_cam, obs_lm, _uv, n_lms = _local_problem(rng, n_cams, 160)
    o = len(obs_cam)
    plan = build_spmd_plan(
        obs_cam, obs_lm, n_cams, n_lms, D, block_align=4096
    )
    assert plan.o_dev % 4096 == 0

    # every live lane's window column maps back to its camera
    for d in range(D):
        lanes = slice(d * plan.o_dev, (d + 1) * plan.o_dev)
        live = plan.pad_weight[lanes] > 0
        kmap_d = plan.kmap[
            d * (plan.o_dev // 4096) : (d + 1) * (plan.o_dev // 4096)
        ]
        win = kmap_d[np.arange(plan.o_dev) // 4096]
        gofs = (
            (d * plan.n_win_dev + win) * plan.width
            + plan.cam_local[lanes]
        )
        assert (
            plan.win_gather[gofs][live] == plan.cam[lanes][live]
        ).all()

    # landmark reduce: lanes -> rows -> combine == direct accumulation
    x = rng.standard_normal(o)
    lane_vals = np.where(plan.pad_weight > 0, x[plan.perm], 0.0)
    combine = build_uniform_combine(
        plan.row_lm_ext, D, plan.n_rows_dev, plan.m_dev
    )
    got = np.zeros(n_lms)
    vals = rng.standard_normal(n_lms)
    for d in range(D):
        lanes = slice(d * plan.o_dev, (d + 1) * plan.o_dev)
        rows = spmd_part_sums(
            jnp.asarray(lane_vals[lanes][None]), plan.layout
        )
        per_lm = np.asarray(
            padded_segment_sum(rows, _dev_combine(combine, d))
        )[0][:-1]
        mine = plan.lm_perm // plan.m_dev == d
        got[mine] = per_lm[plan.lm_perm[mine] % plan.m_dev]

        # expansion: landmark values -> lanes
        local_vals = np.zeros(plan.m_dev)
        local_vals[plan.lm_perm[mine] % plan.m_dev] = vals[mine]
        rr = local_vals[
            plan.lm_order[
                d * plan.n_rows_dev : (d + 1) * plan.n_rows_dev
            ]
        ]
        lanes_v = np.asarray(
            spmd_expand_rows(jnp.asarray(rr[None]), plan.layout)
        )[0]
        live = plan.pad_weight[lanes] > 0
        np.testing.assert_allclose(
            lanes_v[live],
            vals[obs_lm[plan.perm[lanes]]][live],
            rtol=1e-12,
        )
    ref = np.zeros(n_lms)
    np.add.at(ref, obs_lm, x)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


def test_spmd_plan_unobserved_landmark():
    """Landmarks with zero observations still get a (fully fake) slot
    row — the plan must build instead of crashing on the empty
    per-row observation list (the single-chip plan also keeps them),
    and reductions must leave their sums at zero."""
    rng = np.random.default_rng(3)
    n_cams = 200
    obs_cam, obs_lm, _uv, n_lms = _local_problem(rng, n_cams, 60)
    # append two unobserved landmarks (ids n_lms, n_lms + 1)
    n_lms_ext = n_lms + 2
    plan = build_spmd_plan(
        obs_cam, obs_lm, n_cams, n_lms_ext, D, block_align=4096
    )
    x = rng.standard_normal(len(obs_cam))
    combine = build_uniform_combine(
        plan.row_lm_ext, D, plan.n_rows_dev, plan.m_dev
    )
    got = np.zeros(n_lms_ext)
    lane_vals = np.where(plan.pad_weight > 0, x[plan.perm], 0.0)
    for d in range(D):
        lanes = slice(d * plan.o_dev, (d + 1) * plan.o_dev)
        rows = spmd_part_sums(
            jnp.asarray(lane_vals[lanes][None]), plan.layout
        )
        per_lm = np.asarray(
            padded_segment_sum(rows, _dev_combine(combine, d))
        )[0][:-1]
        mine = plan.lm_perm // plan.m_dev == d
        got[mine] = per_lm[plan.lm_perm[mine] % plan.m_dev]
    ref = np.zeros(n_lms_ext)
    np.add.at(ref, obs_lm, x)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)
    assert got[n_lms] == 0.0 and got[n_lms + 1] == 0.0


def _as_jaxpr(p):
    if hasattr(p, "eqns"):
        return p
    if hasattr(p, "jaxpr"):
        return _as_jaxpr(p.jaxpr)
    return None


_COLL = {
    "psum", "all_reduce", "all_gather", "all_to_all", "ppermute",
    "reduce_scatter",
}


def _find_collectives(jaxpr, out):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in _COLL:
            out.append(
                (
                    eqn.primitive.name,
                    [tuple(v.aval.shape) for v in eqn.invars],
                )
            )
        for p in eqn.params.values():
            for q in p if isinstance(p, (list, tuple)) else [p]:
                j = _as_jaxpr(q)
                if j is not None:
                    _find_collectives(j, out)
    return out


def test_spmd_collectives_are_camera_sized_only():
    """The SPMD program's ONLY cross-device communication is the
    all-reduce of per-camera accumulators ([12,N], [144,N]) and of
    cost/model-decrease scalars — the ICI mapping of the reference's
    mutex-guarded per-camera scatter (SURVEY.md §2.7). No obs-sized or
    landmark-sized array ever moves between devices."""
    opts = SolverOptions()
    opts.power_sc_iterations = 3
    opts.pallas_kernels = "on"
    s, _ref, cams = _stage1_pair(opts)
    n_cams = cams.shape[0]
    lmpad = jnp.zeros((s.plan.n_dev * s.plan.m_dev, 3))
    lam = jnp.asarray(1e-3, jnp.float64)
    lin_shape = jax.eval_shape(
        lambda c, l: s._jit_linearize(s.obs, c, l), cams, lmpad
    )
    lin = jax.tree.map(
        lambda a: jnp.zeros(a.shape, a.dtype), lin_shape
    )

    cases = {
        "linearize": (
            lambda c, l: s._jit_linearize(s.obs, c, l), (cams, lmpad)
        ),
        "solve_power": (
            lambda ln, la: s._jit_solve_power(s.obs, ln, la),
            (lin, lam),
        ),
        "apply": (
            lambda c, l, ln: s._jit_apply(
                s.obs, c, l, ln, jnp.zeros((12, n_cams))
            ),
            (cams, lmpad, lin),
        ),
        "compute_error": (
            lambda c, l: s._jit_compute_error(s.obs, c, l),
            (cams, lmpad),
        ),
    }
    for name, (fn, args) in cases.items():
        colls = _find_collectives(jax.make_jaxpr(fn)(*args).jaxpr, [])
        assert colls, f"{name}: expected camera-accumulator psums"
        for pname, shapes in colls:
            for shp in shapes:
                ok = len(shp) == 0 or shp[-1] in (n_cams, n_cams + 1)
                assert ok, (
                    f"{name}: {pname} moves a non-camera-sized array "
                    f"{shp} across devices"
                )


def _stage1_pair(opts):
    from povar_tpu.solver.stage1 import Stage1Solver

    rng = np.random.default_rng(3)
    n_cams = 700
    obs_cam, obs_lm, obs_uv, n_lms = _local_problem(rng, n_cams, 150)
    cam_space = rng.standard_normal((n_cams, 3, 4))
    cam_space[:, 2, :] = [0, 0, 0, 1.0]
    mesh = _mesh()
    plan = build_spmd_plan(
        obs_cam, obs_lm, n_cams, n_lms, D, PART_ALIGN
    )
    S1, _ = get_spmd_solver_classes()
    spmd = S1(plan, obs_uv, n_cams, n_lms, opts, mesh)
    ref = Stage1Solver(obs_cam, obs_lm, obs_uv, n_cams, n_lms, opts)
    return spmd, ref, jnp.asarray(cam_space)


@pytest.mark.slow
def test_spmd_stage1_matches_single_chip():
    """init / error / linearize+power-solve / both applies match the
    single-chip structured solver up to f32 summation order."""
    opts = SolverOptions()
    opts.power_sc_iterations = 3
    opts.eta = 0.0
    opts.r_tolerance = -1.0
    opts.pallas_kernels = "on"
    s, ref, cams = _stage1_pair(opts)
    lam = jnp.asarray(1e-3, s.dtype)

    lp = s.initialize_varproj(cams)
    e0 = s.compute_error(cams, lp)
    lin = s.linearize(cams, lp)
    inc, _ = s.solve_power(lin, lam)
    nc, nl, ld = s.apply(cams, lp, lin, inc)
    e1 = s.compute_error(nc, nl)
    inc2, _ = s.solve_power(lin, lam, landmark_damping=True)
    _nc2, nl2, ld2 = s.apply_poba(cams, lp, lin, inc2, lam)

    lr = ref.initialize_varproj(cams)
    e0r = ref.compute_error(cams, lr)
    lin_r = ref.linearize(cams, lr)
    inc_r, _ = ref.solve_power(lin_r, lam)
    ncr, nlr, ldr = ref.apply(cams, lr, lin_r, inc_r)
    e1r = ref.compute_error(ncr, nlr)
    inc2r, _ = ref.solve_power(lin_r, lam, landmark_damping=True)
    _, nl2r, ld2r = ref.apply_poba(cams, lr, lin_r, inc2r, lam)

    f0, f0r = float(e0["error_all"]), float(e0r["error_all"])
    assert abs(f0 - f0r) <= 1e-11 * abs(f0r)
    # post-step costs are catastrophically cancelled (1e-4 of the
    # initial cost): compare on the initial-cost scale
    assert abs(float(e1["error_all"]) - float(e1r["error_all"])) <= (
        1e-6 * f0r
    )
    # l_diff is an ~5e5-element f32 reduction with different summation
    # orders on the two paths (and different Pallas kernel selection
    # after the fused-E0 planning budget); ~2e-4 relative drift is
    # ordinary ordering noise at f32 (thousands of ulp over 1e5 terms)
    assert abs(float(ld) - float(ldr)) <= 1e-3 * abs(float(ldr))
    assert abs(float(ld2) - float(ld2r)) <= 1e-3 * abs(float(ld2r))
    for a, b in (
        (np.asarray(inc), np.asarray(inc_r)),
        (s.unpad_landmarks(nl), np.asarray(nlr)),
        (s.unpad_landmarks(nl2), np.asarray(nl2r)),
    ):
        d = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
        assert d < 3e-3, d


@pytest.mark.slow
def test_spmd_stage2_matches_single_chip():
    """Same-state stage-2 equivalence on a geometrically CONSISTENT
    near-optimum state (random states make the homogeneous projective
    division arbitrarily ill-conditioned, where the structured fold's
    documented ~1e-2 f32 sensitivity would drown the comparison)."""
    from povar_tpu.problem.synthetic import _ring_cameras
    from povar_tpu.solver.stage2 import Stage2Solver, create_homogeneous

    rng = np.random.default_rng(5)
    n_cams = 700
    obs_cam, obs_lm, obs_uv, n_lms = _local_problem(rng, n_cams, 150)
    gt_cams = _ring_cameras(n_cams, radius=10.0, rng=rng)
    lm_p = rng.standard_normal((n_lms, 3)) * 2.0
    xh = np.concatenate([lm_p, np.ones((n_lms, 1))], axis=1)
    p = np.einsum("oij,oj->oi", gt_cams[obs_cam], xh[obs_lm])
    obs_uv = p[:, :2] / p[:, 2:3]
    cam_space = gt_cams + 1e-3 * rng.standard_normal(gt_cams.shape)
    lm_p = lm_p + 1e-3 * rng.standard_normal(lm_p.shape)

    opts = SolverOptions()
    opts.power_sc_iterations = 3
    opts.eta = 0.0
    opts.r_tolerance = -1.0
    opts.pallas_kernels = "on"
    mesh = _mesh()
    plan = build_spmd_plan(
        obs_cam, obs_lm, n_cams, n_lms, D, PART_ALIGN
    )
    _, S2 = get_spmd_solver_classes()
    s = S2(plan, obs_uv, n_cams, n_lms, opts, mesh)
    ref = Stage2Solver(obs_cam, obs_lm, obs_uv, n_cams, n_lms, opts)

    cams0 = jnp.asarray(cam_space)
    cams, lmh_pad = create_homogeneous(cams0, s.pad_landmarks(lm_p))
    _, lmh = create_homogeneous(cams0, jnp.asarray(lm_p))
    lam = jnp.asarray(1e-3, s.dtype)

    e0 = s.compute_error(cams, lmh_pad)
    e0r = ref.compute_error(cams, lmh)
    assert abs(
        float(e0["error_all"]) - float(e0r["error_all"])
    ) <= 1e-11 * abs(float(e0r["error_all"]))
    assert int(e0["num_obs_valid"]) == int(e0r["num_obs_valid"])

    lin = s.linearize(cams, lmh_pad)
    lin_r = ref.linearize(cams, lmh)
    inc, _ = s.solve_power(lin, lam)
    inc_r, _ = ref.solve_power(lin_r, lam)
    d = np.abs(np.asarray(inc) - np.asarray(inc_r)).max() / (
        np.abs(np.asarray(inc_r)).max() + 1e-12
    )
    assert d < 3e-3, d
    nc, nl, ld = s.apply(cams, lmh_pad, lin, inc, lam)
    ncr, nlr, ldr = ref.apply(cams, lmh, lin_r, inc_r, lam)
    assert abs(float(ld) - float(ldr)) <= 1e-4 * abs(float(ldr))
    d = np.abs(s.unpad_landmarks(nl) - np.asarray(nlr)).max()
    assert d < 1e-4, d
    d = np.abs(np.asarray(nc) - np.asarray(ncr)).max()
    assert d < 1e-4, d


@pytest.mark.slow
def test_spmd_step1_lm_trajectory_parity():
    """The step-1 LM loop on the mesh makes the same accept/reject
    decisions as single-chip, and the full two-step pipeline completes
    with finite state (stage 2 is compared at same-state level above —
    the stratified boundary is chaotic under f32 step noise, so
    cross-path step-2 trajectories legitimately differ)."""
    import copy

    from povar_tpu.problem.synthetic import synthetic_bal_problem
    from povar_tpu.solver.pipeline import bundle_adjust

    problem, _ = synthetic_bal_problem(
        n_cams=10, n_lms=60, obs_per_lm=4, seed=7
    )
    opts = SolverOptions()
    opts.max_num_iterations_step_1 = 4
    opts.max_num_iterations_step_2 = 3
    opts.pallas_kernels = "on"
    mesh = _mesh()
    p1 = copy.deepcopy(problem)
    p2 = copy.deepcopy(problem)
    _, s1a, s2a = bundle_adjust(p1, opts, log=lambda s: None, mesh=mesh)
    _, s1b, _s2b = bundle_adjust(p2, opts, log=lambda s: None)

    ta = [
        (it.step_is_successful,
         it.cost.all.error if it.cost is not None else None)
        for it in s1a.iterations
    ]
    tb = [
        (it.step_is_successful,
         it.cost.all.error if it.cost is not None else None)
        for it in s1b.iterations
    ]
    assert len(ta) == len(tb)
    c_init = tb[0][1]
    for (ok_a, c_a), (ok_b, c_b) in zip(ta, tb):
        assert ok_a == ok_b
        if c_a is not None and c_b is not None:
            # late-iteration costs are ~1e-3 of the initial cost
            # (cancellation): bound the difference on both scales
            assert abs(c_a - c_b) <= max(
                2e-4 * abs(c_b), 1e-6 * c_init
            )
    assert np.all(np.isfinite(p1.cam_space))
    assert np.all(np.isfinite(p1.lm_p_h))
    assert s2a.num_successful_steps > 0


@pytest.mark.slow
def test_spmd_stage1_pcg_matches_single_chip():
    """PCG step-1 under shard_map (VERDICT r3 #6: the fast path covers
    the iterative non-power solver too): solve via the explicit-SC CG
    matches the single-chip structured solver."""
    opts = SolverOptions()
    opts.solver_type_step_1 = SolverType.PCG
    opts.pallas_kernels = "on"
    s, ref, cams = _stage1_pair(opts)
    lam = jnp.asarray(1e-3, s.dtype)

    lp = s.initialize_varproj(cams)
    lin = s.linearize(cams, lp)
    inc, n = s.solve_pcg(lin, lam)

    lr = ref.initialize_varproj(cams)
    lin_r = ref.linearize(cams, lr)
    inc_r, n_r = ref.solve_pcg(lin_r, lam)

    # same CG iteration count (identical operator up to f32 order)
    assert abs(int(n) - int(n_r)) <= 1
    d = np.abs(np.asarray(inc) - np.asarray(inc_r)).max() / (
        np.abs(np.asarray(inc_r)).max() + 1e-12
    )
    assert d < 3e-3, d


def test_spmd_pcg_takes_fast_path_and_no_warning():
    """A PCG mesh run uses the windowed shard_map solvers (not the
    GSPMD fallback) and completes the full pipeline without the
    fallback warning."""
    import copy
    import warnings

    from povar_tpu.problem.synthetic import synthetic_bal_problem
    from povar_tpu.solver.pipeline import bundle_adjust

    problem, _ = synthetic_bal_problem(
        n_cams=10, n_lms=60, obs_per_lm=4, seed=7
    )
    opts = SolverOptions()
    opts.solver_type_step_1 = SolverType.PCG
    opts.max_num_iterations_step_1 = 3
    opts.max_num_iterations_step_2 = 2
    opts.pallas_kernels = "on"
    mesh = _mesh()
    p1 = copy.deepcopy(problem)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        _, s1, s2 = bundle_adjust(
            p1, opts, log=lambda s: None, mesh=mesh
        )
    assert s1.num_successful_steps > 0
    assert np.all(np.isfinite(p1.cam_space))


def test_spmd_fallback_warns_loudly():
    """Configurations outside the fast path (detailed_timing, pure
    f64) fall back to the GSPMD lowering WITH a RuntimeWarning naming
    the reason (VERDICT r3 #6: no silent order-of-magnitude loss)."""
    import copy

    from povar_tpu.problem.synthetic import synthetic_bal_problem
    from povar_tpu.solver.pipeline import bundle_adjust

    problem, _ = synthetic_bal_problem(
        n_cams=8, n_lms=40, obs_per_lm=4, seed=9
    )
    opts = SolverOptions()
    opts.max_num_iterations_step_1 = 2
    opts.max_num_iterations_step_2 = 2
    opts.detailed_timing = True
    mesh = _mesh()
    p1 = copy.deepcopy(problem)
    with pytest.warns(RuntimeWarning, match="detailed_timing"):
        bundle_adjust(p1, opts, log=lambda s: None, mesh=mesh)
    assert np.all(np.isfinite(p1.cam_space))


# --------------------------------------------------------------------
# Pure-f64 fast path (VERDICT r4 #8): mixed_precision_solves=False
# rides the SAME windowed shard_map solvers — the per-observation
# kernels dispatch to their XLA mirrors (ops/xla_pose.py) and the slot
# reduce/expand falls back per class — instead of dropping to the
# GSPMD lowering. Equivalence is against the single-chip pure-f64
# solver (the non-structured XLA path), so it also pins the mirrors'
# math against an independent implementation.


def _stage1_pair_f64():
    from povar_tpu.solver.stage1 import Stage1Solver

    rng = np.random.default_rng(3)
    n_cams = 700
    obs_cam, obs_lm, obs_uv, n_lms = _local_problem(rng, n_cams, 150)
    cam_space = rng.standard_normal((n_cams, 3, 4))
    cam_space[:, 2, :] = [0, 0, 0, 1.0]
    mesh = _mesh()
    plan = build_spmd_plan(
        obs_cam, obs_lm, n_cams, n_lms, D, PART_ALIGN
    )
    opts = SolverOptions()
    opts.mixed_precision_solves = False
    opts.power_sc_iterations = 3
    opts.eta = 0.0
    opts.r_tolerance = -1.0
    opts.pallas_kernels = "on"  # SPMD structured path
    S1, _ = get_spmd_solver_classes()
    spmd = S1(plan, obs_uv, n_cams, n_lms, opts, mesh)
    # single chip: pure f64 runs the non-structured XLA path
    # ("on" is invalid there by design — f32 inner solves required)
    ropts = SolverOptions()
    ropts.mixed_precision_solves = False
    ropts.power_sc_iterations = 3
    ropts.eta = 0.0
    ropts.r_tolerance = -1.0
    ref = Stage1Solver(obs_cam, obs_lm, obs_uv, n_cams, n_lms, ropts)
    return spmd, ref, jnp.asarray(cam_space)


@pytest.mark.slow
def test_spmd_pure_f64_stage1_matches_single_chip():
    """f64-tolerance equivalence of init / error / power solves (both
    dampings) / apply between the sharded structured-XLA path and the
    single-chip f64 solver."""
    s, ref, cams = _stage1_pair_f64()
    assert s.solve_dtype == jnp.float64
    lam = jnp.asarray(1e-3, s.dtype)

    lp = s.initialize_varproj(cams)
    lr = ref.initialize_varproj(cams)
    assert (
        np.abs(s.unpad_landmarks(lp) - np.asarray(lr)).max() < 1e-9
    )
    e0 = s.compute_error(cams, lp)
    e0r = ref.compute_error(cams, lr)
    f0, f0r = float(e0["error_all"]), float(e0r["error_all"])
    assert abs(f0 - f0r) <= 1e-12 * abs(f0r)
    assert int(e0["num_obs_valid"]) == int(e0r["num_obs_valid"])

    lin = s.linearize(cams, lp)
    lin_r = ref.linearize(cams, lr)
    inc, _ = s.solve_power(lin, lam)
    inc_r, _ = ref.solve_power(lin_r, lam)
    d = np.abs(np.asarray(inc) - np.asarray(inc_r)).max() / (
        np.abs(np.asarray(inc_r)).max() + 1e-300
    )
    assert d < 1e-10, d

    nc, nl, ld = s.apply(cams, lp, lin, inc)
    ncr, nlr, ldr = ref.apply(cams, lr, lin_r, inc_r)
    assert abs(float(ld) - float(ldr)) <= 1e-9 * abs(float(ldr))
    assert np.abs(s.unpad_landmarks(nl) - np.asarray(nlr)).max() < 1e-8
    assert np.abs(np.asarray(nc) - np.asarray(ncr)).max() < 1e-8

    inc2, _ = s.solve_power(lin, lam, landmark_damping=True)
    inc2r, _ = ref.solve_power(lin_r, lam, landmark_damping=True)
    d = np.abs(np.asarray(inc2) - np.asarray(inc2r)).max() / (
        np.abs(np.asarray(inc2r)).max() + 1e-300
    )
    assert d < 1e-10, d


@pytest.mark.slow
def test_spmd_pure_f64_stage2_matches_single_chip():
    """Stage-2 equivalence in pure f64 on the consistent near-optimum
    state (see the mixed-mode twin above) — at f64 the comparison is
    tight instead of f32-sensitivity-bounded."""
    from povar_tpu.problem.synthetic import _ring_cameras
    from povar_tpu.solver.stage2 import Stage2Solver, create_homogeneous

    rng = np.random.default_rng(5)
    n_cams = 700
    obs_cam, obs_lm, obs_uv, n_lms = _local_problem(rng, n_cams, 150)
    gt_cams = _ring_cameras(n_cams, radius=10.0, rng=rng)
    lm_p = rng.standard_normal((n_lms, 3)) * 2.0
    xh = np.concatenate([lm_p, np.ones((n_lms, 1))], axis=1)
    p = np.einsum("oij,oj->oi", gt_cams[obs_cam], xh[obs_lm])
    obs_uv = p[:, :2] / p[:, 2:3]
    cam_space = gt_cams + 1e-3 * rng.standard_normal(gt_cams.shape)
    lm_p = lm_p + 1e-3 * rng.standard_normal(lm_p.shape)

    opts = SolverOptions()
    opts.mixed_precision_solves = False
    opts.power_sc_iterations = 3
    opts.eta = 0.0
    opts.r_tolerance = -1.0
    opts.pallas_kernels = "on"
    mesh = _mesh()
    plan = build_spmd_plan(
        obs_cam, obs_lm, n_cams, n_lms, D, PART_ALIGN
    )
    _, S2 = get_spmd_solver_classes()
    s = S2(plan, obs_uv, n_cams, n_lms, opts, mesh)
    assert s.solve_dtype == jnp.float64
    ropts = SolverOptions()
    ropts.mixed_precision_solves = False
    ropts.power_sc_iterations = 3
    ropts.eta = 0.0
    ropts.r_tolerance = -1.0
    ref = Stage2Solver(obs_cam, obs_lm, obs_uv, n_cams, n_lms, ropts)

    cams0 = jnp.asarray(cam_space)
    cams, lmh_pad = create_homogeneous(cams0, s.pad_landmarks(lm_p))
    _, lmh = create_homogeneous(cams0, jnp.asarray(lm_p))
    lam = jnp.asarray(1e-3, s.dtype)

    e0 = s.compute_error(cams, lmh_pad)
    e0r = ref.compute_error(cams, lmh)
    assert abs(
        float(e0["error_all"]) - float(e0r["error_all"])
    ) <= 1e-12 * abs(float(e0r["error_all"]))
    assert int(e0["num_obs_valid"]) == int(e0r["num_obs_valid"])

    lin = s.linearize(cams, lmh_pad)
    lin_r = ref.linearize(cams, lmh)
    inc, _ = s.solve_power(lin, lam)
    inc_r, _ = ref.solve_power(lin_r, lam)
    d = np.abs(np.asarray(inc) - np.asarray(inc_r)).max() / (
        np.abs(np.asarray(inc_r)).max() + 1e-300
    )
    assert d < 1e-9, d
    nc, nl, ld = s.apply(cams, lmh_pad, lin, inc, lam)
    ncr, nlr, ldr = ref.apply(cams, lmh, lin_r, inc_r, lam)
    assert abs(float(ld) - float(ldr)) <= 1e-9 * abs(float(ldr))
    assert np.abs(s.unpad_landmarks(nl) - np.asarray(nlr)).max() < 1e-10
    assert np.abs(np.asarray(nc) - np.asarray(ncr)).max() < 1e-10


@pytest.mark.slow
def test_spmd_pure_f64_pipeline_fast_path_trajectory():
    """bundle_adjust with mixed_precision_solves=False on a mesh takes
    the fast path (NO fallback RuntimeWarning) and reproduces the
    single-chip f64 two-step trajectory decision-for-decision at f64
    tolerances."""
    import copy
    import warnings as _warnings

    from povar_tpu.problem.synthetic import synthetic_bal_problem
    from povar_tpu.solver.pipeline import bundle_adjust

    problem, _ = synthetic_bal_problem(
        n_cams=10, n_lms=60, obs_per_lm=4, seed=7
    )
    opts = SolverOptions()
    opts.mixed_precision_solves = False
    opts.max_num_iterations_step_1 = 4
    opts.max_num_iterations_step_2 = 3
    mesh = _mesh()
    p1 = copy.deepcopy(problem)
    p2 = copy.deepcopy(problem)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error", RuntimeWarning)
        _, s1a, s2a = bundle_adjust(
            p1, opts, log=lambda s: None, mesh=mesh
        )
    _, s1b, s2b = bundle_adjust(p2, opts, log=lambda s: None)

    for sa, sb, tol in ((s1a, s1b, 1e-9), (s2a, s2b, 1e-5)):
        ta = [
            (it.step_is_successful,
             it.cost.all.error if it.cost is not None else None)
            for it in sa.iterations
        ]
        tb = [
            (it.step_is_successful,
             it.cost.all.error if it.cost is not None else None)
            for it in sb.iterations
        ]
        assert len(ta) == len(tb)
        for (ok_a, c_a), (ok_b, c_b) in zip(ta, tb):
            assert ok_a == ok_b
            if c_a is not None and c_b is not None:
                assert abs(c_a - c_b) <= tol * max(abs(c_b), 1.0)
    assert np.all(np.isfinite(p1.cam_space))
    assert np.all(np.isfinite(p1.lm_p_h))
