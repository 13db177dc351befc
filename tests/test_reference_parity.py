"""Executed reference parity (VERDICT r3 #1 + stretch): the
framework's step-1 AND step-2 trajectories against Eigen f64
reference harnesses.

csrc/ref_step1_solver.cpp re-implements the reference's step-1 pOSE
Power-VarProj LM solver (bal_bundle_adjustment.cpp:252-542 +
linearization_power_varproj.hpp + landmark_block.hpp math) in Eigen
double precision. Both solvers consume the *identical* start state (a
POVAR_STATE dump), so this is a measured decision-for-decision
comparison, not parity-by-reading:

  - accept/reject sequence identical
  - power-series term counts identical
  - per-iteration cost <= 1e-10 relative
  - lambda schedule (trust_region_radius) <= 1e-9 relative
  - final camera/landmark state <= 1e-8
  - mixed-precision mode reaches the same final cost

The framework side runs pure f64 with Pallas off (the bitwise-strict
configuration); a second test checks the default mixed-precision mode
lands on the same final cost.

csrc/ref_step2_solver.cpp is the step-2 companion (joint Riemannian
homogeneous refinement, bal_bundle_adjustment.cpp:557-843). The
framework's Householder tangent bases differ from the reference's
Eigen-COD bases, but the joint trajectory is invariant to the choice
of orthonormal kernel basis in exact arithmetic (damping is
Proj^T lambda Proj = lambda I in tangent coordinates; all tangent
norms in the zeta test are preserved by per-block orthogonal
re-parameterizations; every ambient quantity composes as
Proj f(Proj^T A Proj) Proj^T). So step 2 is ALSO checked
decision-for-decision; only the per-iteration cost tolerance is
looser (f64 rounding drifts under the basis change — measured ~1e-7
relative mid-trajectory, ~2e-6 by iteration 15).
"""

import json
import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from povar_tpu.options import SolverOptions
from povar_tpu.problem.bal_io import write_state_dump
from povar_tpu.problem.synthetic import synthetic_bal_problem
from povar_tpu.solver.lm import optimize_step1
from povar_tpu.solver.stage1 import Stage1Solver
from povar_tpu.utils.summary import SolverSummary
from povar_tpu.utils.timer import Timer

CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
HARNESS = os.path.join(CSRC, "ref_step1_solver")

MAX_ITERS = 15


def _build_harness():
    if not os.path.exists(HARNESS):
        r = subprocess.run(
            ["make", "-C", CSRC, "ref_step1_solver"],
            capture_output=True,
            timeout=300,
        )
        if r.returncode != 0 or not os.path.exists(HARNESS):
            pytest.skip(
                "cannot build Eigen reference harness: "
                + r.stderr.decode()[-500:]
            )


@pytest.fixture(scope="module")
def problem():
    # initialization-free config: random N(0,1) cameras, the landmarks
    # are replaced by the closed-form VarProj init at iteration 0
    prob, _ = synthetic_bal_problem(
        n_cams=10, n_lms=60, obs_per_lm=5, seed=20240819, noise=0.01
    )
    prob.sort_observations()
    return prob


@pytest.fixture(scope="module")
def ref_run(problem, tmp_path_factory):
    _build_harness()
    state = str(tmp_path_factory.mktemp("ref") / "state.txt")
    write_state_dump(
        problem,
        state,
        alpha=0.01,
        power_sc_iterations=10,
        max_iters=MAX_ITERS,
        eta=1e-2,
        function_tolerance=1e-6,
    )
    r = subprocess.run(
        [HARNESS, state], capture_output=True, timeout=300
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    return json.loads(r.stdout.decode())


def _solve_framework(problem, mixed: bool):
    opts = SolverOptions()
    opts.mixed_precision_solves = mixed
    opts.pallas_kernels = "off"
    opts.device_lm_loop = "off"  # see the note in the solver matrix test
    opts.max_num_iterations_step_1 = MAX_ITERS
    s1 = Stage1Solver(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        opts,
        dtype=jnp.float64,
    )
    summary = SolverSummary()
    cams, lms = optimize_step1(
        s1,
        jnp.asarray(problem.cam_space, jnp.float64),
        jnp.asarray(problem.lm_p, jnp.float64),
        opts,
        summary,
        Timer(),
        log=lambda s: None,
    )
    return np.asarray(cams), np.asarray(lms), summary


@pytest.mark.quick
def test_step1_trajectory_matches_reference(problem, ref_run):
    """Decision-for-decision + cost parity of the pure-f64 mode."""
    cams, lms, summary = _solve_framework(problem, mixed=False)
    ref_iters = ref_run["iterations"]
    fw_iters = summary.iterations

    assert len(fw_iters) == len(ref_iters), (
        f"iteration counts differ: framework {len(fw_iters)} vs "
        f"reference {len(ref_iters)}"
    )

    # the trajectory must contain real dynamics to be a meaningful
    # check: some accepts, and multiple inner power iterations
    accepts = [r["accept"] for r in ref_iters[1:]]
    assert sum(accepts) >= 5

    for k, (fw, ref) in enumerate(zip(fw_iters, ref_iters)):
        assert fw.step_is_successful == ref["accept"], f"iteration {k}"
        assert fw.step_is_valid == ref["valid"], f"iteration {k}"
        if k == 0:
            fw_cost = fw.cost.all.error
            assert fw_cost == pytest.approx(ref["cost"], rel=1e-12)
            continue
        assert fw.linear_solver_iterations == ref["lin_iters"], (
            f"iteration {k}: power-series terms "
            f"{fw.linear_solver_iterations} vs {ref['lin_iters']}"
        )
        if ref["valid"]:
            assert fw.cost.all.error == pytest.approx(
                ref["cost"], rel=1e-10
            ), f"iteration {k}"
            assert fw.relative_decrease == pytest.approx(
                ref["relative_decrease"], rel=1e-6
            ), f"iteration {k}"
        assert fw.trust_region_radius == pytest.approx(
            ref["trust_region_radius"], rel=1e-9
        ), f"iteration {k}"

    ref_cams = np.array(ref_run["final_cams"]).reshape(-1, 3, 4)
    ref_lms = np.array(ref_run["final_lms"]).reshape(-1, 3)
    np.testing.assert_allclose(cams, ref_cams, rtol=0, atol=1e-8)
    np.testing.assert_allclose(lms, ref_lms, rtol=0, atol=1e-8)

    assert summary.final_cost.all.error == pytest.approx(
        ref_run["final_cost"], rel=1e-10
    )


def test_step1_mixed_mode_final_cost_matches_reference(
    problem, tmp_path
):
    """The default mixed-precision mode must reach the reference's
    final cost (the eta-forcing tolerance dominates the f32 inner-solve
    inexactness; trajectories legitimately differ, so both runs go to
    function_tolerance termination and the converged costs are
    compared)."""
    _build_harness()
    state = str(tmp_path / "state.txt")
    write_state_dump(
        problem,
        state,
        alpha=0.01,
        power_sc_iterations=10,
        max_iters=50,
        eta=1e-2,
        function_tolerance=1e-6,
    )
    r = subprocess.run(
        [HARNESS, state], capture_output=True, timeout=300
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    ref = json.loads(r.stdout.decode())
    assert ref["termination"] == "CONVERGENCE"

    opts = SolverOptions()
    opts.mixed_precision_solves = True
    opts.pallas_kernels = "off"
    opts.max_num_iterations_step_1 = 50
    s1 = Stage1Solver(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        opts,
        dtype=jnp.float64,
    )
    summary = SolverSummary()
    optimize_step1(
        s1,
        jnp.asarray(problem.cam_space, jnp.float64),
        jnp.asarray(problem.lm_p, jnp.float64),
        opts,
        summary,
        Timer(),
        log=lambda s: None,
    )
    # both runs terminate via the per-step function_tolerance test,
    # which leaves a stopping plateau wider than ftol itself (steps
    # decay geometrically; the remaining distance to the optimum can be
    # ~100x the last step). The meaningful criterion is therefore: the
    # mixed-mode converged cost is at least as good as the reference's,
    # up to ftol-scale slack. (Measured here: mixed lands ~1.6e-4
    # relative BELOW the reference's stopping cost.)
    fw_cost = summary.final_cost.all.error
    assert fw_cost <= ref["final_cost"] * (1 + 5e-5), (
        f"mixed-mode cost {fw_cost} worse than reference "
        f"{ref['final_cost']}"
    )
    assert fw_cost == pytest.approx(ref["final_cost"], rel=5e-4)


# ---------------------------------------------------------------------------
# the full solver matrix: PCG / CHOLESKY / POWER_SCHUR_COMPLEMENT and
# robust norms, decision-for-decision (VERDICT r4 #1/#6)
#
# The harness implements all four step-1 linear solvers (explicit-SC
# assembly linearization_sc.hpp:403-450, Ceres CG
# cg/conjugate_gradient.hpp:114-301 with SCHUR_JACOBI
# cg/preconditioner.hpp:70-144, dense LLT for solve_direct_pOSE
# linearization_sc.hpp:236-245, and the landmark-damped poBA variant
# landmark_block.hpp:511-572) plus HUBER/CAUCHY weighting
# (helper.cpp:50-74). Solver and robust norm are argv selectors on the
# same state dump, so every combo consumes the identical start state.

from povar_tpu.options import RobustNorm, SolverType

MATRIX = [
    # (harness argv solver, framework enum, robust, huber_param)
    ("power_sc", SolverType.POWER_SCHUR_COMPLEMENT, "none", 1.0),
    ("pcg", SolverType.PCG, "none", 1.0),
    ("cholesky", SolverType.CHOLESKY, "none", 1.0),
    ("power_varproj", SolverType.POWER_VARPROJ, "huber", 1.0),
    ("power_varproj", SolverType.POWER_VARPROJ, "cauchy", 1.0),
    ("pcg", SolverType.PCG, "huber", 1.0),
]


@pytest.fixture(scope="module")
def state_file(problem, tmp_path_factory):
    _build_harness()
    state = str(tmp_path_factory.mktemp("refmx") / "state.txt")
    write_state_dump(
        problem,
        state,
        alpha=0.01,
        power_sc_iterations=10,
        max_iters=MAX_ITERS,
        eta=1e-2,
        function_tolerance=1e-6,
    )
    return state


@pytest.mark.parametrize(
    "hsolver,fsolver,robust,hparam",
    MATRIX,
    ids=[f"{h}-{r}" for h, _, r, _ in MATRIX],
)
def test_step1_solver_matrix_matches_reference(
    problem, state_file, hsolver, fsolver, robust, hparam
):
    """Executed decision-for-decision parity for every step-1 linear
    solver and robust norm against the Eigen f64 harness."""
    cmd = [HARNESS, state_file, hsolver]
    if robust != "none":
        cmd += [robust, str(hparam)]
    r = subprocess.run(cmd, capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    ref_run = json.loads(r.stdout.decode())

    opts = SolverOptions()
    opts.mixed_precision_solves = False
    # host-driven loop: the tight decision-for-decision tolerances
    # here pin the ALGORITHM against the Eigen harness; the device
    # loop's fusion-context ulps are covered by test_device_loop.py
    opts.device_lm_loop = "off"
    opts.pallas_kernels = "off"
    opts.max_num_iterations_step_1 = MAX_ITERS
    opts.solver_type_step_1 = fsolver
    opts.residual.robust_norm = RobustNorm[robust.upper()] \
        if robust != "none" else RobustNorm.NONE
    opts.residual.huber_parameter = hparam
    s1 = Stage1Solver(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        opts,
        dtype=jnp.float64,
    )
    summary = SolverSummary()
    cams, lms = optimize_step1(
        s1,
        jnp.asarray(problem.cam_space, jnp.float64),
        jnp.asarray(problem.lm_p, jnp.float64),
        opts,
        summary,
        Timer(),
        log=lambda s: None,
    )

    ref_iters = ref_run["iterations"]
    fw_iters = summary.iterations
    assert len(fw_iters) == len(ref_iters), (
        f"iteration counts differ: framework {len(fw_iters)} vs "
        f"reference {len(ref_iters)}"
    )
    assert sum(r_["accept"] for r_ in ref_iters[1:]) >= 5

    for k, (fw, ref) in enumerate(zip(fw_iters, ref_iters)):
        assert fw.step_is_successful == ref["accept"], f"iteration {k}"
        assert fw.step_is_valid == ref["valid"], f"iteration {k}"
        if k == 0:
            assert fw.cost.all.error == pytest.approx(
                ref["cost"], rel=1e-12
            )
            continue
        # CG iteration counts / power-series term counts / 0 for the
        # direct solve — exact match required
        assert fw.linear_solver_iterations == ref["lin_iters"], (
            f"iteration {k}: linear-solver iterations "
            f"{fw.linear_solver_iterations} vs {ref['lin_iters']}"
        )
        if ref["valid"]:
            assert fw.cost.all.error == pytest.approx(
                ref["cost"], rel=1e-8
            ), f"iteration {k}"
        assert fw.trust_region_radius == pytest.approx(
            ref["trust_region_radius"], rel=1e-6
        ), f"iteration {k}"

    ref_cams = np.array(ref_run["final_cams"]).reshape(-1, 3, 4)
    ref_lms = np.array(ref_run["final_lms"]).reshape(-1, 3)
    np.testing.assert_allclose(cams, ref_cams, rtol=0, atol=1e-6)
    np.testing.assert_allclose(lms, ref_lms, rtol=0, atol=1e-6)
    assert summary.final_cost.all.error == pytest.approx(
        ref_run["final_cost"], rel=1e-9
    )


# ---------------------------------------------------------------------------
# mid-scale parity (VERDICT r4 #7): the toy fixtures above are
# 10 cams / 60 lms; the venice-89 solver matrix runs at 89 cams /
# 110k lms. This tier closes the conditioning-stress evidence gap in
# between: a 50-cam / 4000-lm / 24k-obs trajectory for 20 iterations,
# decision-for-decision against the Eigen harness (~seconds per run
# single-thread; nightly `slow` tier).

MAX_ITERS_MID = 20


@pytest.fixture(scope="module")
def midscale_problem():
    prob, _ = synthetic_bal_problem(
        n_cams=50, n_lms=4000, obs_per_lm=6, seed=20250820, noise=0.01
    )
    prob.sort_observations()
    return prob


@pytest.mark.slow
@pytest.mark.parametrize(
    "hsolver,fsolver",
    [
        ("power_varproj", SolverType.POWER_VARPROJ),
        ("pcg", SolverType.PCG),
        ("power_sc", SolverType.POWER_SCHUR_COMPLEMENT),
        ("cholesky", SolverType.CHOLESKY),
    ],
)
def test_step1_midscale_trajectory_matches_reference(
    midscale_problem, tmp_path, hsolver, fsolver
):
    """Decision-for-decision step-1 parity at 4000 landmarks — the
    conditioning regime between the toy fixture and the venice-89
    scale where the solver matrix shows solver-dependent behavior."""
    problem = midscale_problem
    _build_harness()
    state = str(tmp_path / "state_mid.txt")
    write_state_dump(
        problem,
        state,
        alpha=0.01,
        power_sc_iterations=10,
        max_iters=MAX_ITERS_MID,
        eta=1e-2,
        function_tolerance=1e-6,
    )
    r = subprocess.run(
        [HARNESS, state, hsolver], capture_output=True, timeout=1800
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    ref_run = json.loads(r.stdout.decode())

    opts = SolverOptions()
    opts.mixed_precision_solves = False
    opts.device_lm_loop = "off"  # algorithm pin (see matrix test note)
    opts.pallas_kernels = "off"
    opts.max_num_iterations_step_1 = MAX_ITERS_MID
    opts.solver_type_step_1 = fsolver
    s1 = Stage1Solver(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        opts,
        dtype=jnp.float64,
    )
    summary = SolverSummary()
    cams, lms = optimize_step1(
        s1,
        jnp.asarray(problem.cam_space, jnp.float64),
        jnp.asarray(problem.lm_p, jnp.float64),
        opts,
        summary,
        Timer(),
        log=lambda s: None,
    )

    ref_iters = ref_run["iterations"]
    fw_iters = summary.iterations
    assert len(fw_iters) == len(ref_iters), (
        f"iteration counts differ: framework {len(fw_iters)} vs "
        f"reference {len(ref_iters)}"
    )
    assert sum(r_["accept"] for r_ in ref_iters[1:]) >= 8

    for k, (fw, ref) in enumerate(zip(fw_iters, ref_iters)):
        assert fw.step_is_successful == ref["accept"], f"iteration {k}"
        assert fw.step_is_valid == ref["valid"], f"iteration {k}"
        if k == 0:
            assert fw.cost.all.error == pytest.approx(
                ref["cost"], rel=1e-12
            )
            continue
        assert fw.linear_solver_iterations == ref["lin_iters"], (
            f"iteration {k}: linear-solver iterations "
            f"{fw.linear_solver_iterations} vs {ref['lin_iters']}"
        )
        if ref["valid"]:
            # 400x more terms in the cost reduction than the toy
            # fixture -> more f64 summation-order drift; measured
            # <=2e-9 relative at iteration 20
            assert fw.cost.all.error == pytest.approx(
                ref["cost"], rel=1e-7
            ), f"iteration {k}"
        assert fw.trust_region_radius == pytest.approx(
            ref["trust_region_radius"], rel=1e-5
        ), f"iteration {k}"

    assert summary.final_cost.all.error == pytest.approx(
        ref_run["final_cost"], rel=1e-8
    )


# ---------------------------------------------------------------------------
# step 2: joint Riemannian homogeneous refinement

HARNESS2 = os.path.join(CSRC, "ref_step2_solver")

MAX_ITERS_2 = 15


def _build_harness2():
    if not os.path.exists(HARNESS2):
        r = subprocess.run(
            ["make", "-C", CSRC, "ref_step2_solver"],
            capture_output=True,
            timeout=300,
        )
        if r.returncode != 0 or not os.path.exists(HARNESS2):
            pytest.skip(
                "cannot build Eigen step-2 reference harness: "
                + r.stderr.decode()[-500:]
            )


@pytest.fixture(scope="module")
def joint_state(problem):
    """Post-boundary joint state: a short pure-f64 step-1 run, then
    the homogenize+normalize boundary (create_homogeneous_landmark,
    cpp:544-553) — the exact state step 2 starts from."""
    from povar_tpu.solver.stage2 import create_homogeneous

    opts = SolverOptions()
    opts.mixed_precision_solves = False
    # host-driven loop: the tight decision-for-decision tolerances
    # here pin the ALGORITHM against the Eigen harness; the device
    # loop's fusion-context ulps are covered by test_device_loop.py
    opts.device_lm_loop = "off"
    opts.pallas_kernels = "off"
    opts.max_num_iterations_step_1 = 8
    s1 = Stage1Solver(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        opts,
        dtype=jnp.float64,
    )
    cams, lms = optimize_step1(
        s1,
        jnp.asarray(problem.cam_space, jnp.float64),
        jnp.asarray(problem.lm_p, jnp.float64),
        opts,
        SolverSummary(),
        Timer(),
        log=lambda s: None,
    )
    return create_homogeneous(cams, lms)


@pytest.fixture(scope="module")
def ref_run2(problem, joint_state, tmp_path_factory):
    from povar_tpu.problem.bal_io import write_state_dump_homogeneous

    _build_harness2()
    cams_h, lms_h = joint_state
    state = str(tmp_path_factory.mktemp("ref2") / "state2.txt")
    write_state_dump_homogeneous(
        np.asarray(cams_h),
        np.asarray(lms_h),
        problem.obs_lm,
        problem.obs_cam,
        problem.obs_uv,
        state,
        power_sc_iterations=10,
        max_iters=MAX_ITERS_2,
        eta=1e-2,
        function_tolerance=1e-6,
    )
    r = subprocess.run(
        [HARNESS2, state], capture_output=True, timeout=300
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    return json.loads(r.stdout.decode())


def test_step2_trajectory_matches_reference(problem, joint_state, ref_run2):
    """Step-2 decision-for-decision parity (see module docstring for
    why the Householder-vs-COD basis difference does not break it)."""
    from povar_tpu.solver.lm import optimize_step2
    from povar_tpu.solver.stage2 import Stage2Solver

    opts = SolverOptions()
    opts.mixed_precision_solves = False
    # host-driven loop: the tight decision-for-decision tolerances
    # here pin the ALGORITHM against the Eigen harness; the device
    # loop's fusion-context ulps are covered by test_device_loop.py
    opts.device_lm_loop = "off"
    opts.pallas_kernels = "off"
    opts.max_num_iterations_step_2 = MAX_ITERS_2
    s2 = Stage2Solver(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        opts,
        dtype=jnp.float64,
    )
    summary = SolverSummary()
    cams_h, lms_h = joint_state
    optimize_step2(
        s2, cams_h, lms_h, opts, summary, Timer(), log=lambda s: None
    )

    ref_iters = ref_run2["iterations"]
    fw_iters = summary.iterations
    assert len(fw_iters) == len(ref_iters), (
        f"iteration counts differ: framework {len(fw_iters)} vs "
        f"reference {len(ref_iters)}"
    )
    accepts = [r["accept"] for r in ref_iters[1:]]
    rejects = [not a for a in accepts]
    # the trajectory must contain real dynamics: accepts AND rejects
    assert sum(accepts) >= 5 and sum(rejects) >= 2

    for k, (fw, ref) in enumerate(zip(fw_iters, ref_iters)):
        assert fw.step_is_successful == ref["accept"], f"iteration {k}"
        assert fw.step_is_valid == ref["valid"], f"iteration {k}"
        if k == 0:
            assert fw.cost.all.error == pytest.approx(
                ref["cost"], rel=1e-12
            )
            continue
        assert fw.linear_solver_iterations == ref["lin_iters"], (
            f"iteration {k}: power-series terms "
            f"{fw.linear_solver_iterations} vs {ref['lin_iters']}"
        )
        if ref["valid"]:
            # basis-change f64 drift: measured ~1e-9 early, ~2e-6 by
            # iteration 15; gate at 1e-4
            assert fw.cost.all.error == pytest.approx(
                ref["cost"], rel=1e-4
            ), f"iteration {k}"

    assert summary.final_cost.all.error == pytest.approx(
        ref_run2["final_cost"], rel=1e-4
    )


@pytest.fixture(scope="module")
def state2_file(problem, joint_state, tmp_path_factory):
    from povar_tpu.problem.bal_io import write_state_dump_homogeneous

    _build_harness2()
    cams_h, lms_h = joint_state
    state = str(tmp_path_factory.mktemp("refmx2") / "state2.txt")
    write_state_dump_homogeneous(
        np.asarray(cams_h),
        np.asarray(lms_h),
        problem.obs_lm,
        problem.obs_cam,
        problem.obs_uv,
        state,
        power_sc_iterations=10,
        max_iters=MAX_ITERS_2,
        eta=1e-2,
        function_tolerance=1e-6,
    )
    return state


def test_step2_ripcg_trajectory_matches_reference(
    problem, joint_state, state2_file
):
    """RIPCG step-2 parity: the Ceres CG loop on the implicit tangent
    RCS (linearizor_sc.cpp:245-325) against the harness's explicit
    11-block assembly. CG iteration counts must match exactly; the
    per-iteration cost tolerance is looser than RIPOBA's because CG
    iterates amplify the Householder-vs-COD basis f64 drift (measured
    <=6.2e-5 relative by iteration 15)."""
    from povar_tpu.options import SolverTypeRiemannian
    from povar_tpu.solver.lm import optimize_step2
    from povar_tpu.solver.stage2 import Stage2Solver

    r = subprocess.run(
        [HARNESS2, state2_file, "ripcg"], capture_output=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    ref_run = json.loads(r.stdout.decode())

    opts = SolverOptions()
    opts.mixed_precision_solves = False
    # host-driven loop: the tight decision-for-decision tolerances
    # here pin the ALGORITHM against the Eigen harness; the device
    # loop's fusion-context ulps are covered by test_device_loop.py
    opts.device_lm_loop = "off"
    opts.pallas_kernels = "off"
    opts.max_num_iterations_step_2 = MAX_ITERS_2
    opts.solver_type_step_2 = SolverTypeRiemannian.RIPCG
    s2 = Stage2Solver(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        opts,
        dtype=jnp.float64,
    )
    summary = SolverSummary()
    cams_h, lms_h = joint_state
    optimize_step2(
        s2, cams_h, lms_h, opts, summary, Timer(), log=lambda s: None
    )

    ref_iters = ref_run["iterations"]
    fw_iters = summary.iterations
    assert len(fw_iters) == len(ref_iters), (
        f"iteration counts differ: framework {len(fw_iters)} vs "
        f"reference {len(ref_iters)}"
    )
    accepts = [r_["accept"] for r_ in ref_iters[1:]]
    assert sum(accepts) >= 5 and sum(1 for a in accepts if not a) >= 2

    for k, (fw, ref) in enumerate(zip(fw_iters, ref_iters)):
        assert fw.step_is_successful == ref["accept"], f"iteration {k}"
        assert fw.step_is_valid == ref["valid"], f"iteration {k}"
        if k == 0:
            assert fw.cost.all.error == pytest.approx(
                ref["cost"], rel=1e-12
            )
            continue
        assert fw.linear_solver_iterations == ref["lin_iters"], (
            f"iteration {k}: CG iterations "
            f"{fw.linear_solver_iterations} vs {ref['lin_iters']}"
        )
        if ref["valid"]:
            assert fw.cost.all.error == pytest.approx(
                ref["cost"], rel=1e-3
            ), f"iteration {k}"

    assert summary.final_cost.all.error == pytest.approx(
        ref_run["final_cost"], rel=1e-3
    )


# ---------------------------------------------------------------------------
# mid-scale step-2 parity: the step-1 mid-scale tier above leaves the
# joint Riemannian stage pinned only at 10 cams / 60 lms; this run
# closes the symmetric gap at 50 cams / 4000 lms / 24k obs,
# decision-for-decision against the Eigen joint harness (nightly
# `slow` tier, like the step-1 mid-scale test).


@pytest.fixture(scope="module")
def midscale_joint_state(midscale_problem):
    """Post-boundary joint state at mid-scale: a short pure-f64 step-1
    run, then the homogenize+normalize boundary
    (create_homogeneous_landmark, bal_bundle_adjustment.cpp:544-553)."""
    from povar_tpu.solver.stage2 import create_homogeneous

    problem = midscale_problem
    opts = SolverOptions()
    opts.mixed_precision_solves = False
    opts.device_lm_loop = "off"  # algorithm pin (see matrix test note)
    opts.pallas_kernels = "off"
    opts.max_num_iterations_step_1 = 8
    s1 = Stage1Solver(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        opts,
        dtype=jnp.float64,
    )
    cams, lms = optimize_step1(
        s1,
        jnp.asarray(problem.cam_space, jnp.float64),
        jnp.asarray(problem.lm_p, jnp.float64),
        opts,
        SolverSummary(),
        Timer(),
        log=lambda s: None,
    )
    return create_homogeneous(cams, lms)


@pytest.mark.slow
@pytest.mark.parametrize("hsolver", ["ripoba", "ripcg"])
def test_step2_midscale_trajectory_matches_reference(
    midscale_problem, midscale_joint_state, tmp_path, hsolver
):
    """Decision-for-decision step-2 parity at 4000 landmarks for both
    Riemannian solvers. Basis-change f64 drift (Householder here vs
    Eigen-COD there) grows with the term count, so per-iteration cost
    gates are looser than the toy fixture's — the decisions, power/CG
    iteration counts, and iteration count must still match exactly."""
    from povar_tpu.options import SolverTypeRiemannian
    from povar_tpu.problem.bal_io import write_state_dump_homogeneous
    from povar_tpu.solver.lm import optimize_step2
    from povar_tpu.solver.stage2 import Stage2Solver

    problem = midscale_problem
    _build_harness2()
    cams_h, lms_h = midscale_joint_state
    state = str(tmp_path / "state2_mid.txt")
    write_state_dump_homogeneous(
        np.asarray(cams_h),
        np.asarray(lms_h),
        problem.obs_lm,
        problem.obs_cam,
        problem.obs_uv,
        state,
        power_sc_iterations=10,
        max_iters=MAX_ITERS_2,
        eta=1e-2,
        function_tolerance=1e-6,
    )
    r = subprocess.run(
        [HARNESS2, state, hsolver], capture_output=True, timeout=1800
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    ref_run = json.loads(r.stdout.decode())

    opts = SolverOptions()
    opts.mixed_precision_solves = False
    opts.device_lm_loop = "off"  # algorithm pin (see matrix test note)
    opts.pallas_kernels = "off"
    opts.max_num_iterations_step_2 = MAX_ITERS_2
    opts.solver_type_step_2 = (
        SolverTypeRiemannian.RIPCG
        if hsolver == "ripcg"
        else SolverTypeRiemannian.RIPOBA
    )
    s2 = Stage2Solver(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        opts,
        dtype=jnp.float64,
    )
    summary = SolverSummary()
    optimize_step2(
        s2, cams_h, lms_h, opts, summary, Timer(), log=lambda s: None
    )

    ref_iters = ref_run["iterations"]
    fw_iters = summary.iterations
    assert len(fw_iters) == len(ref_iters), (
        f"iteration counts differ: framework {len(fw_iters)} vs "
        f"reference {len(ref_iters)}"
    )
    assert sum(r_["accept"] for r_ in ref_iters[1:]) >= 5

    for k, (fw, ref) in enumerate(zip(fw_iters, ref_iters)):
        assert fw.step_is_successful == ref["accept"], f"iteration {k}"
        assert fw.step_is_valid == ref["valid"], f"iteration {k}"
        if k == 0:
            assert fw.cost.all.error == pytest.approx(
                ref["cost"], rel=1e-12
            )
            continue
        assert fw.linear_solver_iterations == ref["lin_iters"], (
            f"iteration {k}: linear-solver iterations "
            f"{fw.linear_solver_iterations} vs {ref['lin_iters']}"
        )
        if ref["valid"]:
            assert fw.cost.all.error == pytest.approx(
                ref["cost"], rel=1e-3
            ), f"iteration {k}"

    assert summary.final_cost.all.error == pytest.approx(
        ref_run["final_cost"], rel=1e-3
    )
