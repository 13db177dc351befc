"""Banded direct CHOLESKY (solver/band_chol.py): primitive checks and
equivalence with a numpy-assembled dense reduced camera system.

Reference parity target: LinearizationSC + SimplicialLLT
(linearization_sc.hpp:236-245) has no camera-count ceiling; the banded
supernodal factorization provides the same capability above
stage1.DENSE_CHOL_MAX (the numpy anchor avoids compiling the solver's
dense [12N]^2 path, whose unrolled Cholesky is compile-heavy at 48
cameras).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from povar_tpu.options import SolverOptions, SolverType  # noqa: E402
from povar_tpu.problem.synthetic import (  # noqa: E402
    synthetic_bal_problem_fast,
)
from povar_tpu.solver import band_chol  # noqa: E402
from povar_tpu.solver import stage1 as stage1_mod  # noqa: E402
from povar_tpu.solver.stage1 import Stage1Solver  # noqa: E402


def test_blocked_dense_primitives():
    """Panelled Cholesky / triangular solves match numpy on a random
    SPD matrix."""
    rng = np.random.default_rng(0)
    K = 3
    B = 12 * K
    a = rng.standard_normal((B, B)).astype(np.float32)
    a = a @ a.T + B * np.eye(B, dtype=np.float32)
    l = np.asarray(band_chol._chol_blocked(jnp.asarray(a), K))
    l_ref = np.linalg.cholesky(a.astype(np.float64))
    np.testing.assert_allclose(l, l_ref, rtol=0, atol=2e-4)

    f = np.asarray(
        band_chol._tri_solve_right(jnp.asarray(a), jnp.asarray(l), K)
    )
    f_ref = a.astype(np.float64) @ np.linalg.inv(l_ref).T
    np.testing.assert_allclose(f, f_ref, rtol=0, atol=2e-3)

    v = rng.standard_normal(B).astype(np.float32)
    y = np.asarray(band_chol._fwd_solve(jnp.asarray(l), jnp.asarray(v), K))
    np.testing.assert_allclose(
        y, np.linalg.solve(l_ref, v), rtol=0, atol=1e-4
    )
    x = np.asarray(band_chol._bwd_solve(jnp.asarray(l), jnp.asarray(v), K))
    np.testing.assert_allclose(
        x, np.linalg.solve(l_ref.T, v), rtol=0, atol=1e-4
    )


@pytest.fixture(scope="module")
def banded_solver(monkeypatch_module):
    """A CHOLESKY Stage1Solver forced onto the banded path by lowering
    the dense ceiling below the problem size (48 cams -> S=2
    supernodes, real cross-supernode coupling)."""
    monkeypatch_module.setattr(stage1_mod, "DENSE_CHOL_MAX", 8)
    p = synthetic_bal_problem_fast(48, 600, 5, seed=3, locality=8)
    opts = SolverOptions()
    opts.solver_type_step_1 = SolverType.CHOLESKY
    s = Stage1Solver(
        p.obs_cam, p.obs_lm, p.obs_uv, p.num_cameras, p.num_landmarks,
        opts,
    )
    assert s._band_plan is not None
    cams = jnp.asarray(p.cam_space)
    lms = s.initialize_varproj(cams)
    lin = s.linearize(cams, lms)
    return s, lin


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


def _numpy_rcs(s, lin, lam):
    """Assemble the dense RCS in numpy from the SOLVER'S OWN prepared
    pieces (eager jnp evaluation — identical storage/scaling to both
    the dense and banded paths; only the final assembly + solve differ,
    which is exactly what the test compares)."""
    from povar_tpu.ops import linalg
    from povar_tpu.ops.small_einsum import small_einsum

    hll_inv, hll_inv_bl = s._prep_hll(
        s.obs, lin, jnp.asarray(lam, jnp.float64), False
    )
    b, hpp = s._prep_hpp_b(s.obs, lin, hll_inv_bl)
    hll_inv_chol = linalg.cholesky_smallf(hll_inv)
    w = small_einsum("kio,kjo->ijo", lin.Jp, lin.Jl)
    wl = np.asarray(
        small_einsum(
            "ijo,jko->iko", w, s._gather_lm_x(s.obs, hll_inv_chol)
        ),
        np.float64,
    )  # [12, 3, O]
    obs_cam = np.asarray(s.obs.cam)
    obs_lm = np.asarray(s.obs.lm)
    n = s.n_cams
    o = wl.shape[-1]

    a_mat = np.zeros((n * 12, (int(obs_lm.max()) + 1) * 3))
    rows = obs_cam[None, :] * 12 + np.arange(12)[:, None]  # [12, O]
    cols = obs_lm[None, :] * 3 + np.arange(3)[:, None]  # [3, O]
    np.add.at(
        a_mat,
        (rows[:, None, :], np.broadcast_to(cols[None], (12, 3, o))),
        wl,
    )
    s_mat = -a_mat @ a_mat.T
    hpp_np = np.asarray(hpp, np.float64)  # [12, 12, N]
    for i in range(n):
        s_mat[i * 12 : (i + 1) * 12, i * 12 : (i + 1) * 12] += (
            hpp_np[:, :, i] + float(lam) * np.eye(12)
        )
    return s_mat, np.asarray(b, np.float64)


def test_banded_matches_numpy_rcs(banded_solver):
    """The banded solve agrees with numpy's dense solve of the same
    reduced camera system (assembled from the identical storage)."""
    s, lin = banded_solver
    lam_f = 1e-3
    lam = jnp.asarray(lam_f, jnp.float64)
    inc_band, n_it = s.solve_cholesky(lin, lam)
    # direct solve: 0 linear-solver iterations (reference semantics,
    # changed alongside the executed-parity work)
    assert int(n_it) == 0
    s_mat, b = _numpy_rcs(s, lin, lam_f)
    inc_ref = -np.linalg.solve(
        s_mat, b.T.reshape(-1)
    ).reshape(-1, 12).T
    bnd = np.asarray(inc_band)
    assert np.all(np.isfinite(bnd))
    assert (
        np.linalg.norm(bnd - inc_ref) <= 5e-3 * np.linalg.norm(inc_ref)
    )


def test_band_plan_pair_count(banded_solver):
    """Pair stream covers every within-landmark observation pair."""
    s, _ = banded_solver
    w = np.asarray(s.obs.weight) if s.obs.weight is not None else None
    lm = np.asarray(s.obs.lm)
    if w is not None:
        lm = lm[w > 0]
    counts = np.bincount(lm, minlength=s.n_lms)
    base = int(np.sum(counts * (counts + 1) // 2))
    pairs = sum(len(c[0]) for c in s._band_plan.arrays.pair_chunks)
    assert pairs >= base  # same-position duplicates add a few
    assert pairs <= base + int(np.sum(counts * (counts - 1) // 2))
    assert s._band_plan.meta.S >= 2  # exercises supernode coupling


def test_cholesky_unbanded_falls_back_to_pcg():
    """CHOLESKY on a graph with no exploitable band structure at
    n_cams > DENSE_CHOL_MAX must warn and run via PCG instead of
    hard-failing (VERDICT r3 #7; the reference's SimplicialLLT factors
    any sparsity, linearization_sc.hpp:236-245)."""
    import warnings

    import jax.numpy as jnp
    import numpy as np
    import pytest

    from povar_tpu.options import SolverOptions, SolverType
    from povar_tpu.problem.synthetic import (
        synthetic_bal_problem_adversarial,
    )
    from povar_tpu.solver.stage1 import Stage1Solver

    p = synthetic_bal_problem_adversarial(
        4096, 6000, mean_obs_per_lm=5.0, loop_closure_frac=0.3, seed=11
    )
    o = SolverOptions()
    o.solver_type_step_1 = SolverType.CHOLESKY
    o.pallas_kernels = "off"
    with pytest.warns(RuntimeWarning, match="falling back to PCG"):
        s = Stage1Solver(
            p.obs_cam, p.obs_lm, p.obs_uv,
            p.num_cameras, p.num_landmarks, o,
        )
    assert s._chol_pcg_fallback
    assert s._band_plan is None

    cams = jnp.asarray(p.cam_space)
    lms = s.initialize_varproj(cams)
    lin = s.linearize(cams, lms)
    inc, n_iter = s.solve(lin, jnp.asarray(1e-4, jnp.float64))
    assert int(n_iter) >= 1  # CG iterations, not a direct solve
    assert bool(jnp.all(jnp.isfinite(inc)))
    # staged/timed dispatch takes the same fallback
    inc_t, n_t, t = s.solve_timed(lin, jnp.asarray(1e-4, jnp.float64))
    assert "solve_reduced_system" in t
    assert bool(jnp.all(jnp.isfinite(inc_t)))


def test_cholesky_unbanded_dense_direct(monkeypatch_module):
    """Unbandable graph WITHIN the dense-unbanded ceiling: the plan
    degenerates to the full band (bw = N - 1) and the solve stays a
    DIRECT factorization matching the numpy-assembled RCS (VERDICT r4
    #9 — CHOLESKY on arbitrary sparsity without dropping to PCG
    whenever the O(N^2) block table fits)."""
    import warnings

    from povar_tpu.problem.synthetic import (
        synthetic_bal_problem_adversarial,
    )

    # no band structure at tiny MAX_SUPERNODE; well under the ceiling
    monkeypatch_module.setattr(stage1_mod, "DENSE_CHOL_MAX", 8)
    monkeypatch_module.setattr(band_chol, "MAX_SUPERNODE", 4)
    p = synthetic_bal_problem_adversarial(
        48, 600, mean_obs_per_lm=5.0, loop_closure_frac=0.5, seed=7
    )
    o = SolverOptions()
    o.solver_type_step_1 = SolverType.CHOLESKY
    o.pallas_kernels = "off"
    with pytest.warns(RuntimeWarning, match="FULL dense RCS"):
        s = Stage1Solver(
            p.obs_cam, p.obs_lm, p.obs_uv,
            p.num_cameras, p.num_landmarks, o,
        )
    assert not s._chol_pcg_fallback
    assert s._band_plan is not None
    assert s._band_plan.meta.bw == p.num_cameras - 1

    cams = jnp.asarray(p.cam_space)
    lms = s.initialize_varproj(cams)
    lin = s.linearize(cams, lms)
    # lam sets the RCS conditioning; the f32 band assembly's ~3e-7
    # absolute block error amplifies by cond(S) through the solve
    lam = 1e-2
    inc, n_iter = s.solve(lin, jnp.asarray(lam, jnp.float64))
    assert int(n_iter) == 0  # direct solve, no CG loop
    s_mat, b = _numpy_rcs(s, lin, lam)
    inc_ref = -np.linalg.solve(
        s_mat, b.T.reshape(-1)
    ).reshape(p.num_cameras, 12).T
    bnd = np.asarray(inc)
    assert np.all(np.isfinite(bnd))
    assert (
        np.linalg.norm(bnd - inc_ref)
        <= 5e-3 * np.linalg.norm(inc_ref)
    )
