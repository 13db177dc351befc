"""Step-1 pOSE VarProj linearization and linear solvers, TPU-native.

This module replaces, as pure jit-ed array programs:
  - LandmarkBlockSC pOSE storage + ops      (sc/landmark_block.hpp:58-760)
  - LinearizationVarProj                    (sc/linearization_varproj.hpp)
  - LinearizationPowerVarproj               (sc/linearization_power_varproj.hpp)
  - LinearizationSC explicit-SC paths       (sc/linearization_sc.hpp)
  - LinearizorPowerVarproj / LinearizorSC   (solver/linearizor_*.cpp)

Data layout: flat observation-major arrays (see problem.problem). The
reference's per-landmark `storage_pOSE_ [4k x 16]` row blocks become
  Jp [O, 4, 12], Jl [O, 4, 3], r [O, 4]
and every TBB loop + mutex scatter becomes einsum + segment_sum over
the camera-landmark bipartite graph. All per-camera 12x12 and
per-landmark 3x3 factorizations are batched hand-rolled kernels
(ops/linalg) that map onto VPU/MXU without LAPACK custom calls.

A `Stage1Solver` instance holds one problem's static structure and
jit-compiled callables; the observation arrays flow through every jitted
function as an explicit `Obs` pytree argument (NOT closure captures —
captured arrays get baked into the executable as constant literals,
which bloats multi-hundred-MB programs and defeats donation), and
dynamic state (cameras [N,3,4], landmarks [M,3], damping lambda) flows
through arguments so LM backtracking never recompiles.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from povar_tpu.ops import linalg, pose_math
from povar_tpu.options import RobustNorm, SolverOptions, SolverType
from povar_tpu.solver import pcg as pcg_mod
from povar_tpu.solver.common import accumulate_residual_info, segment_sum

_ROBUST_CODE = {
    RobustNorm.NONE: pose_math.ROBUST_NONE,
    RobustNorm.HUBER: pose_math.ROBUST_HUBER,
    RobustNorm.CAUCHY: pose_math.ROBUST_CAUCHY,
}


class Obs(NamedTuple):
    """Static problem structure as a pytree: per-observation camera /
    landmark indices, measurements, and the optional 0/1 padding weight
    (multi-chip sharding pads O to a multiple of the mesh size; padded
    rows contribute exactly zero everywhere)."""

    cam: jnp.ndarray  # [O] i32
    lm: jnp.ndarray  # [O] i32
    uv: jnp.ndarray  # [O, 2]
    weight: Optional[jnp.ndarray]  # [O] or None


class Lin1(NamedTuple):
    """Step-1 linearization point (the 'storage' after stage 1+2 scaling:
    Jl columns scaled per landmark, Jp columns scaled per camera)."""

    Jp: jnp.ndarray  # [O, 4, 12] scaled
    Jl: jnp.ndarray  # [O, 4, 3] scaled
    r: jnp.ndarray  # [O, 4] sqrt-weighted residuals
    pose_scale: jnp.ndarray  # [N, 12]
    jl_scale: jnp.ndarray  # [M, 3]


def _mask_rows(obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded observation rows (no-op when unpadded)."""
    if obs.weight is None:
        return x
    w = obs.weight.reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.where(w > 0, x, 0.0)


class Stage1Solver:
    def __init__(
        self,
        obs_cam: jnp.ndarray,
        obs_lm: jnp.ndarray,
        obs_uv: jnp.ndarray,
        num_cameras: int,
        num_landmarks: int,
        options: SolverOptions,
        dtype=jnp.float64,
        obs_weight=None,
    ):
        self.obs = Obs(
            cam=jnp.asarray(obs_cam, jnp.int32),
            lm=jnp.asarray(obs_lm, jnp.int32),
            uv=jnp.asarray(obs_uv, dtype),
            weight=(
                None if obs_weight is None else jnp.asarray(obs_weight, dtype)
            ),
        )
        self.n_cams = int(num_cameras)
        self.n_lms = int(num_landmarks)
        self.opts = options
        self.dtype = dtype
        self.alpha = float(options.alpha)
        self.robust = _ROBUST_CODE[options.residual.robust_norm]
        self.huber = float(options.residual.huber_parameter)
        self.jacobi_eps = options.effective_jacobi_scaling_epsilon(dtype)
        self.power_m = int(options.power_sc_iterations)

        self._jit_compute_error = jax.jit(self._compute_error)
        self._jit_initialize_varproj = jax.jit(self._initialize_varproj)
        self._jit_linearize = jax.jit(self._linearize)
        self._jit_solve_power = jax.jit(
            self._solve_power, static_argnames=("landmark_damping",)
        )
        self._jit_solve_pcg = jax.jit(self._solve_pcg)
        self._jit_solve_cholesky = jax.jit(self._solve_cholesky)
        self._jit_apply = jax.jit(self._apply)
        self._jit_apply_poba = jax.jit(self._apply_poba)

    # convenience aliases (tests, tools)
    @property
    def obs_cam(self):
        return self.obs.cam

    @property
    def obs_lm(self):
        return self.obs.lm

    @property
    def obs_uv(self):
        return self.obs.uv

    # ------------------------------------------------------ public API
    # (bound to this problem's obs arrays; old call signatures preserved)

    def compute_error(self, cam_space, lm_p):
        return self._jit_compute_error(self.obs, cam_space, lm_p)

    def initialize_varproj(self, cam_space):
        return self._jit_initialize_varproj(self.obs, cam_space)

    def linearize(self, cam_space, lm_p):
        return self._jit_linearize(self.obs, cam_space, lm_p)

    def solve_power(self, lin, lam, landmark_damping=False):
        return self._jit_solve_power(
            self.obs, lin, lam, landmark_damping=landmark_damping
        )

    def solve_pcg(self, lin, lam):
        return self._jit_solve_pcg(self.obs, lin, lam)

    def solve_cholesky(self, lin, lam):
        return self._jit_solve_cholesky(self.obs, lin, lam)

    def apply(self, cam_space, lm_p, lin, inc_scaled):
        return self._jit_apply(self.obs, cam_space, lm_p, lin, inc_scaled)

    def apply_poba(self, cam_space, lm_p, lin, inc_scaled, lam):
        return self._jit_apply_poba(
            self.obs, cam_space, lm_p, lin, inc_scaled, lam
        )

    def solve(
        self, lin: Lin1, lam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Dispatch on solver_type_step_1 (linearizor.cpp:46-61 factory)."""
        st = self.opts.solver_type_step_1
        if st == SolverType.POWER_VARPROJ:
            return self.solve_power(lin, lam, landmark_damping=False)
        if st == SolverType.POWER_SCHUR_COMPLEMENT:
            return self.solve_power(lin, lam, landmark_damping=True)
        if st == SolverType.PCG:
            return self.solve_pcg(lin, lam)
        if st == SolverType.CHOLESKY:
            return self.solve_cholesky(lin, lam)
        raise ValueError(f"unknown step-1 solver type {st}")

    # -------------------------------------------------------------- utils

    def _seg_cam(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        return segment_sum(x, obs.cam, self.n_cams)

    def _seg_lm(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        return segment_sum(x, obs.lm, self.n_lms, sorted_=True)

    # ------------------------------------------------------ error / init

    def _compute_error(
        self, obs: Obs, cam_space: jnp.ndarray, lm_p: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """compute_error_pOSE (helper.cpp:116-154). pOSE projections are
        always 'valid' (linearize_point_pOSE sets projection_valid=true
        unconditionally, helper.cpp:263)."""
        P = cam_space[obs.cam]
        x = lm_p[obs.lm]
        r = _mask_rows(
            obs, pose_math.pose_residual(P, x, obs.uv, self.alpha)
        )
        res_sq = jnp.sum(r * r, axis=-1)
        err, _w = pose_math.robust_error_and_weight(
            res_sq, self.robust, self.huber
        )
        finite = jnp.all(jnp.isfinite(r), axis=-1)
        valid = jnp.ones_like(finite)
        if obs.weight is not None:
            active = obs.weight > 0
            err = jnp.where(active, err, 0.0)
            valid = active
            finite = jnp.logical_or(finite, ~active)
        return accumulate_residual_info(err, jnp.sqrt(res_sq), valid, finite)

    def _initialize_varproj(
        self, obs: Obs, cam_space: jnp.ndarray
    ) -> jnp.ndarray:
        """Closed-form VarProj landmark init v*(u0) = (G^T G)^-1 G^T z
        (helper.cpp:75-99 via normal equations instead of thin SVD; the
        reference documents this identity at helper.cpp:218-219).
        The preceding `setzeros_varproj_lm` is implicit: the result does
        not depend on the previous landmark values."""
        P = cam_space[obs.cam]
        gtg, gtz = pose_math.varproj_init_normal_eq(P, obs.uv, self.alpha)
        gtg_lm = self._seg_lm(obs, _mask_rows(obs, gtg))
        gtz_lm = self._seg_lm(obs, _mask_rows(obs, gtz))
        return linalg.solve3x3(gtg_lm, gtz_lm)

    # -------------------------------------------------------- linearize

    def _linearize(
        self, obs: Obs, cam_space: jnp.ndarray, lm_p: jnp.ndarray
    ) -> Lin1:
        """Stage-1 linearization (linearizor_power_varproj.cpp:44-76):
        evaluate Jacobians with sqrt robust weights
        (landmark_block.hpp:135-178), scale Jl columns per landmark
        (hpp:284-300), compute the pose Jacobi scaling from Jp column
        norms (get_Jp_diag2_pOSE) and scale Jp columns per camera
        (hpp:324-334; the reference defers the Jp scaling to the first
        inner `solve`, but it is applied exactly once per linearization
        point, so we fuse it here)."""
        P = cam_space[obs.cam]
        x = lm_p[obs.lm]
        r, Jp, Jl = pose_math.pose_jacobians(P, x, obs.uv, self.alpha)
        r = _mask_rows(obs, r)
        Jp = _mask_rows(obs, Jp)
        Jl = _mask_rows(obs, Jl)

        res_sq = jnp.sum(r * r, axis=-1)
        _err, w = pose_math.robust_error_and_weight(
            res_sq, self.robust, self.huber
        )
        sw = jnp.sqrt(w)[..., None]
        r = r * sw
        Jp = Jp * sw[..., None]
        Jl = Jl * sw[..., None]

        # landmark Jacobi column scaling: 1 / (eps + col_norm) over the
        # landmark's rows
        jl_sq = self._seg_lm(obs, jnp.sum(Jl * Jl, axis=1))  # [M, 3]
        jl_scale = 1.0 / (self.jacobi_eps + jnp.sqrt(jl_sq))
        Jl = Jl * jl_scale[obs.lm][:, None, :]

        # pose Jacobi column scaling: 1 / (eps + sqrt(diag(Jp^T Jp)))
        jp_sq = self._seg_cam(obs, jnp.sum(Jp * Jp, axis=1))  # [N, 12]
        pose_scale = 1.0 / (self.jacobi_eps + jnp.sqrt(jp_sq))
        Jp = Jp * pose_scale[obs.cam][:, None, :]

        return Lin1(Jp=Jp, Jl=Jl, r=r, pose_scale=pose_scale, jl_scale=jl_scale)

    # ------------------------------------------------------ Schur pieces

    def _prepare_hb(
        self, obs: Obs, lin: Lin1, lam: jnp.ndarray, landmark_damping: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """prepare_Hb_pOSE / prepare_Hb_pOSE_poBA
        (sc/linearization_power_varproj.hpp:126-188):
          hll_inv [M,3,3]  = (Jl^T Jl (+ lam I for poBA))^-1
          b       [N,12]   = sum_obs Jp^T (r - Jl hll_inv bl)
          b_inv   [N,12,12]= (blockdiag(Jp^T Jp) + lam I)^-1
        """
        hll = self._seg_lm(obs, jnp.einsum("oki,okj->oij", lin.Jl, lin.Jl))
        if landmark_damping:
            hll = hll + lam * jnp.eye(3, dtype=hll.dtype)
        hll_inv = linalg.inv3x3(hll)

        bl = self._seg_lm(obs, jnp.einsum("oki,ok->oi", lin.Jl, lin.r))
        hll_inv_bl = jnp.einsum("mij,mj->mi", hll_inv, bl)

        r_tilde = lin.r - jnp.einsum(
            "oij,oj->oi", lin.Jl, hll_inv_bl[obs.lm]
        )
        b = self._seg_cam(obs, jnp.einsum("oki,ok->oi", lin.Jp, r_tilde))

        hpp = self._seg_cam(obs, jnp.einsum("oki,okj->oij", lin.Jp, lin.Jp))
        hpp = hpp + lam * jnp.eye(12, dtype=hpp.dtype)
        b_inv = linalg.inv_psd_small(hpp)
        return b, b_inv, hll_inv

    def _e0_matvec(
        self, x: jnp.ndarray, obs: Obs, lin: Lin1, hll_inv: jnp.ndarray
    ) -> jnp.ndarray:
        """Matrix-free E0 = Jp^T Jl Hll^-1 Jl^T Jp product
        (right_mul_e0_pOSE, linearization_power_varproj.hpp:364-407):
        gather x per obs, two small einsums, per-landmark reduce through
        Hll^-1, and a per-camera segment reduce."""
        xc = x[obs.cam]  # [O, 12]
        jpx = jnp.einsum("oij,oj->oi", lin.Jp, xc)  # [O, 4]
        u = self._seg_lm(obs, jnp.einsum("oij,oi->oj", lin.Jl, jpx))
        w = jnp.einsum("mij,mj->mi", hll_inv, u)
        v = jnp.einsum("oij,oj->oi", lin.Jl, w[obs.lm])  # [O, 4]
        return self._seg_cam(obs, jnp.einsum("oij,oi->oj", lin.Jp, v))

    # ------------------------------------------------------------ solves

    def _solve_power(
        self,
        obs: Obs,
        lin: Lin1,
        lam: jnp.ndarray,
        landmark_damping: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """POWER_VARPROJ / POWER_SCHUR_COMPLEMENT solve: power-series
        expansion x = sum_i (B^-1 E0)^i B^-1 (-b)
        (linearizor_power_varproj.cpp:177-243 + hpp:191-237).
        Returns (inc [N,12] in scaled coordinates, num_terms)."""
        b, b_inv, hll_inv = self._prepare_hb(obs, lin, lam, landmark_damping)

        def b_inv_apply(v):
            return jnp.einsum("nij,nj->ni", b_inv, v)

        def e0_apply(v):
            return self._e0_matvec(v, obs, lin, hll_inv)

        inc, n_iter = pcg_mod.power_series(
            b_inv_apply,
            e0_apply,
            -b,
            max_terms=self.power_m,
            q_tolerance=self.opts.eta,
            r_tolerance=self.opts.r_tolerance,
        )
        return inc, n_iter

    def _schur_matvec(
        self, x, obs: Obs, lin: Lin1, hll_inv, hpp, lam
    ) -> jnp.ndarray:
        """S x = (blockdiag(Jp^T Jp) + lam I) x - E0 x — the implicit
        reduced-camera-system operator for PCG. Equivalent to the
        explicit BlockSparseMatrix::right_multiply of the reference
        (block_sparse_matrix.hpp:217-293) without materializing S."""
        bx = jnp.einsum("nij,nj->ni", hpp, x) + lam * x
        return bx - self._e0_matvec(x, obs, lin, hll_inv)

    def _schur_diag(
        self, obs: Obs, lin: Lin1, hll_inv, hpp, lam
    ) -> jnp.ndarray:
        """Diagonal 12x12 blocks of the reduced camera system, for the
        SCHUR_JACOBI preconditioner (cg/preconditioner.hpp:70-144).
        Because a landmark observes a camera at most once, the (i,i)
        Schur block only couples an observation with itself:
          S_ii = Hpp_ii + lam I - sum_{o: cam(o)=i} W_o Hll^-1_lm(o) W_o^T,
          W_o = Jp_o^T Jl_o.
        """
        W = jnp.einsum("oki,okj->oij", lin.Jp, lin.Jl)  # [O, 12, 3]
        Wh = jnp.einsum("oij,ojk->oik", W, hll_inv[obs.lm])
        corr = self._seg_cam(obs, jnp.einsum("oik,ojk->oij", Wh, W))
        return hpp + lam * jnp.eye(12, dtype=hpp.dtype) - corr

    def _solve_pcg(
        self, obs: Obs, lin: Lin1, lam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """PCG path (linearizor_sc.cpp:91-172): implicit RCS operator +
        Schur-Jacobi block-diagonal preconditioner; solves S x = b and
        returns inc = -x (linearizor_base.cpp:102-125 negation)."""
        b, _b_inv, hll_inv = self._prepare_hb(obs, lin, lam, False)
        hpp = self._seg_cam(obs, jnp.einsum("oki,okj->oij", lin.Jp, lin.Jp))
        diag_blocks = self._schur_diag(obs, lin, hll_inv, hpp, lam)
        diag_chol = linalg.cholesky_small(diag_blocks)

        def matvec(x):
            return self._schur_matvec(x, obs, lin, hll_inv, hpp, lam)

        def precond(x):
            y = linalg.solve_lower_tri(diag_chol, x)
            return linalg.solve_upper_from_lower(diag_chol, y)

        res = pcg_mod.conjugate_gradients(
            matvec,
            b,
            jnp.zeros_like(b),
            precond,
            max_iterations=self.opts.max_linear_solver_iterations,
            min_iterations=self.opts.min_linear_solver_iterations,
            q_tolerance=self.opts.eta,
            r_tolerance=-1.0,
            residual_reset_period=self.opts.residual_reset_period,
        )
        return -res.x, res.num_iterations

    def _solve_cholesky(
        self, obs: Obs, lin: Lin1, lam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """CHOLESKY path (linearization_sc.hpp:236-245 solve_direct_pOSE):
        materialize the dense reduced camera system S [12N, 12N] and
        solve S inc = -b with the hand-rolled Cholesky. Intended for
        small/medium N (tests, small problems), like the reference's
        SimplicialLLT path. S = blockdiag(Hpp) + lam I - A A^T with
        A = [W_o hll_chol^-T] scattered by (cam, lm)."""
        b, _b_inv, hll_inv = self._prepare_hb(obs, lin, lam, False)
        n12 = self.n_cams * 12
        hpp = self._seg_cam(obs, jnp.einsum("oki,okj->oij", lin.Jp, lin.Jp))

        # A [12N, 3M]: column block (cam(o), lm(o)) is W_o Hll^-1/2.
        hll_inv_chol = linalg.cholesky_small(hll_inv)  # hll^-1 = L L^T
        W = jnp.einsum("oki,okj->oij", lin.Jp, lin.Jl)  # [O, 12, 3]
        WL = jnp.einsum("oij,ojk->oik", W, hll_inv_chol[obs.lm])

        A = jnp.zeros((n12, self.n_lms * 3), dtype=lin.Jp.dtype)
        rows = (obs.cam[:, None, None] * 12
                + jnp.arange(12)[None, :, None])
        cols = (obs.lm[:, None, None] * 3
                + jnp.arange(3)[None, None, :])
        A = A.at[rows, cols].add(WL)

        S = -A @ A.T
        blk = jnp.arange(self.n_cams)[:, None, None]
        r12 = jnp.arange(12)
        S = S.at[
            blk * 12 + r12[None, :, None], blk * 12 + r12[None, None, :]
        ].add(hpp)
        S = S + lam * jnp.eye(n12, dtype=S.dtype)

        inc = -linalg.solve_psd_small(S, b.reshape(-1)).reshape(
            self.n_cams, 12
        )
        return inc, jnp.asarray(1, jnp.int32)

    # ------------------------------------------------------------- apply

    def _apply(
        self,
        obs: Obs,
        cam_space: jnp.ndarray,
        lm_p: jnp.ndarray,
        lin: Lin1,
        inc_scaled: jnp.ndarray,  # [N, 12] in scaled (solver) coordinates
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Camera update + VarProj back-substitution
        (linearizor_power_varproj.cpp:245-263 `apply` +
        sc/landmark_block.hpp:670-707 back_substitute_pOSE):

        1. unscale inc, add to camera matrices (apply_inc_pose_pOSE).
        2. re-evaluate Jl and residual at the *updated* cameras u* and
           old landmarks (update_landmark_jacobian_pOSE — unweighted,
           like the reference), and take the exact VarProj landmark step
           inc_lm = -(Jl*^T Jl*)^-1 Jl*^T r(u*, v) — exact because the
           pOSE residual is affine in the landmark.
        3. model cost decrease l_diff from J_inc = Jp* inc_scaled +
           Jl_stored inc_lm against the stored residual (reference
           combines the fresh Jp with the scaled inc and the scaled
           stored Jl with the unscaled landmark inc; we reproduce that
           faithfully since l_diff feeds the logged step quality and the
           lambda schedule).

        Returns (new_cam_space, new_lm_p, l_diff).
        """
        inc_phys = inc_scaled * lin.pose_scale
        new_cam = cam_space + inc_phys.reshape(self.n_cams, 3, 4)

        P_new = new_cam[obs.cam]
        x = lm_p[obs.lm]
        r_new, Jp_new, Jl_new = pose_math.pose_jacobians(
            P_new, x, obs.uv, self.alpha
        )
        r_new = _mask_rows(obs, r_new)
        Jp_new = _mask_rows(obs, Jp_new)
        Jl_new = _mask_rows(obs, Jl_new)

        hll = self._seg_lm(obs, jnp.einsum("oki,okj->oij", Jl_new, Jl_new))
        tmp = self._seg_lm(obs, jnp.einsum("oki,ok->oi", Jl_new, r_new))
        inc_lm = -linalg.solve3x3(hll, tmp)

        j_inc = jnp.einsum(
            "oij,oj->oi", Jp_new, inc_scaled[obs.cam]
        ) + jnp.einsum("oij,oj->oi", lin.Jl, inc_lm[obs.lm])
        l_diff = -jnp.sum(j_inc * (0.5 * j_inc + lin.r))

        return new_cam, lm_p + inc_lm, l_diff

    def _apply_poba(
        self,
        obs: Obs,
        cam_space: jnp.ndarray,
        lm_p: jnp.ndarray,
        lin: Lin1,
        inc_scaled: jnp.ndarray,
        lam: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """POWER_SCHUR_COMPLEMENT apply: classical LM back-substitution
        from the *stored* (scaled) Jacobians with landmark damping
        (back_substitute_poBA, sc/landmark_block.hpp:625-668;
        linearizor_power_varproj.cpp:264-273 order: back-substitute with
        the scaled inc first, then unscale and update cameras)."""
        hll = self._seg_lm(obs, jnp.einsum("oki,okj->oij", lin.Jl, lin.Jl))
        hll = hll + lam * jnp.eye(3, dtype=hll.dtype)
        jp_inc = jnp.einsum("oij,oj->oi", lin.Jp, inc_scaled[obs.cam])
        tmp = self._seg_lm(
            obs, jnp.einsum("oki,ok->oi", lin.Jl, lin.r + jp_inc)
        )
        inc_lm_scaled = -linalg.solve3x3(hll, tmp)

        j_inc = jp_inc + jnp.einsum(
            "oij,oj->oi", lin.Jl, inc_lm_scaled[obs.lm]
        )
        l_diff = -jnp.sum(j_inc * (0.5 * j_inc + lin.r))

        # landmark inc unscaled by the Jl column scale only after the
        # model-cost computation (landmark_block.hpp:664-666)
        new_lm = lm_p + inc_lm_scaled * lin.jl_scale
        inc_phys = inc_scaled * lin.pose_scale
        new_cam = cam_space + inc_phys.reshape(self.n_cams, 3, 4)
        return new_cam, new_lm, l_diff
