"""Step-2 Riemannian projective refinement, TPU-native.

Replaces the reference's homogeneous/joint path:
  - linearize_landmark_projective_space_homogeneous + linearize_nullspace
    (sc/landmark_block.hpp:180-269)
  - prepare_Hb_joint / solve_joint / right_mul_*_joint
    (sc/linearization_power_varproj.hpp:74-122, 240-287, 341-453)
  - back_substitute_joint (sc/landmark_block.hpp:574-623)
  - apply_joint camera lift (solver/linearizor_power_varproj.cpp:276-308)
  - the explicit-SC RIPCG variant (sc/linearization_sc.hpp get_Hb_joint)

Geometry: cameras live on the quotient of 12-dof matrices by global
scale, landmarks on the quotient of homogeneous 4-vectors by scale.
Tangent spaces are the nullspaces of the current representative
(11-dim for cameras, 3-dim for landmarks); the reference realizes them
with COD kernels (`kernel_COD`), we use closed-form Householder bases
(ops/linalg.nullspace_of_rowf) — any orthonormal basis of the same
subspace, so the optimization is equivalent (trajectories can differ in
roundoff/basis, convergence and cost do not). Because the bases have
orthonormal columns, the reference's Proj^T lambda Proj damping terms
reduce to lambda I, which we exploit.

Data layout: observation-last like stage 1 (see stage1.py) — storage
r [2,O], Jp [2,12,O], Jl [2,4,O], nullspace-projected Jp_ns [2,11,O],
Jl_ns [2,3,O]; tangent bases kernel_cam [12,11,N], kernel_lm [4,3,M].

Retraction after each step: Frobenius-normalize camera matrices and
dehomogenize landmarks (bal_bundle_adjustment.cpp:700-705).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from povar_tpu.ops.small_einsum import small_einsum

from povar_tpu.ops import linalg, pallas_cam, pose_math
from povar_tpu.options import RobustNorm, SolverOptions, SolverTypeRiemannian
from povar_tpu.solver import pcg as pcg_mod
from povar_tpu.solver.common import accumulate_residual_info
from povar_tpu.solver.segments import (
    onehot_gather,
    onehot_segment_sum,
    padded_segment_sum,
    slot_expand,
    slot_segment_sum,
)
from povar_tpu.solver.stage1 import Obs, _mask_rows, make_obs

_ROBUST_CODE = {
    RobustNorm.NONE: pose_math.ROBUST_NONE,
    RobustNorm.HUBER: pose_math.ROBUST_HUBER,
    RobustNorm.CAUCHY: pose_math.ROBUST_CAUCHY,
}


class Lin2(NamedTuple):
    """Step-2 linearization point: scaled storage + tangent projections.

    Jp/Jl are the scaled 'storage_homogeneous_' blocks; Jp_ns/Jl_ns the
    'storage_nullspace_' blocks; kernel_cam/kernel_lm the tangent bases.
    """

    Jp: jnp.ndarray  # [2, 12, O]
    Jl: jnp.ndarray  # [2, 4, O]
    r: jnp.ndarray  # [2, O]
    Jp_ns: jnp.ndarray  # [2, 11, O]
    Jl_ns: jnp.ndarray  # [2, 3, O]
    kernel_cam: jnp.ndarray  # [12, 11, N]
    kernel_lm: jnp.ndarray  # [4, 3, M]
    pose_scale: jnp.ndarray  # [12, N]
    jl_scale: jnp.ndarray  # [4, M]


def create_homogeneous(
    cam_space: jnp.ndarray, lm_p: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Step boundary (create_homogeneous_landmark,
    bal_bundle_adjustment.cpp:544-553): lift landmarks to homogeneous
    coordinates and normalize camera matrices."""
    lm_p_h = jnp.concatenate(
        [lm_p, jnp.ones_like(lm_p[..., :1])], axis=-1
    )
    return linalg.frobenius_normalize(cam_space), lm_p_h


class Stage2Solver:
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
        self.n_cams = int(num_cameras)
        self.n_lms = int(num_landmarks)
        self.opts = options
        self.dtype = dtype
        self.robust = _ROBUST_CODE[options.residual.robust_norm]
        self.huber = float(options.residual.huber_parameter)
        self.power_m = int(options.power_sc_iterations)
        self.use_valid_only = options.use_projection_validity_check()
        self.solve_dtype = (
            jnp.float32
            if options.mixed_precision_solves and dtype == jnp.float64
            else dtype
        )
        # fused Pallas camera-side kernels: same gating as Stage1Solver
        mode = options.pallas_kernels
        shape_ok = pallas_cam.supported(
            pallas_cam.OBS_PAD, self.n_cams, self.solve_dtype
        )
        self.use_pallas = shape_ok and (
            mode == "on"
            or (mode == "auto" and jax.default_backend() == "tpu")
        )
        self.obs, self.lm_shapes = make_obs(
            obs_cam, obs_lm, obs_uv, self.n_cams, self.n_lms, dtype,
            obs_weight, solve_dtype=self.solve_dtype,
            build_onehot=not self.use_pallas,
        )
        self.jacobi_eps = options.effective_jacobi_scaling_epsilon(
            self.solve_dtype
        )

        self._jit_compute_error = jax.jit(self._compute_error)
        self._jit_linearize = jax.jit(self._linearize)
        self._jit_solve_power = jax.jit(self._solve_power)
        self._jit_solve_pcg = jax.jit(self._solve_pcg)
        self._jit_apply = jax.jit(self._apply)

    # convenience aliases (tests, tools)
    @property
    def obs_cam(self):
        return self.obs.cam

    @property
    def obs_lm(self):
        return self.obs.lm

    @property
    def obs_uv(self):
        return self.obs.uv.T

    # public API bound to this problem's obs arrays
    def compute_error(self, cam_space, lm_p_h):
        return self._jit_compute_error(self.obs, cam_space, lm_p_h)

    def linearize(self, cam_space, lm_p_h):
        return self._jit_linearize(self.obs, cam_space, lm_p_h)

    def solve_power(self, lin, lam):
        return self._jit_solve_power(self.obs, lin, lam)

    def solve_pcg(self, lin, lam):
        return self._jit_solve_pcg(self.obs, lin, lam)

    def apply(self, cam_space, lm_p_h, lin, inc, lam):
        return self._jit_apply(self.obs, cam_space, lm_p_h, lin, inc, lam)

    def solve(
        self, lin: Lin2, lam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        st = self.opts.solver_type_step_2
        if st == SolverTypeRiemannian.RIPOBA:
            return self.solve_power(lin, lam)
        if st == SolverTypeRiemannian.RIPCG:
            return self.solve_pcg(lin, lam)
        raise ValueError(f"unknown step-2 solver type {st}")

    # -------------------------------------------------------------- utils

    def _seg_cam(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas and x.dtype == jnp.float32:
            flat = x.reshape(-1, x.shape[-1])
            out = pallas_cam.cam_scatter_add(flat, obs.cam, self.n_cams)
            return out.reshape(x.shape[:-1] + (self.n_cams,))
        if obs.cam_onehot is not None and x.dtype == obs.cam_onehot.dtype:
            return onehot_segment_sum(x, obs.cam_onehot)
        return padded_segment_sum(x, obs.cam_red)

    def _seg_cam_outer(
        self, obs: Obs, A: jnp.ndarray, B: jnp.ndarray
    ) -> jnp.ndarray:
        """Chunked seg_cam(einsum('kio,kjo->ijo', A, B)); see
        stage1._seg_cam_outer."""
        if obs.cam_onehot is not None and A.dtype == obs.cam_onehot.dtype:
            return onehot_segment_sum(
                small_einsum("kio,kjo->ijo", A, B), obs.cam_onehot
            )
        i_dim = A.shape[1]
        o_dim = A.shape[-1]
        if i_dim * B.shape[1] * o_dim * A.dtype.itemsize <= 1 << 30:
            return self._seg_cam(obs, small_einsum("kio,kjo->ijo", A, B))
        rows = []
        for i in range(i_dim):
            row = small_einsum("ko,kjo->jo", A[:, i, :], B)
            rows.append(self._seg_cam(obs, row))
        return jnp.stack(rows, axis=0)

    def _gather_cam_x(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas and x.dtype == jnp.float32:
            flat = x.reshape(-1, x.shape[-1])
            out = pallas_cam.cam_gather(flat, obs.cam)
            return out.reshape(x.shape[:-1] + (out.shape[-1],))
        if obs.cam_onehot is not None and x.dtype == obs.cam_onehot.dtype:
            return onehot_gather(x, obs.cam_onehot)
        return x[..., obs.cam]

    def _seg_lm(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        return slot_segment_sum(x, self.lm_shapes, obs.lm_inv)

    def _gather_lm_x(self, obs: Obs, s: jnp.ndarray) -> jnp.ndarray:
        return slot_expand(s, self.lm_shapes, obs.lm_order)

    def _gather_cams(self, obs: Obs, cam_space: jnp.ndarray) -> jnp.ndarray:
        t = jnp.transpose(cam_space, (1, 2, 0))  # [3, 4, N]
        if self.use_pallas and cam_space.dtype == jnp.float32:
            o = pallas_cam.cam_gather(t.reshape(12, -1), obs.cam)
            return o.reshape(3, 4, -1)
        return t[:, :, obs.cam]

    # ------------------------------------------------------------- error

    def _compute_error(
        self, obs: Obs, cam_space: jnp.ndarray, lm_p_h: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """compute_error_projective_space_homogeneous
        (helper.cpp:156-196)."""
        P = self._gather_cams(obs, cam_space)
        xh = self._gather_lm_x(obs, lm_p_h.T)  # [4, O]
        r, valid = pose_math.homogeneous_residual_t(P, xh, obs.uv)
        r = _mask_rows(obs, r)
        res_sq = jnp.sum(r * r, axis=0)
        err, _w = pose_math.robust_error_and_weight(
            res_sq, self.robust, self.huber
        )
        finite = jnp.all(jnp.isfinite(r), axis=0)
        if obs.weight is not None:
            active = obs.weight > 0
            err = jnp.where(active, err, 0.0)
            valid = jnp.logical_and(valid, active)
            finite = jnp.logical_or(finite, ~active)
        return accumulate_residual_info(err, jnp.sqrt(res_sq), valid, finite)

    # --------------------------------------------------------- linearize

    def _linearize(
        self, obs: Obs, cam_space: jnp.ndarray, lm_p_h: jnp.ndarray
    ) -> Lin2:
        """Homogeneous linearization + Jacobi scaling + tangent-space
        (nullspace) projection.

        Order matches the reference: weight, scale Jl columns
        (scale_Jl_cols_homogeneous), compute pose scaling from Jp column
        norms, scale Jp columns (scale_Jp_cols_joint), then build the
        nullspace storage from the *scaled* blocks
        (landmark_block.hpp:227-269; scaling happens before
        linearize_nullspace in linearizor_power_varproj.cpp:129-133).

        Mixed mode stores everything in the solve dtype (see
        stage1._linearize for the precision argument)."""
        sd = self.solve_dtype
        P = self._gather_cams(obs, cam_space.astype(sd))
        xh = self._gather_lm_x(obs, lm_p_h.astype(sd).T)
        r, Jp, Jl, valid = pose_math.homogeneous_jacobians_t(
            P, xh, obs.uv.astype(sd)
        )
        r = _mask_rows(obs, r)
        Jp = _mask_rows(obs, Jp)
        Jl = _mask_rows(obs, Jl)

        if self.use_valid_only:
            # invalid projections contribute zero rows
            # (landmark_block.hpp:203-222 'if (valid)')
            keep = valid[None, :]
            r = jnp.where(keep, r, 0.0)
            Jp = jnp.where(keep[:, None], Jp, 0.0)
            Jl = jnp.where(keep[:, None], Jl, 0.0)

        res_sq = jnp.sum(r * r, axis=0)
        _err, w = pose_math.robust_error_and_weight(
            res_sq, self.robust, self.huber
        )
        sw = jnp.sqrt(w)
        r = r * sw[None]
        Jp = Jp * sw[None, None]
        Jl = Jl * sw[None, None]

        jl_sq = self._seg_lm(obs, jnp.sum(Jl * Jl, axis=0))  # [4, M]
        jl_scale = 1.0 / (self.jacobi_eps + jnp.sqrt(jl_sq))
        Jl = Jl * self._gather_lm_x(obs, jl_scale)[None]

        jp_sq = self._seg_cam(obs, jnp.sum(Jp * Jp, axis=0))  # [12, N]
        pose_scale = 1.0 / (self.jacobi_eps + jnp.sqrt(jp_sq))
        Jp = Jp * self._gather_cam_x(obs, pose_scale)[None]

        kernel_cam = linalg.nullspace_of_rowf(
            cam_space.astype(sd).reshape(self.n_cams, 12).T
        )  # [12, 11, N]
        kernel_lm = linalg.nullspace_of_rowf(lm_p_h.astype(sd).T)

        Jp_ns = small_einsum(
            "ijo,jko->iko", Jp, self._gather_cam_x(obs, kernel_cam)
        )  # [2, 11, O]
        Jl_ns = small_einsum(
            "ijo,jko->iko", Jl, self._gather_lm_x(obs, kernel_lm)
        )  # [2, 3, O]

        return Lin2(
            Jp=Jp,
            Jl=Jl,
            r=r,
            Jp_ns=Jp_ns,
            Jl_ns=Jl_ns,
            kernel_cam=kernel_cam,
            kernel_lm=kernel_lm,
            pose_scale=pose_scale,
            jl_scale=jl_scale,
        )

    # ------------------------------------------------------ Schur pieces

    def _prepare_hb(
        self, obs: Obs, lin: Lin2, lam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """prepare_Hb_joint (linearization_power_varproj.hpp:74-122):
        tangent-space Hll^-1 [3,3,M] (with Proj^T lam Proj = lam I
        damping), gradient b [11,N], undamped per-camera block diagonal
        Jp_ns^T Jp_ns [11,11,N]."""
        lam = lam.astype(lin.Jl_ns.dtype)
        eye3 = jnp.eye(3, dtype=lin.Jl_ns.dtype)[:, :, None]
        hll = self._seg_lm(
            obs, small_einsum("kio,kjo->ijo", lin.Jl_ns, lin.Jl_ns)
        )
        hll = hll + lam * eye3
        hll_inv = linalg.inv3x3f(hll)

        bl = self._seg_lm(obs, small_einsum("kio,ko->io", lin.Jl_ns, lin.r))
        hll_inv_bl = small_einsum("ijm,jm->im", hll_inv, bl)

        r_tilde = lin.r - small_einsum(
            "ijo,jo->io", lin.Jl_ns, self._gather_lm_x(obs, hll_inv_bl)
        )
        if self.use_pallas and lin.Jp_ns.dtype == jnp.float32:
            hpp_flat, b = pallas_cam.hpp_b(
                lin.Jp_ns.reshape(22, -1), r_tilde, obs.cam, self.n_cams
            )
            hpp = hpp_flat.reshape(11, 11, self.n_cams)
        else:
            b = self._seg_cam(
                obs, small_einsum("kio,ko->io", lin.Jp_ns, r_tilde)
            )
            hpp = self._seg_cam_outer(obs, lin.Jp_ns, lin.Jp_ns)
        return b, hpp, hll_inv

    def _e0_matvec(
        self, x: jnp.ndarray, obs: Obs, lin: Lin2, hll_inv: jnp.ndarray
    ) -> jnp.ndarray:
        """right_mul_e0_joint (hpp:409-453). x, result: [11, N]."""
        xc = self._gather_cam_x(obs, x)  # [11, O]
        jpx = small_einsum("ijo,jo->io", lin.Jp_ns, xc)  # [2, O]
        u = self._seg_lm(obs, small_einsum("ijo,io->jo", lin.Jl_ns, jpx))
        w = small_einsum("ijm,jm->im", hll_inv, u)
        v = small_einsum(
            "ijo,jo->io", lin.Jl_ns, self._gather_lm_x(obs, w)
        )
        return self._seg_cam(obs, small_einsum("ijo,io->jo", lin.Jp_ns, v))

    def _e0_factor(
        self, obs: Obs, lin: Lin2, hll_inv: jnp.ndarray, dtype
    ) -> jnp.ndarray:
        """Factorized tangent E0 operand W [3, 11, O] (see
        stage1._e0_factor)."""
        A = small_einsum("kio,kjo->ijo", lin.Jl_ns, lin.Jp_ns)
        L = linalg.cholesky_smallf(hll_inv)
        Lg = self._gather_lm_x(obs, L).astype(dtype)
        return small_einsum("kio,kjo->ijo", Lg, A.astype(dtype))

    def _e0_w_matvec(
        self, x: jnp.ndarray, obs: Obs, W: jnp.ndarray
    ) -> jnp.ndarray:
        if self.use_pallas and W.dtype == jnp.float32:
            w33 = W.reshape(33, -1)
            u = pallas_cam.e0_u(w33, obs.cam, x)  # [3, O]
            s = self._seg_lm(obs, u)
            sb = self._gather_lm_x(obs, s)
            return pallas_cam.e0_scatter(w33, obs.cam, sb, self.n_cams)
        xc = self._gather_cam_x(obs, x)  # [11, O]
        u = small_einsum("ijo,jo->io", W, xc)  # [3, O]
        s = self._seg_lm(obs, u)
        v = small_einsum(
            "ijo,io->jo", W, self._gather_lm_x(obs, s)
        )  # [11, O]
        return self._seg_cam(obs, v)

    # ------------------------------------------------------------ solves

    def _solve_power(
        self, obs: Obs, lin: Lin2, lam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """RIPOBA: power series on the 11-dof tangent system
        (solve_joint, hpp:240-287). Returns (inc [11, N], num_terms).
        Mixed precision: see stage1._solve_power."""
        b, hpp, hll_inv = self._prepare_hb(obs, lin, lam)
        hpp_d = hpp + lam.astype(hpp.dtype) * jnp.eye(
            11, dtype=hpp.dtype
        )[:, :, None]
        b_inv = linalg.inv_psd_smallf(hpp_d)

        sd = self.solve_dtype
        b_inv_s = b_inv.astype(sd)
        W = self._e0_factor(obs, lin, hll_inv, sd)

        def b_inv_apply(v):
            return small_einsum("ijn,jn->in", b_inv_s, v)

        def e0_apply(v):
            return self._e0_w_matvec(v, obs, W)

        inc, n_iter = pcg_mod.power_series(
            b_inv_apply,
            e0_apply,
            (-b).astype(sd),
            max_terms=self.power_m,
            q_tolerance=self.opts.eta,
            r_tolerance=self.opts.r_tolerance,
        )
        return inc.astype(self.dtype), n_iter

    def _schur_diag(self, obs, lin, hll_inv, hpp, lam):
        """Diagonal 11x11 tangent Schur blocks (see stage1._schur_diag)."""
        W = small_einsum("kio,kjo->ijo", lin.Jp_ns, lin.Jl_ns)  # [11, 3, O]
        Wh = small_einsum("ijo,jko->iko", W, self._gather_lm_x(obs, hll_inv))
        corr = self._seg_cam(obs, small_einsum("iko,jko->ijo", Wh, W))
        eye = jnp.eye(11, dtype=hpp.dtype)[:, :, None]
        return hpp + lam.astype(hpp.dtype) * eye - corr

    def _make_precond(self, obs, lin, hll_inv, hpp, lam, sd):
        """CG preconditioner per options.preconditioner_type (see
        stage1._make_precond)."""
        from povar_tpu.options import PreconditionerType as PT

        pt = self.opts.preconditioner_type
        if pt == PT.IDENTITY:
            return lambda x: x
        diag_blocks = self._schur_diag(obs, lin, hll_inv, hpp, lam)
        if pt == PT.JACOBI:
            n = diag_blocks.shape[0]
            d = diag_blocks[jnp.arange(n), jnp.arange(n)].astype(sd)
            invd = jnp.where(d != 0, 1.0 / d, 1.0)
            return lambda x: invd * x
        if pt == PT.SCHUR_JACOBI:
            diag_chol_s = linalg.cholesky_smallf(diag_blocks).astype(sd)

            def precond(x):
                y = linalg.solve_lower_trif(diag_chol_s, x)
                return linalg.solve_upper_from_lowerf(diag_chol_s, y)

            return precond
        raise ValueError(f"unknown preconditioner type {pt}")

    def _solve_pcg(
        self, obs: Obs, lin: Lin2, lam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """RIPCG (linearizor_sc.cpp:245-325): implicit tangent RCS +
        preconditioned CG; inc = -x of S x = b."""
        b, hpp, hll_inv = self._prepare_hb(obs, lin, lam)

        sd = self.solve_dtype
        hpp_s = hpp.astype(sd)
        W = self._e0_factor(obs, lin, hll_inv, sd)
        lam_s = lam.astype(sd)

        def matvec(x):
            bx = small_einsum("ijn,jn->in", hpp_s, x) + lam_s * x
            return bx - self._e0_w_matvec(x, obs, W)

        precond = self._make_precond(obs, lin, hll_inv, hpp, lam, sd)

        res = pcg_mod.conjugate_gradients(
            matvec,
            b.astype(sd),
            jnp.zeros_like(b, dtype=sd),
            precond,
            max_iterations=self.opts.max_linear_solver_iterations,
            min_iterations=self.opts.min_linear_solver_iterations,
            q_tolerance=self.opts.eta,
            r_tolerance=-1.0,
            residual_reset_period=self.opts.residual_reset_period,
        )
        return (-res.x).astype(self.dtype), res.num_iterations

    # ------------------------------------------------------------- apply

    def _apply(
        self,
        obs: Obs,
        cam_space: jnp.ndarray,
        lm_p_h: jnp.ndarray,
        lin: Lin2,
        inc: jnp.ndarray,  # [11, N] tangent increment
        lam: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """back_substitute_joint + apply_joint + retraction
        (landmark_block.hpp:574-623, linearizor_power_varproj.cpp:276-308,
        bal_bundle_adjustment.cpp:700-705).

        Landmarks: solve the damped tangent system from the stored
        (scaled) blocks, lift 3 -> 4 through kernel_lm, unscale by the
        Jl column scale after computing the model decrease, add.
        Cameras: lift 11 -> 12 through kernel_cam, unscale, add.
        Retraction: Frobenius-normalize cameras, dehomogenize landmarks.
        Returns (new_cam_space, new_lm_p_h, l_diff). Back-substitution
        runs in the solve dtype; state updates and retraction in the
        state dtype.
        """
        sd = self.solve_dtype
        inc_s = inc.astype(sd)
        lam_s = lam.astype(sd)
        eye3 = jnp.eye(3, dtype=lin.Jl_ns.dtype)[:, :, None]
        hll = self._seg_lm(
            obs, small_einsum("kio,kjo->ijo", lin.Jl_ns, lin.Jl_ns)
        )
        hll = hll + lam_s * eye3

        jp_inc = small_einsum(
            "ijo,jo->io", lin.Jp_ns, self._gather_cam_x(obs, inc_s)
        )
        tmp = self._seg_lm(
            obs, small_einsum("kio,ko->io", lin.Jl_ns, lin.r + jp_inc)
        )
        inc3 = -linalg.solve3x3f(hll, tmp)  # [3, M]
        inc_proj = small_einsum("ijm,jm->im", lin.kernel_lm, inc3)  # [4, M]

        j_inc = jp_inc + small_einsum(
            "ijo,jo->io", lin.Jl, self._gather_lm_x(obs, inc_proj)
        )
        l_diff = -jnp.sum(j_inc * (0.5 * j_inc + lin.r))

        new_lm_h = lm_p_h + (inc_proj * lin.jl_scale).astype(self.dtype).T

        inc12 = small_einsum("ijn,jn->in", lin.kernel_cam, inc_s)  # [12, N]
        inc12 = (inc12 * lin.pose_scale).astype(self.dtype)
        new_cam = cam_space + inc12.T.reshape(self.n_cams, 3, 4)

        # manifold retraction
        new_cam = linalg.frobenius_normalize(new_cam)
        new_lm_h = new_lm_h / new_lm_h[:, 3:4]
        return new_cam, new_lm_h, l_diff.astype(self.dtype)
