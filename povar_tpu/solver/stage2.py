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

from povar_tpu.ops import linalg, pallas_cam, pallas_pose2, pose_math
from povar_tpu.options import RobustNorm, SolverOptions, SolverTypeRiemannian
from povar_tpu.solver import pcg as pcg_mod
from povar_tpu.solver.common import StagedTiming, accumulate_residual_info
from povar_tpu.solver.segments import (
    onehot_gather,
    onehot_segment_sum,
    padded_segment_sum,
    slot_expand,
    slot_part_sums,
    slot_row_expand,
    slot_segment_sum,
)
from povar_tpu.solver.stage1 import (
    CamWindows,
    LmState,
    Obs,
    _mask_rows,
    make_obs,
)

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


class Lin2S(NamedTuple):
    """Structured step-2 linearization point (Pallas path): compact
    per-observation projection state instead of the Jp/Jl/Jp_ns/Jl_ns
    storage (ops/pallas_pose2.py — the Jacobians re-derive in registers
    from (mm, x4) and the tangent lifts fold per-camera into kps).
    Everything f32.

    Landmark-axis fields live in the solver's L space (CamWindows):
    slot-ROW order when every landmark owns a unique slot row — so the
    per-landmark reduce/expand round trips in solve/apply run with zero
    index gathers — and canonical M order under overflow sub-rows."""

    ct: jnp.ndarray  # [12, N] normalized camera table
    x4: jnp.ndarray  # [4, O] homogeneous landmarks expanded
    mm: jnp.ndarray  # [3, O] (mx, my, 1/p2) projection cache
    sw: jnp.ndarray  # [1, O] sqrt robust weight (0 on dead rows)
    r_w: jnp.ndarray  # [2, O] sqrt-weighted residuals
    jls8: jnp.ndarray  # [8, O] weighted SCALED Jl rows (r*4+c)
    jlns: jnp.ndarray  # [6, O] tangent-projected Jl_ns rows (r*3+i)
    hll_raw: jnp.ndarray  # [3, 3, L] undamped tangent Hll slot sums
    bl_raw: jnp.ndarray  # [3, L] tangent gradient slot sums
    jl_scale: jnp.ndarray  # [4, L]
    pose_scale: jnp.ndarray  # [12, N]
    kernel_cam: jnp.ndarray  # [12, 11, N]
    kernel_lm: jnp.ndarray  # [4, 3, L]
    kps: jnp.ndarray  # [12, 11, N] = pose_scale . kernel_cam


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


class Stage2Solver(StagedTiming, CamWindows):
    # fused-term VMEM rows per slot element (pallas_pose2.E0_TERM2_ROWS)
    _E0_TERM_ROWS = 15
    # see Stage1Solver.supports_device_loop
    supports_device_loop = True

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
        # Structured Pallas kernels (ops/pallas_pose2.py): gating
        # mirrors Stage1Solver, including the camera-window layout
        # beyond the in-VMEM one-hot camera limit.
        mode = options.pallas_kernels
        shape_ok = pallas_cam.supported(
            pallas_cam.OBS_PAD, self.n_cams, self.solve_dtype
        )
        want = mode == "on" or (
            mode == "auto" and jax.default_backend() == "tpu"
        )
        self.use_pallas = shape_ok and want
        self.win_w = 0
        self.n_win = 0
        try_windows = (
            want
            and not shape_ok
            and self.solve_dtype == jnp.float32
            and self.n_cams > pallas_cam.MAX_CAMERAS
        )
        if mode == "on" and not shape_ok and not try_windows:
            raise ValueError(
                "pallas_kernels='on' but the problem shape is "
                f"unsupported (n_cams={self.n_cams} <= "
                f"{pallas_cam.MAX_CAMERAS}, f32 inner solves required)"
            )
        self.obs, self.lm_shapes, self.n_win, chosen_w = make_obs(
            obs_cam, obs_lm, obs_uv, self.n_cams, self.n_lms, dtype,
            obs_weight, solve_dtype=self.solve_dtype,
            build_onehot=not (self.use_pallas or try_windows),
            window_w=-1 if try_windows else 0,
        )
        if self.n_win:
            self.win_w = chosen_w
            self.use_pallas = True
        elif try_windows:
            from povar_tpu.solver.stage1 import _window_fallback

            _window_fallback(
                mode, obs_cam, obs_lm, self.n_lms, self.n_cams
            )
        self.jacobi_eps = options.effective_jacobi_scaling_epsilon(
            self.solve_dtype
        )
        # live-observation count for ResidualInfo (padding rows carry
        # zero weight and must not inflate num_obs / mean residuals)
        import numpy as _np

        self.n_obs_live = (
            int(self.obs.cam.shape[0])
            if self.obs.weight is None
            else int(_np.sum(_np.asarray(self.obs.weight) > 0))
        )

        # fused single-kernel power-series E0 term (small-N structured
        # path): shared static planning from CamWindows; the stage-2
        # kernel streams 15 operand rows per slot element
        self._e0_meta = None
        self._e0_cam2 = None
        self._e0_suffix = None
        if self.use_pallas and not self.n_win and options.fused_power_term:
            self._plan_e0_fused()

        self._jit_compute_error = jax.jit(self._compute_error)
        self._jit_linearize = jax.jit(self._linearize)
        self._jit_solve_power = jax.jit(self._solve_power)
        self._jit_solve_pcg = jax.jit(self._solve_pcg)
        self._jit_apply = jax.jit(self._apply)
        self._jit_trial = jax.jit(self._trial)

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

    @property
    def supports_trial(self) -> bool:
        """Both step-2 solves (RIPOBA power series, RIPCG) are pure
        jit graphs, so the fused LM trial is always available."""
        return True

    def trial(self, cam_space, lm_p_h, lin, lam):
        """One fused step-2 LM backtracking trial: solve + apply +
        f64 cost evaluation in a SINGLE jit executable (the stage-1
        trial's mirror — see Stage1Solver.trial for the rationale).
        The staged path pays three dispatches plus an [11, N]
        increment host round-trip per trial; here only the
        accept/reject scalars reach the host. Same structure as the
        reference's driver loop (bal_bundle_adjustment.cpp:655-785:
        solve, apply, compute_error, then the f_diff test)."""
        return self._jit_trial(self.obs, cam_space, lm_p_h, lin, lam)

    def _trial(self, obs: Obs, cam_space, lm_p_h, lin: Lin2, lam):
        st = self.opts.solver_type_step_2
        if st == SolverTypeRiemannian.RIPOBA:
            inc, n_iter = self._solve_power(obs, lin, lam)
        elif st == SolverTypeRiemannian.RIPCG:
            inc, n_iter = self._solve_pcg(obs, lin, lam)
        else:  # pragma: no cover - guarded by solve()
            raise ValueError(f"unknown step-2 solver type {st}")
        inc_finite = jnp.all(jnp.isfinite(inc))
        new_cams, new_lms, l_diff = self._apply(
            obs, cam_space, lm_p_h, lin, inc, lam
        )
        err = self._compute_error(obs, new_cams, new_lms)
        return new_cams, new_lms, inc_finite, n_iter, l_diff, err

    # ----------------------------------------------- staged (timed) API
    # (see stage1.py: the fused methods compose these same sub-functions)

    def linearize_timed(self, cam_space, lm_p_h):
        """Returns (lin, timings): jacobian_evaluation,
        scale_landmark_jacobian, scale_pose_jacobian, perform_qr (the
        tangent nullspace projection is the QR/COD analogue)."""
        t = {}
        if self.use_pallas:
            core, t["jacobian_evaluation"] = self._timed(
                self._jit_cached("lin2_core_s", self._lin2_core_s),
                self.obs, cam_space, lm_p_h,
            )
            jl_scale, t["scale_landmark_jacobian"] = self._timed(
                self._jit_cached("lin2_scale_jl_s", self._lin2_scale_jl_s),
                core[7],
            )
            pose_scale, t["scale_pose_jacobian"] = self._timed(
                self._jit_cached("lin2_scale_jp_s", self._lin2_scale_jp_s),
                core[8],
            )
            lin, t["perform_qr"] = self._timed(
                self._jit_cached("lin2_tangent_s", self._lin2_tangent_s),
                self.obs, core, jl_scale, pose_scale,
            )
            return lin, t
        (r, Jp, Jl), t["jacobian_evaluation"] = self._timed(
            self._jit_cached("lin_core", self._lin_core),
            self.obs, cam_space, lm_p_h,
        )
        (Jl, jl_scale), t["scale_landmark_jacobian"] = self._timed(
            self._jit_cached("lin_scale_jl", self._lin_scale_jl),
            self.obs, Jl,
        )
        (Jp, pose_scale), t["scale_pose_jacobian"] = self._timed(
            self._jit_cached("lin_scale_jp", self._lin_scale_jp),
            self.obs, Jp,
        )
        ns, t["perform_qr"] = self._timed(
            self._jit_cached("lin_nullspace", self._lin_nullspace),
            self.obs, cam_space, lm_p_h, Jp, Jl,
        )
        Jp_ns, Jl_ns, kernel_cam, kernel_lm = ns
        return Lin2(
            Jp=Jp, Jl=Jl, r=r, Jp_ns=Jp_ns, Jl_ns=Jl_ns,
            kernel_cam=kernel_cam, kernel_lm=kernel_lm,
            pose_scale=pose_scale, jl_scale=jl_scale,
        ), t

    def solve_timed(self, lin, lam):
        """Dispatch like `solve` with per-stage times: stage2 (tangent
        Hll + damping span), landmark_damping, prepare,
        compute_preconditioner (RIPCG), solve_reduced_system."""
        st = self.opts.solver_type_step_2
        lam = jnp.asarray(lam, self.dtype)
        t = {}
        pieces, t["stage2"] = self._timed(
            self._jit_cached("prep_hll", self._prep_hll),
            self.obs, lin, lam,
        )
        # the joint Hll damping (Proj^T lam Proj) is inside the span
        t["landmark_damping"] = t["stage2"]
        if st == SolverTypeRiemannian.RIPOBA:
            prep, t["prepare"] = self._timed(
                self._jit_cached("power_prep", self._power_prep),
                self.obs, lin, lam, pieces,
            )
            (inc, n_iter), t["solve_reduced_system"] = self._timed(
                self._jit_cached("power_iterate", self._power_iterate),
                self.obs, lin, prep,
            )
            return inc, n_iter, t
        if st == SolverTypeRiemannian.RIPCG:
            (b, hpp, W), t["prepare"] = self._timed(
                self._jit_cached("pcg_prep", self._pcg_prep),
                self.obs, lin, pieces,
            )
            pmats, t["compute_preconditioner"] = self._timed(
                self._jit_cached("pcg_precond", self._pcg_precond),
                self.obs, lin, pieces, hpp, lam,
            )
            (inc, n_iter), t["solve_reduced_system"] = self._timed(
                self._jit_cached("pcg_iterate", self._pcg_iterate),
                self.obs, lin, lam, b, hpp, W, pmats,
            )
            return inc, n_iter, t
        raise ValueError(f"unknown step-2 solver type {st}")

    def apply_timed(self, cam_space, lm_p_h, lin, inc, lam):
        """Apply with (back_substitution, update_cameras) wall times."""
        t = {}
        lam = jnp.asarray(lam, self.dtype)
        (new_lm_h, l_diff), t["back_substitution"] = self._timed(
            self._jit_cached("back_sub", self._back_sub),
            self.obs, lm_p_h, lin, inc, lam,
        )
        new_cam, t["update_cameras"] = self._timed(
            self._jit_cached("update_cams", self._update_cams),
            cam_space, lin, inc,
        )
        return new_cam, new_lm_h, l_diff, t

    # -------------------------------------------------------------- utils

    def _seg_cam(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        # windowed mode (n_cams > MAX_CAMERAS): the global-id one-hot
        # kernels cannot apply — use the XLA lowering (stage1._seg_cam)
        if self.use_pallas and not self.n_win and x.dtype == jnp.float32:
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
        if self.use_pallas and not self.n_win and x.dtype == jnp.float32:
            flat = x.reshape(-1, x.shape[-1])
            out = pallas_cam.cam_gather(flat, obs.cam)
            return out.reshape(x.shape[:-1] + (out.shape[-1],))
        if obs.cam_onehot is not None and x.dtype == obs.cam_onehot.dtype:
            return onehot_gather(x, obs.cam_onehot)
        return x[..., obs.cam]

    def _seg_lm(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        if obs.lm_combine is not None:  # overflow sub-landmark rows
            rows = slot_part_sums(x, self.lm_shapes)
            return padded_segment_sum(rows, obs.lm_combine)[
                ..., : self.n_lms
            ]
        return slot_segment_sum(x, self.lm_shapes, obs.lm_inv)

    def _gather_lm_x(self, obs: Obs, s: jnp.ndarray) -> jnp.ndarray:
        return slot_expand(s, self.lm_shapes, obs.lm_order)

    def _gather_cams(self, obs: Obs, cam_space: jnp.ndarray) -> jnp.ndarray:
        t = jnp.transpose(cam_space, (1, 2, 0))  # [3, 4, N]
        if (
            self.use_pallas and not self.n_win
            and cam_space.dtype == jnp.float32
        ):
            o = pallas_cam.cam_gather(t.reshape(12, -1), obs.cam)
            return o.reshape(3, 4, -1)
        return t[:, :, obs.cam]

    # ------------------------------------------------------------- error

    def _compute_error(
        self, obs: Obs, cam_space: jnp.ndarray, lm_p_h: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """compute_error_projective_space_homogeneous
        (helper.cpp:156-196).

        Structured path: double-float (two-f32) evaluation including a
        refined double-float division for the projective normalization
        (pallas_pose2.error2_df32) — replaces the emulated-f64 sweep."""
        if (
            self.use_pallas
            and self.dtype == jnp.float64
            and self.solve_dtype == jnp.float32
        ):
            # mixed mode only: pure-f64 evaluates below in true f64
            return self._compute_error_df32(obs, cam_space, lm_p_h)
        P = self._gather_cams(obs, cam_space)
        xh = self._expand_L(obs, self._lm_rows(obs, lm_p_h))  # [4, O]
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
        return self._psum_err(accumulate_residual_info(
            err, jnp.sqrt(res_sq), valid, finite,
            num_obs_all=self.n_obs_live,
        ))

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
        if self.use_pallas:
            return self._linearize_s(obs, cam_space, lm_p_h)
        r, Jp, Jl = self._lin_core(obs, cam_space, lm_p_h)
        Jl, jl_scale = self._lin_scale_jl(obs, Jl)
        Jp, pose_scale = self._lin_scale_jp(obs, Jp)
        Jp_ns, Jl_ns, kernel_cam, kernel_lm = self._lin_nullspace(
            obs, cam_space, lm_p_h, Jp, Jl
        )
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

    def _lin_core(self, obs: Obs, cam_space, lm_p_h):
        """Homogeneous Jacobian/residual evaluation with validity
        masking and sqrt robust weights."""
        sd = self.solve_dtype
        P = self._gather_cams(obs, cam_space.astype(sd))
        xh = self._expand_L(obs, self._lm_rows(obs, lm_p_h).astype(sd))
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
        return r * sw[None], Jp * sw[None, None], Jl * sw[None, None]

    def _lin_scale_jl(self, obs: Obs, Jl):
        """scale_Jl_cols_homogeneous (landmark_block.hpp:302-318)."""
        jl_sq = self._seg_lm(obs, jnp.sum(Jl * Jl, axis=0))  # [4, M]
        jl_scale = 1.0 / (self.jacobi_eps + jnp.sqrt(jl_sq))
        return Jl * self._gather_lm_x(obs, jl_scale)[None], jl_scale

    def _lin_scale_jp(self, obs: Obs, Jp):
        """scale_Jp_cols_joint (landmark_block.hpp:336-350)."""
        jp_sq = self._seg_cam(obs, jnp.sum(Jp * Jp, axis=0))  # [12, N]
        pose_scale = 1.0 / (self.jacobi_eps + jnp.sqrt(jp_sq))
        return Jp * self._gather_cam_x(obs, pose_scale)[None], pose_scale

    def _lin_nullspace(self, obs: Obs, cam_space, lm_p_h, Jp, Jl):
        """Tangent-space projection of the scaled blocks
        (linearize_nullspace, landmark_block.hpp:227-269)."""
        sd = self.solve_dtype
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
        return Jp_ns, Jl_ns, kernel_cam, kernel_lm

    # ------------------------------------------------------ Schur pieces

    def _prep_hll(self, obs: Obs, lin, lam: jnp.ndarray):
        """Tangent Hll assembly + Proj^T lam Proj damping + inversion
        (the landmark half of prepare_Hb_joint,
        linearization_power_varproj.hpp:74-122; the staged
        stage2/landmark-damping span). Returns a
        lin-type-dependent pieces tuple."""
        if isinstance(lin, Lin2S):
            return self._prep_hll_s(obs, lin, lam)
        lam = lam.astype(lin.Jl_ns.dtype)
        eye3 = jnp.eye(3, dtype=lin.Jl_ns.dtype)[:, :, None]
        hll = self._seg_lm(
            obs, small_einsum("kio,kjo->ijo", lin.Jl_ns, lin.Jl_ns)
        )
        hll = hll + lam * eye3
        hll_inv = linalg.inv3x3f(hll)

        bl = self._seg_lm(obs, small_einsum("kio,ko->io", lin.Jl_ns, lin.r))
        hll_inv_bl = small_einsum("ijm,jm->im", hll_inv, bl)
        return hll_inv, hll_inv_bl

    def _prep_hpp_b(self, obs: Obs, lin: Lin2, hll_inv_bl):
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
        return b, hpp

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
        if (
            self.use_pallas and not self.n_win
            and W.dtype == jnp.float32
        ):
            w33 = W.reshape(33, -1)
            u = pallas_cam.e0_u(w33, obs.cam, x)  # [3, O]
            sb = self._seg_lm_reexpand(obs, u)
            return pallas_cam.e0_scatter(w33, obs.cam, sb, self.n_cams)
        xc = self._gather_cam_x(obs, x)  # [11, O]
        u = small_einsum("ijo,jo->io", W, xc)  # [3, O]
        v = small_einsum(
            "ijo,io->jo", W, self._seg_lm_reexpand(obs, u)
        )  # [11, O]
        return self._seg_cam(obs, v)

    # ------------------------------------------------------------ solves

    def _solve_power(
        self, obs: Obs, lin: Lin2, lam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """RIPOBA: power series on the 11-dof tangent system
        (solve_joint, hpp:240-287). Returns (inc [11, N], num_terms).
        Mixed precision: see stage1._solve_power."""
        pieces = self._prep_hll(obs, lin, lam)
        prep = self._power_prep(obs, lin, lam, pieces)
        return self._power_iterate(obs, lin, prep)

    def _power_prep(self, obs: Obs, lin, lam, pieces):
        if isinstance(lin, Lin2S):
            return self._power_prep_s(obs, lin, lam, pieces)
        hll_inv, hll_inv_bl = pieces
        b, hpp = self._prep_hpp_b(obs, lin, hll_inv_bl)
        hpp_d = hpp + lam.astype(hpp.dtype) * jnp.eye(
            11, dtype=hpp.dtype
        )[:, :, None]
        b_inv = linalg.inv_psd_smallf(hpp_d)
        sd = self.solve_dtype
        W = self._e0_factor(obs, lin, hll_inv, sd)
        return (-b).astype(sd), b_inv.astype(sd), W

    def _power_iterate(self, obs: Obs, lin, prep):
        nb, b_inv_s, W = prep

        def b_inv_apply(v):
            return small_einsum("ijn,jn->in", b_inv_s, v)

        if isinstance(lin, Lin2S):
            e0_apply = self._e0_apply_s(obs, lin, W)
        else:
            def e0_apply(v):
                return self._e0_w_matvec(v, obs, W)

        inc, n_iter = pcg_mod.power_series(
            b_inv_apply,
            e0_apply,
            nb,
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

    def _pcg_precond(self, obs, lin, pieces, hpp, lam):
        """CG preconditioner materials (a tuple of arrays; the type is
        static per options.preconditioner_type)."""
        from povar_tpu.options import PreconditionerType as PT

        sd = self.solve_dtype
        pt = self.opts.preconditioner_type
        if pt == PT.IDENTITY:
            return ()
        if isinstance(lin, Lin2S):
            B6 = pieces[2]
            corr12 = self._combine_cam_win(obs, pallas_pose2.schur_diag2(
                self._kcam(obs), lin.x4, lin.mm, lin.sw, B6,
                self.n_cams, win=self._winargs(obs),
            ))
            corr11, _ = self._fold_kps(lin, corr12, None)
            diag_blocks = (
                hpp
                + lam.astype(hpp.dtype)
                * jnp.eye(11, dtype=hpp.dtype)[:, :, None]
                - corr11
            )
            if pt == PT.JACOBI:
                d = diag_blocks[jnp.arange(11), jnp.arange(11)]
                return (jnp.where(d != 0, 1.0 / d, 1.0),)
            return (linalg.cholesky_smallf(diag_blocks),)
        hll_inv = pieces[0]
        diag_blocks = self._schur_diag(obs, lin, hll_inv, hpp, lam)
        if pt == PT.JACOBI:
            n = diag_blocks.shape[0]
            d = diag_blocks[jnp.arange(n), jnp.arange(n)].astype(sd)
            return (jnp.where(d != 0, 1.0 / d, 1.0),)
        return (linalg.cholesky_smallf(diag_blocks).astype(sd),)

    def _precond_closure(self, pmats):
        from povar_tpu.options import PreconditionerType as PT

        pt = self.opts.preconditioner_type
        if pt == PT.IDENTITY:
            return lambda x: x
        if pt == PT.JACOBI:
            (invd,) = pmats
            return lambda x: invd * x
        (chol,) = pmats

        def precond(x):
            y = linalg.solve_lower_trif(chol, x)
            return linalg.solve_upper_from_lowerf(chol, y)

        return precond

    def _solve_pcg(
        self, obs: Obs, lin, lam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """RIPCG (linearizor_sc.cpp:245-325): implicit tangent RCS +
        preconditioned CG; inc = -x of S x = b."""
        pieces = self._prep_hll(obs, lin, lam)
        b, hpp, W = self._pcg_prep(obs, lin, pieces)
        pmats = self._pcg_precond(obs, lin, pieces, hpp, lam)
        return self._pcg_iterate(obs, lin, lam, b, hpp, W, pmats)

    def _pcg_prep(self, obs: Obs, lin, pieces):
        if isinstance(lin, Lin2S):
            return self._pcg_prep_s(obs, lin, pieces)
        hll_inv, hll_inv_bl = pieces
        b, hpp = self._prep_hpp_b(obs, lin, hll_inv_bl)
        W = self._e0_factor(obs, lin, hll_inv, self.solve_dtype)
        return b, hpp, W

    def _pcg_iterate(self, obs: Obs, lin, lam, b, hpp, W, pmats):
        sd = self.solve_dtype
        hpp_s = hpp.astype(sd)
        lam_s = lam.astype(sd)

        if isinstance(lin, Lin2S):
            e0 = self._e0_apply_s(obs, lin, W)

            def matvec(x):
                return (
                    small_einsum("ijn,jn->in", hpp_s, x)
                    + lam_s * x - e0(x)
                )
        else:
            def matvec(x):
                bx = small_einsum("ijn,jn->in", hpp_s, x) + lam_s * x
                return bx - self._e0_w_matvec(x, obs, W)

        res = pcg_mod.conjugate_gradients(
            matvec,
            b.astype(sd),
            jnp.zeros_like(b, dtype=sd),
            self._precond_closure(pmats),
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
        new_lm_h, l_diff = self._back_sub(obs, lm_p_h, lin, inc, lam)
        new_cam = self._update_cams(cam_space, lin, inc)
        return new_cam, new_lm_h, l_diff

    def _back_sub(self, obs: Obs, lm_p_h, lin, inc, lam):
        """Damped tangent landmark back-substitution, COD lift 3 -> 4,
        model cost decrease, landmark update + dehomogenize retraction.
        Returns (new_lm_p_h, l_diff)."""
        if isinstance(lin, Lin2S):
            return self._back_sub_s(obs, lm_p_h, lin, inc, lam)
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
        new_lm_h = new_lm_h / new_lm_h[:, 3:4]
        return new_lm_h, l_diff.astype(self.dtype)

    def _update_cams(self, cam_space, lin: Lin2, inc):
        """Camera tangent lift 11 -> 12 through kernel_cam, unscale, add,
        Frobenius-normalize retraction (apply_joint,
        linearizor_power_varproj.cpp:276-308 +
        bal_bundle_adjustment.cpp:700-703)."""
        inc_s = inc.astype(self.solve_dtype)
        inc12 = small_einsum("ijn,jn->in", lin.kernel_cam, inc_s)  # [12, N]
        inc12 = (inc12 * lin.pose_scale).astype(self.dtype)
        new_cam = cam_space + inc12.T.reshape(self.n_cams, 3, 4)
        return linalg.frobenius_normalize(new_cam)

    def _mask1(self, obs: Obs) -> jnp.ndarray:
        sd = self.solve_dtype
        if obs.weight is None:
            return jnp.ones((1, obs.cam.shape[0]), sd)
        return (obs.weight > 0).astype(sd).reshape(1, -1)

    def _compute_error_df32(
        self, obs: Obs, cam_space: jnp.ndarray, lm_p_h: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """Double-float homogeneous cost: split the f64 state into
        (hi, lo) f32 pairs, evaluate residuals (incl. the projective
        division) with error-free transforms in one Pallas pass, and
        assemble totals in f64 on 128 lanes."""
        f32, f64 = jnp.float32, jnp.float64

        def split(a):
            hi = a.astype(f32)
            return hi, (a - hi.astype(f64)).astype(f32)

        ct = cam_space.reshape(self.n_cams, 12).T  # [12, N] f64
        ct_hi, ct_lo = split(ct)
        lm_hi, lm_lo = split(self._lm_rows(obs, lm_p_h))  # [4, L]
        x_hi = self._expand_L(obs, lm_hi)
        x_lo = self._expand_L(obs, lm_lo)
        uv_hi, uv_lo = split(obs.uv)
        part = pallas_pose2.error2_df32(
            self._kcam(obs),
            self._expand_tbl(obs, ct_hi), self._expand_tbl(obs, ct_lo),
            x_hi, x_lo, uv_hi, uv_lo, self._mask1(obs),
            robust=self.robust, huber=self.huber,
            win=self._winargs(obs),
        )

        def pair(i):
            return self._psum(
                jnp.sum(part[2 * i].astype(f64))
                + jnp.sum(part[2 * i + 1].astype(f64))
            )

        return {
            "num_obs_all": jnp.asarray(self.n_obs_live, jnp.int64),
            "error_all": pair(0),
            "residual_sum_all": pair(1),
            "num_obs_valid": self._psum(
                jnp.sum(part[8])
            ).astype(jnp.int64),
            "error_valid": pair(2),
            "residual_sum_valid": pair(3),
            "is_numerically_valid": self._psum(jnp.sum(part[9])) == 0,
        }

    # ------------------------------------------------ structured path
    # (Pallas; ops/pallas_pose2.py). Same math as the methods above
    # through the projective Kronecker factorization — the solver never
    # materializes Jp [2,12,O], Jl [2,4,O] or the nullspace-projected
    # blocks; tangent lifts fold per-camera (kps) / per-landmark in
    # tiny XLA ops around the kernels.

    def _linearize_s(self, obs: Obs, cam_space, lm_p_h) -> Lin2S:
        core = self._lin2_core_s(obs, cam_space, lm_p_h)
        jl_scale = self._lin2_scale_jl_s(core[7])
        pose_scale = self._lin2_scale_jp_s(core[8])
        return self._lin2_tangent_s(obs, core, jl_scale, pose_scale)

    def _lin2_scale_jl_s(self, jl_sq):
        """Landmark Jacobi scale (scale_Jl_cols_homogeneous span)."""
        return 1.0 / (self.jacobi_eps + jnp.sqrt(jl_sq))

    def _lin2_scale_jp_s(self, jpsq):
        """Pose Jacobi scale (scale_Jp_cols_joint span)."""
        return 1.0 / (self.jacobi_eps + jnp.sqrt(jpsq))

    def _lin2_core_s(self, obs: Obs, cam_space, lm_p_h):
        """Projection/residual/weight pass + raw column-norm sums (the
        jacobian_evaluation timing span)."""
        sd = self.solve_dtype
        ct = cam_space.astype(sd).reshape(self.n_cams, 12).T
        # landmark state enters L space ONCE (a [4, M] take when rows
        # are unique; free when it arrives packed); every per-landmark
        # quantity below stays in L space so the seg/expand round trips
        # are gather-free
        x4_L = self._lm_rows(obs, lm_p_h).astype(sd)  # [4, L]
        x4 = self._expand_L(obs, x4_L)  # [4, O]
        rw, sw, mm, jlw, jlsq, jpsq = pallas_pose2.prepare2(
            self._kcam(obs), self._expand_tbl(obs, ct), x4,
            obs.uv.astype(sd), self._mask1(obs),
            use_valid=self.use_valid_only, robust=self.robust,
            huber=self.huber, win=self._winargs(obs),
        )
        jpsq = self._combine_cam_win(obs, jpsq)
        jl_sq = self._seg_L(obs, jlsq)  # [4, L]
        return ct, x4_L, x4, rw, sw, mm, jlw, jl_sq, jpsq

    def _lin2_tangent_s(
        self, obs: Obs, core, jl_scale, pose_scale
    ) -> Lin2S:
        """Tangent bases + projected storage + tangent Hll/bl sums (the
        perform_qr timing span — the nullspace projection is the
        reference's QR/COD analogue)."""
        ct, x4_L, x4, rw, sw, mm, jlw, _jl_sq, _jpsq = core
        kernel_cam = linalg.nullspace_of_rowf(ct)  # [12, 11, N]
        kernel_lm = linalg.nullspace_of_rowf(x4_L)  # [4, 3, L]

        jls_e = self._expand_L(obs, jl_scale)  # [4, O]
        jls8 = jlw * jnp.concatenate([jls_e, jls_e], axis=0)
        klm_e = self._expand_L(
            obs, kernel_lm.reshape(12, kernel_lm.shape[-1])
        )  # [12, O], rows c*3+i
        jlns = jnp.stack(
            [
                sum(
                    jls8[r * 4 + c] * klm_e[c * 3 + i]
                    for c in range(4)
                )
                for r in range(2)
                for i in range(3)
            ],
            axis=0,
        )  # [6, O], rows r*3+i

        # tangent Hll / gradient slot sums
        prods = jnp.stack(
            [
                jlns[i] * jlns[j] + jlns[3 + i] * jlns[3 + j]
                for i in range(3)
                for j in range(3)
            ],
            axis=0,
        )
        hll_raw = self._seg_L(obs, prods).reshape(3, 3, -1)
        blp = jnp.stack(
            [jlns[i] * rw[0] + jlns[3 + i] * rw[1] for i in range(3)],
            axis=0,
        )
        bl_raw = self._seg_L(obs, blp)
        kps = pose_scale[:, None, :] * kernel_cam
        return Lin2S(
            ct=ct, x4=x4, mm=mm, sw=sw, r_w=rw, jls8=jls8, jlns=jlns,
            hll_raw=hll_raw, bl_raw=bl_raw, jl_scale=jl_scale,
            pose_scale=pose_scale, kernel_cam=kernel_cam,
            kernel_lm=kernel_lm, kps=kps,
        )

    def _prep_hll_s(self, obs: Obs, lin: Lin2S, lam):
        """(hll_inv [3,3,M], hib_obs [3,O], B6 [6,O] = Jl_ns L rows)."""
        sd = self.solve_dtype
        lam32 = lam.astype(sd)
        hll = lin.hll_raw + lam32 * jnp.eye(3, dtype=sd)[
            :, :, None
        ]
        hll_inv = linalg.inv3x3f(hll)
        hib = small_einsum("ijm,jm->im", hll_inv, lin.bl_raw)
        lchol = linalg.cholesky_smallf(hll_inv)  # [3, 3, L]
        hib_obs = self._expand_L(obs, hib)
        l_obs = self._expand_L(
            obs, lchol.reshape(9, lchol.shape[-1])
        )  # rows i*3+c
        b6 = jnp.stack(
            [
                sum(
                    lin.jlns[r * 3 + i] * l_obs[i * 3 + c]
                    for i in range(3)
                )
                for r in range(2)
                for c in range(3)
            ],
            axis=0,
        )
        return hll_inv, hib_obs, b6

    def _fold_kps(self, lin: Lin2S, m12, b12):
        """Per-camera tangent folds: [144,N] -> Kps^T . Kps [11,11,N],
        [12,N] -> Kps^T . [11,N]."""
        h11 = None
        if m12 is not None:
            hpp = m12.reshape(12, 12, self.n_cams)
            tmp = small_einsum("abn,acn->cbn", hpp, lin.kps)
            h11 = small_einsum("cbn,bdn->cdn", tmp, lin.kps)
        b11 = None
        if b12 is not None:
            b11 = small_einsum("abn,an->bn", lin.kps, b12)
        return h11, b11

    def _power_prep_s(self, obs: Obs, lin: Lin2S, lam, pieces):
        _hll_inv, hib_obs, b6 = pieces
        hpp12, b12 = pallas_pose2.hppb2(
            self._kcam(obs), lin.x4, lin.mm, lin.sw, lin.r_w, lin.jlns,
            hib_obs, self.n_cams, win=self._winargs(obs),
        )
        hpp12 = self._combine_cam_win(obs, hpp12)
        b12 = self._combine_cam_win(obs, b12)
        hpp11, b11 = self._fold_kps(lin, hpp12, b12)
        sd = self.solve_dtype
        lam32 = lam.astype(sd)
        hpp_d = hpp11 + lam32 * jnp.eye(11, dtype=sd)[
            :, :, None
        ]
        b_inv = linalg.inv_psd_smallf(hpp_d)
        return -b11, b_inv, b6

    def _pcg_prep_s(self, obs: Obs, lin: Lin2S, pieces):
        _hll_inv, hib_obs, b6 = pieces
        hpp12, b12 = pallas_pose2.hppb2(
            self._kcam(obs), lin.x4, lin.mm, lin.sw, lin.r_w, lin.jlns,
            hib_obs, self.n_cams, win=self._winargs(obs),
        )
        hpp12 = self._combine_cam_win(obs, hpp12)
        b12 = self._combine_cam_win(obs, b12)
        hpp11, b11 = self._fold_kps(lin, hpp12, b12)
        return b11, hpp11, b6

    def _e0_fused_parts2(self, lin: Lin2S, b6):
        """Per-solve traced operand views for e0_term2_parts: [kw, g]
        landmark-major reshapes of the slot-element-major obs arrays
        (lane pads carry sw == 0, contributing zero)."""
        parts = []
        for (ofs, g, w, gt, gp), c2 in zip(self._e0_meta, self._e0_cam2):
            sl = slice(ofs, ofs + g * w)
            x42 = lin.x4[:, sl].reshape(4 * w, g)
            mm2 = lin.mm[:, sl].reshape(3 * w, g)
            sw2 = lin.sw[:, sl].reshape(w, g)
            mat2 = b6[:, sl].reshape(6 * w, g)
            if gp != g:
                pad = ((0, 0), (0, gp - g))
                x42 = jnp.pad(x42, pad)
                mm2 = jnp.pad(mm2, pad)
                sw2 = jnp.pad(sw2, pad)
                mat2 = jnp.pad(mat2, pad)
            parts.append((c2, x42, mm2, sw2, mat2, w, gt))
        return tuple(parts)

    def _e0_suffix_apply2(self, obs: Obs, lin: Lin2S, b6, zt):
        """Composed-kernel stage-2 E0 on the wide-part suffix slice."""
        cut, suf_shapes, o_sp = self._e0_suffix
        o_suf = int(obs.cam.shape[0]) - cut
        pad = o_sp - o_suf
        cam_s = jnp.pad(obs.cam[cut:], (0, pad))
        x4_s = jnp.pad(lin.x4[:, cut:], ((0, 0), (0, pad)))
        mm_s = jnp.pad(lin.mm[:, cut:], ((0, 0), (0, pad)))
        sw_s = jnp.pad(lin.sw[:, cut:], ((0, 0), (0, pad)))
        b6_s = jnp.pad(b6[:, cut:], ((0, 0), (0, pad)))
        u3 = pallas_pose2.mat_dot2(
            cam_s, x4_s, mm_s, sw_s, b6_s, None, zt, add_r=False
        )
        rows = slot_part_sums(u3[:, :o_suf], suf_shapes)
        sb = jnp.pad(
            slot_row_expand(rows, suf_shapes), ((0, 0), (0, pad))
        )
        return pallas_pose2.scatter2(
            cam_s, x4_s, mm_s, sw_s, b6_s, sb, self.n_cams
        )

    def _e0_apply_s(self, obs: Obs, lin: Lin2S, b6):
        """Matrix-free tangent E0 closure through the zt-table trick."""
        win = self._winargs(obs)
        kcam = self._kcam(obs)

        if self._e0_meta is not None and win is None:
            parts = self._e0_fused_parts2(lin, b6)

            def e0_fused(v11):
                zt = small_einsum("abn,bn->an", lin.kps, v11)
                out12 = pallas_pose2.e0_term2_parts(
                    parts, zt, self.n_cams
                )
                if self._e0_suffix is not None:
                    out12 = out12 + self._e0_suffix_apply2(
                        obs, lin, b6, zt
                    )
                out12 = self._combine_cam_win(obs, out12)
                _, out11 = self._fold_kps(lin, None, out12)
                return out11

            return e0_fused

        def e0(v11):
            zt = small_einsum("abn,bn->an", lin.kps, v11)  # [12, N]
            u3 = pallas_pose2.mat_dot2(
                kcam, lin.x4, lin.mm, lin.sw, b6, None,
                self._expand_tbl(obs, zt), add_r=False, win=win,
            )
            sb = self._seg_lm_reexpand(obs, u3)
            out12 = self._combine_cam_win(obs, pallas_pose2.scatter2(
                kcam, lin.x4, lin.mm, lin.sw, b6, sb, self.n_cams,
                win=win,
            ))
            _, out11 = self._fold_kps(lin, None, out12)
            return out11

        return e0

    def _back_sub_s(self, obs: Obs, lm_p_h, lin: Lin2S, inc, lam):
        sd = self.solve_dtype
        lam32 = lam.astype(sd)
        inc_s = inc.astype(sd)
        win = self._winargs(obs)
        kcam = self._kcam(obs)
        zt = small_einsum("abn,bn->an", lin.kps, inc_s)  # [12, N]
        zt_e = self._expand_tbl(obs, zt)
        t3_obs = pallas_pose2.mat_dot2(
            kcam, lin.x4, lin.mm, lin.sw, lin.jlns, lin.r_w, zt_e,
            add_r=True, win=win,
        )
        t3 = self._seg_L(obs, t3_obs)
        hll = lin.hll_raw + lam32 * jnp.eye(3, dtype=sd)[:, :, None]
        inc3 = -linalg.solve3x3f(hll, t3)  # [3, L]
        inc_proj = small_einsum(
            "ijm,jm->im", lin.kernel_lm, inc3
        )  # [4, L]
        part = pallas_pose2.ldiff2(
            kcam, lin.x4, lin.mm, lin.sw, lin.r_w, lin.jls8,
            self._expand_L(obs, inc_proj), zt_e, win=win,
        )
        l_diff = -self._psum(jnp.sum(part))
        inc4_L = (inc_proj * lin.jl_scale).astype(self.dtype)
        if isinstance(lm_p_h, LmState):
            rows = lm_p_h.rows + inc4_L
            # dehomogenize per row (pad rows divide by their stale
            # copy's w — finite, and only dead observations see them)
            return (
                LmState(rows=rows / rows[3:4, :]),
                l_diff.astype(self.dtype),
            )
        # canonical state update: one [4, M] take out of L space
        new_lm_h = lm_p_h + self._L_to_lm(obs, inc4_L).T
        new_lm_h = new_lm_h / new_lm_h[:, 3:4]
        return new_lm_h, l_diff.astype(self.dtype)
