"""Step-1 pOSE VarProj linearization and linear solvers, TPU-native.

This module replaces, as pure jit-ed array programs:
  - LandmarkBlockSC pOSE storage + ops      (sc/landmark_block.hpp:58-760)
  - LinearizationVarProj                    (sc/linearization_varproj.hpp)
  - LinearizationPowerVarproj               (sc/linearization_power_varproj.hpp)
  - LinearizationSC explicit-SC paths       (sc/linearization_sc.hpp)
  - LinearizorPowerVarproj / LinearizorSC   (solver/linearizor_*.cpp)

Data layout — observation-LAST everywhere (the TPU-critical decision):
the reference's per-landmark `storage_pOSE_ [4k x 16]` row blocks become
  Jp [4, 12, O], Jl [4, 3, O], r [4, O]
so the million-scale observation axis maps onto vector lanes (XLA tiles
the last two array dims onto (8,128) registers; batch-first [O,4,3]
arrays would pad the 3-wide minor dim to 128 lanes, a 40x memory
blowup). Per-camera / per-landmark accumulators are likewise batch-last:
hll_inv [3,3,M], b_inv [12,12,N], b [12,N].

Reductions: observations are sorted by landmark, so every TBB loop +
mutex scatter of the reference becomes a contiguous-segment reduction
(cumsum + boundary gather, solver/segments.py) — per-camera sums go
through a static resorting permutation. Small per-block factorizations
are batched hand-rolled kernels (ops/linalg *f variants), no LAPACK
custom calls.

The observation arrays flow through every jitted function as an explicit
`Obs` pytree argument (not closure captures, which would be baked into
the executable as constant literals); dynamic state (cameras [N,3,4],
landmarks [M,3], damping lambda) flows through arguments so LM
backtracking never recompiles.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from povar_tpu.ops.small_einsum import small_einsum

from povar_tpu.ops import linalg, pallas_cam, pallas_pose, pose_math
from povar_tpu.options import RobustNorm, SolverOptions, SolverType
from povar_tpu.solver import pcg as pcg_mod
from povar_tpu.solver.common import StagedTiming, accumulate_residual_info
from povar_tpu.solver.segments import (
    DupCorrect,
    PaddedReduce,
    _build_padded_reduce,
    build_dup_correct,
    build_slot_plan,
    dup_correct_rows,
    onehot_gather,
    onehot_segment_sum,
    padded_segment_sum,
    slot_expand,
    slot_part_sums,
    slot_segment_sum,
)

# build the dense camera one-hot incidence (MXU path for camera-side
# gathers/reductions) when it fits comfortably in HBM
ONEHOT_BUDGET_BYTES = 1_500_000_000

# largest camera count for the dense reduced-camera-system direct
# solve; above this CHOLESKY switches to the banded factorization
# (solver/band_chol.py)
DENSE_CHOL_MAX = 1536

_ROBUST_CODE = {
    RobustNorm.NONE: pose_math.ROBUST_NONE,
    RobustNorm.HUBER: pose_math.ROBUST_HUBER,
    RobustNorm.CAUCHY: pose_math.ROBUST_CAUCHY,
}


def _window_fallback(mode, obs_cam, obs_lm, n_lms, n_cams):
    """The camera-window plan was infeasible: fail loudly under
    pallas_kernels='on', and warn (never silently degrade — the XLA
    lowering is ~20x slower per observation) under 'auto'."""
    import logging

    from povar_tpu.solver.segments import WINDOW_W, camera_span_stats

    max_span, n_over = camera_span_stats(obs_cam, obs_lm, n_lms)
    msg = (
        f"camera-window plan infeasible even after RCM reordering: "
        f"{n_over} landmark(s) span up to {max_span} cameras, above "
        f"the largest window ({WINDOW_W}) at n_cams={n_cams}; "
        "falling back to the XLA lowering (~20x slower per "
        "observation)"
    )
    if mode == "on":
        raise ValueError(
            "pallas_kernels='on' but the " + msg.replace(
                "falling back to", "which would fall back to"
            )
        )
    logging.getLogger("povar_tpu").warning(msg)


class Obs(NamedTuple):
    """Static problem structure as a pytree (slot-ordered observations).

    Observations are reordered once at construction into the landmark
    slot layout (segments.build_slot_plan): each landmark's entries
    occupy a fixed-width contiguous slot, so per-landmark reductions
    are reshape+sum and expansions are broadcast. Fields:
    cam/lm: per-observation indices [Op]; uv: measurements [2, Op];
    weight: optional 0/1 mask [Op] covering slot pads and multi-chip
    shard pads (zero-weight rows contribute exactly zero everywhere);
    cam_red: bucketed gather/reduce plan for the camera side;
    cam_onehot: optional dense [Op, N] f32 incidence for MXU-matmul
    camera reductions (small N only); lm_order/lm_inv: slot-row <->
    canonical landmark id maps.
    """

    cam: jnp.ndarray
    lm: jnp.ndarray
    uv: jnp.ndarray
    weight: Optional[jnp.ndarray]
    cam_red: Optional[PaddedReduce]
    cam_onehot: Optional[jnp.ndarray]
    lm_order: jnp.ndarray
    lm_inv: jnp.ndarray
    # camera-window fields (large-N structured path; None otherwise):
    # window-local camera ids, per-aligned-block window index, and the
    # expanded-axis gather/scatter index maps (segments.py windows)
    cam_local: Optional[jnp.ndarray] = None
    win_kmap: Optional[jnp.ndarray] = None
    win_gather: Optional[jnp.ndarray] = None
    win_scatter: Optional[jnp.ndarray] = None
    # slot-row -> landmark combine reduce, present only when span-
    # overflow sub-landmark rows exist (segments.build_window_plan):
    # per-landmark sums are then bucketed-gather-summed across rows
    lm_combine: Optional[PaddedReduce] = None
    # duplicate-row correction keeping L space usable under overflow
    # sub-rows (segments.DupCorrect). Buildable, but NOT wired by
    # default: every write-back formulation measured SLOWER in situ
    # than the canonical combine round trip on TPU (a [3, R] scatter
    # fused to 245 ms/term; the select+dense-take variant still pays an
    # O(R) random gather) — see docs/PERFORMANCE.md "Adversarial".
    lm_dup: Optional[DupCorrect] = None
    # 1/0 mask over the landmark axis (SPMD padding; parallel/spmd.py)
    lm_mask: Optional[jnp.ndarray] = None


class Lin1(NamedTuple):
    """Step-1 linearization point (the 'storage' after stage 1+2 scaling:
    Jl columns scaled per landmark, Jp columns scaled per camera)."""

    Jp: jnp.ndarray  # [4, 12, O] scaled
    Jl: jnp.ndarray  # [4, 3, O] scaled
    r: jnp.ndarray  # [4, O] sqrt-weighted residuals
    pose_scale: jnp.ndarray  # [12, N]
    jl_scale: jnp.ndarray  # [3, M]


class Lin1S(NamedTuple):
    """Structured step-1 linearization point (Pallas path): the
    Kronecker-factored storage that replaces the Jp/Jl arrays entirely
    (see ops/pallas_pose.py). Everything f32.

    hll_raw/bl_raw are the UNSCALED landmark normal-equation slot sums
    (w A~^T A~, w A~^T r); the Jacobi scales apply as tiny outer
    products on [.., L]/[.., N] tables, never per observation.

    Landmark-axis fields live in the solver's L space (CamWindows):
    slot-ROW order when every landmark owns a unique slot row (zero
    index gathers in the seg/expand round trips), canonical M order
    under overflow sub-rows."""

    ct: jnp.ndarray  # [12, N] camera table (vec(P) rows) at lin point
    x: jnp.ndarray  # [3, O] landmarks expanded to observations
    r_w: jnp.ndarray  # [4, O] sqrt-weighted residuals
    sw: jnp.ndarray  # [1, O] sqrt robust weight (0 on dead rows)
    hll_raw: jnp.ndarray  # [3, 3, L]
    bl_raw: jnp.ndarray  # [3, L]
    jl_scale: jnp.ndarray  # [3, L]
    pose_scale: jnp.ndarray  # [12, N]


class LmState(NamedTuple):
    """Landmark state threaded through the LM loop in L space (slot-ROW
    order, CamWindows): `rows` is [K, L] in the state dtype (K=3 for
    step 1, 4 for step 2). Produced by `lm_pack`, consumed by
    linearize/compute_error/apply, converted back to the canonical
    [M, K] layout by `lm_unpack` at the stage boundary — so the
    per-iteration canonical<->slot-order state takes (4 x [K, M]
    random-access gathers, ~20% of device time at venice-1778) happen
    once per STAGE instead. Solver methods accept either representation;
    trajectories are bit-identical because the take commutes with every
    elementwise state operation."""

    rows: jnp.ndarray  # [K, L]


def _mask_rows(obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded observation lanes (no-op when unpadded)."""
    if obs.weight is None:
        return x
    w = obs.weight.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(w > 0, x, 0.0)


def make_obs(
    obs_cam, obs_lm, obs_uv, num_cameras, num_landmarks, dtype, obs_weight,
    solve_dtype=None, build_onehot=True, window_w=0,
):
    """Build the slot-ordered Obs pytree. Returns
    (obs, lm_slot_shapes, n_windows, window_w); the shapes and window
    count are static Python ints kept on the solver (outside the
    pytree).

    `window_w != 0` builds the camera-window layout for the large-N
    structured path (segments.build_window_plan); -1 picks the
    tightest width whose span-overflow stays within budget
    (choose_window_width). Cameras are first reordered by reverse
    Cuthill-McKee in PLANNING space when that tightens the spans (the
    canonical camera axis — state, accumulators, tables — is
    untouched; only the window maps see the permutation). Landmarks
    whose span still exceeds the window split into per-grid-cell
    sub-rows recombined by Obs.lm_combine, so the plan is always
    feasible."""
    import numpy as np

    from povar_tpu.solver.segments import (
        build_slot_plan_windowed,
        build_window_plan,
        choose_window_width,
        plan_camera_order,
    )

    obs_cam_np = np.asarray(obs_cam)
    obs_lm_np = np.asarray(obs_lm)
    obs_uv_np = np.asarray(obs_uv)
    if obs_uv_np.ndim == 2 and obs_uv_np.shape[-1] == 2:
        obs_uv_np = obs_uv_np.T  # accept [O, 2] input, use [2, O]

    n_win = 0
    if window_w:
        # RCM camera reordering for planning (bandwidth minimization
        # over the co-observation graph, the analogue of the
        # reference's camera adjacency at bal_problem.cpp:268-303);
        # kept only when it beats the identity ordering on the
        # (window width, overflow) cost model
        pos = plan_camera_order(
            obs_cam_np, obs_lm_np, num_cameras, num_landmarks
        )
        if pos is None:
            cam_plan = obs_cam_np.astype(np.int64)
            plan_to_orig = None  # identity
        else:
            cam_plan = pos[obs_cam_np]
            plan_to_orig = np.empty(num_cameras, dtype=np.int64)
            plan_to_orig[pos] = np.arange(num_cameras, dtype=np.int64)
        if window_w < 0:  # auto: tightest width within overflow budget
            window_w = choose_window_width(
                cam_plan, obs_lm_np, num_landmarks
            )
        obs_row, row_window, row_lm, win_start = build_window_plan(
            cam_plan, obs_lm_np, num_landmarks, width=window_w
        )
        n_win = len(win_start)
        from povar_tpu.ops.pallas_pose import PART_ALIGN

        sp = build_slot_plan_windowed(
            obs_row, row_window, row_lm, num_landmarks, n_win,
            pad_to=PART_ALIGN,
        )
        perm, pad_w, shapes = sp.perm, sp.pad_weight, sp.shapes
        lm_order, inv_pos = sp.lm_order, sp.lm_inv
    else:
        perm, pad_w, shapes, lm_order, inv_pos = build_slot_plan(
            obs_lm_np, num_landmarks, pad_to=pallas_cam.OBS_PAD
        )
    cam_slot = obs_cam_np[perm]
    lm_slot = obs_lm_np[perm]
    uv_slot = obs_uv_np[:, perm]
    if obs_weight is None:
        w = pad_w if (pad_w < 1.0).any() else None
    else:
        w = np.asarray(obs_weight)[perm] * pad_w

    cam_onehot = None
    if (
        build_onehot
        and solve_dtype == jnp.float32
        and len(cam_slot) * num_cameras * 4 <= ONEHOT_BUDGET_BYTES
    ):
        oh = np.zeros((len(cam_slot), num_cameras), dtype=np.float32)
        oh[np.arange(len(cam_slot)), cam_slot] = 1.0
        if w is not None:
            # fold the pad mask into the scatter side
            oh *= w[:, None].astype(np.float32)
        cam_onehot = jnp.asarray(oh)

    win_fields = {}
    if n_win:
        # window-local camera ids per (slot-ordered) observation,
        # computed in planning space
        lane_start = win_start[row_window[obs_row]][perm]
        cam_local = (cam_plan[perm] - lane_start).astype(np.int32)
        # expanded axis: column w*W + j is PLAN camera win_start[w]+j,
        # mapped back to the canonical camera id for gather/scatter
        cols = (win_start[:, None] + np.arange(window_w)[None, :])
        flat = cols.reshape(-1)
        in_range = (flat >= 0) & (flat < num_cameras)
        safe = np.clip(flat, 0, num_cameras - 1)
        if plan_to_orig is not None:
            safe = plan_to_orig[safe]
        gather = safe
        scatter = np.where(in_range, safe, num_cameras)
        win_fields = dict(
            cam_local=jnp.asarray(cam_local),
            win_kmap=jnp.asarray(sp.block_window),
            win_gather=jnp.asarray(gather.astype(np.int32)),
            win_scatter=jnp.asarray(scatter.astype(np.int32)),
        )
        if sp.has_duplicates:
            win_fields["lm_combine"] = _build_padded_reduce(
                sp.row_lm_ext, num_landmarks + 1
            )

    obs = Obs(
        cam=jnp.asarray(cam_slot, jnp.int32),
        lm=jnp.asarray(lm_slot, jnp.int32),
        uv=jnp.asarray(uv_slot, dtype),
        weight=None if w is None else jnp.asarray(w, dtype),
        cam_red=_build_padded_reduce(cam_slot, num_cameras),
        cam_onehot=cam_onehot,
        lm_order=jnp.asarray(lm_order),
        lm_inv=jnp.asarray(inv_pos),
        **win_fields,
    )
    return obs, shapes, n_win, window_w


class CamWindows:
    """Camera-window helpers shared by the stage solvers (large-N
    structured path; every method is a no-op when n_win == 0).
    Requires attributes: n_win, win_w, n_cams."""

    # SPMD hooks: the sharded solvers (parallel/spmd.py) run every
    # jitted entry inside shard_map over this mesh axis; per-camera
    # accumulators and scalar reductions then all-reduce over it.
    # None (default) = single-device tracing, _psum is the identity.
    spmd_axis = None

    def _psum(self, x):
        if self.spmd_axis is None:
            return x
        return jax.lax.psum(x, self.spmd_axis)

    def _psum_err(self, d):
        """All-reduce an accumulate_residual_info dict over the mesh
        (identity single-device). num_obs_all is the static global
        live count; the other buckets are device-local partial sums."""
        if self.spmd_axis is None:
            return d
        out = dict(d)
        for k in (
            "error_all", "residual_sum_all", "num_obs_valid",
            "error_valid", "residual_sum_valid",
        ):
            out[k] = self._psum(d[k])
        bad = (
            self._psum(
                (~d["is_numerically_valid"]).astype(jnp.int32)
            )
            > 0
        )
        out["is_numerically_valid"] = ~bad
        return out

    def _lm_masked(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        """Zero per-landmark outputs of fake landmark slots (SPMD
        padding; their normal equations are singular, so increments
        come out NaN and must not touch the state). x [..., M]."""
        if obs.lm_mask is None:
            return x
        m = obs.lm_mask.reshape((1,) * (x.ndim - 1) + (-1,)) > 0
        return jnp.where(m, x, 0.0)

    def _hll_guard(self, obs: Obs, hll: jnp.ndarray) -> jnp.ndarray:
        """Make fake-landmark (SPMD padding) 3x3 normal matrices the
        identity so downstream inversions/Cholesky stay FINITE — a NaN
        there would poison per-observation operands through the slot
        expansion when a device's local landmark 0 is itself fake.
        Their (zero right-hand-side) solves yield zero increments.
        hll [3, 3, M]."""
        if obs.lm_mask is None:
            return hll
        f = (1.0 - obs.lm_mask).astype(hll.dtype)
        return hll + f * jnp.eye(3, dtype=hll.dtype)[:, :, None]

    def _winargs(self, obs: Obs):
        if not self.n_win:
            return None
        return (obs.win_kmap, self.n_win, self.win_w)

    def _seg_lm_reexpand(self, obs: Obs, u: jnp.ndarray) -> jnp.ndarray:
        """Per-landmark sum of u [..., O] immediately re-expanded to
        observations [..., O] — the inner operation of every E0 matvec
        (right_mul_e0, linearization_power_varproj.hpp:364-453). With
        unique slot rows this is a pure reshape-sum-broadcast in SLOT
        ROW order (no canonical-order takes, which cost ~40% of a
        power term on device); duplicated overflow rows fall back to
        the canonical combine round trip."""
        from povar_tpu.solver.segments import (
            slot_part_sums,
            slot_row_expand,
        )

        if self._lm_rowspace(obs):
            rows = self._dup_fix(
                obs, slot_part_sums(u, self.lm_shapes)
            )
            return slot_row_expand(rows, self.lm_shapes)
        return self._gather_lm_x(obs, self._seg_lm(obs, u))

    # ---- landmark "L space": where per-landmark tables live between
    # a slot reduce and a slot expansion. With unique slot rows per
    # landmark (no overflow sub-rows) that is SLOT-ROW order, and both
    # directions are reshape-sum/broadcast with ZERO index gathers —
    # the same trick _seg_lm_reexpand plays for E0, extended to every
    # per-landmark quantity a linearization stores (Hll, bl, Jacobi
    # scales, tangent bases). Random-access [M]-table gathers otherwise
    # run ~100x below HBM bandwidth and dominated stage-2 linearize.
    # Overflow sub-rows stay in row space through the O(D) duplicate
    # correction (segments.DupCorrect: every row of a multi-row
    # landmark carries the landmark TOTAL after a reduce, so row-space
    # expansions and per-row solves remain per-landmark-consistent);
    # without a correction plan, L space IS canonical M order.

    def _lm_rowspace(self, obs: Obs) -> bool:
        return obs.lm_combine is None or obs.lm_dup is not None

    def _dup_fix(self, obs: Obs, rows: jnp.ndarray) -> jnp.ndarray:
        if obs.lm_dup is None:
            return rows
        return dup_correct_rows(rows, obs.lm_dup)

    def _seg_L(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        """[..., O] -> [..., L] per-landmark reduce into L space (dup
        rows hold their landmark total)."""
        from povar_tpu.solver.segments import slot_part_sums

        if self._lm_rowspace(obs):
            return self._dup_fix(
                obs, slot_part_sums(x, self.lm_shapes)
            )
        return self._seg_lm(obs, x)

    def _expand_L(self, obs: Obs, s: jnp.ndarray) -> jnp.ndarray:
        """[..., L] -> per-observation [..., O]."""
        from povar_tpu.solver.segments import slot_row_expand

        if self._lm_rowspace(obs):
            return slot_row_expand(s, self.lm_shapes)
        return self._gather_lm_x(obs, s)

    def _L_to_lm(self, obs: Obs, s: jnp.ndarray) -> jnp.ndarray:
        """[..., L] -> canonical [..., M] (one take; identity when L
        space is already canonical)."""
        if self._lm_rowspace(obs):
            return jnp.take(s, obs.lm_inv, axis=-1)
        return s

    def _lm_to_L(self, obs: Obs, s: jnp.ndarray) -> jnp.ndarray:
        """Canonical [..., M] -> [..., L] (one take; identity when L
        space is already canonical)."""
        if self._lm_rowspace(obs):
            return jnp.take(s, obs.lm_order, axis=-1)
        return s

    # ---- L-space state threading (see LmState). The LM driver packs
    # once per stage; every jitted entry accepts either representation
    # (a trace-time pytree branch), so direct canonical callers (tests,
    # tools) are unaffected.

    def lm_pack(self, lm_p):
        """Canonical [M, K] state -> LmState (identity on the XLA
        path, where no slot-order storage exists)."""
        if isinstance(lm_p, LmState) or not self.use_pallas:
            return lm_p
        return LmState(
            rows=self._jit_cached("lm_pack", self._lm_pack_rows)(
                self.obs, lm_p
            )
        )

    def lm_unpack(self, lm_p):
        """LmState -> canonical [M, K] state (identity otherwise)."""
        if not isinstance(lm_p, LmState):
            return lm_p
        return self._jit_cached("lm_unpack", self._lm_unpack_rows)(
            self.obs, lm_p.rows
        )

    def _lm_pack_rows(self, obs: Obs, lm_p):
        return self._lm_to_L(obs, jnp.asarray(lm_p, self.dtype).T)

    def _lm_unpack_rows(self, obs: Obs, rows):
        return self._L_to_lm(obs, rows).T

    def _lm_rows(self, obs: Obs, lm_p) -> jnp.ndarray:
        """State rows [K, L] in the state dtype from either
        representation (one take for canonical input, free for
        LmState)."""
        if isinstance(lm_p, LmState):
            return lm_p.rows
        return self._lm_to_L(obs, lm_p.T)

    def _lm_masked_L(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        """_lm_masked for L-space arrays (fake-landmark zeroing under
        SPMD; no-op without a mask)."""
        if obs.lm_mask is None:
            return x
        m = self._lm_to_L(obs, obs.lm_mask)
        m = m.reshape((1,) * (x.ndim - 1) + (-1,)) > 0
        return jnp.where(m, x, 0.0)

    def _hll_guard_L(self, obs: Obs, hll: jnp.ndarray) -> jnp.ndarray:
        """_hll_guard for L-space [3, 3, L] normal matrices.

        Unlike canonical M space, slot-ROW space contains PAD rows
        (lane/profile filler) whose sums are exactly zero — inverting
        them would poison per-observation expansions with NaN (0 * NaN
        = NaN survives the sw=0 dead-row mask). Their diagonal is a sum
        of squares, so == 0 identifies exactly the singular rows (pads
        AND SPMD fake landmarks); identity-guarding them keeps the
        inversions finite and their zero-rhs solves yield zero."""
        dg = hll[0, 0] + hll[1, 1] + hll[2, 2]
        f = (dg == 0).astype(hll.dtype)
        return hll + f * jnp.eye(3, dtype=hll.dtype)[:, :, None]

    def _kcam(self, obs: Obs) -> jnp.ndarray:
        """Camera ids as the kernels expect them (window-local under
        the windowed layout)."""
        return obs.cam_local if self.n_win else obs.cam

    def _expand_tbl(self, obs: Obs, tbl: jnp.ndarray) -> jnp.ndarray:
        """[R, N] camera table -> [R, n_win*W] window-expanded (tiny
        XLA gather; identity when not windowed)."""
        if not self.n_win:
            return tbl
        return jnp.take(tbl, obs.win_gather, axis=1)

    def _combine_cam_win(self, obs: Obs, y: jnp.ndarray) -> jnp.ndarray:
        """[R, n_win*W] per-window-camera sums -> [R, N] (duplicated
        cameras summed; out-of-range columns dropped; all-reduced over
        the mesh under SPMD — the ICI analogue of the reference's
        mutex scatter, sc/landmark_block.hpp:383-410)."""
        if not self.n_win:
            return self._psum(y) if self.spmd_axis else y
        out = jax.ops.segment_sum(
            y.T, obs.win_scatter, num_segments=self.n_cams + 1
        )
        return self._psum(out[: self.n_cams].T)

    # ---- fused single-kernel power-series E0 term (small-N path):
    # static planning shared by the stage solvers. The prefix of slot
    # parts narrow enough to unroll (w <= E0_TERM_MAX_W) runs the
    # single-pass kernel (pallas_pose.e0_term_parts / pallas_pose2.
    # e0_term2_parts); any wide-part suffix falls back to the composed
    # kernels on its (padded) obs slice. All-dead suffixes (the pad
    # tail build_slot_plan appends) are skipped outright.

    # f32 operand rows per slot element in the fused kernel's VMEM
    # frame (stage 1: cam+x+h = 13; stage 2 overrides with 15)
    _E0_TERM_ROWS = 13
    _e0_meta = None
    _e0_cam2 = None
    _e0_suffix = None

    def _plan_e0_fused(self) -> None:
        import numpy as np

        from povar_tpu.ops import pallas_pose

        metas = []
        ofs = 0
        n_parts = 0
        for g, w in self.lm_shapes:
            if w > pallas_pose.E0_TERM_MAX_W:
                break
            geo = pallas_pose.e0_term_geometry(
                w, g, self.n_cams, rows_per_lane=self._E0_TERM_ROWS
            )
            if geo is None:
                # retained one-hots [gt, n_pad] x w don't fit the VMEM
                # frame at this camera count: composed kernels instead
                break
            gt, gp = geo
            metas.append((ofs, g, w, gt, gp))
            ofs += g * w
            n_parts += 1
        if not metas:
            return
        o_pad = int(self.obs.cam.shape[0])
        cut = ofs
        w_np = (
            None if self.obs.weight is None
            else np.asarray(self.obs.weight)
        )
        live_total = o_pad if w_np is None else int((w_np > 0).sum())
        if cut == o_pad:
            live_suffix = 0
        elif w_np is None:
            live_suffix = o_pad - cut
        else:
            live_suffix = int((w_np[cut:] > 0).sum())
        # the fused prefix must carry the bulk of the live work; a
        # degenerate all-dead layout keeps the composed path too (the
        # fused kernels would only compute zeros)
        if live_total == 0:
            return
        if (live_total - live_suffix) / live_total < 0.5:
            return
        cam_np = np.asarray(self.obs.cam)
        cam2 = []
        for ofs_p, g, w, gt, gp in metas:
            c2 = cam_np[ofs_p : ofs_p + g * w].reshape(w, g)
            if gp != g:
                c2 = np.pad(c2, ((0, 0), (0, gp - g)))
            cam2.append(jnp.asarray(c2, jnp.int32))
        self._e0_meta = tuple(metas)
        self._e0_cam2 = tuple(cam2)
        if live_suffix:
            from povar_tpu.ops.pallas_cam import _round_up

            self._e0_suffix = (
                cut,
                tuple(self.lm_shapes[n_parts:]),
                _round_up(o_pad - cut, 512),
            )


class Stage1Solver(StagedTiming, CamWindows):
    # whole-solve-on-device LM loop (solver/device_loop.py): the raw
    # _trial/_linearize graphs compose under one lax.while_loop. SPMD
    # subclasses override to False (their raw graphs carry collectives
    # that must live inside shard_map; see parallel/spmd.py).
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
        self.alpha = float(options.alpha)
        self.robust = _ROBUST_CODE[options.residual.robust_norm]
        self.huber = float(options.residual.huber_parameter)
        self.power_m = int(options.power_sc_iterations)
        # reference quirk: only the power linearizor scales Jl columns
        # (linearizor_power_varproj.cpp:64 calls scale_Jl_cols_pOSE;
        # linearizor_sc.cpp linearize_pOSE has no such call). The SC
        # solve itself is scale-invariant, but back-substitution's
        # model-cost term J_inc += stored_Jl @ inc_lm is NOT, so the
        # lambda schedule diverges from the reference unless PCG /
        # CHOLESKY keep Jl unscaled.
        self.scale_jl = options.solver_type_step_1 in (
            SolverType.POWER_VARPROJ,
            SolverType.POWER_SCHUR_COMPLEMENT,
        )
        # inner-solve/storage dtype (mixed precision under f64 LM)
        self.solve_dtype = (
            jnp.float32
            if options.mixed_precision_solves and dtype == jnp.float64
            else dtype
        )
        # fused Pallas camera-side kernels (ops/pallas_cam.py): gated on
        # shape support; "auto" additionally requires a real TPU backend
        # (off-TPU they run in the interpreter — only useful for tests).
        # parallel.mesh.shard_obs turns this off: pallas_call does not
        # partition under GSPMD (multi-chip uses the XLA lowering).
        # make_obs always pads the obs axis to OBS_PAD, so support is
        # a function of camera count and dtype alone.
        mode = options.pallas_kernels
        shape_ok = pallas_cam.supported(
            pallas_cam.OBS_PAD, self.n_cams, self.solve_dtype
        )
        want = mode == "on" or (
            mode == "auto" and jax.default_backend() == "tpu"
        )
        self.use_pallas = shape_ok and want
        # large-N structured path: beyond the in-VMEM one-hot camera
        # limit, attempt the camera-window layout (O(W)-per-obs
        # gather/scatter at any N; segments.py windows)
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
                "pallas_kernels='on' but the problem shape is unsupported "
                f"(n_cams={self.n_cams} <= {pallas_cam.MAX_CAMERAS}, f32 "
                "inner solves required)"
            )
        # the dense direct solve needs the explicit per-observation W
        # blocks; it serves small problems where the XLA path is fast
        if options.solver_type_step_1 == SolverType.CHOLESKY:
            self.use_pallas = False
            try_windows = False
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
            _window_fallback(
                mode, obs_cam, obs_lm, self.n_lms, self.n_cams
            )
        self.jacobi_eps = options.effective_jacobi_scaling_epsilon(
            self.solve_dtype
        )
        # banded direct solver beyond the dense-RCS ceiling
        # (solver/band_chol.py: RCM band -> block-tridiagonal LLT).
        # When neither the dense nor the banded factorization covers
        # the graph, CHOLESKY falls back to PCG with a loud warning
        # instead of failing — the reference's SimplicialLLT
        # (linearization_sc.hpp:236-245) factors any sparsity, so a
        # CHOLESKY config must never hard-fail (VERDICT r3 #7).
        self._band_plan = None
        self._chol_pcg_fallback = False
        if (
            options.solver_type_step_1 == SolverType.CHOLESKY
            and self.n_cams > DENSE_CHOL_MAX
        ):
            import numpy as _np

            from povar_tpu.solver import band_chol

            self._band_plan = band_chol.build_band_plan(
                _np.asarray(self.obs.cam), _np.asarray(self.obs.lm),
                self.n_cams, self.n_lms,
                live=None if self.obs.weight is None
                else _np.asarray(self.obs.weight),
                allow_dense=True,
            )
            if self._band_plan is None:
                import warnings

                self._chol_pcg_fallback = True
                warnings.warn(
                    f"CHOLESKY at n_cams={self.n_cams}: the RCM block "
                    "bandwidth exceeds "
                    f"{band_chol.MAX_SUPERNODE} (no exploitable band "
                    "structure) and the camera count exceeds the "
                    "unbanded dense-factorization ceiling "
                    f"({band_chol.DENSE_UNBANDED_MAX}, O(N^2) block "
                    "table) — falling back to PCG with the "
                    "SCHUR_JACOBI preconditioner. Iteration counts "
                    "will reflect CG iterations, not a direct solve.",
                    RuntimeWarning,
                    stacklevel=2,
                )
            else:
                if self._band_plan.meta.bw >= self.n_cams - 1:
                    import warnings

                    warnings.warn(
                        f"CHOLESKY at n_cams={self.n_cams}: no "
                        "exploitable band structure (RCM bandwidth > "
                        f"{band_chol.MAX_SUPERNODE}) — factoring the "
                        "FULL dense RCS through the pair-stream "
                        "assembly (O(N^2) memory). The solve stays "
                        "direct (the reference's SimplicialLLT fills "
                        "toward dense on such graphs too); expect "
                        "this to be slower than PCG.",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                self._band_meta = self._band_plan.meta
                self._band_arrays = jax.tree.map(
                    jnp.asarray, self._band_plan.arrays
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
        # path): per-part operands reshaped landmark-major so one
        # pallas_call runs gather + per-landmark reduce + re-expand +
        # scatter of a term in a single pass (pallas_pose.e0_term_parts)
        self._e0_meta = None
        self._e0_cam2 = None
        self._e0_suffix = None
        if self.use_pallas and not self.n_win and options.fused_power_term:
            self._plan_e0_fused()

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
        """Measurements in the public [O, 2] convention."""
        return self.obs.uv.T

    # ------------------------------------------------------ public API
    # (bound to this problem's obs arrays)

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
        if self._chol_pcg_fallback:
            return self.solve_pcg(lin, lam)
        if self._band_plan is not None:
            return self._jit_solve_cholesky(
                self.obs, lin, lam, self._band_arrays
            )
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

    @property
    def supports_trial(self) -> bool:
        """True when the fused LM trial (one executable per
        backtracking trial) is available for this solver config.
        CHOLESKY stays on the staged path: its banded factorization
        threads host-side plan arrays through the jit boundary."""
        return self.opts.solver_type_step_1 in (
            SolverType.POWER_VARPROJ,
            SolverType.POWER_SCHUR_COMPLEMENT,
            SolverType.PCG,
        )

    def trial(self, cam_space, lm_p, lin, lam):
        """One fused LM backtracking trial: solve + apply +
        f64 cost evaluation in a SINGLE jit executable.

        The staged solve/apply/compute_error sequence makes three
        dispatches and two full device->host syncs per trial (the
        [12, N] increment round-trips through the host between solve
        and apply). One LM trial is one logical device step — fusing
        it removes the inter-module scheduling gaps (~1.5 ms/iter at
        venice-89) and the increment round-trip; only the scalars the
        accept/reject rule needs (finiteness, l_diff, cost) ever reach
        the host. The reference's driver has the same structure
        host-side (bal_bundle_adjustment.cpp:337-448: solve, apply,
        compute_error, then the f_diff test); on TPU the whole trial
        belongs in one executable.

        Returns (new_cams, new_lms, inc_finite, num_inner_iters,
        l_diff, err_dict). When the increment is non-finite, the
        staged caller must discard the trial state (same contract as
        the reference's NaN check, cpp:362-401)."""
        return self._jit_trial(self.obs, cam_space, lm_p, lin, lam)

    def _trial(self, obs: Obs, cam_space, lm_p, lin: Lin1, lam):
        st = self.opts.solver_type_step_1
        if st == SolverType.POWER_VARPROJ:
            inc, n_iter = self._solve_power(
                obs, lin, lam, landmark_damping=False
            )
        elif st == SolverType.POWER_SCHUR_COMPLEMENT:
            inc, n_iter = self._solve_power(
                obs, lin, lam, landmark_damping=True
            )
        elif st == SolverType.PCG:
            inc, n_iter = self._solve_pcg(obs, lin, lam)
        else:  # pragma: no cover - guarded by supports_trial
            raise ValueError(f"fused trial unsupported for {st}")
        inc_finite = jnp.all(jnp.isfinite(inc))
        if st == SolverType.POWER_SCHUR_COMPLEMENT:
            new_cams, new_lms, l_diff = self._apply_poba(
                obs, cam_space, lm_p, lin, inc,
                lam.astype(self.dtype),
            )
        else:
            new_cams, new_lms, l_diff = self._apply(
                obs, cam_space, lm_p, lin, inc
            )
        err = self._compute_error(obs, new_cams, new_lms)
        return new_cams, new_lms, inc_finite, n_iter, l_diff, err

    # ----------------------------------------------- staged (timed) API
    # The same compute graphs as linearize/solve/apply, split at the
    # reference's per-iteration timing boundaries
    # (solver_summary.hpp:186-212) and synced between stages so each
    # span is a real device wall time. The fused methods above remain
    # the single source of truth: every staged piece is a sub-function
    # they compose.

    def linearize_timed(self, cam_space, lm_p):
        """Returns (lin, timings): jacobian_evaluation,
        scale_landmark_jacobian, scale_pose_jacobian."""
        t = {}
        if self.use_pallas:
            core, t["jacobian_evaluation"] = self._timed(
                self._jit_cached("lin_core_s", self._lin_core_s),
                self.obs, cam_space, lm_p,
            )
            ct, x, r_w, sw, hll_raw, bl_raw, jpsq = core
            jl_scale, t["scale_landmark_jacobian"] = self._timed(
                self._jit_cached("lin_scale_jl_s", self._lin_scale_jl_s),
                hll_raw,
            )
            pose_scale, t["scale_pose_jacobian"] = self._timed(
                self._jit_cached("lin_scale_jp_s", self._lin_scale_jp_s),
                jpsq,
            )
            return Lin1S(
                ct=ct, x=x, r_w=r_w, sw=sw, hll_raw=hll_raw,
                bl_raw=bl_raw, jl_scale=jl_scale, pose_scale=pose_scale,
            ), t
        (r, Jp, Jl), t["jacobian_evaluation"] = self._timed(
            self._jit_cached("lin_core", self._lin_core),
            self.obs, cam_space, lm_p,
        )
        (Jl, jl_scale), t["scale_landmark_jacobian"] = self._timed(
            self._jit_cached("lin_scale_jl", self._lin_scale_jl),
            self.obs, Jl,
        )
        (Jp, pose_scale), t["scale_pose_jacobian"] = self._timed(
            self._jit_cached("lin_scale_jp", self._lin_scale_jp),
            self.obs, Jp,
        )
        return Lin1(
            Jp=Jp, Jl=Jl, r=r, pose_scale=pose_scale, jl_scale=jl_scale
        ), t

    def solve_timed(self, lin, lam):
        """Dispatch like `solve`, returning (inc, lin_iters, timings):
        stage2 (Hll scale/damp/invert span), landmark_damping, prepare,
        compute_preconditioner (PCG), solve_reduced_system."""
        st = self.opts.solver_type_step_1
        lam = jnp.asarray(lam, self.dtype)
        t = {}
        structured = isinstance(lin, Lin1S)
        if st in (SolverType.POWER_VARPROJ,
                  SolverType.POWER_SCHUR_COMPLEMENT):
            ld = st == SolverType.POWER_SCHUR_COMPLEMENT
            if structured:
                lam32 = lam.astype(self.solve_dtype)
                pieces, t["stage2"] = self._timed(
                    self._jit_cached(
                        "hll_pieces_s", self._hll_pieces_s,
                        static_argnames=("landmark_damping",),
                    ),
                    self.obs, lin, lam32, ld,
                )
                prep, t["prepare"] = self._timed(
                    self._jit_cached("power_prep_s", self._power_prep_s),
                    self.obs, lin, lam32, pieces,
                )
                (inc, n_iter), t["solve_reduced_system"] = self._timed(
                    self._jit_cached(
                        "power_iterate_s", self._power_iterate_s
                    ),
                    self.obs, lin, prep,
                )
            else:
                pieces, t["stage2"] = self._timed(
                    self._jit_cached(
                        "prep_hll", self._prep_hll,
                        static_argnames=("landmark_damping",),
                    ),
                    self.obs, lin, lam, ld,
                )
                prep, t["prepare"] = self._timed(
                    self._jit_cached("power_prep", self._power_prep),
                    self.obs, lin, lam, *pieces,
                )
                (inc, n_iter), t["solve_reduced_system"] = self._timed(
                    self._jit_cached("power_iterate", self._power_iterate),
                    self.obs, lin, prep,
                )
            # the Hll span includes the poBA landmark damping
            # (set_landmark_damping, linearizor_power_varproj.cpp:199-201)
            t["landmark_damping"] = t["stage2"] if ld else 0.0
            return inc, n_iter, t
        if st == SolverType.PCG or (
            st == SolverType.CHOLESKY and self._chol_pcg_fallback
        ):
            if structured:
                lam32 = lam.astype(self.solve_dtype)
                pieces, t["stage2"] = self._timed(
                    self._jit_cached(
                        "hll_pieces_s", self._hll_pieces_s,
                        static_argnames=("landmark_damping",),
                    ),
                    self.obs, lin, lam32, False,
                )
                (b, hpp, h), t["prepare"] = self._timed(
                    self._jit_cached("pcg_prep_s", self._pcg_prep_s),
                    self.obs, lin, pieces,
                )
                pmats, t["compute_preconditioner"] = self._timed(
                    self._jit_cached("pcg_precond_s", self._pcg_precond_s),
                    self.obs, lin, lam32, hpp, h,
                )
                (inc, n_iter), t["solve_reduced_system"] = self._timed(
                    self._jit_cached("pcg_iterate_s", self._pcg_iterate_s),
                    self.obs, lin, lam32, b, hpp, h, pmats,
                )
            else:
                pieces, t["stage2"] = self._timed(
                    self._jit_cached(
                        "prep_hll", self._prep_hll,
                        static_argnames=("landmark_damping",),
                    ),
                    self.obs, lin, lam, False,
                )
                hll_inv, hll_inv_bl = pieces
                (b, hpp, W), t["prepare"] = self._timed(
                    self._jit_cached("pcg_prep", self._pcg_prep),
                    self.obs, lin, hll_inv, hll_inv_bl,
                )
                pmats, t["compute_preconditioner"] = self._timed(
                    self._jit_cached("pcg_precond", self._pcg_precond),
                    self.obs, lin, hll_inv, hpp, lam,
                )
                (inc, n_iter), t["solve_reduced_system"] = self._timed(
                    self._jit_cached("pcg_iterate", self._pcg_iterate),
                    self.obs, lin, lam, b, hpp, W, pmats,
                )
            return inc, n_iter, t
        if st == SolverType.CHOLESKY:
            pieces, t["stage2"] = self._timed(
                self._jit_cached(
                    "prep_hll", self._prep_hll,
                    static_argnames=("landmark_damping",),
                ),
                self.obs, lin, lam, False,
            )
            if self._band_plan is not None:
                (inc, n_iter), t["solve_reduced_system"] = self._timed(
                    self._jit_cached(
                        "chol_solve_band", self._chol_solve_banded
                    ),
                    self.obs, lin, lam, *pieces, self._band_arrays,
                )
            else:
                (inc, n_iter), t["solve_reduced_system"] = self._timed(
                    self._jit_cached("chol_solve", self._chol_solve),
                    self.obs, lin, lam, *pieces,
                )
            return inc, n_iter, t
        raise ValueError(f"unknown step-1 solver type {st}")

    def apply_timed(self, cam_space, lm_p, lin, inc_scaled, lam=None):
        """Apply with (update_cameras, back_substitution) wall times.
        `lam` selects the poBA back-substitution (dispatch mirrors the
        LM driver's solver-type switch)."""
        t = {}
        is_poba = (
            self.opts.solver_type_step_1
            == SolverType.POWER_SCHUR_COMPLEMENT
        )
        new_cam, t["update_cameras"] = self._timed(
            self._jit_cached("update_cams", self._update_cams),
            cam_space, lin, inc_scaled,
        )
        if is_poba:
            (new_lm, l_diff), t["back_substitution"] = self._timed(
                self._jit_cached("back_sub_poba", self._back_sub_poba),
                self.obs, lm_p, lin, inc_scaled,
                jnp.asarray(lam, self.dtype),
            )
        else:
            (new_lm, l_diff), t["back_substitution"] = self._timed(
                self._jit_cached("back_sub", self._back_sub),
                self.obs, new_cam, lm_p, lin, inc_scaled,
            )
        return new_cam, new_lm, l_diff, t

    # -------------------------------------------------------------- utils

    def _seg_cam_outer(
        self, obs: Obs, A: jnp.ndarray, B: jnp.ndarray
    ) -> jnp.ndarray:
        """seg_cam(einsum('kio,kjo->ijo', A, B)) with bounded peak
        memory: with the one-hot path the [I,J,O] product streams into
        the MXU; without it (large N), the product plus its bucket-
        gather copy would be multi-GB at BAL-final scale, so compute it
        in row chunks of I."""
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
            rows.append(self._seg_cam(obs, row))  # [J, N]
        return jnp.stack(rows, axis=0)  # [I, J, N]

    def _seg_cam(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        """[..., O] -> [..., N] per-camera reduction (fused Pallas
        scatter, MXU one-hot matmul, or bucketed gather+sum)."""
        if self.use_pallas and not self.n_win and x.dtype == jnp.float32:
            flat = x.reshape(-1, x.shape[-1])
            out = pallas_cam.cam_scatter_add(flat, obs.cam, self.n_cams)
            return out.reshape(x.shape[:-1] + (self.n_cams,))
        if obs.cam_onehot is not None and x.dtype == obs.cam_onehot.dtype:
            return onehot_segment_sum(x, obs.cam_onehot)
        return padded_segment_sum(x, obs.cam_red)

    def _gather_cam_x(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        """x [..., N] -> per-observation [..., O]."""
        if self.use_pallas and not self.n_win and x.dtype == jnp.float32:
            flat = x.reshape(-1, x.shape[-1])
            out = pallas_cam.cam_gather(flat, obs.cam)
            return out.reshape(x.shape[:-1] + (out.shape[-1],))
        if obs.cam_onehot is not None and x.dtype == obs.cam_onehot.dtype:
            return onehot_gather(x, obs.cam_onehot)
        return x[..., obs.cam]

    def _seg_lm(self, obs: Obs, x: jnp.ndarray) -> jnp.ndarray:
        """[..., O] -> [..., M] per-landmark reduction: reshape+sum over
        the fixed-width landmark slots; overflow sub-landmark rows are
        re-combined by the bucketed lm_combine reduce (segment M is the
        pad-row bin, dropped)."""
        if obs.lm_combine is not None:
            rows = slot_part_sums(x, self.lm_shapes)
            return padded_segment_sum(rows, obs.lm_combine)[
                ..., : self.n_lms
            ]
        return slot_segment_sum(x, self.lm_shapes, obs.lm_inv)

    def _gather_lm_x(self, obs: Obs, s: jnp.ndarray) -> jnp.ndarray:
        """s [..., M] -> per-observation [..., O]: slice + broadcast
        over the landmark slots."""
        return slot_expand(s, self.lm_shapes, obs.lm_order)

    def _gather_cams(self, obs: Obs, cam_space: jnp.ndarray) -> jnp.ndarray:
        """cam_space [N,3,4] -> per-obs P [3,4,O]. In windowed mode the
        global-id one-hot kernel would need a [N_pad, T] on-chip
        incidence (N > MAX_CAMERAS by construction), so fall back to the
        XLA gather there."""
        t = jnp.transpose(cam_space, (1, 2, 0))  # [3, 4, N]
        if (
            self.use_pallas and not self.n_win
            and cam_space.dtype == jnp.float32
        ):
            o = pallas_cam.cam_gather(t.reshape(12, -1), obs.cam)
            return o.reshape(3, 4, -1)
        return t[:, :, obs.cam]

    # ------------------------------------------------------ error / init

    def _compute_error(
        self, obs: Obs, cam_space: jnp.ndarray, lm_p: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """compute_error_pOSE (helper.cpp:116-154). pOSE projections are
        always 'valid' (linearize_point_pOSE sets projection_valid=true
        unconditionally, helper.cpp:263).

        Structured path: double-float (two-f32) evaluation at ~47-bit
        end-to-end precision (ops/pallas_pose.pose_error_df32) — the
        emulated-f64 sweep costs 72 ms/call at venice-89 on v5e."""
        if (
            self.use_pallas
            and self.dtype == jnp.float64
            and self.solve_dtype == jnp.float32
        ):
            # mixed mode only: pure-f64 evaluates below in true f64
            return self._compute_error_df32(obs, cam_space, lm_p)
        P = self._gather_cams(obs, cam_space)
        x = self._expand_L(obs, self._lm_rows(obs, lm_p))  # [3, O]
        r = _mask_rows(
            obs, pose_math.pose_residual_t(P, x, obs.uv, self.alpha)
        )
        res_sq = jnp.sum(r * r, axis=0)  # [O]
        err, _w = pose_math.robust_error_and_weight(
            res_sq, self.robust, self.huber
        )
        finite = jnp.all(jnp.isfinite(r), axis=0)
        valid = jnp.ones_like(finite)
        if obs.weight is not None:
            active = obs.weight > 0
            err = jnp.where(active, err, 0.0)
            valid = active
            finite = jnp.logical_or(finite, ~active)
        return self._psum_err(accumulate_residual_info(
            err, jnp.sqrt(res_sq), valid, finite,
            num_obs_all=self.n_obs_live,
        ))

    def _initialize_varproj(
        self, obs: Obs, cam_space: jnp.ndarray
    ) -> jnp.ndarray:
        """Closed-form VarProj landmark init v*(u0) = (G^T G)^-1 G^T z
        (helper.cpp:75-99 via normal equations instead of thin SVD; the
        reference documents this identity at helper.cpp:218-219).
        Returns lm_p [M, 3].

        Structured path: at x = 0 the pOSE residual is r = A~ e4 - corr
        = -z and A~[:, :3] = G, so one `prepare` pass with zero
        landmarks yields G^T G = ata and G^T z = -atr exactly."""
        if self.use_pallas:
            sd = self.solve_dtype
            o = obs.cam.shape[0]
            ct = cam_space.astype(sd).reshape(self.n_cams, 12).T
            zeros = jnp.zeros((3, o), sd)
            _rw, _sw, ata, atr, _jpsq = pallas_pose.prepare(
                self._kcam(obs), self._expand_tbl(obs, ct), zeros,
                obs.uv.astype(sd),
                self._mask1(obs), alpha=self.alpha, robust=0,
                huber=1.0, weighted=False, win=self._winargs(obs),
            )
            gtg = self._hll_guard_L(
                obs, self._seg_L(obs, ata).reshape(3, 3, -1)
            )
            gtz = -self._seg_L(obs, atr)
            lm0 = self._L_to_lm(obs, linalg.solve3x3f(gtg, gtz))
            return self._lm_masked(obs, lm0).T.astype(self.dtype)
        P = self._gather_cams(obs, cam_space)
        gtg, gtz = pose_math.varproj_init_normal_eq_t(P, obs.uv, self.alpha)
        gtg_lm = self._seg_lm(obs, _mask_rows(obs, gtg))  # [3, 3, M]
        gtz_lm = self._seg_lm(obs, _mask_rows(obs, gtz))  # [3, M]
        return linalg.solve3x3f(gtg_lm, gtz_lm).T

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
        point, so we fuse it here).

        In mixed mode the storage is evaluated and kept in the solve
        dtype (f32): every LM decision is driven by f64 costs of exact
        f64 states, so f32 Jacobian storage only perturbs the *steps*
        at ~1e-7 relative — inside the forcing tolerance."""
        if self.use_pallas:
            return self._linearize_s(obs, cam_space, lm_p)
        r, Jp, Jl = self._lin_core(obs, cam_space, lm_p)
        Jl, jl_scale = self._lin_scale_jl(obs, Jl)
        Jp, pose_scale = self._lin_scale_jp(obs, Jp)
        return Lin1(
            Jp=Jp, Jl=Jl, r=r, pose_scale=pose_scale, jl_scale=jl_scale
        )

    def _lin_core(
        self, obs: Obs, cam_space: jnp.ndarray, lm_p: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Jacobian/residual evaluation with sqrt robust weights applied
        (the jacobian_evaluation timing span)."""
        sd = self.solve_dtype
        P = self._gather_cams(obs, cam_space.astype(sd))
        x = self._expand_L(obs, self._lm_rows(obs, lm_p).astype(sd))
        r, Jp, Jl = pose_math.pose_jacobians_t(
            P, x, obs.uv.astype(sd), self.alpha
        )
        r = _mask_rows(obs, r)
        Jp = _mask_rows(obs, Jp)
        Jl = _mask_rows(obs, Jl)

        res_sq = jnp.sum(r * r, axis=0)
        _err, w = pose_math.robust_error_and_weight(
            res_sq, self.robust, self.huber
        )
        sw = jnp.sqrt(w)  # [O]
        return r * sw[None], Jp * sw[None, None], Jl * sw[None, None]

    def _lin_scale_jl(self, obs: Obs, Jl: jnp.ndarray):
        """Landmark Jacobi column scaling: 1 / (eps + col_norm) over the
        landmark's rows (scale_Jl_cols_pOSE, landmark_block.hpp:284-300)."""
        jl_sq = self._seg_lm(obs, jnp.sum(Jl * Jl, axis=0))  # [3, M]
        if not self.scale_jl:  # SC linearizor quirk (see __init__)
            return Jl, jnp.ones_like(jl_sq)
        jl_scale = 1.0 / (self.jacobi_eps + jnp.sqrt(jl_sq))
        return Jl * self._gather_lm_x(obs, jl_scale)[None], jl_scale

    def _lin_scale_jp(self, obs: Obs, Jp: jnp.ndarray):
        """Pose Jacobi column scaling: 1 / (eps + sqrt(diag(Jp^T Jp)))
        (scale_Jp_cols_pOSE, landmark_block.hpp:324-334)."""
        jp_sq = self._seg_cam(obs, jnp.sum(Jp * Jp, axis=0))  # [12, N]
        pose_scale = 1.0 / (self.jacobi_eps + jnp.sqrt(jp_sq))
        return Jp * self._gather_cam_x(obs, pose_scale)[None], pose_scale

    # ------------------------------------------------------ Schur pieces

    def _prep_hll(
        self, obs: Obs, lin: Lin1, lam: jnp.ndarray, landmark_damping: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Landmark-side half of prepare_Hb: assemble + (poBA-)damp +
        invert Hll, and the landmark gradient solve Hll^-1 bl. This is
        the staged-timing boundary matching the reference's stage-2
        span (set_landmark_damping + Hll work,
        linearizor_power_varproj.cpp:185-203)."""
        lam = lam.astype(lin.Jl.dtype)
        eye3 = jnp.eye(3, dtype=lin.Jl.dtype)[:, :, None]
        hll = self._seg_lm(obs, small_einsum("kio,kjo->ijo", lin.Jl, lin.Jl))
        if landmark_damping:
            hll = hll + lam * eye3
        hll_inv = linalg.inv3x3f(hll)

        bl = self._seg_lm(obs, small_einsum("kio,ko->io", lin.Jl, lin.r))
        hll_inv_bl = small_einsum("ijm,jm->im", hll_inv, bl)  # [3, M]
        return hll_inv, hll_inv_bl

    def _prep_hpp_b(
        self, obs: Obs, lin: Lin1, hll_inv_bl: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Camera-side half of prepare_Hb: VarProj-corrected residual and
        the per-camera gradient/block-diagonal sums."""
        r_tilde = lin.r - small_einsum(
            "ijo,jo->io", lin.Jl, self._gather_lm_x(obs, hll_inv_bl)
        )
        if self.use_pallas and lin.Jp.dtype == jnp.float32:
            # one fused pass over Jp produces both per-camera sums
            hpp_flat, b = pallas_cam.hpp_b(
                lin.Jp.reshape(48, -1), r_tilde, obs.cam, self.n_cams
            )
            hpp = hpp_flat.reshape(12, 12, self.n_cams)
        else:
            b = self._seg_cam(
                obs, small_einsum("kio,ko->io", lin.Jp, r_tilde)
            )
            hpp = self._seg_cam_outer(obs, lin.Jp, lin.Jp)
        return b, hpp

    def _prepare_hb(
        self, obs: Obs, lin: Lin1, lam: jnp.ndarray, landmark_damping: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """prepare_Hb_pOSE / prepare_Hb_pOSE_poBA
        (sc/linearization_power_varproj.hpp:126-188):
          hll_inv [3,3,M]   = (Jl^T Jl (+ lam I for poBA))^-1
          b       [12,N]    = sum_obs Jp^T (r - Jl hll_inv bl)
          hpp     [12,12,N] = blockdiag(Jp^T Jp), undamped
        """
        hll_inv, hll_inv_bl = self._prep_hll(obs, lin, lam, landmark_damping)
        b, hpp = self._prep_hpp_b(obs, lin, hll_inv_bl)
        return b, hpp, hll_inv

    def _e0_matvec(
        self, x: jnp.ndarray, obs: Obs, lin: Lin1, hll_inv: jnp.ndarray
    ) -> jnp.ndarray:
        """Matrix-free E0 = Jp^T Jl Hll^-1 Jl^T Jp product
        (right_mul_e0_pOSE, linearization_power_varproj.hpp:364-407):
        gather x per obs, two small einsums, per-landmark reduce through
        Hll^-1, and a per-camera segment reduce. x, result: [12, N]."""
        xc = self._gather_cam_x(obs, x)  # [12, O]
        jpx = small_einsum("ijo,jo->io", lin.Jp, xc)  # [4, O]
        u = self._seg_lm(obs, small_einsum("ijo,io->jo", lin.Jl, jpx))
        w = small_einsum("ijm,jm->im", hll_inv, u)  # [3, M]
        v = small_einsum(
            "ijo,jo->io", lin.Jl, self._gather_lm_x(obs, w)
        )  # [4, O]
        return self._seg_cam(obs, small_einsum("ijo,io->jo", lin.Jp, v))

    def _e0_factor(
        self, obs: Obs, lin: Lin1, hll_inv: jnp.ndarray, dtype
    ) -> jnp.ndarray:
        """Factorized E0 operand: W_o = L_m^T (Jl_o^T Jp_o) [3, 12, O]
        with Hll^-1 = L L^T, so E0 = (scatter_cam W^T)(seg_lm W gather).
        Precomputed once per solve; each power term then reads one
        [3,12,O] array instead of Jp and Jl plus a 4-wide intermediate
        (~40% less HBM traffic across the m terms)."""
        A = small_einsum("kio,kjo->ijo", lin.Jl, lin.Jp)  # [3, 12, O]
        L = linalg.cholesky_smallf(hll_inv)  # [3, 3, M]
        Lg = self._gather_lm_x(obs, L).astype(dtype)
        return small_einsum("kio,kjo->ijo", Lg, A.astype(dtype))

    def _e0_w_matvec(
        self, x: jnp.ndarray, obs: Obs, W: jnp.ndarray
    ) -> jnp.ndarray:
        """E0 x through the factorized operand W [3, 12, O].

        Pallas path: two fused kernels around the slot-layout landmark
        reduction, each reading W exactly once per power term and
        building the camera one-hot on-chip (no [12, O] intermediates,
        no [O, N] incidence in HBM)."""
        if self.use_pallas and W.dtype == jnp.float32:
            w36 = W.reshape(36, -1)
            u = pallas_cam.e0_u(w36, obs.cam, x)  # [3, O]
            sb = self._seg_lm_reexpand(obs, u)  # [3, O]
            return pallas_cam.e0_scatter(w36, obs.cam, sb, self.n_cams)
        xc = x[:, obs.cam]  # [12, O]
        u = small_einsum("ijo,jo->io", W, xc)  # [3, O]
        v = small_einsum(
            "ijo,io->jo", W, self._seg_lm_reexpand(obs, u)
        )  # [12, O]
        return self._seg_cam(obs, v)

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
        Returns (inc [12, N] in scaled coordinates, num_terms).

        Assembly (residual-dependent b, Hll, Hpp inverses) runs in the
        storage dtype; the series itself optionally runs in f32 (see
        SolverOptions.mixed_precision_solves) — the forcing tolerance
        eta bounds the required inner accuracy far above f32 epsilon."""
        if isinstance(lin, Lin1S):
            return self._solve_power_s(obs, lin, lam, landmark_damping)
        hll_inv, hll_inv_bl = self._prep_hll(obs, lin, lam, landmark_damping)
        prep = self._power_prep(obs, lin, lam, hll_inv, hll_inv_bl)
        return self._power_iterate(obs, lin, prep)

    def _power_prep(
        self, obs: Obs, lin: Lin1, lam, hll_inv, hll_inv_bl
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Camera-side prepare for the power solve: (neg-gradient,
        damped-inverted block diagonal, factorized E0 operand)."""
        b, hpp = self._prep_hpp_b(obs, lin, hll_inv_bl)
        hpp = hpp + lam.astype(hpp.dtype) * jnp.eye(
            12, dtype=hpp.dtype
        )[:, :, None]
        b_inv = linalg.inv_psd_smallf(hpp)
        sd = self.solve_dtype
        W = self._e0_factor(obs, lin, hll_inv, sd)
        return (-b).astype(sd), b_inv.astype(sd), W

    def _power_iterate(
        self, obs: Obs, lin: Lin1, prep
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Power-series recurrence from prepared operands."""
        nb, b_inv_s, W = prep

        def b_inv_apply(v):
            return small_einsum("ijn,jn->in", b_inv_s, v)

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
        W = small_einsum("kio,kjo->ijo", lin.Jp, lin.Jl)  # [12, 3, O]
        Wh = small_einsum("ijo,jko->iko", W, self._gather_lm_x(obs, hll_inv))
        corr = self._seg_cam(obs, small_einsum("iko,jko->ijo", Wh, W))
        eye = jnp.eye(12, dtype=hpp.dtype)[:, :, None]
        return hpp + lam.astype(hpp.dtype) * eye - corr

    def _solve_pcg(
        self, obs: Obs, lin: Lin1, lam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """PCG path (linearizor_sc.cpp:91-172): implicit RCS operator +
        Schur-Jacobi block-diagonal preconditioner; solves S x = b and
        returns inc = -x (linearizor_base.cpp:102-125 negation).

        Mixed precision like _solve_power: assembly in state dtype, CG
        iteration in solve_dtype.

        Preconditioner per options.preconditioner_type: SCHUR_JACOBI
        (block-diagonal of S, cg/preconditioner.hpp:70-144 — the only
        one the reference's live path allows, linearizor_sc.cpp:143),
        JACOBI (scalar diagonal of S, DiagonalPreconditioner
        hpp:46-68), or IDENTITY."""
        if isinstance(lin, Lin1S):
            return self._solve_pcg_s(obs, lin, lam)
        hll_inv, hll_inv_bl = self._prep_hll(obs, lin, lam, False)
        b, hpp, W = self._pcg_prep(obs, lin, hll_inv, hll_inv_bl)
        pmats = self._pcg_precond(obs, lin, hll_inv, hpp, lam)
        return self._pcg_iterate(obs, lin, lam, b, hpp, W, pmats)

    def _pcg_prep(self, obs: Obs, lin: Lin1, hll_inv, hll_inv_bl):
        b, hpp = self._prep_hpp_b(obs, lin, hll_inv_bl)
        W = self._e0_factor(obs, lin, hll_inv, self.solve_dtype)
        return b, hpp, W

    def _pcg_precond(self, obs: Obs, lin: Lin1, hll_inv, hpp, lam):
        """Preconditioner materials for the generic CG path (see
        _pcg_precond_s)."""
        from povar_tpu.options import PreconditionerType as PT

        sd = self.solve_dtype
        pt = self.opts.preconditioner_type
        if pt == PT.IDENTITY:
            return ()
        diag_blocks = self._schur_diag(obs, lin, hll_inv, hpp, lam)
        if pt == PT.JACOBI:
            n = diag_blocks.shape[0]
            d = diag_blocks[jnp.arange(n), jnp.arange(n)].astype(sd)
            return (jnp.where(d != 0, 1.0 / d, 1.0),)
        return (linalg.cholesky_smallf(diag_blocks).astype(sd),)

    def _pcg_iterate(
        self, obs: Obs, lin: Lin1, lam, b, hpp, W, pmats
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        sd = self.solve_dtype
        hpp_s = hpp.astype(sd)
        lam_s = lam.astype(sd)
        b_s = b.astype(sd)

        def matvec(x):
            bx = small_einsum("ijn,jn->in", hpp_s, x) + lam_s * x
            return bx - self._e0_w_matvec(x, obs, W)

        res = pcg_mod.conjugate_gradients(
            matvec,
            b_s,
            jnp.zeros_like(b_s),
            self._precond_closure(pmats),
            max_iterations=self.opts.max_linear_solver_iterations,
            min_iterations=self.opts.min_linear_solver_iterations,
            q_tolerance=self.opts.eta,
            r_tolerance=-1.0,
            residual_reset_period=self.opts.residual_reset_period,
        )
        return (-res.x).astype(self.dtype), res.num_iterations

    def _solve_cholesky(
        self, obs: Obs, lin: Lin1, lam: jnp.ndarray, band_arrs=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """CHOLESKY path (linearization_sc.hpp:236-245 solve_direct_pOSE):
        materialize the dense reduced camera system S [12N, 12N] and
        solve S inc = -b with the hand-rolled Cholesky — or, when
        `band_arrs` is given (n_cams > DENSE_CHOL_MAX), the banded
        block-tridiagonal factorization. S = blockdiag(Hpp) + lam I -
        A A^T with A = [W_o hll_chol^-T] scattered by (cam, lm)."""
        if isinstance(lin, Lin1S):
            raise ValueError(
                "CHOLESKY is not supported on the structured Pallas "
                "path; set pallas_kernels='off' or use POWER_VARPROJ/"
                "PCG (the dense direct solve serves small problems, "
                "where the XLA path is fast anyway)"
            )
        hll_inv, hll_inv_bl = self._prep_hll(obs, lin, lam, False)
        if band_arrs is not None:
            return self._chol_solve_banded(
                obs, lin, lam, hll_inv, hll_inv_bl, band_arrs
            )
        if self.n_cams > DENSE_CHOL_MAX:
            raise ValueError(
                f"CHOLESKY at n_cams={self.n_cams} requires the banded "
                "plan built at construction (solver_type_step_1 must "
                "be CHOLESKY when the solver is created)"
            )
        return self._chol_solve(obs, lin, lam, hll_inv, hll_inv_bl)

    def _chol_solve(self, obs: Obs, lin: Lin1, lam, hll_inv, hll_inv_bl):
        """Dense RCS assembly + direct PSD solve (the staged second half
        of the CHOLESKY path)."""
        b, hpp = self._prep_hpp_b(obs, lin, hll_inv_bl)
        n12 = self.n_cams * 12

        # A [12N, 3M]: column block (cam(o), lm(o)) is W_o Hll^-1/2.
        hll_inv_chol = linalg.cholesky_smallf(hll_inv)  # hll^-1 = L L^T
        W = small_einsum("kio,kjo->ijo", lin.Jp, lin.Jl)  # [12, 3, O]
        WL = small_einsum(
            "ijo,jko->oik", W, self._gather_lm_x(obs, hll_inv_chol)
        )  # [O, 12, 3]

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
        ].add(jnp.transpose(hpp, (2, 0, 1)))
        # keep the whole assembly+solve in the storage dtype: a raw f64
        # lam would promote S and make solve_psd_small scatter f64 into
        # f32 buffers (a future-error in JAX)
        S = S + lam.astype(S.dtype) * jnp.eye(n12, dtype=S.dtype)

        inc = -linalg.solve_psd_small(
            S, b.astype(S.dtype).T.reshape(-1)
        ).reshape(self.n_cams, 12)
        # direct solve: the reference records 0 linear-solver
        # iterations for CHOLESKY (no CG loop runs)
        return inc.T.astype(self.dtype), jnp.asarray(0, jnp.int32)

    def _chol_solve_banded(
        self, obs: Obs, lin: Lin1, lam, hll_inv, hll_inv_bl, band_arrs
    ):
        """Banded RCS assembly + supernodal block-tridiagonal LLT
        (solver/band_chol.py) — the TPU mapping of the reference's
        sparse SimplicialLLT (linearization_sc.hpp:236-245) beyond the
        dense ceiling: RCM-banded structure factored as a lax.scan of
        dense MXU panels."""
        from povar_tpu.solver import band_chol

        b, hpp = self._prep_hpp_b(obs, lin, hll_inv_bl)
        hll_inv_chol = linalg.cholesky_smallf(hll_inv)
        W = small_einsum("kio,kjo->ijo", lin.Jp, lin.Jl)  # [12, 3, O]
        WL = small_einsum(
            "ijo,jko->iko", W, self._gather_lm_x(obs, hll_inv_chol)
        )  # [12, 3, O]
        s_flat = band_chol.assemble_band(
            self._band_meta, band_arrs, WL, hpp, lam
        )
        inc = -band_chol.solve_band(
            self._band_meta, band_arrs, s_flat, b.astype(s_flat.dtype)
        )
        return inc.astype(self.dtype), jnp.asarray(0, jnp.int32)

    # ------------------------------------------------------------- apply

    def _apply(
        self,
        obs: Obs,
        cam_space: jnp.ndarray,
        lm_p: jnp.ndarray,
        lin: Lin1,
        inc_scaled: jnp.ndarray,  # [12, N] in scaled (solver) coordinates
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

        The fresh Jacobian evaluation and landmark solve run in the
        solve dtype: v* is the exact minimizer, so an O(eps_f32)
        perturbation of v raises the f64-evaluated cost only to second
        order (~1e-14 relative); l_diff only feeds the lambda schedule.
        """
        new_cam = self._update_cams(cam_space, lin, inc_scaled)
        new_lm, l_diff = self._back_sub(
            obs, new_cam, lm_p, lin, inc_scaled
        )
        return new_cam, new_lm, l_diff

    def _update_cams(
        self, cam_space: jnp.ndarray, lin, inc_scaled: jnp.ndarray
    ) -> jnp.ndarray:
        """apply_inc_pose_pOSE (bal_problem.hpp:147-163): unscale the
        camera increment and add it to the 3x4 matrices. Shared by all
        apply variants (both Lin1 layouts, VarProj and poBA)."""
        inc_phys = (
            inc_scaled.astype(lin.pose_scale.dtype) * lin.pose_scale
        )
        return cam_space + inc_phys.astype(self.dtype).T.reshape(
            self.n_cams, 3, 4
        )

    def _back_sub(
        self,
        obs: Obs,
        new_cam: jnp.ndarray,
        lm_p: jnp.ndarray,
        lin,
        inc_scaled: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """VarProj landmark back-substitution + model cost decrease at
        the updated cameras. Returns (new_lm_p, l_diff)."""
        if isinstance(lin, Lin1S):
            return self._back_sub_s(obs, new_cam, lm_p, lin, inc_scaled)
        sd = self.solve_dtype
        P_new = self._gather_cams(obs, new_cam.astype(sd))
        x = self._gather_lm_x(obs, lm_p.astype(sd).T)
        r_new, Jp_new, Jl_new = pose_math.pose_jacobians_t(
            P_new, x, obs.uv.astype(sd), self.alpha
        )
        r_new = _mask_rows(obs, r_new)
        Jp_new = _mask_rows(obs, Jp_new)
        Jl_new = _mask_rows(obs, Jl_new)

        hll = self._seg_lm(obs, small_einsum("kio,kjo->ijo", Jl_new, Jl_new))
        tmp = self._seg_lm(obs, small_einsum("kio,ko->io", Jl_new, r_new))
        inc_lm = -linalg.solve3x3f(hll, tmp)  # [3, M]

        j_inc = small_einsum(
            "ijo,jo->io", Jp_new, self._gather_cam_x(obs, inc_scaled.astype(sd))
        ) + small_einsum("ijo,jo->io", lin.Jl, self._gather_lm_x(obs, inc_lm))
        l_diff = -jnp.sum(j_inc * (0.5 * j_inc + lin.r))

        return (
            lm_p + inc_lm.astype(self.dtype).T,
            l_diff.astype(self.dtype),
        )

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
        new_cam = self._update_cams(cam_space, lin, inc_scaled)
        new_lm, l_diff = self._back_sub_poba(
            obs, lm_p, lin, inc_scaled, lam
        )
        return new_cam, new_lm, l_diff

    def _back_sub_poba(
        self, obs: Obs, lm_p, lin, inc_scaled, lam
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """poBA landmark back-substitution from the stored (scaled)
        Jacobians. Returns (new_lm_p, l_diff)."""
        if isinstance(lin, Lin1S):
            return self._back_sub_poba_s(obs, lm_p, lin, inc_scaled, lam)
        sd = self.solve_dtype
        inc_s = inc_scaled.astype(sd)
        eye3 = jnp.eye(3, dtype=lin.Jl.dtype)[:, :, None]
        hll = self._seg_lm(obs, small_einsum("kio,kjo->ijo", lin.Jl, lin.Jl))
        hll = hll + lam.astype(lin.Jl.dtype) * eye3
        jp_inc = small_einsum(
            "ijo,jo->io", lin.Jp, self._gather_cam_x(obs, inc_s)
        )
        tmp = self._seg_lm(
            obs, small_einsum("kio,ko->io", lin.Jl, lin.r + jp_inc)
        )
        inc_lm_scaled = -linalg.solve3x3f(hll, tmp)  # [3, M]

        j_inc = jp_inc + small_einsum(
            "ijo,jo->io", lin.Jl, self._gather_lm_x(obs, inc_lm_scaled)
        )
        l_diff = -jnp.sum(j_inc * (0.5 * j_inc + lin.r))

        # landmark inc unscaled by the Jl column scale only after the
        # model-cost computation (landmark_block.hpp:664-666)
        new_lm = lm_p + (inc_lm_scaled * lin.jl_scale).astype(self.dtype).T
        return new_lm, l_diff.astype(self.dtype)

    # ------------------------------------------------ structured path
    # (Pallas; ops/pallas_pose.py). Same math as the methods above, but
    # through the Kronecker factorization of the pOSE Jacobians — the
    # solver never materializes Jp [4,12,O], Jl [4,3,O] or W [3,12,O].

    def _mask1(self, obs: Obs) -> jnp.ndarray:
        sd = self.solve_dtype
        if obs.weight is None:
            return jnp.ones((1, obs.cam.shape[0]), sd)
        return (obs.weight > 0).astype(sd).reshape(1, -1)

    def _linearize_s(
        self, obs: Obs, cam_space: jnp.ndarray, lm_p: jnp.ndarray
    ) -> Lin1S:
        core = self._lin_core_s(obs, cam_space, lm_p)
        ct, x, r_w, sw, hll_raw, bl_raw, jpsq = core
        jl_scale = self._lin_scale_jl_s(hll_raw)
        pose_scale = self._lin_scale_jp_s(jpsq)
        return Lin1S(
            ct=ct, x=x, r_w=r_w, sw=sw, hll_raw=hll_raw, bl_raw=bl_raw,
            jl_scale=jl_scale, pose_scale=pose_scale,
        )

    def _lin_core_s(
        self, obs: Obs, cam_space: jnp.ndarray, lm_p: jnp.ndarray
    ):
        """Structured-path linearization core: one pass over the
        observations plus the landmark-slot reductions (Pallas in f32;
        the XLA mirror ops/xla_pose.py when solve_dtype is f64)."""
        sd = self.solve_dtype
        ct = cam_space.astype(sd).reshape(self.n_cams, 12).T
        # landmark state enters L space once (or arrives packed);
        # per-landmark tables stay there so seg/expand round trips are
        # gather-free (CamWindows)
        x = self._expand_L(
            obs, self._lm_rows(obs, lm_p).astype(sd)
        )  # [3, O]
        r_w, sw, ata, atr, jpsq = pallas_pose.prepare(
            self._kcam(obs), self._expand_tbl(obs, ct), x,
            obs.uv.astype(sd), self._mask1(obs),
            alpha=self.alpha, robust=self.robust, huber=self.huber,
            win=self._winargs(obs),
        )
        jpsq = self._combine_cam_win(obs, jpsq)
        hll_raw = self._seg_L(obs, ata).reshape(3, 3, -1)
        bl_raw = self._seg_L(obs, atr)
        return ct, x, r_w, sw, hll_raw, bl_raw, jpsq

    def _lin_scale_jl_s(self, hll_raw: jnp.ndarray) -> jnp.ndarray:
        """Landmark Jacobi scale from the raw Hll diagonal (the scaling
        itself is applied algebraically as outer products downstream —
        the structured layout makes scale_Jl_cols a near-free rsqrt)."""
        jl_sq = hll_raw[jnp.arange(3), jnp.arange(3)]  # [3, M]
        if not self.scale_jl:  # SC linearizor quirk (see __init__)
            return jnp.ones_like(jl_sq)
        return 1.0 / (self.jacobi_eps + jnp.sqrt(jl_sq))

    def _lin_scale_jp_s(self, jpsq: jnp.ndarray) -> jnp.ndarray:
        """Pose Jacobi scale from the per-camera Jp column norms."""
        return 1.0 / (self.jacobi_eps + jnp.sqrt(jpsq))

    def _hll_pieces_s(
        self, obs: Obs, lin: Lin1S, lam: jnp.ndarray, landmark_damping
    ):
        """(hll_inv [3,3,M], hib_obs [3,O], jls_obs [3,O], lh_obs [9,O])
        from the raw slot sums: scale, damp (poBA), invert, factor."""
        d = lin.jl_scale
        hll = lin.hll_raw * (d[:, None, :] * d[None, :, :])
        if landmark_damping:
            hll = hll + lam.astype(hll.dtype) * jnp.eye(
                3, dtype=hll.dtype
            )[:, :, None]
        hll_inv = linalg.inv3x3f(self._hll_guard_L(obs, hll))
        bl = d * lin.bl_raw
        hib = small_einsum("ijm,jm->im", hll_inv, bl)  # [3, L]
        lh = linalg.cholesky_smallf(hll_inv)  # [3, 3, L] lower
        jls_obs = self._expand_L(obs, d)
        hib_obs = self._expand_L(obs, hib)
        lh_obs = self._expand_L(obs, lh.reshape(9, lh.shape[-1]))
        return hll_inv, hib_obs, jls_obs, lh_obs

    def _hpp_b_s(self, obs: Obs, lin: Lin1S, hib_obs, jls_obs):
        """(hpp [12,12,N] undamped, b [12,N]) with pose scales applied
        as outer products after the reduction."""
        hpp_raw, b_raw = pallas_pose.hpp_b_structured(
            self._kcam(obs), self._expand_tbl(obs, lin.ct), lin.x,
            obs.uv.astype(self.solve_dtype), lin.sw,
            lin.r_w, jls_obs, hib_obs, self.n_cams, alpha=self.alpha,
            win=self._winargs(obs),
        )
        hpp_raw = self._combine_cam_win(obs, hpp_raw)
        b_raw = self._combine_cam_win(obs, b_raw)
        ps = lin.pose_scale
        hpp = hpp_raw.reshape(12, 12, self.n_cams) * (
            ps[:, None, :] * ps[None, :, :]
        )
        return hpp, b_raw * ps

    def _e0_fused_parts(self, lin: Lin1S, h: jnp.ndarray):
        """Per-solve traced operand views for e0_term_parts: [3w, g] /
        [9w, g] landmark-major reshapes of the slot-element-major obs
        arrays (pure views; lane pads carry h == 0, contributing zero)."""
        parts = []
        for (ofs, g, w, gt, gp), c2 in zip(self._e0_meta, self._e0_cam2):
            x2 = lin.x[:, ofs : ofs + g * w].reshape(3 * w, g)
            h2 = h[:, ofs : ofs + g * w].reshape(9 * w, g)
            if gp != g:
                x2 = jnp.pad(x2, ((0, 0), (0, gp - g)))
                h2 = jnp.pad(h2, ((0, 0), (0, gp - g)))
            parts.append((c2, x2, h2, w, gt))
        return tuple(parts)

    def _e0_suffix_apply(self, obs: Obs, lin: Lin1S, h, z):
        """Composed-kernel E0 on the wide-part suffix slice (rare:
        landmarks with > E0_TERM_MAX_W observations)."""
        from povar_tpu.solver.segments import (
            slot_part_sums,
            slot_row_expand,
        )

        cut, suf_shapes, o_sp = self._e0_suffix
        o_suf = int(obs.cam.shape[0]) - cut
        pad = o_sp - o_suf
        cam_s = jnp.pad(obs.cam[cut:], (0, pad))
        x_s = jnp.pad(lin.x[:, cut:], ((0, 0), (0, pad)))
        h_s = jnp.pad(h[:, cut:], ((0, 0), (0, pad)))
        u = pallas_pose.e0_u_structured(cam_s, x_s, h_s, z)
        rows = slot_part_sums(u[:, :o_suf], suf_shapes)
        sb = jnp.pad(
            slot_row_expand(rows, suf_shapes), ((0, 0), (0, pad))
        )
        return pallas_pose.e0_scatter_structured(
            cam_s, x_s, h_s, sb, self.n_cams
        )

    def _e0_apply_s(self, obs: Obs, lin: Lin1S, h: jnp.ndarray):
        """Matrix-free structured E0 = W^T(seg_lm(W gather .)) closure."""
        ps = lin.pose_scale
        win = self._winargs(obs)
        kcam = self._kcam(obs)

        if self._e0_meta is not None and win is None:
            parts = self._e0_fused_parts(lin, h)

            def e0_fused(v):
                z = ps * v
                out = pallas_pose.e0_term_parts(parts, z, self.n_cams)
                if self._e0_suffix is not None:
                    out = out + self._e0_suffix_apply(obs, lin, h, z)
                return ps * self._combine_cam_win(obs, out)

            return e0_fused

        def e0(v):
            u = pallas_pose.e0_u_structured(
                kcam, lin.x, h, self._expand_tbl(obs, ps * v), win=win
            )
            sb = self._seg_lm_reexpand(obs, u)
            out = pallas_pose.e0_scatter_structured(
                kcam, lin.x, h, sb, self.n_cams, win=win
            )
            return ps * self._combine_cam_win(obs, out)

        return e0

    def _h_factor_s(self, obs: Obs, lin: Lin1S, jls_obs, lh_obs):
        return pallas_pose.e0_factor(
            self._kcam(obs), self._expand_tbl(obs, lin.ct),
            obs.uv.astype(self.solve_dtype),
            lin.sw * lin.sw, jls_obs, lh_obs, alpha=self.alpha,
            win=self._winargs(obs),
        )

    def _solve_power_s(
        self, obs: Obs, lin: Lin1S, lam: jnp.ndarray, landmark_damping
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lam_s = lam.astype(self.solve_dtype)
        hll_pieces = self._hll_pieces_s(obs, lin, lam_s, landmark_damping)
        prep = self._power_prep_s(obs, lin, lam_s, hll_pieces)
        return self._power_iterate_s(obs, lin, prep)

    def _power_prep_s(self, obs: Obs, lin: Lin1S, lam32, hll_pieces):
        _hll_inv, hib_obs, jls_obs, lh_obs = hll_pieces
        hpp, b = self._hpp_b_s(obs, lin, hib_obs, jls_obs)
        hpp = hpp + lam32 * jnp.eye(12, dtype=hpp.dtype)[:, :, None]
        b_inv = linalg.inv_psd_smallf(hpp)
        h = self._h_factor_s(obs, lin, jls_obs, lh_obs)
        return -b, b_inv, h

    def _power_iterate_s(
        self, obs: Obs, lin: Lin1S, prep
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        nb, b_inv, h = prep

        def b_inv_apply(v):
            return small_einsum("ijn,jn->in", b_inv, v)

        inc, n_iter = pcg_mod.power_series(
            b_inv_apply,
            self._e0_apply_s(obs, lin, h),
            nb,
            max_terms=self.power_m,
            q_tolerance=self.opts.eta,
            r_tolerance=self.opts.r_tolerance,
        )
        return inc.astype(self.dtype), n_iter

    def _solve_pcg_s(
        self, obs: Obs, lin: Lin1S, lam: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lam32 = lam.astype(self.solve_dtype)
        pieces = self._hll_pieces_s(obs, lin, lam32, False)
        b, hpp, h = self._pcg_prep_s(obs, lin, pieces)
        pmats = self._pcg_precond_s(obs, lin, lam32, hpp, h)
        return self._pcg_iterate_s(obs, lin, lam32, b, hpp, h, pmats)

    def _pcg_prep_s(self, obs: Obs, lin: Lin1S, hll_pieces):
        _hll_inv, hib_obs, jls_obs, lh_obs = hll_pieces
        hpp, b = self._hpp_b_s(obs, lin, hib_obs, jls_obs)
        h = self._h_factor_s(obs, lin, jls_obs, lh_obs)
        return b, hpp, h

    def _pcg_precond_s(self, obs: Obs, lin: Lin1S, lam32, hpp, h):
        """Preconditioner materials (a tuple of arrays; the type is
        static per options.preconditioner_type)."""
        from povar_tpu.options import PreconditionerType as PT

        pt = self.opts.preconditioner_type
        if pt == PT.IDENTITY:
            return ()
        ps = lin.pose_scale
        corr_raw = pallas_pose.schur_diag_structured(
            self._kcam(obs), lin.x, h, self.n_cams,
            win=self._winargs(obs),
        )
        corr = self._combine_cam_win(obs, corr_raw).reshape(
            12, 12, self.n_cams
        ) * (ps[:, None, :] * ps[None, :, :])
        diag_blocks = (
            hpp + lam32 * jnp.eye(12, dtype=hpp.dtype)[:, :, None] - corr
        )
        if pt == PT.JACOBI:
            dg = diag_blocks[jnp.arange(12), jnp.arange(12)]
            return (jnp.where(dg != 0, 1.0 / dg, 1.0),)
        return (linalg.cholesky_smallf(diag_blocks),)

    def _precond_closure(self, pmats):
        """Apply-closure over preconditioner materials (shared by the
        structured and generic CG paths)."""
        from povar_tpu.options import PreconditionerType as PT

        pt = self.opts.preconditioner_type
        if pt == PT.IDENTITY:
            return lambda v: v
        if pt == PT.JACOBI:
            (invd,) = pmats
            return lambda v: invd * v
        (chol,) = pmats

        def precond(v):
            y = linalg.solve_lower_trif(chol, v)
            return linalg.solve_upper_from_lowerf(chol, y)

        return precond

    def _pcg_iterate_s(
        self, obs: Obs, lin: Lin1S, lam32, b, hpp, h, pmats
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        e0 = self._e0_apply_s(obs, lin, h)

        def matvec(v):
            return (
                small_einsum("ijn,jn->in", hpp, v) + lam32 * v - e0(v)
            )

        res = pcg_mod.conjugate_gradients(
            matvec,
            b,
            jnp.zeros_like(b),
            self._precond_closure(pmats),
            max_iterations=self.opts.max_linear_solver_iterations,
            min_iterations=self.opts.min_linear_solver_iterations,
            q_tolerance=self.opts.eta,
            r_tolerance=-1.0,
            residual_reset_period=self.opts.residual_reset_period,
        )
        return (-res.x).astype(self.dtype), res.num_iterations

    def _back_sub_s(
        self, obs: Obs, new_cam, lm_p, lin: Lin1S, inc_scaled
    ):
        sd = self.solve_dtype
        inc_f = inc_scaled.astype(sd)
        ct_new = new_cam.astype(sd).reshape(self.n_cams, 12).T
        win = self._winargs(obs)
        kcam = self._kcam(obs)
        # exact VarProj back-substitution from UNWEIGHTED fresh
        # Jacobians at the updated cameras (helper.cpp:382-454)
        _rw, _sw, ata, atr, _jpsq = pallas_pose.prepare(
            kcam, self._expand_tbl(obs, ct_new), lin.x,
            obs.uv.astype(sd),
            self._mask1(obs), alpha=self.alpha, robust=0, huber=1.0,
            weighted=False, win=win,
        )
        hll_new = self._hll_guard_L(
            obs, self._seg_L(obs, ata).reshape(3, 3, -1)
        )
        tmp = self._seg_L(obs, atr)
        inc_lm = self._lm_masked_L(
            obs, -linalg.solve3x3f(hll_new, tmp)
        )  # [3, L]

        part = pallas_pose.apply_ldiff(
            kcam, lin.x, obs.uv.astype(sd), lin.sw, lin.r_w,
            self._expand_L(obs, lin.jl_scale),
            self._expand_L(obs, inc_lm),
            self._expand_tbl(obs, lin.ct),
            self._expand_tbl(obs, inc_f), alpha=self.alpha, win=win,
        )
        l_diff = -self._psum(jnp.sum(part))
        if isinstance(lm_p, LmState):
            new_lm = LmState(
                rows=lm_p.rows + inc_lm.astype(self.dtype)
            )
        else:
            new_lm = lm_p + self._L_to_lm(obs, inc_lm).astype(
                self.dtype
            ).T
        return new_lm, l_diff.astype(self.dtype)

    def _back_sub_poba_s(
        self, obs: Obs, lm_p, lin: Lin1S, inc_scaled, lam
    ):
        sd = self.solve_dtype
        lam32 = lam.astype(sd)
        inc_f = inc_scaled.astype(sd)
        d = lin.jl_scale
        hll = lin.hll_raw * (d[:, None, :] * d[None, :, :])
        hll = hll + lam32 * jnp.eye(3, dtype=sd)[:, :, None]
        jls_obs = self._expand_L(obs, d)
        win = self._winargs(obs)
        kcam = self._kcam(obs)
        t3 = pallas_pose.poba_t3(
            kcam, self._expand_tbl(obs, lin.ct), lin.x,
            obs.uv.astype(sd), lin.sw,
            lin.r_w, jls_obs,
            self._expand_tbl(obs, lin.pose_scale * inc_f),
            alpha=self.alpha, win=win,
        )
        tmp = self._seg_L(obs, t3)
        inc_lm_scaled = self._lm_masked_L(
            obs, -linalg.solve3x3f(hll, tmp)
        )  # [3, L]

        part = pallas_pose.apply_ldiff_stored(
            kcam, lin.x, obs.uv.astype(sd), lin.sw, lin.r_w,
            jls_obs, self._expand_L(obs, inc_lm_scaled),
            self._expand_tbl(obs, lin.ct),
            self._expand_tbl(obs, lin.pose_scale * inc_f),
            alpha=self.alpha, win=win,
        )
        l_diff = -self._psum(jnp.sum(part))

        if isinstance(lm_p, LmState):
            new_lm = LmState(
                rows=lm_p.rows
                + (inc_lm_scaled * d).astype(self.dtype)
            )
        else:
            new_lm = lm_p + self._L_to_lm(
                obs, inc_lm_scaled * d
            ).astype(self.dtype).T
        return new_lm, l_diff.astype(self.dtype)

    def _compute_error_df32(
        self, obs: Obs, cam_space: jnp.ndarray, lm_p: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """Double-float pOSE cost: split the f64 state into (hi, lo)
        f32 pairs, evaluate residuals and accumulate with error-free
        transforms in one Pallas pass, and assemble the totals in f64
        host-side arithmetic on 128 lanes."""
        f32, f64 = jnp.float32, jnp.float64

        def split(a):
            hi = a.astype(f32)
            return hi, (a - hi.astype(f64)).astype(f32)

        ct = cam_space.reshape(self.n_cams, 12).T  # [12, N] f64
        ct_hi, ct_lo = split(ct)
        lm_hi, lm_lo = split(self._lm_rows(obs, lm_p))  # [3, L]
        x_hi = self._expand_L(obs, lm_hi)
        x_lo = self._expand_L(obs, lm_lo)
        uv_hi, uv_lo = split(obs.uv)
        part = pallas_pose.pose_error_df32(
            self._kcam(obs),
            self._expand_tbl(obs, ct_hi), self._expand_tbl(obs, ct_lo),
            x_hi, x_lo, uv_hi, uv_lo,
            self._mask1(obs), alpha=self.alpha, robust=self.robust,
            huber=self.huber, win=self._winargs(obs),
        )
        err = self._psum(
            jnp.sum(part[0].astype(f64)) + jnp.sum(part[1].astype(f64))
        )
        rn = self._psum(
            jnp.sum(part[2].astype(f64)) + jnp.sum(part[3].astype(f64))
        )
        bad = self._psum(jnp.sum(part[4])) > 0
        n_live = jnp.asarray(self.n_obs_live, jnp.int64)
        return {
            "num_obs_all": n_live,
            "error_all": err,
            "residual_sum_all": rn,
            # pOSE projections are always valid (helper.cpp:263); the
            # valid bucket equals the live bucket
            "num_obs_valid": n_live,
            "error_valid": err,
            "residual_sum_valid": rn,
            "is_numerically_valid": ~bad,
        }
