"""Structured homogeneous-projective kernels: the stage-2 compute core.

The step-2 residual (linearize_point_projective_space_homogeneous,
bal_bundle_adjustment_helper.cpp:315-380) shares the Kronecker
structure the stage-1 kernels exploit (ops/pallas_pose.py):

  p  = P x4,  m = (p0/p2, p1/p2),  r = m - uv
  Jp = (1/p2) C (x) x4^T,   C = [[1, 0, -mx], [0, 1, -my]]   (2 x 12)
  Jl = (1/p2) [P0 - mx P2; P1 - my P2]                       (2 x 4)

so every per-observation quantity derives from the camera row P
(gathered once, in `prepare2`), the homogeneous landmark x4, and the
cached projection state mm = (mx, my, 1/p2). The Riemannian tangent
lifts are NOT per-observation work: the camera kernel K_c [12,11]
folds into per-camera [12,11] tables (Kps = ps . K_c) applied in XLA
around the kernels —

  E0 x11:  zt = Kps x11 [12, N]  (tiny per-camera XLA op per term)
           per obs: q~_a = sum_c x4_c zt[4a+c, cam]
                    jp_x = sw/p2 [q~0 - mx q~2, q~1 - my q~2]
           landmark side through B = Jl_ns L  (6 cached values)
           scatter: rows = sw/p2 (C^T v) (x) x4 -> [12, N] raw,
           folded out11 = Kps^T raw per camera in XLA

— mirroring right_mul_e0_joint (linearization_power_varproj.hpp:
409-453) with the mutex scatter replaced by the windowed one-hot.

Shares the window machinery and padding contract with pallas_pose
(win = (kmap, n_win, W); see that module's header).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from povar_tpu.ops.pallas_cam import _n_pad, _onehot, _tile
from povar_tpu.ops.pallas_pose import (
    PART_ALIGN,
    _cam_block,
    _cam_spec,
    _choose_tile,
    _first_visit,
    _fixed_spec,
    _gather_table,
    _obs_spec,
    _pose_call,
    _scatter_rows,
    _win_tile,
)

_NONE, _HUBER, _CAUCHY = 0, 1, 2


def _tbl_prep(tbl, win):
    """Pad a canonical [R, N] table to the kernel width (plain mode);
    windowed tables are already expanded."""
    if win is not None:
        return tbl, tbl.shape[-1]
    n = tbl.shape[-1]
    n_pad = _n_pad(n)
    if n_pad != n:
        tbl = jnp.pad(tbl, ((0, 0), (0, n_pad - n)))
    return tbl, n_pad


# -------------------------------------------------------------- S2-K1
# Linearization-point pass: project, residual + robust weight, the
# projection state cache, raw (weighted, unscaled) Jl rows and their
# column norms, and the per-camera Jp column-norm scatter.


def _prepare2_kernel(
    cam_ref, x4_ref, uv_ref, m_ref, ct_ref,
    rw_ref, sw_ref, mm_ref, jlw_ref, jlsq_ref, jpsq_ref,
    *, use_valid, robust, huber, km_ref=None,
):
    @pl.when(_first_visit(km_ref))
    def _():
        jpsq_ref[:] = jnp.zeros_like(jpsq_ref)

    t = cam_ref.shape[-1]
    oh = _onehot(cam_ref[:], ct_ref.shape[-1])
    P = _gather_table(ct_ref, oh)  # [12, T]
    u, v = uv_ref[0], uv_ref[1]
    x4 = [x4_ref[0], x4_ref[1], x4_ref[2], x4_ref[3]]
    mask = m_ref[0] > 0

    p = []
    for r in range(3):
        acc = P[4 * r] * x4[0]
        for c in range(1, 4):
            acc += P[4 * r + c] * x4[c]
        p.append(acc)
    # Sophus epsilonSqrt for the f64 solve this kernel emulates:
    # sqrt(1e-10) = 1e-5 (bal_camera.hpp:147), exactly representable
    eps = np.float32(1e-5)
    valid = jnp.abs(p[2]) >= eps
    tiny = np.float32(1e-30)
    # f32 constants throughout: weak python floats turn the select f64
    # under x64, which Mosaic cannot lay out
    zinv = np.float32(1.0) / jnp.where(
        jnp.abs(p[2]) < tiny,
        jnp.where(p[2] < 0, -tiny, tiny), p[2]
    )
    mx = p[0] * zinv
    my = p[1] * zinv
    r0 = mx - u
    r1 = my - v
    live = mask if not use_valid else (mask & valid)
    livef = live.astype(jnp.float32)

    res_sq = r0 * r0 + r1 * r1
    if robust == _HUBER:
        w = jnp.where(
            res_sq < huber * huber,
            jnp.ones_like(res_sq),
            huber / jnp.sqrt(jnp.maximum(res_sq, 1e-30)),
        )
    else:
        w = jnp.ones_like(res_sq)
    w = w * livef
    sw = jnp.sqrt(w)

    rw_ref[0, :] = r0 * sw
    rw_ref[1, :] = r1 * sw
    sw_ref[0, :] = sw
    mm_ref[0, :] = mx * livef
    mm_ref[1, :] = my * livef
    mm_ref[2, :] = zinv * livef

    # weighted raw Jl rows (2 x 4, layout r*4 + c) and column norms^2
    for c in range(4):
        j0 = sw * zinv * (P[c] - mx * P[8 + c])
        j1 = sw * zinv * (P[4 + c] - my * P[8 + c])
        jlw_ref[c, :] = j0
        jlw_ref[4 + c, :] = j1
        jlsq_ref[c, :] = j0 * j0 + j1 * j1

    # Jp column norms^2: w (1/p2)^2 K3diag_a x4_c^2,
    # K3diag = [1, 1, mx^2 + my^2]
    wz2 = w * zinv * zinv
    kd = [jnp.ones_like(mx), jnp.ones_like(mx), mx * mx + my * my]
    rows = []
    for a in range(3):
        for c in range(4):
            rows.append(wz2 * kd[a] * x4[c] * x4[c])
    jpsq_ref[:] += _scatter_rows(
        jnp.stack(rows, axis=0).reshape(12, t), oh
    )


def prepare2(
    cam, cam_table, x4, uv, mask, *, use_valid, robust, huber, win=None
):
    """Returns (r_w [2,O], sw [1,O], mm [3,O] = (mx, my, 1/p2),
    jlw [8,O] weighted unscaled Jl rows, jlsq [4,O] Jl column norm^2
    contributions, jpsq [12,N] per-camera Jp column norms)."""
    if x4.dtype != jnp.float32:  # f64 solves: XLA mirror (ops/xla_pose)
        from povar_tpu.ops import xla_pose

        return xla_pose.prepare2(
            cam, cam_table, x4, uv, mask, use_valid=use_valid,
            robust=robust, huber=huber, win=win,
        )
    o = cam.shape[0]
    n = cam_table.shape[-1]
    cam_table, n_pad = _tbl_prep(cam_table, win)
    nb = _cam_block(n_pad, win)
    t = _choose_tile(o, nb, win)
    kern = functools.partial(
        _prepare2_kernel, use_valid=bool(use_valid),
        robust=int(robust), huber=float(huber),
    )
    rw, sw, mm, jlw, jlsq, jpsq = _pose_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((2, o), jnp.float32),
            jax.ShapeDtypeStruct((1, o), jnp.float32),
            jax.ShapeDtypeStruct((3, o), jnp.float32),
            jax.ShapeDtypeStruct((8, o), jnp.float32),
            jax.ShapeDtypeStruct((4, o), jnp.float32),
            jax.ShapeDtypeStruct((12, n_pad), jnp.float32),
        ),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(4, t, win),
            _obs_spec(2, t, win),
            _obs_spec(1, t, win),
            _cam_spec(12, nb, win),
        ],
        out_specs=(
            _obs_spec(2, t, win),
            _obs_spec(1, t, win),
            _obs_spec(3, t, win),
            _obs_spec(8, t, win),
            _obs_spec(4, t, win),
            _cam_spec(12, nb, win),
        ),
        args=(cam.reshape(1, o), x4, uv, mask, cam_table),
        o=o, t=t, win=win,
    )
    return rw, sw, mm, jlw, jlsq, (jpsq if win is not None else jpsq[:, :n])


# -------------------------------------------------------------- S2-K2
# Fused tangent Hpp + b assembly in the UNPROJECTED 12-dof frame:
#   rt       = r_w - Jl_ns (Hll_t^-1 bl_t)      (jlns [6,O] cached)
#   b12_raw  = seg_cam( sw/p2 (C^T rt) (x) x4 )
#   hpp12raw = seg_cam( w/p2^2 K3 (x) x4 x4^T )
# the caller folds Kps^T . Kps / Kps^T . per camera (XLA, tiny).


def _hppb2_kernel(
    cam_ref, x4_ref, mm_ref, sw_ref, rw_ref, jlns_ref, hib_ref,
    hpp_ref, b_ref, *, km_ref=None,
):
    @pl.when(_first_visit(km_ref))
    def _():
        hpp_ref[:] = jnp.zeros_like(hpp_ref)
        b_ref[:] = jnp.zeros_like(b_ref)

    t = cam_ref.shape[-1]
    oh = _onehot(cam_ref[:], hpp_ref.shape[-1])
    mx, my, zinv = mm_ref[0], mm_ref[1], mm_ref[2]
    sw = sw_ref[0]
    x4 = [x4_ref[0], x4_ref[1], x4_ref[2], x4_ref[3]]

    # rt = r_w - Jl_ns hib   (Jl_ns layout r*3 + i)
    rt = []
    for r in range(2):
        corr = (jlns_ref[r * 3 + 0, :] * hib_ref[0]
                + jlns_ref[r * 3 + 1, :] * hib_ref[1]
                + jlns_ref[r * 3 + 2, :] * hib_ref[2])
        rt.append(rw_ref[r, :] - corr)

    # b rows: sw/p2 (C^T rt) (x) x4
    swz = sw * zinv
    ctr = [rt[0], rt[1], -(mx * rt[0] + my * rt[1])]
    rows = []
    for a in range(3):
        for c in range(4):
            rows.append(swz * ctr[a] * x4[c])
    b_ref[:] += _scatter_rows(jnp.stack(rows, axis=0).reshape(12, t), oh)

    # hpp rows: w/p2^2 K3[a,b] x4_i x4_j
    wz2 = swz * swz
    K3 = [[jnp.ones_like(mx), jnp.zeros_like(mx), -mx],
          [jnp.zeros_like(mx), jnp.ones_like(mx), -my],
          [-mx, -my, mx * mx + my * my]]
    rows = []
    for a in range(3):
        for i in range(4):
            wk = wz2 * x4[i]
            for bb in range(3):
                for j in range(4):
                    rows.append(wk * K3[a][bb] * x4[j])
    hpp_ref[:] += _scatter_rows(
        jnp.stack(rows, axis=0).reshape(144, t), oh
    )


def hppb2(cam, x4, mm, sw, r_w, jlns, hib, n_cams, win=None):
    """(hpp12_raw [144, N], b12_raw [12, N]) in the unprojected frame;
    the caller applies the per-camera Kps folds."""
    if x4.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.hppb2(
            cam, x4, mm, sw, r_w, jlns, hib, n_cams, win=win
        )
    o = cam.shape[0]
    n_pad = win[1] * win[2] if win is not None else _n_pad(n_cams)
    nb = _cam_block(n_pad, win)
    t = _win_tile(min(_tile(o, nb), 2048), win)
    hpp, b = _pose_call(
        _hppb2_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((144, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((12, n_pad), jnp.float32),
        ),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(4, t, win),
            _obs_spec(3, t, win),
            _obs_spec(1, t, win),
            _obs_spec(2, t, win),
            _obs_spec(6, t, win),
            _obs_spec(3, t, win),
        ],
        out_specs=(
            _cam_spec(144, nb, win),
            _cam_spec(12, nb, win),
        ),
        args=(cam.reshape(1, o), x4, mm, sw, r_w, jlns, hib),
        o=o, t=t, win=win,
    )
    if win is not None:
        return hpp, b
    return hpp[:, :n_cams], b[:, :n_cams]


# ----------------------------------------------------------- S2-K3/K4
# Per-term E0 matvec halves through the zt-table trick.


def _mat_dot_kernel(
    cam_ref, x4_ref, mm_ref, sw_ref, mat_ref, *rest,
    add_r, km_ref=None,
):
    """out3 = M^T (r_add + jp_x) with M [2,3] cached per obs (layout
    r*3+i), jp_x = sw/p2 [q~0 - mx q~2, q~1 - my q~2],
    q~a = sum_c x4_c zt[4a+c, cam]. add_r=True adds the stored r_w
    (back-substitution RHS); False is the pure E0 'up' half, which
    does not take (or read) the residual operand at all — it would
    otherwise cost a full [2, O] sweep per power-series term."""
    if add_r:
        rw_ref, zt_ref, out_ref = rest
    else:
        zt_ref, out_ref = rest
    oh = _onehot(cam_ref[:], zt_ref.shape[-1])
    zc = _gather_table(zt_ref, oh)  # [12, T]
    mx, my, zinv = mm_ref[0], mm_ref[1], mm_ref[2]
    sw = sw_ref[0]
    x4 = [x4_ref[0], x4_ref[1], x4_ref[2], x4_ref[3]]

    q = []
    for a in range(3):
        acc = zc[4 * a] * x4[0]
        for c in range(1, 4):
            acc += zc[4 * a + c] * x4[c]
        q.append(acc)
    swz = sw * zinv
    jx0 = swz * (q[0] - mx * q[2])
    jx1 = swz * (q[1] - my * q[2])
    if add_r:
        jx0 = jx0 + rw_ref[0, :]
        jx1 = jx1 + rw_ref[1, :]
    for i in range(3):
        out_ref[i, :] = (mat_ref[i, :] * jx0 + mat_ref[3 + i, :] * jx1)


def mat_dot2(cam, x4, mm, sw, mat6, r_w, zt, *, add_r, win=None):
    """[3, O] = M^T (jp_x (+ r_w)); see _mat_dot_kernel. r_w is only
    an operand when add_r (pass None otherwise)."""
    if x4.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.mat_dot2(
            cam, x4, mm, sw, mat6, r_w, zt, add_r=add_r, win=win
        )
    o = cam.shape[0]
    zt, n_pad = _tbl_prep(zt, win)
    nb = _cam_block(n_pad, win)
    t = _choose_tile(o, nb, win)
    specs = [
        _obs_spec(1, t, win),
        _obs_spec(4, t, win),
        _obs_spec(3, t, win),
        _obs_spec(1, t, win),
        _obs_spec(6, t, win),
    ]
    args = [cam.reshape(1, o), x4, mm, sw, mat6]
    if add_r:
        specs.append(_obs_spec(2, t, win))
        args.append(r_w)
    specs.append(_cam_spec(12, nb, win))
    args.append(zt)
    return _pose_call(
        functools.partial(_mat_dot_kernel, add_r=bool(add_r)),
        out_shape=jax.ShapeDtypeStruct((3, o), jnp.float32),
        in_specs=specs,
        out_specs=_obs_spec(3, t, win),
        args=tuple(args),
        o=o, t=t, win=win,
    )


def _scatter2_kernel(
    cam_ref, x4_ref, mm_ref, sw_ref, mat_ref, sb_ref, out_ref,
    *, km_ref=None,
):
    """out12_raw = seg_cam( sw/p2 (C^T (M sb)) (x) x4 )."""
    @pl.when(_first_visit(km_ref))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = cam_ref.shape[-1]
    mx, my, zinv = mm_ref[0], mm_ref[1], mm_ref[2]
    sw = sw_ref[0]
    x4 = [x4_ref[0], x4_ref[1], x4_ref[2], x4_ref[3]]
    v0 = (mat_ref[0, :] * sb_ref[0, :] + mat_ref[1, :] * sb_ref[1, :]
          + mat_ref[2, :] * sb_ref[2, :])
    v1 = (mat_ref[3, :] * sb_ref[0, :] + mat_ref[4, :] * sb_ref[1, :]
          + mat_ref[5, :] * sb_ref[2, :])
    swz = sw * zinv
    ctv = [swz * v0, swz * v1, -swz * (mx * v0 + my * v1)]
    rows = []
    for a in range(3):
        for c in range(4):
            rows.append(ctv[a] * x4[c])
    oh = _onehot(cam_ref[:], out_ref.shape[-1])
    out_ref[:] += _scatter_rows(
        jnp.stack(rows, axis=0).reshape(12, t), oh
    )


def scatter2(cam, x4, mm, sw, mat6, sb, n_cams, win=None):
    """[12, N] raw scatter; caller folds Kps^T per camera."""
    if x4.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.scatter2(
            cam, x4, mm, sw, mat6, sb, n_cams, win=win
        )
    o = cam.shape[0]
    n_pad = win[1] * win[2] if win is not None else _n_pad(n_cams)
    nb = _cam_block(n_pad, win)
    t = _choose_tile(o, nb, win)
    out = _pose_call(
        _scatter2_kernel,
        out_shape=jax.ShapeDtypeStruct((12, n_pad), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(4, t, win),
            _obs_spec(3, t, win),
            _obs_spec(1, t, win),
            _obs_spec(6, t, win),
            _obs_spec(3, t, win),
        ],
        out_specs=_cam_spec(12, nb, win),
        args=(cam.reshape(1, o), x4, mm, sw, mat6, sb),
        o=o, t=t, win=win,
    )
    return out if win is not None else out[:, :n_cams]


# ----------------------------------------------------------- S2-K4b
# Fully fused power-series E0 term (right_mul_e0_joint,
# sc/linearization_power_varproj.hpp:409-453): one kernel computes
#   out12[:, n] = seg_cam( swz (C^T (M sb)) (x) x4 ),
#   sb = seg_lm( M^T jp_x ),  jp_x = swz [q~0 - mx q~2, q~1 - my q~2]
# i.e. the mat_dot2 gather, the per-landmark slot reduction, the
# re-expansion AND the scatter2 in a single pass — the stage-2
# analogue of pallas_pose._e0_term_kernel (see the layout contract
# there: [w, gt] landmark-major blocks per fixed-width slot part,
# caller reshapes the slot-element-major obs arrays and sums the
# per-part [12, Npad] outputs).


def _e0_term2_kernel(
    cam_ref, x4_ref, mm_ref, sw_ref, mat_ref, z_ref, out_ref, *, w
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    nb = z_ref.shape[-1]
    gt = cam_ref.shape[-1]
    ohs = []
    swz_j = []
    sb = [None, None, None]
    # pass A: u3 per slot row, accumulated per landmark (lane) into sb
    for j in range(w):
        oh = _onehot(cam_ref[j, :].reshape(1, gt), nb)
        ohs.append(oh)
        zc = _gather_table(z_ref, oh)  # [12, gt]
        x4 = [x4_ref[c * w + j, :] for c in range(4)]
        q = []
        for a in range(3):
            acc = zc[4 * a, :] * x4[0]
            for c in range(1, 4):
                acc += zc[4 * a + c, :] * x4[c]
            q.append(acc)
        mx, my = mm_ref[j, :], mm_ref[w + j, :]
        swz = sw_ref[j, :] * mm_ref[2 * w + j, :]
        swz_j.append(swz)
        jx0 = swz * (q[0] - mx * q[2])
        jx1 = swz * (q[1] - my * q[2])
        for i in range(3):
            u = (mat_ref[i * w + j, :] * jx0
                 + mat_ref[(3 + i) * w + j, :] * jx1)
            sb[i] = u if sb[i] is None else sb[i] + u
    # pass B: scatter swz (C^T (M sb)) (x) x4 per slot row to cameras
    acc_out = None
    for j in range(w):
        v0 = (mat_ref[j, :] * sb[0] + mat_ref[w + j, :] * sb[1]
              + mat_ref[2 * w + j, :] * sb[2])
        v1 = (mat_ref[3 * w + j, :] * sb[0] + mat_ref[4 * w + j, :] * sb[1]
              + mat_ref[5 * w + j, :] * sb[2])
        mx, my = mm_ref[j, :], mm_ref[w + j, :]
        swz = swz_j[j]
        ctv = [swz * v0, swz * v1, -swz * (mx * v0 + my * v1)]
        x4 = [x4_ref[c * w + j, :] for c in range(4)]
        rows = []
        for a in range(3):
            for c in range(4):
                rows.append(ctv[a] * x4[c])
        contrib = _scatter_rows(jnp.stack(rows, axis=0), ohs[j])
        acc_out = contrib if acc_out is None else acc_out + contrib
    out_ref[:] += acc_out


# f32 operand rows per slot element: 1 cam + 4 x4 + 3 mm + 1 sw + 6 mat
E0_TERM2_ROWS = 15


def e0_term2_parts(parts, z_table, n_cams):
    """Fused stage-2 E0 matvec over pre-reshaped slot parts.

    parts: tuple of (cam2 [w, G] i32, x42 [4w, G], mm2 [3w, G],
    sw2 [w, G], mat2 [6w, G], w, gt) with G a multiple of gt (pads
    carry sw == 0 and contribute exactly zero). z_table [12, N] is the
    per-term camera table zt = Kps v11. Returns [12, n_cams] raw
    per-camera sums (caller folds Kps^T)."""
    n_pad = _n_pad(n_cams)
    if z_table.shape[-1] != n_pad:
        z_table = jnp.pad(
            z_table, ((0, 0), (0, n_pad - z_table.shape[-1]))
        )
    from povar_tpu.ops.pallas_cam import _interpret
    from jax.experimental.pallas import tpu as pltpu

    _I0 = np.int32(0)
    out = None
    for cam2, x42, mm2, sw2, mat2, w, gt in parts:
        g = cam2.shape[-1]
        r = pl.pallas_call(
            functools.partial(_e0_term2_kernel, w=w),
            out_shape=jax.ShapeDtypeStruct((12, n_pad), jnp.float32),
            grid=(g // gt,),
            in_specs=[
                pl.BlockSpec((w, gt), lambda i: (_I0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * w, gt), lambda i: (_I0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * w, gt), lambda i: (_I0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, gt), lambda i: (_I0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6 * w, gt), lambda i: (_I0, i),
                             memory_space=pltpu.VMEM),
                _fixed_spec(12, n_pad),
            ],
            out_specs=_fixed_spec(12, n_pad),
            interpret=_interpret(),
        )(cam2, x42, mm2, sw2, mat2, z_table)
        out = r if out is None else out + r
    return out[:, :n_cams]


# -------------------------------------------------------------- S2-K5
# Structured tangent Schur-Jacobi diagonal correction (one obs couples
# a camera only with itself):
#   corr12_raw = seg_cam( w/p2^2 (B B^T-weighted C-structure) ),
# concretely rows = sw/p2 C^T (B B^T) C (x) x4 x4^T with BB^T [2,2].


def _schur2_kernel(cam_ref, x4_ref, mm_ref, sw_ref, mat_ref, out_ref,
                   *, km_ref=None):
    @pl.when(_first_visit(km_ref))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = cam_ref.shape[-1]
    mx, my, zinv = mm_ref[0], mm_ref[1], mm_ref[2]
    sw = sw_ref[0]
    x4 = [x4_ref[0], x4_ref[1], x4_ref[2], x4_ref[3]]
    # G = B B^T [2,2] from the cached 6-value B
    g00 = (mat_ref[0, :] ** 2 + mat_ref[1, :] ** 2 + mat_ref[2, :] ** 2)
    g11 = (mat_ref[3, :] ** 2 + mat_ref[4, :] ** 2 + mat_ref[5, :] ** 2)
    g01 = (mat_ref[0, :] * mat_ref[3, :] + mat_ref[1, :] * mat_ref[4, :]
           + mat_ref[2, :] * mat_ref[5, :])
    wz2 = (sw * zinv) * (sw * zinv)
    # H = C^T G C [3,3]; C columns: e0, e1, [-mx, -my]
    cg = [[g00, g01], [g01, g11],
          [-(mx * g00 + my * g01), -(mx * g01 + my * g11)]]
    H = [[None] * 3 for _ in range(3)]
    cc = [[jnp.ones_like(mx), jnp.zeros_like(mx)],
          [jnp.zeros_like(mx), jnp.ones_like(mx)],
          [-mx, -my]]
    for a in range(3):
        for b in range(3):
            H[a][b] = wz2 * (cg[a][0] * cc[b][0] + cg[a][1] * cc[b][1])
    rows = []
    for a in range(3):
        for i in range(4):
            for b in range(3):
                for j in range(4):
                    rows.append(H[a][b] * x4[i] * x4[j])
    oh = _onehot(cam_ref[:], out_ref.shape[-1])
    out_ref[:] += _scatter_rows(
        jnp.stack(rows, axis=0).reshape(144, t), oh
    )


def schur_diag2(cam, x4, mm, sw, mat6, n_cams, win=None):
    """corr12_raw [144, N]; caller folds Kps^T . Kps and subtracts."""
    if x4.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.schur_diag2(cam, x4, mm, sw, mat6, n_cams, win=win)
    o = cam.shape[0]
    n_pad = win[1] * win[2] if win is not None else _n_pad(n_cams)
    nb = _cam_block(n_pad, win)
    t = _win_tile(min(_tile(o, nb), 2048), win)
    out = _pose_call(
        _schur2_kernel,
        out_shape=jax.ShapeDtypeStruct((144, n_pad), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(4, t, win),
            _obs_spec(3, t, win),
            _obs_spec(1, t, win),
            _obs_spec(6, t, win),
        ],
        out_specs=_cam_spec(144, nb, win),
        args=(cam.reshape(1, o), x4, mm, sw, mat6),
        o=o, t=t, win=win,
    )
    return out if win is not None else out[:, :n_cams]


# -------------------------------------------------------------- S2-K6
# Model-cost decrease for the joint apply (back_substitute_joint,
# landmark_block.hpp:574-623): j_inc = Jp_ns inc + Jl_s inc_proj,
# l_diff partials = -sum j_inc (0.5 j_inc + r_w).


def _ldiff2_kernel(
    cam_ref, x4_ref, mm_ref, sw_ref, rw_ref, jls_ref, ilm_ref, zt_ref,
    out_ref, *, km_ref=None,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    oh = _onehot(cam_ref[:], zt_ref.shape[-1])
    zc = _gather_table(zt_ref, oh)
    mx, my, zinv = mm_ref[0], mm_ref[1], mm_ref[2]
    sw = sw_ref[0]
    x4 = [x4_ref[0], x4_ref[1], x4_ref[2], x4_ref[3]]
    q = []
    for a in range(3):
        acc = zc[4 * a] * x4[0]
        for c in range(1, 4):
            acc += zc[4 * a + c] * x4[c]
        q.append(acc)
    swz = sw * zinv
    jp = [swz * (q[0] - mx * q[2]), swz * (q[1] - my * q[2])]
    ld = jnp.zeros_like(mx)
    for r in range(2):
        jl_inc = (jls_ref[r * 4 + 0, :] * ilm_ref[0]
                  + jls_ref[r * 4 + 1, :] * ilm_ref[1]
                  + jls_ref[r * 4 + 2, :] * ilm_ref[2]
                  + jls_ref[r * 4 + 3, :] * ilm_ref[3])
        j_inc = jp[r] + jl_inc
        ld += j_inc * (0.5 * j_inc + rw_ref[r, :])
    t = ld.shape[-1]
    out_ref[0, :] += jnp.sum(ld.reshape(t // 128, 128), axis=0)


def ldiff2(cam, x4, mm, sw, r_w, jls8, ilm4, zt, win=None):
    """-l_diff partial sums [128]; zt = Kps @ inc11 per camera."""
    if x4.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.ldiff2(
            cam, x4, mm, sw, r_w, jls8, ilm4, zt, win=win
        )
    o = cam.shape[0]
    zt, n_pad = _tbl_prep(zt, win)
    nb = _cam_block(n_pad, win)
    t = _choose_tile(o, nb, win)
    out = _pose_call(
        _ldiff2_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(4, t, win),
            _obs_spec(3, t, win),
            _obs_spec(1, t, win),
            _obs_spec(2, t, win),
            _obs_spec(8, t, win),
            _obs_spec(4, t, win),
            _cam_spec(12, nb, win),
        ],
        out_specs=_fixed_spec(1, 128, win),
        args=(cam.reshape(1, o), x4, mm, sw, r_w, jls8, ilm4, zt),
        o=o, t=t, win=win,
    )
    return out[0]


# -------------------------------------------------------------- S2-K7
# Double-float (two-f32) homogeneous cost evaluation, mirroring the
# stage-1 K10 kernel (pallas_pose.pose_error_df32): the XLA emulated-
# f64 error sweep dominates the stage-2 LM loop once the solve runs
# through the structured kernels. Adds a double-float DIVISION
# (Karp-Markstein style refinement of the f32 quotient) for the
# projective normalization, ~2 ulp of the ~47-bit format. Matches
# compute_error_projective_space_homogeneous (helper.cpp:156-196),
# including the all/valid buckets (validity |p2| >= sqrt(eps) matters
# here, unlike the pOSE cost).

from povar_tpu.ops.pallas_pose import (  # noqa: E402
    _HUBER as _R_HUBER,
    _CAUCHY as _R_CAUCHY,
    _df_add,
    _df_mul,
    _df_neg,
    _df_scale,
    _two_prod,
    _two_sum,
)


def _df_div(num, den):
    """Double-float division num/den (~2 ulp): refine the f32 quotient
    with one exact-residual correction."""
    q1 = num[0] / den[0]
    p, e = _two_prod(q1, den[0])
    r_hi, r_lo = _two_sum(num[0], -p)
    r_lo = r_lo + num[1] - e - q1 * den[1]
    q2 = (r_hi + r_lo) / den[0]
    hi, lo = _two_sum(q1, q2)
    return (hi, lo)


def _error2_kernel(
    cam_ref, xh_ref, xl_ref, uvh_ref, uvl_ref, m_ref,
    cth_ref, ctl_ref, out_ref, *, robust, huber, km_ref=None,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = cam_ref.shape[-1]
    oh = _onehot(cam_ref[:], cth_ref.shape[-1])
    Ph = _gather_table(cth_ref, oh)
    Pl = _gather_table(ctl_ref, oh)
    mask = m_ref[0] > 0
    x4 = [
        (xh_ref[0], xl_ref[0]),
        (xh_ref[1], xl_ref[1]),
        (xh_ref[2], xl_ref[2]),
        (xh_ref[3], xl_ref[3]),
    ]
    # p_r = sum_c P[r,c] x4[c] in double-float
    p = []
    for r in range(3):
        acc = None
        for c in range(4):
            term = _df_mul((Ph[4 * r + c], Pl[4 * r + c]), x4[c])
            acc = term if acc is None else _df_add(acc, term)
        p.append(acc)
    # Sophus epsilonSqrt (double) = sqrt(1e-10) = 1e-5, bal_camera.hpp:147
    eps_sqrt = np.float32(1e-5)
    valid = (jnp.abs(p[2][0]) >= eps_sqrt) & mask

    r0 = _df_add(_df_div(p[0], p[2]),
                 _df_neg((uvh_ref[0], uvl_ref[0])))
    r1 = _df_add(_df_div(p[1], p[2]),
                 _df_neg((uvh_ref[1], uvl_ref[1])))

    finite = jnp.ones_like(mask)
    res_sq = None
    for rk in (r0, r1):
        rm = (jnp.where(mask, rk[0], 0.0), jnp.where(mask, rk[1], 0.0))
        finite = finite & jnp.isfinite(rm[0])
        sq = _df_mul(rm, rm)
        res_sq = sq if res_sq is None else _df_add(res_sq, sq)

    if robust == _R_HUBER:
        h2 = np.float32(huber * huber)
        w = jnp.where(
            res_sq[0] < h2,
            jnp.ones_like(res_sq[0]),
            np.float32(huber) / jnp.sqrt(jnp.maximum(res_sq[0], 1e-30)),
        )
        err = _df_scale(
            ((2.0 - w) * w * res_sq[0], (2.0 - w) * w * res_sq[1]), 0.5
        )
    elif robust == _R_CAUCHY:
        err = (jnp.log1p(res_sq[0]), jnp.zeros_like(res_sq[0]))
    else:
        err = _df_scale(res_sq, 0.5)
    rn = jnp.sqrt(jnp.maximum(res_sq[0], 0.0))
    validf = valid.astype(jnp.float32)

    def lane_fold(hi, lo):
        acc = (jnp.zeros((128,), jnp.float32),
               jnp.zeros((128,), jnp.float32))
        h2d = hi.reshape(t // 128, 128)
        l2d = lo.reshape(t // 128, 128)
        for i in range(t // 128):
            acc = _df_add(acc, (h2d[i], l2d[i]))
        return acc

    rows = [
        lane_fold(err[0], err[1]),
        lane_fold(rn, jnp.zeros_like(rn)),
        lane_fold(err[0] * validf, err[1] * validf),
        lane_fold(rn * validf, jnp.zeros_like(rn)),
    ]
    for i, acc in enumerate(rows):
        cur = _df_add((out_ref[2 * i, :], out_ref[2 * i + 1, :]), acc)
        out_ref[2 * i, :] = cur[0]
        out_ref[2 * i + 1, :] = cur[1]
    out_ref[8, :] += jnp.sum(
        validf.reshape(t // 128, 128), axis=0
    )
    out_ref[9, :] += jnp.sum(
        (~finite).astype(jnp.float32).reshape(t // 128, 128), axis=0
    )


def error2_df32(
    cam, ct_hi, ct_lo, x_hi, x_lo, uv_hi, uv_lo, mask,
    *, robust, huber, win=None,
):
    """[10, 128] partials: rows (0,1) err all hi/lo, (2,3) res-norm all
    hi/lo, (4,5) err valid hi/lo, (6,7) res-norm valid hi/lo,
    (8) valid count, (9) nonfinite count. Sum pairs in f64."""
    o = cam.shape[0]
    ct_hi, n_pad = _tbl_prep(ct_hi, win)
    ct_lo, _ = _tbl_prep(ct_lo, win)
    nb = _cam_block(n_pad, win)
    t = _win_tile(min(_tile(o, nb), 2048), win)
    return _pose_call(
        functools.partial(
            _error2_kernel, robust=int(robust), huber=float(huber)
        ),
        out_shape=jax.ShapeDtypeStruct((10, 128), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(4, t, win),
            _obs_spec(4, t, win),
            _obs_spec(2, t, win),
            _obs_spec(2, t, win),
            _obs_spec(1, t, win),
            _cam_spec(12, nb, win),
            _cam_spec(12, nb, win),
        ],
        out_specs=_fixed_spec(10, 128, win),
        args=(
            cam.reshape(1, o), x_hi, x_lo, uv_hi, uv_lo, mask,
            ct_hi, ct_lo,
        ),
        o=o, t=t, win=win,
    )
