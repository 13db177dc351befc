"""Structured pOSE kernels: the fused stage-1 compute core (TPU Pallas).

The pOSE residual (bal_bundle_adjustment_helper.cpp:243-313) has
Kronecker structure that a per-observation storage layout wastes:

  A~ rows:  A0 = sp (P0 - u P2), A1 = sp (P1 - v P2),
            A2 = sa P0,          A3 = sa P1          (sp^2 + sa^2 = 1)
  r  = A~ xh - [0, 0, sa u, sa v],   xh = [x, 1]
  Jl = A~[:, :3]                                     (4 x 3)
  Jp[k, 4a+j] = C[k, a] xh_j    with C a function of (u, v) only

Consequences exploited here (all verified against the dense forms in
ops/pose_math.py by tests/test_pallas_pose.py):

  Jp^T Jp      = K (x) (xh xh^T),  K[a,b] 3x3 from (u,v):   9+10 values
  Jp^T r       = rho (x) xh,       rho[a] 3 values from (r, u, v)
  Jl^T Jp      = g (x) xh,         g[i,a] = 3x3 from (P, u, v)
  W = L^T Jl_s^T Jp_s = (h (x) xh) . ps_gather,  h = sw^2 L^T D_jl g

and the Jacobi scalings factor out of every per-camera segment sum:
pose_scale applies as an outer product on the [12(x12), N] accumulators
AFTER the reduction, never per observation.

So the solver never materializes Jp [4,12,O], Jl [4,3,O] or W [3,12,O]:
per-observation state is x [3,O], uv [2,O], w [1,O], r_w [4,O], and the
9-value factor h [9,O] — an ~8x cut in HBM traffic on the power-series
hot loop, on top of the on-chip one-hot camera gather/scatter
(ops/pallas_cam.py) replacing the reference's mutex scatter-add
(sc/linearization_power_varproj.hpp:364-453).

All kernels are f32 with Precision.HIGHEST incidence matmuls; gating and
obs-axis padding contract are shared with ops/pallas_cam.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from povar_tpu.ops.pallas_cam import (
    _I0,
    _interpret,
    _n_pad,
    _oh_gather,
    _oh_scatter,
    _onehot,
    _tile,
)

# robust norm codes (ops/pose_math.py)
_NONE, _HUBER, _CAUCHY = 0, 1, 2

# Windowed mode (large N): the slot plan packs landmarks into camera
# windows of width W (segments.build_window_plan) and pads each
# window's observation lanes to PART_ALIGN, so every aligned obs block
# touches exactly ONE window. Kernels then receive:
#   - cam ids LOCAL to the window (in [0, W)),
#   - camera tables EXPANDED to [rows, n_win * W] (columns = window
#     slices of the canonical [rows, N] table; the caller expands with
#     a tiny XLA gather and combines per-camera outputs back with a
#     tiny segment-sum),
#   - a per-tile window index kmap (scalar-prefetched; block index maps
#     select the window slice of tables/accumulators).
# The in-kernel one-hot is then [W, T] regardless of N — the gather/
# scatter cost per observation is O(W), not O(N).
#
# `win` below = (kmap [n_blocks] i32 at PART_ALIGN granularity,
# n_win, W); None = the single-window small-N mode (tables [rows,
# n_pad], kmap absent — exactly the historical behavior).

PART_ALIGN = 4096


def _obs_spec(rows: int, t: int, win=None):
    if win is None:
        return pl.BlockSpec((rows, t), lambda i: (_I0, i),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((rows, t), lambda i, km: (_I0, i),
                        memory_space=pltpu.VMEM)


def _fixed_spec(rows: int, cols: int, win=None):
    if win is None:
        return pl.BlockSpec((rows, cols), lambda i: (_I0, _I0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((rows, cols), lambda i, km: (_I0, _I0),
                        memory_space=pltpu.VMEM)


def _cam_spec(rows: int, width: int, win=None):
    """Camera-table / per-camera-accumulator blocks: the whole padded
    table (plain) or the tile's window slice (windowed)."""
    if win is None:
        return pl.BlockSpec((rows, width), lambda i: (_I0, _I0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((rows, width), lambda i, km: (_I0, km[i]),
                        memory_space=pltpu.VMEM)


def _first_visit(km_ref):
    """Accumulator zero-init condition: first tile overall (plain), or
    first tile of each window (windowed — the output block is revisited
    in one consecutive run per window; kmap is non-decreasing)."""
    i = pl.program_id(0)
    if km_ref is None:
        return i == 0
    return (i == 0) | (km_ref[i] != km_ref[jnp.maximum(i - 1, 0)])


def _cam_cols(n_pad: int, win) -> int:
    """Column count of camera tables/accumulators at the call level."""
    return win[1] * win[2] if win is not None else n_pad


def _cam_block(n_pad: int, win) -> int:
    """Column count of the per-tile camera block inside the kernel."""
    return win[2] if win is not None else n_pad


def _win_tile(t: int, win) -> int:
    """Windowed kernels double-buffer the km-indexed table and
    accumulator blocks on top of the obs blocks; cap the tile so the
    whole VMEM frame (one-hot [W, T] included) stays under the scoped
    limit."""
    return min(t, 1024) if win is not None else t


def _choose_tile(o: int, nb: int, win, plain_cap: int = PART_ALIGN) -> int:
    """Obs tile for a kernel launch: windowed mode caps at the kmap
    block granularity (PART_ALIGN) and the window VMEM budget; plain
    mode caps at the kernel's own VMEM frame budget (`plain_cap` —
    thin kernels take 8192 to halve the fixed per-tile launch cost,
    fat ones like `prepare` stay at 4096: their padded operand +
    temporary rows exceed scoped VMEM at 8192)."""
    t = _tile(o, nb)
    if win is not None:
        return _win_tile(min(t, PART_ALIGN), win)
    return min(t, plain_cap)


def _pose_call(kern, out_shape, in_specs, out_specs, args, *, o, t, win):
    """pallas_call wrapper: plain grid, or scalar-prefetch grid with the
    per-tile window map as the prefetched operand."""
    if win is None:
        return pl.pallas_call(
            kern, out_shape=out_shape, grid=(o // t,),
            in_specs=in_specs, out_specs=out_specs,
            interpret=_interpret(),
        )(*args)
    kmap = win[0]
    km_t = jnp.repeat(kmap, PART_ALIGN // t)

    def wrapped(km_ref, *refs):
        return kern(*refs, km_ref=km_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(o // t,),
        in_specs=in_specs, out_specs=out_specs,
    )
    return pl.pallas_call(
        wrapped, out_shape=out_shape, grid_spec=grid_spec,
        interpret=_interpret(),
    )(km_t, *args)


def _gather_table(table_ref, oh):
    """[R, Npad] table -> [R, T] per-observation rows via the on-chip
    one-hot incidence (exact: 3-way bf16 split, see pallas_cam)."""
    return _oh_gather(table_ref[:], oh)


def _scatter_rows(rows, oh):
    """rows [R, T] -> [R, Npad] per-camera sums (exact products:
    3-way bf16 split, see pallas_cam)."""
    return _oh_scatter(rows, oh)


def _a_tilde(P, u, v, sp, sa):
    """A~ [4][4] rows as lists of [T] vectors from P [12, T] rows."""
    # P rows: P[r*4 + c]
    A = [[None] * 4 for _ in range(4)]
    for c in range(4):
        p0, p1, p2 = P[c], P[4 + c], P[8 + c]
        A[0][c] = sp * (p0 - u * p2)
        A[1][c] = sp * (p1 - v * p2)
        A[2][c] = sa * p0
        A[3][c] = sa * p1
    return A


def _residual(A, xh, u, v, sa):
    """pOSE residual rows [4][T] = A~ xh - [0,0,sa u, sa v]."""
    r = []
    for k in range(4):
        acc = A[k][0] * xh[0]
        for c in range(1, 4):
            acc += A[k][c] * xh[c]
        r.append(acc)
    r[2] = r[2] - sa * u
    r[3] = r[3] - sa * v
    return r


def _robust_w(res_sq, robust: int, huber: float):
    """IRLS weight (helper.cpp:50-74); error term not needed here."""
    if robust == _HUBER:
        return jnp.where(
            res_sq < huber * huber,
            jnp.ones_like(res_sq),
            huber / jnp.sqrt(jnp.maximum(res_sq, 1e-30)),
        )
    return jnp.ones_like(res_sq)


# --------------------------------------------------------------- K1
# One pass over observations at a linearization point: residual,
# robust weight, and every reduction input the solver needs —
# ata/atr feed the landmark (Hll) side via slot sums, jpsq is the
# per-camera Jp column-norm accumulator (scattered in-kernel).


def _prepare_kernel(
    cam_ref, x_ref, uv_ref, m_ref, ct_ref,
    rw_ref, sw_ref, ata_ref, atr_ref, jpsq_ref,
    *, alpha, robust, huber, weighted, km_ref=None,
):
    @pl.when(_first_visit(km_ref))
    def _():
        jpsq_ref[:] = jnp.zeros_like(jpsq_ref)

    t = cam_ref.shape[-1]
    sp = np.float32(np.sqrt(1.0 - alpha))
    sa = np.float32(np.sqrt(alpha))
    oh = _onehot(cam_ref[:], ct_ref.shape[-1])
    P = _gather_table(ct_ref, oh)  # [12, T]
    u, v = uv_ref[0], uv_ref[1]
    xh = [x_ref[0], x_ref[1], x_ref[2], jnp.ones_like(u)]
    mask = m_ref[0] > 0

    A = _a_tilde(P, u, v, sp, sa)
    r = _residual(A, xh, u, v, sa)
    r = [jnp.where(mask, rk, 0.0) for rk in r]

    res_sq = r[0] * r[0] + r[1] * r[1] + r[2] * r[2] + r[3] * r[3]
    if weighted:
        w = _robust_w(res_sq, robust, huber)
    else:
        w = jnp.ones_like(res_sq)
    w = jnp.where(mask, w, 0.0)
    sw = jnp.sqrt(w)

    for k in range(4):
        rw_ref[k, :] = r[k] * sw
    sw_ref[0, :] = sw

    # ata[i*3+j] = w sum_k A[k][i] A[k][j]; atr[i] = w sum_k A[k][i] r[k]
    for i in range(3):
        for j in range(3):
            acc = A[0][i] * A[0][j]
            for k in range(1, 4):
                acc += A[k][i] * A[k][j]
            ata_ref[i * 3 + j, :] = w * acc
        acc = A[0][i] * r[0]
        for k in range(1, 4):
            acc += A[k][i] * r[k]
        atr_ref[i, :] = w * acc

    # Jp column norms^2: jpsq[4a+j] = w K[a,a] xh_j^2 with
    # K diag = [1, 1, sp^2 (u^2+v^2)]
    kdiag = [jnp.ones_like(u), jnp.ones_like(u), sp * sp * (u * u + v * v)]
    rows = []
    for a in range(3):
        for j in range(4):
            rows.append(w * kdiag[a] * xh[j] * xh[j])
    jpsq_ref[:] += _scatter_rows(
        jnp.stack(rows, axis=0).reshape(12, t), oh
    )


def prepare(
    cam, cam_table, x, uv, mask, *, alpha, robust, huber, weighted=True,
    win=None,
):
    """Linearization-point pass. Inputs: cam [O] i32 (window-local ids
    under `win`), cam_table [12, N] (row-major vec(P) per camera;
    [12, n_win*W] expanded under `win`), x [3, O] (landmarks expanded
    to observations), uv [2, O], mask [1, O] (>0 = live row). Returns
    (r_w [4,O], sw [1,O], ata [9,O], atr [3,O], jpsq [12,N] — expanded
    width under `win`, caller combines).

    `weighted=False` skips the robust weight (the fresh-Jacobian pass of
    the VarProj back-substitution is unweighted,
    helper.cpp update_landmark_jacobian_pOSE:382-454)."""
    if x.dtype != jnp.float32:  # f64 solves: XLA mirror (ops/xla_pose)
        from povar_tpu.ops import xla_pose

        return xla_pose.prepare(
            cam, cam_table, x, uv, mask, alpha=alpha, robust=robust,
            huber=huber, weighted=weighted, win=win,
        )
    o = cam.shape[0]
    n = cam_table.shape[-1]
    if win is None:
        n_pad = _n_pad(n)
        if n_pad != n:
            cam_table = jnp.pad(cam_table, ((0, 0), (0, n_pad - n)))
    else:
        n_pad = n
    nb = _cam_block(n_pad, win)
    # the A~ / residual / outer temporaries bound the tile below the
    # one-hot VMEM budget
    t = _choose_tile(o, nb, win)
    kern = functools.partial(
        _prepare_kernel, alpha=float(alpha), robust=int(robust),
        huber=float(huber), weighted=bool(weighted),
    )
    rw, sw, ata, atr, jpsq = _pose_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((4, o), jnp.float32),
            jax.ShapeDtypeStruct((1, o), jnp.float32),
            jax.ShapeDtypeStruct((9, o), jnp.float32),
            jax.ShapeDtypeStruct((3, o), jnp.float32),
            jax.ShapeDtypeStruct((12, n_pad), jnp.float32),
        ),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(3, t, win),
            _obs_spec(2, t, win),
            _obs_spec(1, t, win),
            _cam_spec(12, nb, win),
        ],
        out_specs=(
            _obs_spec(4, t, win),
            _obs_spec(1, t, win),
            _obs_spec(9, t, win),
            _obs_spec(3, t, win),
            _cam_spec(12, nb, win),
        ),
        args=(cam.reshape(1, o), x, uv, mask, cam_table),
        o=o, t=t, win=win,
    )
    return rw, sw, ata, atr, (jpsq if win is not None else jpsq[:, :n])


# --------------------------------------------------------------- K2
# Build the 9-value E0 factor h [9, O]:
#   g[i, a]  (Jl^T Jp = g (x) xh):
#     g[i,0] = P0i - sp^2 u P2i
#     g[i,1] = P1i - sp^2 v P2i
#     g[i,2] = sp^2 ( (u^2+v^2) P2i - u P0i - v P1i )
#   h[c, a] = w sum_i (jls_i L[i,c]) g[i, a]
# where L [3,3] is the Cholesky factor of Hll^-1 (slot-expanded) and
# jls the landmark Jacobi column scale.


def _h_kernel(cam_ref, uv_ref, w_ref, jls_ref, lh_ref, ct_ref, h_ref,
              *, alpha, km_ref=None):
    sp2 = np.float32(1.0 - alpha)
    oh = _onehot(cam_ref[:], ct_ref.shape[-1])
    P = _gather_table(ct_ref, oh)
    u, v = uv_ref[0], uv_ref[1]
    w = w_ref[0]

    g = [[None] * 3 for _ in range(3)]
    for i in range(3):
        p0, p1, p2 = P[i], P[4 + i], P[8 + i]
        g[i][0] = p0 - sp2 * u * p2
        g[i][1] = p1 - sp2 * v * p2
        g[i][2] = sp2 * ((u * u + v * v) * p2 - u * p0 - v * p1)

    for c in range(3):
        for a in range(3):
            acc = jls_ref[0] * lh_ref[c, :] * g[0][a]
            acc += jls_ref[1] * lh_ref[3 + c, :] * g[1][a]
            acc += jls_ref[2] * lh_ref[6 + c, :] * g[2][a]
            h_ref[c * 3 + a, :] = w * acc


def e0_factor(cam, cam_table, uv, w, jls, lh, *, alpha, win=None):
    """h [9, O] (layout c*3+a). Inputs: w [1,O] robust weight (not
    sqrt), jls [3,O] landmark scale expanded to obs, lh [9,O] chol of
    Hll^-1 expanded to obs (row-major i*3+c)."""
    if cam_table.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.e0_factor(
            cam, cam_table, uv, w, jls, lh, alpha=alpha, win=win
        )
    o = cam.shape[0]
    n = cam_table.shape[-1]
    if win is None:
        n_pad = _n_pad(n)
        if n_pad != n:
            cam_table = jnp.pad(cam_table, ((0, 0), (0, n_pad - n)))
    else:
        n_pad = n
    nb = _cam_block(n_pad, win)
    t = _choose_tile(o, nb, win, plain_cap=8192)
    return _pose_call(
        functools.partial(_h_kernel, alpha=float(alpha)),
        out_shape=jax.ShapeDtypeStruct((9, o), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(2, t, win),
            _obs_spec(1, t, win),
            _obs_spec(3, t, win),
            _obs_spec(9, t, win),
            _cam_spec(12, nb, win),
        ],
        out_specs=_obs_spec(9, t, win),
        args=(cam.reshape(1, o), uv, w, jls, lh, cam_table),
        o=o, t=t, win=win,
    )


# --------------------------------------------------------------- K3
# Fused Hpp + b assembly from the structured form (prepare_Hb_pOSE,
# sc/linearization_power_varproj.hpp:126-188):
#   r~      = r_w - Jl_s (Hll^-1 bl)          (per obs, on the fly)
#   b_raw   = seg_cam( rho (x) xh )           rho from (r~, u, v)
#   hpp_raw = seg_cam( w K (x) xh xh^T )
# the caller applies pose_scale as ps (x) ps / ps outer products.


def _hpp_b_kernel(
    cam_ref, x_ref, uv_ref, sw_ref, rw_ref, jls_ref, hib_ref, ct_ref,
    hpp_ref, b_ref, *, alpha, km_ref=None,
):
    @pl.when(_first_visit(km_ref))
    def _():
        hpp_ref[:] = jnp.zeros_like(hpp_ref)
        b_ref[:] = jnp.zeros_like(b_ref)

    t = cam_ref.shape[-1]
    sp = np.float32(np.sqrt(1.0 - alpha))
    sa = np.float32(np.sqrt(alpha))
    sp2 = sp * sp
    oh = _onehot(cam_ref[:], ct_ref.shape[-1])
    P = _gather_table(ct_ref, oh)
    u, v = uv_ref[0], uv_ref[1]
    sw = sw_ref[0]
    xh = [x_ref[0], x_ref[1], x_ref[2], jnp.ones_like(u)]

    A = _a_tilde(P, u, v, sp, sa)
    # r~ = r_w - Jl_s hib,  Jl_s[k,i] = A[k][i] sw jls_i
    rt = []
    for k in range(4):
        corr = A[k][0] * jls_ref[0] * hib_ref[0]
        corr += A[k][1] * jls_ref[1] * hib_ref[1]
        corr += A[k][2] * jls_ref[2] * hib_ref[2]
        rt.append(rw_ref[k, :] - sw * corr)

    # rho[a]: Jp^T r~ = rho (x) xh, with the sqrt-weight already in r~
    # and one more sw from Jp_s's weighting
    rho = [
        sw * (sp * rt[0] + sa * rt[2]),
        sw * (sp * rt[1] + sa * rt[3]),
        sw * (-sp * (u * rt[0] + v * rt[1])),
    ]
    rows = []
    for a in range(3):
        for j in range(4):
            rows.append(rho[a] * xh[j])
    b_ref[:] += _scatter_rows(jnp.stack(rows, axis=0).reshape(12, t), oh)

    # K (x) xh xh^T with w = sw^2
    w = sw * sw
    K = [[jnp.ones_like(u), jnp.zeros_like(u), -sp2 * u],
         [jnp.zeros_like(u), jnp.ones_like(u), -sp2 * v],
         [-sp2 * u, -sp2 * v, sp2 * (u * u + v * v)]]
    rows = []
    for a in range(3):
        for i in range(4):
            wk = w * xh[i]
            for bb in range(3):
                for j in range(4):
                    rows.append(wk * K[a][bb] * xh[j])
    hpp_ref[:] += _scatter_rows(
        jnp.stack(rows, axis=0).reshape(144, t), oh
    )


def hpp_b_structured(
    cam, cam_table, x, uv, sw, r_w, jls, hib, n_cams, *, alpha, win=None
):
    """(hpp_raw [144, N], b_raw [12, N]) per-camera sums BEFORE the
    pose-scale outer products (row layout (4a+i)*12 + (4b+j)).
    Under `win`, N is the expanded n_win*W axis (caller combines)."""
    if x.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.hpp_b_structured(
            cam, cam_table, x, uv, sw, r_w, jls, hib, n_cams,
            alpha=alpha, win=win,
        )
    o = cam.shape[0]
    if win is None:
        n_pad = _n_pad(n_cams)
        nt = cam_table.shape[-1]
        if _n_pad(nt) != nt:
            cam_table = jnp.pad(
                cam_table, ((0, 0), (0, _n_pad(nt) - nt))
            )
        tbl_cols = _n_pad(nt)
    else:
        n_pad = cam_table.shape[-1]
        tbl_cols = n_pad
    nb = _cam_block(tbl_cols, win)
    t = _win_tile(min(_tile(o, nb), 2048), win)
    hpp, b = _pose_call(
        functools.partial(_hpp_b_kernel, alpha=float(alpha)),
        out_shape=(
            jax.ShapeDtypeStruct((144, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((12, n_pad), jnp.float32),
        ),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(3, t, win),
            _obs_spec(2, t, win),
            _obs_spec(1, t, win),
            _obs_spec(4, t, win),
            _obs_spec(3, t, win),
            _obs_spec(3, t, win),
            _cam_spec(12, nb, win),
        ],
        out_specs=(
            _cam_spec(144, nb, win),
            _cam_spec(12, nb, win),
        ),
        args=(cam.reshape(1, o), x, uv, sw, r_w, jls, hib, cam_table),
        o=o, t=t, win=win,
    )
    if win is not None:
        return hpp, b
    return hpp[:, :n_cams], b[:, :n_cams]


# ------------------------------------------------------------ K4/K5
# Power-series E0 matvec through the 9-value factor:
#   u[c]   = sum_a h[c,a] y[a],  y[a] = sum_j xh_j (ps x)[cam][4a+j]
#   out    = ps . seg_cam( t (x) xh ),  t[a] = sum_c h[c,a] sb[c]
# The pose scale rides the z-table on the way in and the accumulator
# on the way out — never touching per-observation arrays.


def _e0_u_kernel(cam_ref, x_ref, h_ref, zt_ref, u_ref, *, km_ref=None):
    oh = _onehot(cam_ref[:], zt_ref.shape[-1])
    zc = _gather_table(zt_ref, oh)  # [12, T]
    xh = [x_ref[0], x_ref[1], x_ref[2]]
    y = []
    for a in range(3):
        acc = zc[4 * a + 3, :]  # xh_3 = 1
        for j in range(3):
            acc += xh[j] * zc[4 * a + j, :]
        y.append(acc)
    for c in range(3):
        u_ref[c, :] = (h_ref[c * 3 + 0, :] * y[0]
                       + h_ref[c * 3 + 1, :] * y[1]
                       + h_ref[c * 3 + 2, :] * y[2])


def e0_u_structured(cam, x, h, z_table, win=None):
    """u [3, O] = W_o . z[:, cam(o)] with z_table = ps . xvec [12, N]."""
    if x.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.e0_u_structured(cam, x, h, z_table, win=win)
    o = cam.shape[0]
    n = z_table.shape[-1]
    if win is None:
        n_pad = _n_pad(n)
        if n_pad != n:
            z_table = jnp.pad(z_table, ((0, 0), (0, n_pad - n)))
    else:
        n_pad = n
    nb = _cam_block(n_pad, win)
    t = _choose_tile(o, nb, win, plain_cap=8192)
    return _pose_call(
        _e0_u_kernel,
        out_shape=jax.ShapeDtypeStruct((3, o), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(3, t, win),
            _obs_spec(9, t, win),
            _cam_spec(12, nb, win),
        ],
        out_specs=_obs_spec(3, t, win),
        args=(cam.reshape(1, o), x, h, z_table),
        o=o, t=t, win=win,
    )


def _e0_scatter_kernel(cam_ref, x_ref, h_ref, sb_ref, out_ref, *,
                       km_ref=None):
    @pl.when(_first_visit(km_ref))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = cam_ref.shape[-1]
    xh = [x_ref[0], x_ref[1], x_ref[2], None]
    tt = []
    for a in range(3):
        acc = h_ref[a, :] * sb_ref[0, :]
        acc += h_ref[3 + a, :] * sb_ref[1, :]
        acc += h_ref[6 + a, :] * sb_ref[2, :]
        tt.append(acc)
    rows = []
    for a in range(3):
        for j in range(4):
            rows.append(tt[a] if j == 3 else tt[a] * xh[j])
    oh = _onehot(cam_ref[:], out_ref.shape[-1])
    out_ref[:] += _scatter_rows(
        jnp.stack(rows, axis=0).reshape(12, t), oh
    )


def e0_scatter_structured(cam, x, h, sb, n_cams, win=None):
    """out_raw [12, N] = seg_cam( (h^T sb) (x) xh ); caller multiplies
    by the pose scale. Under `win`, N is the expanded axis."""
    if x.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.e0_scatter_structured(
            cam, x, h, sb, n_cams, win=win
        )
    o = cam.shape[0]
    n_pad = win[1] * win[2] if win is not None else _n_pad(n_cams)
    nb = _cam_block(n_pad, win)
    t = _choose_tile(o, nb, win, plain_cap=8192)
    out = _pose_call(
        _e0_scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((12, n_pad), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(3, t, win),
            _obs_spec(9, t, win),
            _obs_spec(3, t, win),
        ],
        out_specs=_cam_spec(12, nb, win),
        args=(cam.reshape(1, o), x, h, sb),
        o=o, t=t, win=win,
    )
    return out if win is not None else out[:, :n_cams]


# --------------------------------------------------------------- K5b
# Fully fused power-series E0 term (right_mul_e0,
# sc/linearization_power_varproj.hpp:364-453): one kernel computes
#   out[:, n] = seg_cam( (H^T sb) (x) xh ),  sb = seg_lm( H (xh . zc) )
# i.e. the e0_u gather, the per-landmark slot reduction, the
# re-expansion AND the e0_scatter in a single pass — the composed
# three-step pipeline pays two extra kernel launches per obs tile plus
# an HBM round trip of u/sb [3, O] per term (~40% of a term's device
# time at venice-89 was launch sequencing + XLA reduce/expand glue).
#
# The per-landmark reduction is possible in-kernel because the slot
# layout is slot-element-major per width bucket (segments.py): a part
# of g landmarks with slot width w is a [w, g] grid with the landmark
# axis on the lanes. The caller reshapes each part's per-obs operands
# to [rows * w, g] (flat slot-major rows — a pure view of the existing
# memory) and the kernel blocks on the LANDMARK axis: a [rows*w, gt]
# block holds every slot of gt whole landmarks, so sb is a plain
# in-register sum over the w row slices. One pallas_call per width
# bucket; the caller sums the per-part [12, Npad] outputs.


def _e0_term_kernel(cam_ref, x_ref, h_ref, z_ref, out_ref, *, w):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    nb = z_ref.shape[-1]
    gt = cam_ref.shape[-1]
    ohs = []
    sb = [None, None, None]
    # pass A: u per slot row, accumulated per landmark (lane) into sb
    for j in range(w):
        oh = _onehot(cam_ref[j, :].reshape(1, gt), nb)
        ohs.append(oh)
        zc = _gather_table(z_ref, oh)  # [12, gt]
        xh = [x_ref[j, :], x_ref[w + j, :], x_ref[2 * w + j, :]]
        y = []
        for a in range(3):
            acc = zc[4 * a + 3, :]
            for i in range(3):
                acc += xh[i] * zc[4 * a + i, :]
            y.append(acc)
        for c in range(3):
            u = (h_ref[(c * 3 + 0) * w + j, :] * y[0]
                 + h_ref[(c * 3 + 1) * w + j, :] * y[1]
                 + h_ref[(c * 3 + 2) * w + j, :] * y[2])
            sb[c] = u if sb[c] is None else sb[c] + u
    # pass B: scatter (H^T sb) (x) xh per slot row back to cameras
    acc_out = None
    for j in range(w):
        xh = [x_ref[j, :], x_ref[w + j, :], x_ref[2 * w + j, :]]
        tt = []
        for a in range(3):
            tt.append(h_ref[a * w + j, :] * sb[0]
                      + h_ref[(3 + a) * w + j, :] * sb[1]
                      + h_ref[(6 + a) * w + j, :] * sb[2])
        rows = []
        for a in range(3):
            for i in range(4):
                rows.append(tt[a] if i == 3 else tt[a] * xh[i])
        contrib = _scatter_rows(jnp.stack(rows, axis=0), ohs[j])
        acc_out = contrib if acc_out is None else acc_out + contrib
    out_ref[:] += acc_out


# Per-part VMEM frame budget for the fused term kernel. Footprint per
# landmark lane: rows_per_lane operand rows ((1 cam + 3 x + 9 h) * w *
# 4 B for stage 1) PLUS the w one-hot matrices [gt, n_pad] that pass A
# builds and pass B reuses for the scatter — the retained one-hots
# dominate at larger camera counts and MUST be budgeted, not left to
# compiler spilling (advisor r3).
_E0_TERM_VMEM = 14 << 20
# Unrolled slot loops: parts wider than this fall back to the composed
# kernels (program size grows linearly in w).
E0_TERM_MAX_W = 16


def e0_term_geometry(w: int, g: int, n_cams: int, rows_per_lane: int = 13):
    """(landmark-axis tile, padded landmark count) for a (g landmarks,
    width w) part, or None when even the minimum 128-lane tile blows
    the VMEM frame (large camera counts: the retained one-hots are
    w * gt * n_pad * 4 B). The part pads its landmark axis (zero-weight
    lanes) to a whole number of tiles. rows_per_lane: f32 operand rows
    per slot element (13 for the stage-1 kernel: cam+x+h; 15 for
    stage-2: cam+x4+mm+sw+mat6)."""
    from povar_tpu.ops.pallas_cam import _n_pad, _round_up

    n_pad = _n_pad(n_cams)
    per_gt = 4 * w * (rows_per_lane + n_pad)
    cap = (_E0_TERM_VMEM // per_gt) // 128 * 128
    if cap < 128:
        return None
    gt = min(2048, cap, _round_up(g, 128))
    return gt, _round_up(g, gt)


def e0_term_parts(parts, z_table, n_cams):
    """Fused E0 matvec over pre-reshaped slot parts.

    parts: tuple of (cam2 [w, G] i32, x2 [3w, G] f32, h2 [9w, G] f32,
    w, gt) with G a multiple of gt (zero-weight pads have h == 0 and
    contribute exactly zero). z_table [12, N]: the gathered camera
    vector (pose scale folded by the caller). Returns [12, n_cams]
    per-camera sums, exact bf16-split products like the composed path.
    """
    n_pad = _n_pad(n_cams)
    if z_table.shape[-1] != n_pad:
        z_table = jnp.pad(
            z_table, ((0, 0), (0, n_pad - z_table.shape[-1]))
        )
    out = None
    for cam2, x2, h2, w, gt in parts:
        g = cam2.shape[-1]
        r = pl.pallas_call(
            functools.partial(_e0_term_kernel, w=w),
            out_shape=jax.ShapeDtypeStruct((12, n_pad), jnp.float32),
            grid=(g // gt,),
            in_specs=[
                pl.BlockSpec((w, gt), lambda i: (_I0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * w, gt), lambda i: (_I0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * w, gt), lambda i: (_I0, i),
                             memory_space=pltpu.VMEM),
                _fixed_spec(12, n_pad),
            ],
            out_specs=_fixed_spec(12, n_pad),
            interpret=_interpret(),
        )(cam2, x2, h2, z_table)
        out = r if out is None else out + r
    return out[:, :n_cams]


# --------------------------------------------------------------- K6
# Model-cost decrease for the VarProj apply
# (back_substitute_pOSE, sc/landmark_block.hpp:670-707):
#   j_inc = Jp(new cams) inc_gathered + Jl_stored inc_lm
#   l_diff = -sum j_inc . (0.5 j_inc + r_w)
# Jp inc via the structure: Jp q = [sp (q~0 - u q~2), sp (q~1 - v q~2),
# sa q~0, sa q~1], q~a = sum_j q[4a+j] xh_j.


def _ldiff_kernel(
    cam_ref, x_ref, uv_ref, sw_ref, rw_ref, jls_ref, ilm_ref,
    ct_old_ref, it_ref, out_ref, *, alpha, km_ref=None,
):
    # the [1,128] accumulator block is constant across the whole grid,
    # so init is at tile 0 regardless of windows
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    sp = np.float32(np.sqrt(1.0 - alpha))
    sa = np.float32(np.sqrt(alpha))
    oh = _onehot(cam_ref[:], ct_old_ref.shape[-1])
    q = _gather_table(it_ref, oh)  # inc (scaled coords) per obs [12, T]
    Po = _gather_table(ct_old_ref, oh)
    u, v = uv_ref[0], uv_ref[1]
    sw = sw_ref[0]
    xh = [x_ref[0], x_ref[1], x_ref[2], jnp.ones_like(u)]

    qt = []
    for a in range(3):
        acc = q[4 * a + 3, :]
        for j in range(3):
            acc += xh[j] * q[4 * a + j, :]
        qt.append(acc)
    # fresh Jp at the NEW cameras is mask/weight-free in the reference;
    # but q is zero only where inc is — apply the mask via sw==0 rows
    # of the stored r_w (pads have r_w = 0 AND jinc contributions that
    # must vanish): zero via the stored sw mask.
    live = sw > 0
    jp_inc = [
        sp * (qt[0] - u * qt[2]),
        sp * (qt[1] - v * qt[2]),
        sa * qt[0],
        sa * qt[1],
    ]

    # Jl_stored inc_lm: Jl_s[k,i] = A_old[k][i] sw jls_i. (The fresh Jp
    # at the NEW cameras uses only the structure (xh, u, v), never P
    # itself, so no new-camera table flows into this kernel.)
    Ao = _a_tilde(Po, u, v, sp, sa)
    ld = jnp.zeros_like(u)
    for k in range(4):
        jl_inc = (Ao[k][0] * jls_ref[0] * ilm_ref[0]
                  + Ao[k][1] * jls_ref[1] * ilm_ref[1]
                  + Ao[k][2] * jls_ref[2] * ilm_ref[2]) * sw
        j_inc = jnp.where(live, jp_inc[k] + jl_inc, 0.0)
        ld += j_inc * (0.5 * j_inc + rw_ref[k, :])
    t = ld.shape[-1]
    out_ref[0, :] += jnp.sum(ld.reshape(t // 128, 128), axis=0)


def apply_ldiff(
    cam, x, uv, sw, r_w, jls, inc_lm_obs, cam_table_old,
    inc_table, *, alpha, win=None
):
    """-l_diff partial sums [128]; sum() for the model cost decrease.
    inc_table [12, N] is the scaled camera increment; inc_lm_obs [3, O]
    the (unscaled) landmark increment expanded to observations. The
    fresh Jp at the updated cameras depends only on (xh, u, v), so no
    new-camera table operand is needed."""
    if x.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.apply_ldiff(
            cam, x, uv, sw, r_w, jls, inc_lm_obs, cam_table_old,
            inc_table, alpha=alpha, win=win,
        )
    o = cam.shape[0]
    n = cam_table_old.shape[-1]
    if win is None:
        n_pad = _n_pad(n)
        if n_pad != n:
            pad = ((0, 0), (0, n_pad - n))
            cam_table_old = jnp.pad(cam_table_old, pad)
            inc_table = jnp.pad(inc_table, pad)
    else:
        n_pad = n
    nb = _cam_block(n_pad, win)
    t = _choose_tile(o, nb, win)
    out = _pose_call(
        functools.partial(_ldiff_kernel, alpha=float(alpha)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(3, t, win),
            _obs_spec(2, t, win),
            _obs_spec(1, t, win),
            _obs_spec(4, t, win),
            _obs_spec(3, t, win),
            _obs_spec(3, t, win),
            _cam_spec(12, nb, win),
            _cam_spec(12, nb, win),
        ],
        out_specs=_fixed_spec(1, 128, win),
        args=(
            cam.reshape(1, o), x, uv, sw, r_w, jls, inc_lm_obs,
            cam_table_old, inc_table,
        ),
        o=o, t=t, win=win,
    )
    return out[0]


# --------------------------------------------------------------- K7
# poBA back-substitution input (back_substitute_poBA,
# sc/landmark_block.hpp:625-668): t3 = Jl_s^T (r_w + Jp_s inc), with
# Jp_s inc computed through the structure and the z-table
# (zt = ps . inc per camera), per-landmark slot-summed by the caller.


def _poba_t3_kernel(
    cam_ref, x_ref, uv_ref, sw_ref, rw_ref, jls_ref, zt_ref, ct_ref,
    t3_ref, *, alpha, km_ref=None,
):
    sp = np.float32(np.sqrt(1.0 - alpha))
    sa = np.float32(np.sqrt(alpha))
    oh = _onehot(cam_ref[:], zt_ref.shape[-1])
    q = _gather_table(zt_ref, oh)
    P = _gather_table(ct_ref, oh)
    u, v = uv_ref[0], uv_ref[1]
    sw = sw_ref[0]
    xh = [x_ref[0], x_ref[1], x_ref[2]]

    qt = []
    for a in range(3):
        acc = q[4 * a + 3, :]
        for j in range(3):
            acc += xh[j] * q[4 * a + j, :]
        qt.append(acc)
    jp_inc = [
        sw * sp * (qt[0] - u * qt[2]),
        sw * sp * (qt[1] - v * qt[2]),
        sw * sa * qt[0],
        sw * sa * qt[1],
    ]
    A = _a_tilde(P, u, v, sp, sa)
    for i in range(3):
        acc = A[0][i] * (rw_ref[0, :] + jp_inc[0])
        for k in range(1, 4):
            acc += A[k][i] * (rw_ref[k, :] + jp_inc[k])
        t3_ref[i, :] = acc * sw * jls_ref[i]


def poba_t3(cam, cam_table, x, uv, sw, r_w, jls, z_table, *, alpha,
            win=None):
    """t3 [3, O] = Jl_s^T (r_w + Jp_s inc); slot-sum for the poBA
    landmark system right-hand side."""
    if x.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.poba_t3(
            cam, cam_table, x, uv, sw, r_w, jls, z_table, alpha=alpha,
            win=win,
        )
    o = cam.shape[0]
    n = cam_table.shape[-1]
    if win is None:
        n_pad = _n_pad(n)
        if n_pad != n:
            cam_table = jnp.pad(cam_table, ((0, 0), (0, n_pad - n)))
            z_table = jnp.pad(z_table, ((0, 0), (0, n_pad - n)))
    else:
        n_pad = n
    nb = _cam_block(n_pad, win)
    t = _choose_tile(o, nb, win)
    return _pose_call(
        functools.partial(_poba_t3_kernel, alpha=float(alpha)),
        out_shape=jax.ShapeDtypeStruct((3, o), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(3, t, win),
            _obs_spec(2, t, win),
            _obs_spec(1, t, win),
            _obs_spec(4, t, win),
            _obs_spec(3, t, win),
            _cam_spec(12, nb, win),
            _cam_spec(12, nb, win),
        ],
        out_specs=_obs_spec(3, t, win),
        args=(cam.reshape(1, o), x, uv, sw, r_w, jls, z_table, cam_table),
        o=o, t=t, win=win,
    )


# --------------------------------------------------------------- K8
# Structured Schur-Jacobi diagonal correction: because each landmark
# observes a camera at most once, the (i,i) Schur block couples an
# observation only with itself (stage1._schur_diag), and
#   W_s Hll^-1 W_s^T per obs = (h^T h) (x) (xh xh^T) . (ps ps^T)
# so the SCHUR_JACOBI preconditioner costs one streaming pass.


def _schur_diag_kernel(cam_ref, x_ref, h_ref, out_ref, *, km_ref=None):
    @pl.when(_first_visit(km_ref))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = cam_ref.shape[-1]
    xh = [x_ref[0], x_ref[1], x_ref[2], None]
    hth = [[None] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(a + 1):
            acc = h_ref[a, :] * h_ref[b, :]
            acc += h_ref[3 + a, :] * h_ref[3 + b, :]
            acc += h_ref[6 + a, :] * h_ref[6 + b, :]
            hth[a][b] = acc
            hth[b][a] = acc
    rows = []
    for a in range(3):
        for i in range(4):
            xi = None if i == 3 else xh[i]
            for b in range(3):
                for j in range(4):
                    r = hth[a][b]
                    if xi is not None:
                        r = r * xi
                    if j != 3:
                        r = r * xh[j]
                    rows.append(r)
    oh = _onehot(cam_ref[:], out_ref.shape[-1])
    out_ref[:] += _scatter_rows(
        jnp.stack(rows, axis=0).reshape(144, t), oh
    )


def schur_diag_structured(cam, x, h, n_cams, win=None):
    """corr_raw [144, N] = seg_cam( (h^T h) (x) xh xh^T ); the caller
    applies the ps (x) ps outer and subtracts from the damped Hpp.
    Under `win`, N is the expanded axis."""
    if x.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.schur_diag_structured(
            cam, x, h, n_cams, win=win
        )
    o = cam.shape[0]
    n_pad = win[1] * win[2] if win is not None else _n_pad(n_cams)
    nb = _cam_block(n_pad, win)
    t = _win_tile(min(_tile(o, nb), 2048), win)
    out = _pose_call(
        _schur_diag_kernel,
        out_shape=jax.ShapeDtypeStruct((144, n_pad), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(3, t, win),
            _obs_spec(9, t, win),
        ],
        out_specs=_cam_spec(144, nb, win),
        args=(cam.reshape(1, o), x, h),
        o=o, t=t, win=win,
    )
    return out if win is not None else out[:, :n_cams]


# --------------------------------------------------------------- K9
# Model-cost decrease from the STORED scaled Jacobians (poBA apply,
# back_substitute_poBA): j_inc = Jp_s inc + Jl_s inc_lm_scaled with
# Jp_s inc = sw . structure(q~), q = (ps . inc) gathered.


def _ldiff_stored_kernel(
    cam_ref, x_ref, uv_ref, sw_ref, rw_ref, jls_ref, ilm_ref,
    ct_old_ref, zt_ref, out_ref, *, alpha, km_ref=None,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    sp = np.float32(np.sqrt(1.0 - alpha))
    sa = np.float32(np.sqrt(alpha))
    oh = _onehot(cam_ref[:], zt_ref.shape[-1])
    q = _gather_table(zt_ref, oh)
    Po = _gather_table(ct_old_ref, oh)
    u, v = uv_ref[0], uv_ref[1]
    sw = sw_ref[0]
    xh = [x_ref[0], x_ref[1], x_ref[2]]

    qt = []
    for a in range(3):
        acc = q[4 * a + 3, :]
        for j in range(3):
            acc += xh[j] * q[4 * a + j, :]
        qt.append(acc)
    jp_inc = [
        sw * sp * (qt[0] - u * qt[2]),
        sw * sp * (qt[1] - v * qt[2]),
        sw * sa * qt[0],
        sw * sa * qt[1],
    ]
    Ao = _a_tilde(Po, u, v, sp, sa)
    ld = jnp.zeros_like(u)
    for k in range(4):
        jl_inc = (Ao[k][0] * jls_ref[0] * ilm_ref[0]
                  + Ao[k][1] * jls_ref[1] * ilm_ref[1]
                  + Ao[k][2] * jls_ref[2] * ilm_ref[2]) * sw
        j_inc = jp_inc[k] + jl_inc
        ld += j_inc * (0.5 * j_inc + rw_ref[k, :])
    t = ld.shape[-1]
    out_ref[0, :] += jnp.sum(ld.reshape(t // 128, 128), axis=0)


def apply_ldiff_stored(
    cam, x, uv, sw, r_w, jls, inc_lm_obs, cam_table_old, z_table,
    *, alpha, win=None
):
    """-l_diff partial sums [128] for the poBA apply; z_table [12, N]
    = pose_scale . inc (scaled increment through the z-table trick)."""
    if x.dtype != jnp.float32:
        from povar_tpu.ops import xla_pose

        return xla_pose.apply_ldiff_stored(
            cam, x, uv, sw, r_w, jls, inc_lm_obs, cam_table_old,
            z_table, alpha=alpha, win=win,
        )
    o = cam.shape[0]
    n = cam_table_old.shape[-1]
    if win is None:
        n_pad = _n_pad(n)
        if n_pad != n:
            pad = ((0, 0), (0, n_pad - n))
            cam_table_old = jnp.pad(cam_table_old, pad)
            z_table = jnp.pad(z_table, pad)
    else:
        n_pad = n
    nb = _cam_block(n_pad, win)
    t = _choose_tile(o, nb, win)
    out = _pose_call(
        functools.partial(_ldiff_stored_kernel, alpha=float(alpha)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(3, t, win),
            _obs_spec(2, t, win),
            _obs_spec(1, t, win),
            _obs_spec(4, t, win),
            _obs_spec(3, t, win),
            _obs_spec(3, t, win),
            _cam_spec(12, nb, win),
            _cam_spec(12, nb, win),
        ],
        out_specs=_fixed_spec(1, 128, win),
        args=(
            cam.reshape(1, o), x, uv, sw, r_w, jls, inc_lm_obs,
            cam_table_old, z_table,
        ),
        o=o, t=t, win=win,
    )
    return out[0]


# -------------------------------------------------------------- K10
# Double-float (two-f32) pOSE cost evaluation. TPU has no native f64:
# XLA's emulated-f64 residual sweep measured 72 ms/call at venice-89
# (the reduction alone 54 ms). Error-free transforms (Dekker two_prod /
# Knuth two_sum) give ~47 significant bits end to end — residuals,
# squares, and the global accumulation — at VPU f32 speed. The robust
# nonlinearity (Huber/Cauchy) is applied to the double-float value's
# leading component; with NONE (the default) the whole error is carried
# in double-float. Matches compute_error_pOSE (helper.cpp:116-154).


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _split(a):
    c = a * np.float32(4097.0)
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _df_add(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    hi, lo = _two_sum(s, e)
    return (hi, lo)


def _df_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    e = e + x[0] * y[1] + x[1] * y[0]
    hi, lo = _two_sum(p, e)
    return (hi, lo)


def _df_scale(x, c):
    # c an exact f32 constant
    p, e = _two_prod(x[0], np.float32(c))
    e = e + x[1] * np.float32(c)
    hi, lo = _two_sum(p, e)
    return (hi, lo)


def _df_const(c64: float):
    """Split an f64 host constant into an (hi, lo) f32 pair — sqrt(1-a)
    etc. rounded to a single f32 would inject a systematic 2^-25
    relative error into every residual."""
    hi = np.float32(c64)
    return hi, np.float32(c64 - np.float64(hi))


def _df_cmul(x, c):
    """x (df) times a _df_const pair."""
    p, e = _two_prod(x[0], c[0])
    e = e + (x[0] * c[1] + x[1] * c[0])
    hi, lo = _two_sum(p, e)
    return (hi, lo)


def _df_neg(x):
    return (-x[0], -x[1])


def _error_kernel(
    cam_ref, xh_ref, xl_ref, uvh_ref, uvl_ref, m_ref,
    cth_ref, ctl_ref, out_ref, *, alpha, robust, huber, km_ref=None,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = cam_ref.shape[-1]
    sp = _df_const(np.sqrt(np.float64(1.0) - np.float64(alpha)))
    sa = _df_const(np.sqrt(np.float64(alpha)))
    oh = _onehot(cam_ref[:], cth_ref.shape[-1])
    Ph = _gather_table(cth_ref, oh)  # exact one-hot selection
    Pl = _gather_table(ctl_ref, oh)
    u = (uvh_ref[0], uvl_ref[0])
    v = (uvh_ref[1], uvl_ref[1])
    mask = m_ref[0] > 0
    one = jnp.ones_like(uvh_ref[0])
    zero = jnp.zeros_like(one)
    xh = [
        (xh_ref[0], xl_ref[0]),
        (xh_ref[1], xl_ref[1]),
        (xh_ref[2], xl_ref[2]),
        (one, zero),
    ]

    # r_k = sum_c A[k][c] xh[c] - corr_k, all in double-float
    r = []
    for k in range(4):
        acc = None
        for c in range(4):
            p0 = (Ph[c], Pl[c])
            p1 = (Ph[4 + c], Pl[4 + c])
            p2 = (Ph[8 + c], Pl[8 + c])
            if k == 0:
                a = _df_cmul(_df_add(p0, _df_neg(_df_mul(u, p2))), sp)
            elif k == 1:
                a = _df_cmul(_df_add(p1, _df_neg(_df_mul(v, p2))), sp)
            elif k == 2:
                a = _df_cmul(p0, sa)
            else:
                a = _df_cmul(p1, sa)
            term = _df_mul(a, xh[c])
            acc = term if acc is None else _df_add(acc, term)
        r.append(acc)
    r[2] = _df_add(r[2], _df_neg(_df_cmul(u, sa)))
    r[3] = _df_add(r[3], _df_neg(_df_cmul(v, sa)))

    finite = mask | True  # all-true; masked rows zero -> stay finite
    res_sq = None
    for k in range(4):
        rk = (
            jnp.where(mask, r[k][0], 0.0),
            jnp.where(mask, r[k][1], 0.0),
        )
        finite = finite & jnp.isfinite(rk[0])
        sq = _df_mul(rk, rk)
        res_sq = sq if res_sq is None else _df_add(res_sq, sq)

    if robust == _HUBER:
        h2 = np.float32(huber * huber)
        w = jnp.where(
            res_sq[0] < h2,
            jnp.ones_like(res_sq[0]),
            np.float32(huber)
            / jnp.sqrt(jnp.maximum(res_sq[0], 1e-30)),
        )
        err = _df_scale(
            ( (2.0 - w) * w * res_sq[0], (2.0 - w) * w * res_sq[1] ),
            0.5,
        )
    elif robust == _CAUCHY:
        err = (jnp.log1p(res_sq[0]), jnp.zeros_like(res_sq[0]))
    else:
        err = _df_scale(res_sq, 0.5)
    rn = jnp.sqrt(jnp.maximum(res_sq[0], 0.0))

    # reduce the tile to 128 lanes in double-float, then fold into the
    # running accumulator rows
    def lane_fold(val_df):
        acc = (jnp.zeros((128,), jnp.float32), jnp.zeros((128,), jnp.float32))
        hi2 = val_df[0].reshape(t // 128, 128)
        lo2 = val_df[1].reshape(t // 128, 128)
        for i in range(t // 128):
            acc = _df_add(acc, (hi2[i], lo2[i]))
        return acc

    err_acc = lane_fold(err)
    rn_acc = lane_fold((rn, jnp.zeros_like(rn)))
    bad = jnp.sum(
        (~finite).astype(jnp.float32).reshape(t // 128, 128), axis=0
    )

    cur = _df_add((out_ref[0, :], out_ref[1, :]), err_acc)
    out_ref[0, :] = cur[0]
    out_ref[1, :] = cur[1]
    cur = _df_add((out_ref[2, :], out_ref[3, :]), rn_acc)
    out_ref[2, :] = cur[0]
    out_ref[3, :] = cur[1]
    out_ref[4, :] += bad


def pose_error_df32(
    cam, ct_hi, ct_lo, x_hi, x_lo, uv_hi, uv_lo, mask,
    *, alpha, robust, huber, win=None,
):
    """[5, 128] partials: (err_hi, err_lo, rn_hi, rn_lo, nonfinite).
    Sum each row pair in f64 for the totals."""
    o = cam.shape[0]
    n = ct_hi.shape[-1]
    if win is None:
        n_pad = _n_pad(n)
        if n_pad != n:
            pad = ((0, 0), (0, n_pad - n))
            ct_hi = jnp.pad(ct_hi, pad)
            ct_lo = jnp.pad(ct_lo, pad)
    else:
        n_pad = n
    nb = _cam_block(n_pad, win)
    # deep double-float temporary chains bound the tile
    t = _win_tile(min(_tile(o, nb), 2048), win)
    return _pose_call(
        functools.partial(
            _error_kernel, alpha=float(alpha), robust=int(robust),
            huber=float(huber),
        ),
        out_shape=jax.ShapeDtypeStruct((5, 128), jnp.float32),
        in_specs=[
            _obs_spec(1, t, win),
            _obs_spec(3, t, win),
            _obs_spec(3, t, win),
            _obs_spec(2, t, win),
            _obs_spec(2, t, win),
            _obs_spec(1, t, win),
            _cam_spec(12, nb, win),
            _cam_spec(12, nb, win),
        ],
        out_specs=_fixed_spec(5, 128, win),
        args=(
            cam.reshape(1, o), x_hi, x_lo, uv_hi, uv_lo, mask,
            ct_hi, ct_lo,
        ),
        o=o, t=t, win=win,
    )
