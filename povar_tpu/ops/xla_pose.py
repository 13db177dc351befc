"""XLA (dtype-generic) implementations of the structured kernels.

Pure-jnp mirrors of every structured per-observation kernel in
ops/pallas_pose.py and ops/pallas_pose2.py, used when the solve dtype
is not f32 (Mosaic TPU kernels are f32-only). This is what lets the
pure-f64 configuration (`mixed_precision_solves=False`) run the SAME
structured/windowed solver classes — single-chip and under the SPMD
shard_map fast path — instead of dropping to the GSPMD-sharded dense
lowering (VERDICT r4 #8).

Math and layouts mirror the kernel bodies line for line (row orders,
masking semantics, partial-sum shapes), so the f32 Pallas kernel and
the f64 XLA path are interchangeable term-for-term; the camera-table
gather becomes a take along the expanded window axis and the in-kernel
one-hot scatter becomes a segment_sum over per-observation expanded
column ids (window_of_obs * W + window-local cam id).

Reference derivations: sc/landmark_block.hpp:135-178 (pOSE
linearization), linearization_power_varproj.hpp:364-453 (E0 matvecs),
bal_bundle_adjustment_helper.cpp:315-380 (homogeneous stage 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from povar_tpu.ops.pallas_pose import _a_tilde, _residual, _robust_w


def _cols(cam, win):
    """Per-observation column into the (window-expanded) camera table:
    the XLA analogue of the kernels' km-indexed block select + local
    one-hot. win = (kmap [o/PART_ALIGN] i32, n_win, W); None = cam ids
    are already global table columns."""
    if win is None:
        return cam
    kmap, _n_win, w = win
    rep = cam.shape[0] // kmap.shape[0]
    return jnp.repeat(kmap.astype(jnp.int32), rep) * w + cam


def _scatter(rows, cols, n_cols):
    """rows [R, O] -> per-column sums [R, n_cols] (the kernels' one-hot
    scatter)."""
    return jax.ops.segment_sum(rows.T, cols, num_segments=n_cols).T


def _out_cols(n_cams, win):
    return win[1] * win[2] if win is not None else n_cams


def _partials(ld):
    """[O] -> [128] lane partial sums, matching the kernels' fixed
    accumulator block (obs axes are padded to multiples of 128)."""
    return ld.reshape(-1, 128).sum(axis=0)


# ------------------------------------------------------------- stage 1
# (pallas_pose.py kernel mirrors; row layouts in each docstring there)


def prepare(cam, cam_table, x, uv, mask, *, alpha, robust, huber,
            weighted=True, win=None):
    sp = np.sqrt(1.0 - alpha)
    sa = np.sqrt(alpha)
    P = cam_table[:, _cols(cam, win)]
    u, v = uv[0], uv[1]
    xh = [x[0], x[1], x[2], jnp.ones_like(u)]
    m = mask[0] > 0

    A = _a_tilde(P, u, v, sp, sa)
    r = _residual(A, xh, u, v, sa)
    r = [jnp.where(m, rk, 0.0) for rk in r]
    res_sq = r[0] * r[0] + r[1] * r[1] + r[2] * r[2] + r[3] * r[3]
    w = _robust_w(res_sq, robust, huber) if weighted else (
        jnp.ones_like(res_sq)
    )
    w = jnp.where(m, w, 0.0)
    sw = jnp.sqrt(w)

    r_w = jnp.stack([rk * sw for rk in r])
    ata = jnp.stack([
        w * sum(A[k][i] * A[k][j] for k in range(4))
        for i in range(3) for j in range(3)
    ])
    atr = jnp.stack([
        w * sum(A[k][i] * r[k] for k in range(4)) for i in range(3)
    ])
    kdiag = [1.0, 1.0, sp * sp * (u * u + v * v)]
    rows = jnp.stack([
        w * kdiag[a] * xh[j] * xh[j]
        for a in range(3) for j in range(4)
    ])
    jpsq = _scatter(rows, _cols(cam, win), cam_table.shape[-1])
    return r_w, sw.reshape(1, -1), ata, atr, jpsq


def e0_factor(cam, cam_table, uv, w, jls, lh, *, alpha, win=None):
    sp2 = 1.0 - alpha
    P = cam_table[:, _cols(cam, win)]
    u, v = uv[0], uv[1]
    wv = w[0]
    g = [[None] * 3 for _ in range(3)]
    for i in range(3):
        p0, p1, p2 = P[i], P[4 + i], P[8 + i]
        g[i][0] = p0 - sp2 * u * p2
        g[i][1] = p1 - sp2 * v * p2
        g[i][2] = sp2 * ((u * u + v * v) * p2 - u * p0 - v * p1)
    return jnp.stack([
        wv * sum(jls[i] * lh[i * 3 + c] * g[i][a] for i in range(3))
        for c in range(3) for a in range(3)
    ])


def hpp_b_structured(cam, cam_table, x, uv, sw_a, r_w, jls, hib, n_cams,
                     *, alpha, win=None):
    sp = np.sqrt(1.0 - alpha)
    sa = np.sqrt(alpha)
    sp2 = sp * sp
    cols = _cols(cam, win)
    P = cam_table[:, cols]
    u, v = uv[0], uv[1]
    sw = sw_a[0]
    xh = [x[0], x[1], x[2], jnp.ones_like(u)]

    A = _a_tilde(P, u, v, sp, sa)
    rt = [
        r_w[k] - sw * sum(A[k][i] * jls[i] * hib[i] for i in range(3))
        for k in range(4)
    ]
    rho = [
        sw * (sp * rt[0] + sa * rt[2]),
        sw * (sp * rt[1] + sa * rt[3]),
        sw * (-sp * (u * rt[0] + v * rt[1])),
    ]
    n_out = _out_cols(n_cams, win)
    b = _scatter(
        jnp.stack([rho[a] * xh[j] for a in range(3) for j in range(4)]),
        cols, n_out,
    )
    w = sw * sw
    K = [[jnp.ones_like(u), jnp.zeros_like(u), -sp2 * u],
         [jnp.zeros_like(u), jnp.ones_like(u), -sp2 * v],
         [-sp2 * u, -sp2 * v, sp2 * (u * u + v * v)]]
    rows = jnp.stack([
        w * xh[i] * K[a][bb] * xh[j]
        for a in range(3) for i in range(4)
        for bb in range(3) for j in range(4)
    ])
    hpp = _scatter(rows, cols, n_out)
    return hpp, b


def e0_u_structured(cam, x, h, z_table, win=None):
    zc = z_table[:, _cols(cam, win)]
    xh = [x[0], x[1], x[2]]
    y = [
        zc[4 * a + 3] + sum(xh[j] * zc[4 * a + j] for j in range(3))
        for a in range(3)
    ]
    return jnp.stack([
        sum(h[c * 3 + a] * y[a] for a in range(3)) for c in range(3)
    ])


def e0_scatter_structured(cam, x, h, sb, n_cams, win=None):
    xh = [x[0], x[1], x[2], None]
    tt = [
        sum(h[3 * i + a] * sb[i] for i in range(3)) for a in range(3)
    ]
    rows = jnp.stack([
        tt[a] if j == 3 else tt[a] * xh[j]
        for a in range(3) for j in range(4)
    ])
    return _scatter(rows, _cols(cam, win), _out_cols(n_cams, win))


def apply_ldiff(cam, x, uv, sw_a, r_w, jls, inc_lm_obs, cam_table_old,
                inc_table, *, alpha, win=None):
    sp = np.sqrt(1.0 - alpha)
    sa = np.sqrt(alpha)
    cols = _cols(cam, win)
    q = inc_table[:, cols]
    Po = cam_table_old[:, cols]
    u, v = uv[0], uv[1]
    sw = sw_a[0]
    xh = [x[0], x[1], x[2]]

    qt = [
        q[4 * a + 3] + sum(xh[j] * q[4 * a + j] for j in range(3))
        for a in range(3)
    ]
    live = sw > 0
    jp_inc = [
        sp * (qt[0] - u * qt[2]),
        sp * (qt[1] - v * qt[2]),
        sa * qt[0],
        sa * qt[1],
    ]
    Ao = _a_tilde(Po, u, v, sp, sa)
    ld = jnp.zeros_like(u)
    for k in range(4):
        jl_inc = sw * sum(
            Ao[k][i] * jls[i] * inc_lm_obs[i] for i in range(3)
        )
        j_inc = jnp.where(live, jp_inc[k] + jl_inc, 0.0)
        ld += j_inc * (0.5 * j_inc + r_w[k])
    return _partials(ld)


def poba_t3(cam, cam_table, x, uv, sw_a, r_w, jls, z_table, *, alpha,
            win=None):
    sp = np.sqrt(1.0 - alpha)
    sa = np.sqrt(alpha)
    cols = _cols(cam, win)
    q = z_table[:, cols]
    P = cam_table[:, cols]
    u, v = uv[0], uv[1]
    sw = sw_a[0]
    xh = [x[0], x[1], x[2]]

    qt = [
        q[4 * a + 3] + sum(xh[j] * q[4 * a + j] for j in range(3))
        for a in range(3)
    ]
    jp_inc = [
        sw * sp * (qt[0] - u * qt[2]),
        sw * sp * (qt[1] - v * qt[2]),
        sw * sa * qt[0],
        sw * sa * qt[1],
    ]
    A = _a_tilde(P, u, v, sp, sa)
    return jnp.stack([
        sw * jls[i] * sum(
            A[k][i] * (r_w[k] + jp_inc[k]) for k in range(4)
        )
        for i in range(3)
    ])


def schur_diag_structured(cam, x, h, n_cams, win=None):
    xh = [x[0], x[1], x[2], None]
    hth = [[None] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(a + 1):
            acc = sum(h[3 * i + a] * h[3 * i + b] for i in range(3))
            hth[a][b] = acc
            hth[b][a] = acc
    rows = []
    for a in range(3):
        for i in range(4):
            for b in range(3):
                for j in range(4):
                    r = hth[a][b]
                    if i != 3:
                        r = r * xh[i]
                    if j != 3:
                        r = r * xh[j]
                    rows.append(r)
    return _scatter(
        jnp.stack(rows), _cols(cam, win), _out_cols(n_cams, win)
    )


def apply_ldiff_stored(cam, x, uv, sw_a, r_w, jls, inc_lm_obs,
                       cam_table_old, z_table, *, alpha, win=None):
    sp = np.sqrt(1.0 - alpha)
    sa = np.sqrt(alpha)
    cols = _cols(cam, win)
    q = z_table[:, cols]
    Po = cam_table_old[:, cols]
    u, v = uv[0], uv[1]
    sw = sw_a[0]
    xh = [x[0], x[1], x[2]]

    qt = [
        q[4 * a + 3] + sum(xh[j] * q[4 * a + j] for j in range(3))
        for a in range(3)
    ]
    jp_inc = [
        sw * sp * (qt[0] - u * qt[2]),
        sw * sp * (qt[1] - v * qt[2]),
        sw * sa * qt[0],
        sw * sa * qt[1],
    ]
    Ao = _a_tilde(Po, u, v, sp, sa)
    ld = jnp.zeros_like(u)
    for k in range(4):
        jl_inc = sw * sum(
            Ao[k][i] * jls[i] * inc_lm_obs[i] for i in range(3)
        )
        j_inc = jp_inc[k] + jl_inc
        ld += j_inc * (0.5 * j_inc + r_w[k])
    return _partials(ld)


# ------------------------------------------------------------- stage 2
# (pallas_pose2.py kernel mirrors)

_HUBER = 1


def prepare2(cam, cam_table, x4_a, uv, mask, *, use_valid, robust,
             huber, win=None):
    P = cam_table[:, _cols(cam, win)]
    u, v = uv[0], uv[1]
    x4 = [x4_a[0], x4_a[1], x4_a[2], x4_a[3]]
    m = mask[0] > 0

    p = [
        sum(P[4 * r + c] * x4[c] for c in range(4)) for r in range(3)
    ]
    # Sophus epsilonSqrt (bal_camera.hpp:147)
    valid = jnp.abs(p[2]) >= 1e-5
    tiny = 1e-30
    zinv = 1.0 / jnp.where(
        jnp.abs(p[2]) < tiny, jnp.where(p[2] < 0, -tiny, tiny), p[2]
    )
    mx = p[0] * zinv
    my = p[1] * zinv
    r0 = mx - u
    r1 = my - v
    live = m if not use_valid else (m & valid)
    livef = live.astype(x4_a.dtype)

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

    r_w = jnp.stack([r0 * sw, r1 * sw])
    mm = jnp.stack([mx * livef, my * livef, zinv * livef])
    jlw_rows = []
    jlsq_rows = []
    for c in range(4):
        j0 = sw * zinv * (P[c] - mx * P[8 + c])
        j1 = sw * zinv * (P[4 + c] - my * P[8 + c])
        jlw_rows.append((c, j0, j1))
        jlsq_rows.append(j0 * j0 + j1 * j1)
    jlw = jnp.stack(
        [j0 for _c, j0, _j1 in jlw_rows]
        + [j1 for _c, _j0, j1 in jlw_rows]
    )
    jlsq = jnp.stack(jlsq_rows)

    wz2 = w * zinv * zinv
    kd = [jnp.ones_like(mx), jnp.ones_like(mx), mx * mx + my * my]
    rows = jnp.stack([
        wz2 * kd[a] * x4[c] * x4[c] for a in range(3) for c in range(4)
    ])
    jpsq = _scatter(rows, _cols(cam, win), cam_table.shape[-1])
    return r_w, sw.reshape(1, -1), mm, jlw, jlsq, jpsq


def hppb2(cam, x4_a, mm, sw_a, r_w, jlns, hib, n_cams, win=None):
    cols = _cols(cam, win)
    mx, my, zinv = mm[0], mm[1], mm[2]
    sw = sw_a[0]
    x4 = [x4_a[0], x4_a[1], x4_a[2], x4_a[3]]

    rt = [
        r_w[r] - sum(jlns[r * 3 + i] * hib[i] for i in range(3))
        for r in range(2)
    ]
    swz = sw * zinv
    ctr = [rt[0], rt[1], -(mx * rt[0] + my * rt[1])]
    n_out = _out_cols(n_cams, win)
    b = _scatter(
        jnp.stack([
            swz * ctr[a] * x4[c] for a in range(3) for c in range(4)
        ]),
        cols, n_out,
    )
    wz2 = swz * swz
    K3 = [[jnp.ones_like(mx), jnp.zeros_like(mx), -mx],
          [jnp.zeros_like(mx), jnp.ones_like(mx), -my],
          [-mx, -my, mx * mx + my * my]]
    rows = jnp.stack([
        wz2 * x4[i] * K3[a][bb] * x4[j]
        for a in range(3) for i in range(4)
        for bb in range(3) for j in range(4)
    ])
    hpp = _scatter(rows, cols, n_out)
    return hpp, b


def mat_dot2(cam, x4_a, mm, sw_a, mat6, r_w, zt, *, add_r, win=None):
    zc = zt[:, _cols(cam, win)]
    mx, my, zinv = mm[0], mm[1], mm[2]
    sw = sw_a[0]
    x4 = [x4_a[0], x4_a[1], x4_a[2], x4_a[3]]
    q = [
        sum(zc[4 * a + c] * x4[c] for c in range(4)) for a in range(3)
    ]
    swz = sw * zinv
    jx0 = swz * (q[0] - mx * q[2])
    jx1 = swz * (q[1] - my * q[2])
    if add_r:
        jx0 = jx0 + r_w[0]
        jx1 = jx1 + r_w[1]
    return jnp.stack([
        mat6[i] * jx0 + mat6[3 + i] * jx1 for i in range(3)
    ])


def scatter2(cam, x4_a, mm, sw_a, mat6, sb, n_cams, win=None):
    mx, my, zinv = mm[0], mm[1], mm[2]
    sw = sw_a[0]
    x4 = [x4_a[0], x4_a[1], x4_a[2], x4_a[3]]
    v0 = sum(mat6[i] * sb[i] for i in range(3))
    v1 = sum(mat6[3 + i] * sb[i] for i in range(3))
    swz = sw * zinv
    ctv = [swz * v0, swz * v1, -swz * (mx * v0 + my * v1)]
    rows = jnp.stack([
        ctv[a] * x4[c] for a in range(3) for c in range(4)
    ])
    return _scatter(rows, _cols(cam, win), _out_cols(n_cams, win))


def schur_diag2(cam, x4_a, mm, sw_a, mat6, n_cams, win=None):
    mx, my, zinv = mm[0], mm[1], mm[2]
    sw = sw_a[0]
    x4 = [x4_a[0], x4_a[1], x4_a[2], x4_a[3]]
    g00 = mat6[0] ** 2 + mat6[1] ** 2 + mat6[2] ** 2
    g11 = mat6[3] ** 2 + mat6[4] ** 2 + mat6[5] ** 2
    g01 = mat6[0] * mat6[3] + mat6[1] * mat6[4] + mat6[2] * mat6[5]
    wz2 = (sw * zinv) * (sw * zinv)
    cg = [[g00, g01], [g01, g11],
          [-(mx * g00 + my * g01), -(mx * g01 + my * g11)]]
    cc = [[jnp.ones_like(mx), jnp.zeros_like(mx)],
          [jnp.zeros_like(mx), jnp.ones_like(mx)],
          [-mx, -my]]
    H = [
        [wz2 * (cg[a][0] * cc[b][0] + cg[a][1] * cc[b][1])
         for b in range(3)]
        for a in range(3)
    ]
    rows = jnp.stack([
        H[a][b] * x4[i] * x4[j]
        for a in range(3) for i in range(4)
        for b in range(3) for j in range(4)
    ])
    return _scatter(
        rows, _cols(cam, win), _out_cols(n_cams, win)
    )


def ldiff2(cam, x4_a, mm, sw_a, r_w, jls8, ilm4, zt, win=None):
    zc = zt[:, _cols(cam, win)]
    mx, my, zinv = mm[0], mm[1], mm[2]
    sw = sw_a[0]
    x4 = [x4_a[0], x4_a[1], x4_a[2], x4_a[3]]
    q = [
        sum(zc[4 * a + c] * x4[c] for c in range(4)) for a in range(3)
    ]
    swz = sw * zinv
    jp = [swz * (q[0] - mx * q[2]), swz * (q[1] - my * q[2])]
    ld = jnp.zeros_like(mx)
    for r in range(2):
        jl_inc = sum(jls8[r * 4 + c] * ilm4[c] for c in range(4))
        j_inc = jp[r] + jl_inc
        ld += j_inc * (0.5 * j_inc + r_w[r])
    return _partials(ld)
