"""XLA mirrors of the structured kernels (ops/xla_pose.py) vs the
Pallas originals.

Every public structured function in ops/pallas_pose.py and
ops/pallas_pose2.py dispatches to its XLA mirror when the operand
dtype is not f32 (the pure-f64 configuration). These tests call each
function twice on identical f32-valued data — once in f32 (Pallas,
interpreter mode on CPU) and once in f64 (the mirror) — in both the
plain and windowed layouts, pinning the mirrors' row orders, masking
semantics, and scatter targets to the kernels'."""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import pytest

from povar_tpu.ops import pallas_pose as pp
from povar_tpu.ops import pallas_pose2 as pp2
from povar_tpu.ops.pallas_pose import PART_ALIGN

ALPHA = 0.01


def _mk(shape, rng, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def _cases():
    """(label, cam [O] i32, n_cams_or_expanded_cols, win) layouts."""
    rng = np.random.default_rng(11)
    plain_o, plain_n = 1024, 13
    cam_p = rng.integers(0, plain_n, plain_o).astype(np.int32)
    win_o, n_win, w = 2 * PART_ALIGN, 2, 16
    cam_w = rng.integers(0, w, win_o).astype(np.int32)
    kmap = jnp.asarray(np.array([0, 1], np.int32))
    return [
        ("plain", cam_p, plain_n, None),
        ("windowed", cam_w, n_win * w, (kmap, n_win, w)),
    ]


def _both(fn, float_args, *, static=(), kw=None):
    """Run fn on f32 args (Pallas) and f64 casts (XLA mirror)."""
    kw = kw or {}
    a32 = [jnp.asarray(a) for a in float_args]
    a64 = [
        jnp.asarray(a, jnp.float64)
        if np.asarray(a).dtype == np.float32
        else jnp.asarray(a)
        for a in float_args
    ]
    r32 = fn(*a32, *static, **kw)
    r64 = fn(*a64, *static, **kw)
    if not isinstance(r32, tuple):
        r32, r64 = (r32,), (r64,)
    for x32, x64 in zip(r32, r64):
        assert x64.dtype == jnp.float64, "mirror must keep f64"
        np.testing.assert_allclose(
            np.asarray(x32), np.asarray(x64, dtype=np.float32),
            rtol=2e-3, atol=2e-4,
        )


@pytest.mark.parametrize("label,cam,nc,win", _cases())
def test_stage1_mirrors(label, cam, nc, win):
    rng = np.random.default_rng(3)
    o = len(cam)
    ct = _mk((12, nc), rng)
    x = _mk((3, o), rng)
    uv = _mk((2, o), rng)
    mask = (rng.uniform(size=(1, o)) > 0.1).astype(np.float32)
    kw = dict(win=win)

    _both(
        pp.prepare, (cam, ct, x, uv, mask),
        kw=dict(alpha=ALPHA, robust=1, huber=0.7, **kw),
    )
    w1 = np.abs(_mk((1, o), rng))
    jls = np.abs(_mk((3, o), rng)) + 0.1
    lh = _mk((9, o), rng)
    _both(
        pp.e0_factor, (cam, ct, uv, w1, jls, lh),
        kw=dict(alpha=ALPHA, **kw),
    )
    sw = np.sqrt(w1)
    r_w = _mk((4, o), rng)
    hib = _mk((3, o), rng)
    _both(
        pp.hpp_b_structured, (cam, ct, x, uv, sw, r_w, jls, hib),
        static=(nc,), kw=dict(alpha=ALPHA, **kw),
    )
    h = _mk((9, o), rng)
    zt = _mk((12, nc), rng)
    _both(pp.e0_u_structured, (cam, x, h, zt), kw=kw)
    sb = _mk((3, o), rng)
    _both(
        pp.e0_scatter_structured, (cam, x, h, sb), static=(nc,), kw=kw
    )
    _both(pp.schur_diag_structured, (cam, x, h), static=(nc,), kw=kw)
    ilm = _mk((3, o), rng)
    inc_t = _mk((12, nc), rng)
    _both(
        pp.apply_ldiff, (cam, x, uv, sw, r_w, jls, ilm, ct, inc_t),
        kw=dict(alpha=ALPHA, **kw),
    )
    _both(
        pp.poba_t3, (cam, ct, x, uv, sw, r_w, jls, zt),
        kw=dict(alpha=ALPHA, **kw),
    )
    _both(
        pp.apply_ldiff_stored,
        (cam, x, uv, sw, r_w, jls, ilm, ct, zt),
        kw=dict(alpha=ALPHA, **kw),
    )


@pytest.mark.parametrize("label,cam,nc,win", _cases())
def test_stage2_mirrors(label, cam, nc, win):
    rng = np.random.default_rng(4)
    o = len(cam)
    ct = _mk((12, nc), rng)
    x4 = _mk((4, o), rng)
    uv = _mk((2, o), rng)
    mask = (rng.uniform(size=(1, o)) > 0.1).astype(np.float32)
    kw = dict(win=win)

    _both(
        pp2.prepare2, (cam, ct, x4, uv, mask),
        kw=dict(use_valid=True, robust=1, huber=0.7, **kw),
    )
    mm = _mk((3, o), rng)
    sw = np.abs(_mk((1, o), rng))
    r_w = _mk((2, o), rng)
    jlns = _mk((6, o), rng)
    hib = _mk((3, o), rng)
    _both(
        pp2.hppb2, (cam, x4, mm, sw, r_w, jlns, hib), static=(nc,),
        kw=kw,
    )
    mat6 = _mk((6, o), rng)
    zt = _mk((12, nc), rng)
    _both(
        pp2.mat_dot2, (cam, x4, mm, sw, mat6, r_w, zt),
        kw=dict(add_r=True, **kw),
    )

    def md_nor(c, x, m, s, m6, z, **k):
        return pp2.mat_dot2(c, x, m, s, m6, None, z, add_r=False, **k)

    _both(md_nor, (cam, x4, mm, sw, mat6, zt), kw=kw)
    sb = _mk((3, o), rng)
    _both(
        pp2.scatter2, (cam, x4, mm, sw, mat6, sb), static=(nc,), kw=kw
    )
    _both(
        pp2.schur_diag2, (cam, x4, mm, sw, mat6), static=(nc,), kw=kw
    )
    jls8 = _mk((8, o), rng)
    ilm4 = _mk((4, o), rng)
    _both(
        pp2.ldiff2, (cam, x4, mm, sw, r_w, jls8, ilm4, zt), kw=kw
    )
