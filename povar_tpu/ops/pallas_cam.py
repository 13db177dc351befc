"""Fused camera-side gather/scatter kernels (TPU Pallas).

The BAL camera side is a bipartite gather/scatter: per-observation rows
index a small per-camera table `[R, N]`. XLA lowers these either as
index gathers (random HBM access, measured ~45 GB/s effective on v5e)
or as matmuls against a *precomputed* one-hot incidence `[O, N]` f32 —
197 MB at venice-89 scale, re-read from HBM on every use (ten times per
power-series solve). Both are dominated by index plumbing, not math.

These kernels read the 4-byte camera index per observation and build
the one-hot incidence ON-CHIP per tile (`broadcasted_iota == cam`),
turning every camera gather/scatter into an MXU matmul against a
`[Npad, T]` tile that never exists in HBM. This is the TPU-native
replacement for the reference's mutex-guarded scatter-add loops
(sc/landmark_block.hpp:383-410, linearization_power_varproj.hpp:393-444).

Numerics: the incidence matmuls run at Precision.HIGHEST — the default
(single-pass bf16) truncates table values to 8 mantissa bits, which is
far outside the f32 noise the mixed-precision solver is validated for.
With exact 0/1 one-hot entries the results then match the XLA lowering
up to f32 summation order.

All kernels are f32 (TPU Pallas restriction; the solver's mixed-
precision mode keeps inner solves in f32 anyway). The observation axis
must be padded to a multiple of OBS_PAD (make_obs pads the slot layout
with zero-weight rows); the tile actually used adapts to the camera
count so the in-VMEM one-hot stays within budget.

Scaling limit: the one-hot needs Npad * T * 4 bytes of VMEM and the
incidence matmul is O(O * N) FLOPs — fine up to ~1k cameras, unsuitable
beyond; callers gate on `supported()`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pad quantum for the obs axis: the largest tile a kernel may choose
OBS_PAD = 8192
# largest camera count the in-VMEM one-hot supports
MAX_CAMERAS = 1024
# VMEM budget for the per-tile one-hot incidence
_ONEHOT_VMEM = 4 << 20  # allows T=8192 at Npad=128 (tiny-N problems)

_HIGHEST = jax.lax.Precision.HIGHEST

_I0 = np.int32(0)  # index maps must return i32 under x64


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _n_pad(n_cams: int) -> int:
    return _round_up(max(n_cams, 8), 128)


def _tile(o: int, n_cams: int) -> int:
    """Largest tile in {512..OBS_PAD} dividing o with the one-hot within
    the VMEM budget."""
    t = OBS_PAD
    while t > 512 and (o % t or _n_pad(n_cams) * t * 4 > _ONEHOT_VMEM):
        t //= 2
    return t


def supported(n_obs: int, n_cams: int, dtype) -> bool:
    """Whether these kernels apply to a problem of this shape/dtype."""
    return (
        dtype == jnp.float32
        and n_obs % 512 == 0
        and n_cams <= MAX_CAMERAS
    )


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests on tiny shapes)."""
    return jax.default_backend() != "tpu"


def _check_supported(o: int, n_cams: int) -> None:
    """Fail fast with an actionable message instead of reaching Mosaic
    with an oversized in-VMEM one-hot or a misaligned obs axis (callers
    gate on supported(); this catches gating bugs like a missing
    windowed-mode guard)."""
    if not supported(o, n_cams, jnp.float32):
        raise ValueError(
            f"pallas_cam kernel misuse: n_obs={o} (must be a multiple "
            f"of 512), n_cams={n_cams} (must be <= {MAX_CAMERAS}); "
            "large-N problems must go through the camera-window layout "
            "(solver/segments.py), not these global-id kernels"
        )


def _onehot(cam_tile: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """[Npad, T] bf16 incidence for one tile's camera indices [1, T].

    bf16 because {0, 1} is exact in bf16 and the MXU runs bf16 matmuls
    in ONE pass where an f32 HIGHEST matmul costs six: the incidence
    contractions below split the f32 value operand into three exact
    bf16 summands instead (same products, half the passes)."""
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (n_pad, cam_tile.shape[-1]), 0
    )
    return (rows == cam_tile).astype(jnp.bfloat16)


def _split3(v32: jnp.ndarray):
    """Exact 3-way bf16 split: hi + mid + lo == v32 (f32 adds, to the
    last ulp).  Each summand is exact in bf16, so a bf16 matmul against
    a 0/1 incidence matrix produces exact products with f32 MXU
    accumulation — a 2x cheaper equivalent of precision=HIGHEST for
    one-hot gathers/scatters."""
    hi = v32.astype(jnp.bfloat16)
    r1 = v32 - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _oh_gather(v32: jnp.ndarray, oh: jnp.ndarray) -> jnp.ndarray:
    """[R, Npad] f32 table x [Npad, T] one-hot -> [R, T] f32, exact.

    The three bf16 summands are STACKED on the row axis into one
    [3R, Npad] x [Npad, T] matmul: the tables here are skinny
    (R = 12), so one 36-row pass through the 128-row MXU replaces
    three 12-row passes (each of which occupies the full array)."""
    dims = (((1,), (0,)), ((), ()))
    r = v32.shape[0]
    hi, mid, lo = _split3(v32)
    out = jax.lax.dot_general(
        jnp.concatenate([hi, mid, lo], axis=0), oh, dims,
        preferred_element_type=jnp.float32,
    )
    return out[:r] + out[r : 2 * r] + out[2 * r :]


def _oh_scatter(v32: jnp.ndarray, oh: jnp.ndarray) -> jnp.ndarray:
    """[R, T] f32 rows x [Npad, T] one-hot -> [R, Npad] per-camera f32
    sums, with exact per-observation products (3-way bf16 split,
    row-stacked into one matmul — see _oh_gather)."""
    dims = (((1,), (1,)), ((), ()))
    r = v32.shape[0]
    hi, mid, lo = _split3(v32)
    out = jax.lax.dot_general(
        jnp.concatenate([hi, mid, lo], axis=0), oh, dims,
        preferred_element_type=jnp.float32,
    )
    return out[:r] + out[r : 2 * r] + out[2 * r :]


def _obs_spec(rows: int, t: int):
    return pl.BlockSpec((rows, t), lambda i: (_I0, i),
                        memory_space=pltpu.VMEM)


def _fixed_spec(rows: int, cols: int):
    return pl.BlockSpec((rows, cols), lambda i: (_I0, _I0),
                        memory_space=pltpu.VMEM)


# ------------------------------------------------------------ gather


def _gather_kernel(cam_ref, table_ref, out_ref):
    oh = _onehot(cam_ref[:], table_ref.shape[-1])
    out_ref[:] = _oh_gather(table_ref[:], oh)


def cam_gather(table: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """table [R, N] f32, cam [O] i32 -> [R, O] (table[:, cam[o]])."""
    r, n = table.shape
    o = cam.shape[0]
    _check_supported(o, n)
    n_pad = _n_pad(n)
    if n_pad != n:
        table = jnp.pad(table, ((0, 0), (0, n_pad - n)))
    t = _tile(o, n)
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((r, o), jnp.float32),
        grid=(o // t,),
        in_specs=[_obs_spec(1, t), _fixed_spec(r, n_pad)],
        out_specs=_obs_spec(r, t),
        interpret=_interpret(),
    )(cam.reshape(1, o), table)


# ------------------------------------------------------- scatter-add


def _scatter_kernel(cam_ref, v_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    oh = _onehot(cam_ref[:], out_ref.shape[-1])
    out_ref[:] += _oh_scatter(v_ref[:], oh)


def cam_scatter_add(
    v: jnp.ndarray, cam: jnp.ndarray, n_cams: int
) -> jnp.ndarray:
    """v [R, O] f32, cam [O] i32 -> [R, N] per-camera sums."""
    r, o = v.shape
    _check_supported(o, n_cams)
    n_pad = _n_pad(n_cams)
    t = _tile(o, n_cams)
    out = pl.pallas_call(
        _scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((r, n_pad), jnp.float32),
        grid=(o // t,),
        in_specs=[_obs_spec(1, t), _obs_spec(r, t)],
        out_specs=_fixed_spec(r, n_pad),
        interpret=_interpret(),
    )(cam.reshape(1, o), v)
    return out[:, :n_cams]


# ----------------------------------------------- fused power-series E0
# E0 x = scatter_cam(W^T . expand_lm(seg_lm(W . gather_cam(x))))
# (right_mul_e0_pOSE, sc/linearization_power_varproj.hpp:364-407, with
# the factorized operand W = L^T Jl^T Jp [dl, dc, O]).
# Split into two fused kernels around the (cheap, slot-layout) landmark
# reduction: each reads the big W array exactly once per term, and the
# camera gather/scatter never materializes [dc, O] intermediates.


def _e0_u_kernel(cam_ref, x_ref, w_ref, u_ref, *, dl, dc):
    oh = _onehot(cam_ref[:], x_ref.shape[-1])
    xc = _oh_gather(x_ref[:], oh)  # [dc, T]
    w3 = w_ref[:].reshape(dl, dc, w_ref.shape[-1])
    u_ref[:] = jnp.sum(w3 * xc[None, :, :], axis=1)


def e0_u(W: jnp.ndarray, cam: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """u [dl, O] = W_o . x[:, cam(o)] with W [dl*dc, O] (= [dl,dc,O]
    flat, dl the landmark tangent dim, dc the camera dim), x [dc, N]."""
    o = W.shape[-1]
    dc, n = x.shape
    _check_supported(o, n)
    dl = W.shape[0] // dc
    n_pad = _n_pad(n)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)))
    t = _tile(o, n)
    return pl.pallas_call(
        functools.partial(_e0_u_kernel, dl=dl, dc=dc),
        out_shape=jax.ShapeDtypeStruct((dl, o), jnp.float32),
        grid=(o // t,),
        in_specs=[
            _obs_spec(1, t),
            _fixed_spec(dc, n_pad),
            _obs_spec(dl * dc, t),
        ],
        out_specs=_obs_spec(dl, t),
        interpret=_interpret(),
    )(cam.reshape(1, o), x, W)


def _e0_scatter_kernel(cam_ref, sb_ref, w_ref, out_ref, *, dl, dc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w3 = w_ref[:].reshape(dl, dc, w_ref.shape[-1])
    v = jnp.sum(w3 * sb_ref[:][:, None, :], axis=0)  # [dc, T]
    oh = _onehot(cam_ref[:], out_ref.shape[-1])
    out_ref[:] += _oh_scatter(v, oh)


def e0_scatter(
    W: jnp.ndarray, cam: jnp.ndarray, sb: jnp.ndarray, n_cams: int
) -> jnp.ndarray:
    """out [dc, N] = sum_o onehot(cam(o)) (W_o^T sb_o) with sb [dl, O]
    (the per-landmark value already expanded to observations)."""
    o = W.shape[-1]
    _check_supported(o, n_cams)
    dl = sb.shape[0]
    dc = W.shape[0] // dl
    n_pad = _n_pad(n_cams)
    t = _tile(o, n_cams)
    out = pl.pallas_call(
        functools.partial(_e0_scatter_kernel, dl=dl, dc=dc),
        out_shape=jax.ShapeDtypeStruct((dc, n_pad), jnp.float32),
        grid=(o // t,),
        in_specs=[
            _obs_spec(1, t),
            _obs_spec(dl, t),
            _obs_spec(dl * dc, t),
        ],
        out_specs=_fixed_spec(dc, n_pad),
        interpret=_interpret(),
    )(cam.reshape(1, o), sb, W)
    return out[:, :n_cams]


# -------------------------------------------- fused Hpp + b assembly
# One pass over the scaled Jp storage produces both per-camera
# accumulators of prepare_Hb (get_Hll_inv_add_Hpp_b_pOSE,
# sc/landmark_block.hpp:474-529): the block-diagonal Hpp
# (Jp^T Jp per camera, [d*d, N]) and b (Jp^T r~ per camera, [d, N]).


def _hpp_b_kernel(cam_ref, jp_ref, rt_ref, hpp_ref, b_ref, *, k, d):
    @pl.when(pl.program_id(0) == 0)
    def _():
        hpp_ref[:] = jnp.zeros_like(hpp_ref)
        b_ref[:] = jnp.zeros_like(b_ref)

    t = jp_ref.shape[-1]
    jp = jp_ref[:].reshape(k, d, t)
    oh = _onehot(cam_ref[:], hpp_ref.shape[-1])
    # outer [d*d, T] accumulated over the k residual rows (loop keeps
    # the live temp at [d, d, T] instead of [k, d, d, T]; basic-index
    # first, Mosaic only lowers 2D gathers)
    jp0 = jp[0]
    outer = jp0[:, None, :] * jp0[None, :, :]
    for kk in range(1, k):
        jpk = jp[kk]
        outer += jpk[:, None, :] * jpk[None, :, :]
    hpp_ref[:] += _oh_scatter(outer.reshape(d * d, t), oh)
    jr = jnp.sum(jp * rt_ref[:][:, None, :], axis=0)  # [d, T]
    b_ref[:] += _oh_scatter(jr, oh)


def hpp_b(
    Jp: jnp.ndarray, r_tilde: jnp.ndarray, cam: jnp.ndarray, n_cams: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Jp [k*d, O] (= [k,d,O] flat: k residual rows, d pose dims),
    r_tilde [k, O] -> (hpp [d*d, N], b [d, N]): per-camera sums of
    Jp^T Jp and Jp^T r~."""
    o = Jp.shape[-1]
    _check_supported(o, n_cams)
    k = r_tilde.shape[0]
    d = Jp.shape[0] // k
    n_pad = _n_pad(n_cams)
    # the [d, d, T] outer temp also competes for VMEM
    t = min(_tile(o, n_cams), 2048)
    hpp, b = pl.pallas_call(
        functools.partial(_hpp_b_kernel, k=k, d=d),
        out_shape=(
            jax.ShapeDtypeStruct((d * d, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((d, n_pad), jnp.float32),
        ),
        grid=(o // t,),
        in_specs=[
            _obs_spec(1, t),
            _obs_spec(k * d, t),
            _obs_spec(k, t),
        ],
        out_specs=(
            _fixed_spec(d * d, n_pad),
            _fixed_spec(d, n_pad),
        ),
        interpret=_interpret(),
    )(cam.reshape(1, o), Jp, r_tilde)
    return hpp[:, :n_cams], b[:, :n_cams]
