"""Streaming Pallas kernels for the SPMD window layout's slot
reduce/expand (parallel/spmd.py).

The XLA formulation of the per-(class, part) slot reduction reshapes
the device-local lane array [K, o_dev] to [K, n_win, w, cap] and sums
over w (spmd_part_sums). On TPU that reshape is layout-hostile twice
over: the leading K rows leave the sublane axis (a full relayout
copy), and the new second-minor dim w pads to 8 sublanes (w=5 ->
1.6x inflation). Traced at venice-1778 those reshape round trips cost
~23 ms of the 117 ms D=1 SPMD iteration — essentially the whole
measured layout overhead vs the plain windowed path.

These kernels do the identical reduction/broadcast as strided LANE
slices inside a window block, with no reshapes at all: the grid walks
windows, every block keeps the lane axis minor, and the per-slot sum
is w-1 elementwise adds of 128-aligned slices (caps are ROW_ALIGN=128
multiples, window lanes block-aligned — see spmd.build_spmd_plan).
HBM traffic is the streaming floor: read x once, write the rows once.

Used by spmd.spmd_part_sums / spmd_expand_rows / the fused E0
reduce-reexpand; each falls back to the XLA formulation per class for
f64 operands (TPU Pallas is f32) or oversized window blocks. The
equivalence of both formulations is pinned by tests/test_pallas_spmd.py.

Semantics mirror the reference's per-landmark reduce inside
sc/landmark_block.hpp:383-410 (there a TBB loop over landmark blocks;
here one streaming pass over the uniformized window layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from povar_tpu.ops.pallas_cam import _I0, _interpret

# total VMEM budget for one kernel's blocks: every operand block is
# double-buffered by the Pallas pipeline, so the footprint of a call
# is 2 * 4 bytes * k * (in_lanes + out_lanes). Half the ~16 MB frame
# leaves room for accumulators/semaphores/scratch.
_VMEM_BUDGET = 8 * 1024 * 1024


def _class_eligible(k: int, cl, dtype) -> bool:
    """Pallas path per class: f32 lanes, tile-aligned geometry, and a
    total double-buffered block footprint that fits the VMEM budget.
    The worst of the three kernels is class_reduce_reexpand (in + out
    both win_lanes wide), so that footprint gates all of them —
    keeping eligibility a single per-(k, class) predicate."""
    if dtype != jnp.float32:
        return False
    if cl.win_lanes % 128 or cl.n_windows <= 0:
        return False
    if any(cap % 128 for cap, _w in cl.parts):
        return False
    return 2 * 4 * k * (2 * cl.win_lanes) <= _VMEM_BUDGET


def _fixed(k: int, lanes: int):
    return pl.BlockSpec(
        (k, lanes), lambda i: (_I0, i), memory_space=pltpu.VMEM
    )


def _part_sums_kernel(x_ref, *out_refs, parts):
    p = 0
    for i, (cap, w) in enumerate(parts):
        acc = x_ref[:, p : p + cap]
        for s in range(1, w):
            acc = acc + x_ref[:, p + s * cap : p + (s + 1) * cap]
        out_refs[i][...] = acc
        p += cap * w


def class_part_sums(x, cl):
    """x [K, n_win * win_lanes] (one class's lanes) -> tuple of
    per-part slot-row sums [K, n_win * cap]."""
    k = x.shape[0]
    n = cl.n_windows
    return pl.pallas_call(
        functools.partial(_part_sums_kernel, parts=cl.parts),
        out_shape=tuple(
            jax.ShapeDtypeStruct((k, n * cap), x.dtype)
            for cap, _w in cl.parts
        ),
        grid=(n,),
        in_specs=[_fixed(k, cl.win_lanes)],
        out_specs=tuple(_fixed(k, cap) for cap, _w in cl.parts),
        interpret=_interpret(),
    )(x)


def _expand_kernel(*refs, parts, tail):
    out = refs[-1]
    p = 0
    for i, (cap, w) in enumerate(parts):
        v = refs[i][...]
        for s in range(w):
            out[:, p + s * cap : p + (s + 1) * cap] = v
        p += cap * w
    if tail:
        out[:, p : p + tail] = jnp.zeros_like(out[:, p : p + tail])


def class_expand_rows(rows_parts, cl):
    """Per-part slot-row values ([K, n_win * cap] per part) -> one
    class lane array [K, n_win * win_lanes] (tail lanes zero)."""
    k = rows_parts[0].shape[0]
    n = cl.n_windows
    used = sum(cap * w for cap, w in cl.parts)
    return pl.pallas_call(
        functools.partial(
            _expand_kernel, parts=cl.parts, tail=cl.win_lanes - used
        ),
        out_shape=jax.ShapeDtypeStruct(
            (k, n * cl.win_lanes), rows_parts[0].dtype
        ),
        grid=(n,),
        in_specs=[_fixed(k, cap) for cap, _w in cl.parts],
        out_specs=_fixed(k, cl.win_lanes),
        interpret=_interpret(),
    )(*rows_parts)


def _reduce_reexpand_kernel(x_ref, out_ref, *, parts, tail):
    p = 0
    for cap, w in parts:
        acc = x_ref[:, p : p + cap]
        for s in range(1, w):
            acc = acc + x_ref[:, p + s * cap : p + (s + 1) * cap]
        for s in range(w):
            out_ref[:, p + s * cap : p + (s + 1) * cap] = acc
        p += cap * w
    if tail:
        out_ref[:, p : p + tail] = jnp.zeros_like(
            out_ref[:, p : p + tail]
        )


def class_reduce_reexpand(x, cl):
    """Fused per-landmark reduce-then-broadcast over one class's lanes
    (the E0 power-term inner op): x [K, n_win * win_lanes] -> same
    shape, each slot-row group replaced by its sum, tail lanes zero.
    One read + one write of the class lanes instead of the
    reduce + re-expand pair."""
    k = x.shape[0]
    n = cl.n_windows
    used = sum(cap * w for cap, w in cl.parts)
    return pl.pallas_call(
        functools.partial(
            _reduce_reexpand_kernel,
            parts=cl.parts,
            tail=cl.win_lanes - used,
        ),
        out_shape=jax.ShapeDtypeStruct((k, n * cl.win_lanes), x.dtype),
        grid=(n,),
        in_specs=[_fixed(k, cl.win_lanes)],
        out_specs=_fixed(k, cl.win_lanes),
        interpret=_interpret(),
    )(x)
