"""Segment reductions over the observation axis, TPU-native.

Why this exists — three TPU facts drive the whole solver layout:

1. XLA tiles the **last two** dimensions of every array onto (sublane,
   lane) = (8, 128) vector registers. Arrays like `Jl [O, 4, 3]` pad the
   3-wide minor dimension to 128 lanes: a 40-50x memory blowup that
   OOMs HBM at venice scale. Putting the huge observation axis last
   (`Jl [4, 3, O]`) makes lanes = observations with near-zero padding.

2. `scatter-add` (the default lowering of segment_sum) serializes on
   TPU, so the reference's mutex-guarded scatter
   (sc/landmark_block.hpp:383-410) cannot be translated directly.

3. `cumsum` (the classic sorted-segment trick) takes *minutes* to
   compile in f64 on the current TPU toolchain regardless of length,
   so prefix-sum approaches are out too.

What remains is gather + masked sum, which compiles in seconds and is
bandwidth-optimal: observations are grouped per segment (landmark or
camera) into padded [G, L] index blocks, bucketed by power-of-two
segment size so padding waste is < 2x. A segment sum is then
  take(x, idx) -> [.., G, L]; where(mask) -> sum(axis=-1)
per bucket, concatenated and re-ordered to canonical segment order.
Sums are exact per-segment reductions (no prefix-difference roundoff).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class PaddedReduce(NamedTuple):
    """Static gather/reduce plan for one segmentation of the obs axis.

    idx[b]:  [G_b, L_b] int32 — observation positions of each segment in
             bucket b, padded with arbitrary valid positions
    mask[b]: [G_b, L_b] bool — True for real entries
    inv_order: [S] int32 — maps canonical segment id -> position in the
             bucket-concatenated output
    """

    idx: Tuple[jnp.ndarray, ...]
    mask: Tuple[jnp.ndarray, ...]
    inv_order: jnp.ndarray


class SegmentLayout(NamedTuple):
    """Reduction plans for both sides of the camera-landmark graph."""

    lm: PaddedReduce
    cam: PaddedReduce


def _build_padded_reduce(
    seg_ids: np.ndarray, num_segments: int
) -> PaddedReduce:
    """Group observation positions by segment id into power-of-two
    padded buckets."""
    order = np.argsort(seg_ids, kind="stable")
    sorted_ids = seg_ids[order]
    starts = np.searchsorted(sorted_ids, np.arange(num_segments), "left")
    ends = np.searchsorted(sorted_ids, np.arange(num_segments), "right")
    counts = ends - starts

    # bucket index = ceil(log2(max(count,1)))
    buckets = np.zeros(num_segments, dtype=np.int64)
    nonzero = counts > 0
    buckets[nonzero] = np.ceil(
        np.log2(np.maximum(counts[nonzero], 1))
    ).astype(np.int64)

    idx_list = []
    mask_list = []
    seg_order = []
    for b in sorted(set(buckets.tolist())):
        length = 1 << b
        segs = np.nonzero(buckets == b)[0]
        g = len(segs)
        idx = np.zeros((g, length), dtype=np.int32)
        mask = np.zeros((g, length), dtype=bool)
        for row, s in enumerate(segs):
            c = counts[s]
            idx[row, :c] = order[starts[s] : ends[s]]
            mask[row, :c] = True
        idx_list.append(jnp.asarray(idx))
        mask_list.append(jnp.asarray(mask))
        seg_order.extend(segs.tolist())

    inv_order = np.empty(num_segments, dtype=np.int32)
    inv_order[np.asarray(seg_order, dtype=np.int64)] = np.arange(
        num_segments, dtype=np.int32
    )
    return PaddedReduce(
        idx=tuple(idx_list),
        mask=tuple(mask_list),
        inv_order=jnp.asarray(inv_order),
    )


def build_segment_layout(
    obs_cam: np.ndarray,
    obs_lm: np.ndarray,
    num_cameras: int,
    num_landmarks: int,
) -> SegmentLayout:
    obs_cam = np.asarray(obs_cam)
    obs_lm = np.asarray(obs_lm)
    return SegmentLayout(
        lm=_build_padded_reduce(obs_lm, num_landmarks),
        cam=_build_padded_reduce(obs_cam, num_cameras),
    )


def onehot_segment_sum(
    v: jnp.ndarray, onehot: jnp.ndarray
) -> jnp.ndarray:
    """Per-segment sum as a matmul against a one-hot incidence matrix
    [O, S]: v [..., O] -> [..., S]. Streams both operands and runs on
    the MXU — for small S (camera side of BAL graphs) this is several
    times faster than index gathers, whose random HBM access patterns
    run far below peak bandwidth on TPU. f32 only (f64 dot_general is
    emulated with multi-pass intermediates)."""
    import jax

    return jax.lax.dot_general(
        v,
        onehot,
        (((v.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=v.dtype,
    )


def onehot_gather(x: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """Per-observation expansion as a matmul: x [..., S] with onehot
    [O, S] -> [..., O] (x[..., seg_id(o)] per observation)."""
    import jax

    return jax.lax.dot_general(
        x,
        onehot,
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    )


def build_onehot(
    seg_ids: np.ndarray, num_segments: int, dtype=np.float32
) -> jnp.ndarray:
    """Dense one-hot incidence [O, S]; gate on O*S*4 bytes at call site."""
    import numpy as np

    o = len(seg_ids)
    m = np.zeros((o, num_segments), dtype=dtype)
    m[np.arange(o), np.asarray(seg_ids)] = 1.0
    return jnp.asarray(m)


def padded_segment_sum(x: jnp.ndarray, red: PaddedReduce) -> jnp.ndarray:
    """Sum x [..., O] per segment -> [..., S]."""
    parts = []
    for idx_b, mask_b in zip(red.idx, red.mask):
        g = jnp.take(x, idx_b.reshape(-1), axis=-1)
        g = g.reshape(x.shape[:-1] + idx_b.shape)
        g = jnp.where(mask_b, g, 0.0)
        parts.append(jnp.sum(g, axis=-1))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return jnp.take(out, red.inv_order, axis=-1)
