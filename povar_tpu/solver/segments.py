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


# ---------------------------------------------------------------------
# Slot layout: the observation axis itself is reordered once (at solver
# construction) so that each bucket of landmarks with equal (padded)
# observation count w occupies a contiguous block ordered SLOT-ELEMENT-
# MAJOR: lane index = k * G + g for slot element k of landmark g. The
# per-landmark segment sum is then a sum of w contiguous [.., G] slices
# (the reshape [.., w*G] -> [.., w, G] keeps the big landmark axis on
# the vector lanes — a landmark-major (g, w) reshape would pad the
# w-wide minor dim to 128 lanes, a 25x memory blowup measured at 75% of
# the power-series term cost), and the inverse expansion is a broadcast
# — no index gathers at all, which on TPU run far below streaming
# bandwidth. Rare large landmarks (count > SLOT_EXACT_MAX) are padded
# up to powers of two with zero-weight slots.
# ---------------------------------------------------------------------

SLOT_EXACT_MAX = 64


def build_slot_plan(obs_lm: np.ndarray, num_landmarks: int, pad_to: int = 1):
    """Returns (perm, pad_weight, shapes, lm_order, inv_pos):
    perm [O_pad] original-obs position per slot (pads repeat a position),
    pad_weight [O_pad] 0/1, shapes = tuple of (num_landmarks_in_bucket,
    slot_width), lm_order [M (+1)] canonical lm id per slot-row,
    inv_pos [M] position of canonical lm id in lm_order.

    pad_to > 1 appends a zero-weight tail block so the total padded
    length is a multiple (Pallas kernels tile the obs axis; multi-chip
    sharding divides it). The tail forms an extra fake slot row whose
    sum is dropped by inv_pos and whose expansion broadcasts landmark 0
    (masked everywhere by the zero weight)."""
    obs_lm = np.asarray(obs_lm)
    order = np.argsort(obs_lm, kind="stable")
    sorted_ids = obs_lm[order]
    starts = np.searchsorted(sorted_ids, np.arange(num_landmarks), "left")
    ends = np.searchsorted(sorted_ids, np.arange(num_landmarks), "right")
    counts = ends - starts

    def width(c):
        if c <= SLOT_EXACT_MAX:
            return int(c) if c > 0 else 1
        return 1 << int(np.ceil(np.log2(c)))

    widths = np.array([width(c) for c in counts], dtype=np.int64)
    perm_parts = []
    weight_parts = []
    shapes = []
    lm_order_parts = []
    for w in np.unique(widths):
        lms = np.nonzero(widths == w)[0]
        g = len(lms)
        blk_idx = np.zeros((g, w), dtype=np.int64)
        blk_w = np.zeros((g, w), dtype=np.float64)
        for row, m in enumerate(lms):
            c = counts[m]
            pos = order[starts[m] : ends[m]]
            blk_idx[row, :c] = pos
            blk_idx[row, c:] = pos[0] if c > 0 else 0
            blk_w[row, :c] = 1.0
        # slot-element-major: lane = k * G + g (see module comment)
        perm_parts.append(blk_idx.T.reshape(-1))
        weight_parts.append(blk_w.T.reshape(-1))
        shapes.append((g, int(w)))
        lm_order_parts.append(lms)
    perm = np.concatenate(perm_parts)
    pad_weight = np.concatenate(weight_parts)
    lm_order = np.concatenate(lm_order_parts).astype(np.int32)
    inv_pos = np.empty(num_landmarks, dtype=np.int32)
    inv_pos[lm_order] = np.arange(num_landmarks, dtype=np.int32)
    if pad_to > 1 and len(perm) % pad_to:
        tail = pad_to - len(perm) % pad_to
        perm = np.concatenate([perm, np.zeros(tail, perm.dtype)])
        pad_weight = np.concatenate([pad_weight, np.zeros(tail)])
        shapes.append((1, int(tail)))
        lm_order = np.concatenate([lm_order, np.zeros(1, np.int32)])
    return perm, pad_weight, tuple(shapes), lm_order, inv_pos


def slot_segment_sum(
    x: jnp.ndarray, shapes, inv_pos: jnp.ndarray
) -> jnp.ndarray:
    """Per-landmark sum for slot-ordered x [..., O_pad] -> [..., M]
    (canonical landmark order). Buckets are slot-element-major, so the
    sum keeps the big landmark axis on the vector lanes."""
    parts = []
    ofs = 0
    for g, w in shapes:
        blk = x[..., ofs : ofs + g * w]
        parts.append(blk.reshape(x.shape[:-1] + (w, g)).sum(axis=-2))
        ofs += g * w
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return jnp.take(out, inv_pos, axis=-1)


def slot_expand(
    s: jnp.ndarray, shapes, lm_order: jnp.ndarray
) -> jnp.ndarray:
    """Inverse of slot_segment_sum's indexing: per-landmark values
    s [..., M] -> per-observation [..., O_pad] (slot order)."""
    s_slot = jnp.take(s, lm_order, axis=-1)  # [..., M] in slot-row order
    parts = []
    ofs = 0
    for g, w in shapes:
        blk = s_slot[..., ofs : ofs + g]
        parts.append(
            jnp.broadcast_to(
                blk[..., None, :], blk.shape[:-1] + (w, g)
            ).reshape(s.shape[:-1] + (g * w,))
        )
        ofs += g
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------
# Camera windows: the large-N extension of the slot layout. The in-VMEM
# one-hot that backs every camera gather/scatter in the structured
# Pallas kernels costs O(N) per observation, which caps it at ~1k
# cameras. BAL problems, however, are temporally coherent: a landmark
# is observed by a narrow band of cameras. Packing landmarks greedily
# into camera WINDOWS of fixed width W (arbitrary, unaligned starts)
# and ordering the slot layout window-major makes every observation
# tile touch exactly one window, so the kernels gather/scatter against
# a [rows, W] window slice selected per tile by a prefetched scalar —
# one-hot cost O(W) per observation, independent of N. Cameras shared
# by several windows are duplicated on an expanded axis of size
# n_win * W; expanding tables / combining accumulators across it are
# O(n_win * W) XLA ops (~N, trivial). This replaces the reference's
# global mutex scatter (sc/landmark_block.hpp:383-410) at any camera
# count.
# ---------------------------------------------------------------------

WINDOW_W = 512  # largest supported window (VMEM bound on the one-hot)
WINDOW_CHOICES = (128, 256, 512)


def camera_span_stats(
    obs_cam: np.ndarray, obs_lm: np.ndarray, num_landmarks: int
):
    """Per-landmark camera-index span statistics (span = hi - lo + 1).
    Returns (max_span, num_over_largest_window) — the inputs to both
    the window-width choice and the fallback diagnostics."""
    obs_cam = np.asarray(obs_cam)
    obs_lm = np.asarray(obs_lm)
    lo = np.full(num_landmarks, np.iinfo(np.int64).max, dtype=np.int64)
    hi = np.full(num_landmarks, -1, dtype=np.int64)
    np.minimum.at(lo, obs_lm, obs_cam)
    np.maximum.at(hi, obs_lm, obs_cam)
    seen = hi >= 0
    if not seen.any():
        return 1, 0
    spans = hi[seen] - lo[seen] + 1
    return int(spans.max()), int(np.sum(spans > WINDOW_W))


def choose_window_width(
    obs_cam: np.ndarray, obs_lm: np.ndarray, num_landmarks: int
):
    """Smallest supported window width covering every landmark's camera
    span (the one-hot gather/scatter cost per observation is O(W), so
    tighter camera locality directly buys kernel speed), or None when
    even the largest window cannot."""
    obs_cam = np.asarray(obs_cam)
    obs_lm = np.asarray(obs_lm)
    lo = np.full(num_landmarks, np.iinfo(np.int64).max, dtype=np.int64)
    hi = np.full(num_landmarks, -1, dtype=np.int64)
    np.minimum.at(lo, obs_lm, obs_cam)
    np.maximum.at(hi, obs_lm, obs_cam)
    seen = hi >= 0
    max_span = int((hi[seen] - lo[seen]).max()) + 1 if seen.any() else 1
    for w in WINDOW_CHOICES:
        if max_span <= w:
            return w
    return None


def build_window_plan(
    obs_cam: np.ndarray,
    obs_lm: np.ndarray,
    num_landmarks: int,
    width: int = WINDOW_W,
):
    """Greedy window packing of landmarks by camera span.

    Returns (lm_window [M] i32, win_start [n_win] i32) or None when any
    landmark's camera span exceeds `width` (caller falls back to the
    non-windowed paths)."""
    obs_cam = np.asarray(obs_cam)
    obs_lm = np.asarray(obs_lm)
    lo = np.full(num_landmarks, np.iinfo(np.int64).max, dtype=np.int64)
    hi = np.full(num_landmarks, -1, dtype=np.int64)
    np.minimum.at(lo, obs_lm, obs_cam)
    np.maximum.at(hi, obs_lm, obs_cam)
    seen = hi >= 0
    lo[~seen] = 0
    hi[~seen] = 0
    if np.any(hi - lo >= width):
        return None
    order = np.argsort(lo, kind="stable")
    lm_window = np.zeros(num_landmarks, dtype=np.int32)
    starts = []
    cur_start = None
    for m in order:
        if cur_start is None or hi[m] >= cur_start + width:
            cur_start = int(lo[m])
            starts.append(cur_start)
        lm_window[m] = len(starts) - 1
    return lm_window, np.asarray(starts, dtype=np.int64)


def build_slot_plan_windowed(
    obs_lm: np.ndarray,
    num_landmarks: int,
    lm_window: np.ndarray,
    n_windows: int,
    pad_to: int,
):
    """Window-major slot plan: like build_slot_plan, but parts are laid
    out per (window, width-bucket) and each window's lane span is padded
    to a multiple of `pad_to`, so every aligned `pad_to` lane block lies
    entirely in one window. Returns
    (perm, pad_weight, shapes, lm_order, inv_pos, block_window) where
    block_window [n_blocks] i32 gives the window of each aligned block.
    """
    obs_lm = np.asarray(obs_lm)
    order = np.argsort(obs_lm, kind="stable")
    sorted_ids = obs_lm[order]
    starts = np.searchsorted(sorted_ids, np.arange(num_landmarks), "left")
    ends = np.searchsorted(sorted_ids, np.arange(num_landmarks), "right")
    counts = ends - starts

    def width(c):
        if c <= SLOT_EXACT_MAX:
            return int(c) if c > 0 else 1
        return 1 << int(np.ceil(np.log2(c)))

    widths = np.array([width(c) for c in counts], dtype=np.int64)
    perm_parts = []
    weight_parts = []
    shapes = []
    lm_order_parts = []
    block_window = []
    pad_parts = set()
    for win in range(n_windows):
        in_win = lm_window == win
        win_lanes = 0
        for w in np.unique(widths[in_win]):
            lms = np.nonzero(in_win & (widths == w))[0]
            g = len(lms)
            blk_idx = np.zeros((g, w), dtype=np.int64)
            blk_w = np.zeros((g, w), dtype=np.float64)
            for row, m in enumerate(lms):
                c = counts[m]
                pos = order[starts[m] : ends[m]]
                blk_idx[row, :c] = pos
                blk_idx[row, c:] = pos[0] if c > 0 else 0
                blk_w[row, :c] = 1.0
            perm_parts.append(blk_idx.T.reshape(-1))
            weight_parts.append(blk_w.T.reshape(-1))
            shapes.append((g, int(w)))
            lm_order_parts.append(lms)
            win_lanes += g * int(w)
        if win_lanes % pad_to:
            tail = pad_to - win_lanes % pad_to
            perm_parts.append(np.zeros(tail, np.int64))
            weight_parts.append(np.zeros(tail))
            pad_parts.add(len(shapes))
            shapes.append((1, int(tail)))
            lm_order_parts.append(np.zeros(1, np.int64))
            win_lanes += tail
        block_window += [win] * (win_lanes // pad_to)
    perm = np.concatenate(perm_parts)
    pad_weight = np.concatenate(weight_parts)
    lm_order = np.concatenate(lm_order_parts).astype(np.int32)
    inv_pos = np.empty(num_landmarks, dtype=np.int32)
    # per-window pad tails add fake slot rows pointing at landmark 0;
    # they must not claim inv_pos[0], so only real rows assign
    pos = np.arange(len(lm_order), dtype=np.int32)
    is_real = np.ones(len(lm_order), dtype=bool)
    row = 0
    for i, (g, w) in enumerate(shapes):
        if i in pad_parts:
            is_real[row : row + g] = False
        row += g
    inv_pos[lm_order[is_real]] = pos[is_real]
    return perm, pad_weight, tuple(shapes), lm_order, inv_pos, np.asarray(
        block_window, dtype=np.int32
    )
