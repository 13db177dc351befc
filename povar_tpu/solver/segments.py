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

from typing import NamedTuple, Optional, Tuple

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


class DupCorrect(NamedTuple):
    """Static plan for the duplicate-row correction that keeps L space
    (slot-ROW order, see stage1.CamWindows) usable when span-overflow
    landmarks own SEVERAL slot rows: after a per-row reduce, every row
    of a multi-row landmark is overwritten with its landmark TOTAL, so
    row-space expansion/solves stay per-landmark-consistent. All ops
    are O(D) in the duplicate-row count — the full canonical combine
    round trip (two O(R) random gathers that dominated the adversarial
    power term) is avoided.

    rows [D]: slot-row positions belonging to multi-row landmarks;
    combine: D-position reduce grouped per landmark -> [M_d] totals;
    is_dup [R] bool, group_dense [R]: select mask + per-row position in
    the totals (0 for unique rows) — the write-back is a
    select(mask, take(totals, group_dense), rows) rather than a
    scatter: TPU scatters fuse pathologically (a [3, R] scatter
    measured 245 ms inside the power-term loop vs 11 ms standalone),
    while the select formulation is a plain gather + elementwise."""

    rows: jnp.ndarray
    combine: PaddedReduce
    is_dup: jnp.ndarray
    group_dense: jnp.ndarray


def build_dup_correct(row_lm_ext: np.ndarray, num_landmarks: int):
    """DupCorrect from the windowed plan's row->landmark map (pads map
    to num_landmarks). Returns None when rows are unique."""
    row_lm_ext = np.asarray(row_lm_ext)
    real = row_lm_ext < num_landmarks
    ids = row_lm_ext[real]
    uniq, counts = np.unique(ids, return_counts=True)
    dup_lms = uniq[counts > 1]
    if len(dup_lms) == 0:
        return None
    lm_is_dup = np.zeros(num_landmarks + 1, dtype=bool)
    lm_is_dup[dup_lms] = True
    rows = np.nonzero(lm_is_dup[row_lm_ext])[0]
    gid_of_lm = np.zeros(num_landmarks + 1, dtype=np.int64)
    gid_of_lm[dup_lms] = np.arange(len(dup_lms))
    gids = gid_of_lm[row_lm_ext[rows]]
    group_dense = np.zeros(len(row_lm_ext), dtype=np.int32)
    group_dense[rows] = gids
    return DupCorrect(
        rows=jnp.asarray(rows, jnp.int32),
        combine=_build_padded_reduce(gids, len(dup_lms)),
        is_dup=jnp.asarray(lm_is_dup[row_lm_ext]),
        group_dense=jnp.asarray(group_dense),
    )


def dup_correct_rows(x: jnp.ndarray, dc: DupCorrect) -> jnp.ndarray:
    """Overwrite each duplicate row of x [..., R] with its landmark
    total (gather/reduce over the duplicate subset + select)."""
    sub = jnp.take(x, dc.rows, axis=-1)
    tot = padded_segment_sum(sub, dc.combine)
    fix = jnp.take(tot, dc.group_dense, axis=-1)
    return jnp.where(dc.is_dup, fix, x)


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


def slot_part_sums(x: jnp.ndarray, shapes) -> jnp.ndarray:
    """Per-slot-row sums for slot-ordered x [..., O_pad] ->
    [..., n_slot_rows]. Buckets are slot-element-major, so the sum
    keeps the big row axis on the vector lanes."""
    parts = []
    ofs = 0
    for g, w in shapes:
        blk = x[..., ofs : ofs + g * w]
        parts.append(blk.reshape(x.shape[:-1] + (w, g)).sum(axis=-2))
        ofs += g * w
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def slot_segment_sum(
    x: jnp.ndarray, shapes, inv_pos: jnp.ndarray
) -> jnp.ndarray:
    """Per-landmark sum for slot-ordered x [..., O_pad] -> [..., M]
    (canonical landmark order; requires rows unique per landmark —
    duplicated overflow rows go through the combine reduce instead)."""
    return jnp.take(slot_part_sums(x, shapes), inv_pos, axis=-1)


def slot_row_expand(rows: jnp.ndarray, shapes) -> jnp.ndarray:
    """Per-slot-row values [..., n_slot_rows] -> per-observation
    [..., O_pad]: the broadcast half of slot_expand without the
    canonical-order take. With unique rows per landmark,
    slot_row_expand(slot_part_sums(x)) re-expands a per-landmark
    reduction with ZERO index gathers — the reduce-then-broadcast
    round trip the power-series E0 runs every term (on device the two
    canonical-order takes cost ~40% of a term at venice-89)."""
    parts = []
    ofs = 0
    for g, w in shapes:
        blk = rows[..., ofs : ofs + g]
        parts.append(
            jnp.broadcast_to(
                blk[..., None, :], blk.shape[:-1] + (w, g)
            ).reshape(rows.shape[:-1] + (g * w,))
        )
        ofs += g
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def slot_expand(
    s: jnp.ndarray, shapes, lm_order: jnp.ndarray
) -> jnp.ndarray:
    """Inverse of slot_segment_sum's indexing: per-landmark values
    s [..., M] -> per-observation [..., O_pad] (slot order)."""
    # [..., M] -> slot-row order, then broadcast over slot widths
    return slot_row_expand(jnp.take(s, lm_order, axis=-1), shapes)


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


def _lm_spans(obs_cam, obs_lm, num_landmarks):
    """Per-landmark (lo, hi) camera index range; unobserved -> (0, 0)."""
    lo = np.full(num_landmarks, np.iinfo(np.int64).max, dtype=np.int64)
    hi = np.full(num_landmarks, -1, dtype=np.int64)
    np.minimum.at(lo, obs_lm, obs_cam)
    np.maximum.at(hi, obs_lm, obs_cam)
    seen = hi >= 0
    lo[~seen] = 0
    hi[~seen] = 0
    return lo, hi


def camera_span_stats(
    obs_cam: np.ndarray, obs_lm: np.ndarray, num_landmarks: int
):
    """Per-landmark camera-index span statistics (span = hi - lo + 1).
    Returns (max_span, num_over_largest_window) — the inputs to both
    the window-width choice and the fallback diagnostics."""
    lo, hi = _lm_spans(
        np.asarray(obs_cam), np.asarray(obs_lm), num_landmarks
    )
    spans = hi - lo + 1
    return int(spans.max()), int(np.sum(spans > WINDOW_W))


def rcm_camera_order(
    obs_cam: np.ndarray,
    obs_lm: np.ndarray,
    num_cameras: int,
    lm_skip: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Bandwidth-minimizing camera ordering by reverse Cuthill-McKee
    over the camera co-observation graph, the TPU-planning analogue of
    the reference's camera-camera adjacency (bal_problem.cpp:268-303).

    Returns pos [N]: pos[c] = rank of camera c in the new order. The
    graph uses chain+star edges per landmark (first camera to every
    other, plus consecutive pairs) — O(sum obs) edges that bound each
    landmark's span by ~2x the graph bandwidth, vs O(sum obs^2) for
    the full clique. `lm_skip` [M] bool excludes landmarks from the
    graph (incompressible loop closures, which would otherwise drag
    every local span wider)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    obs_cam = np.asarray(obs_cam, dtype=np.int64)
    obs_lm = np.asarray(obs_lm)
    if lm_skip is not None:
        keep = ~lm_skip[obs_lm]
        obs_cam = obs_cam[keep]
        obs_lm = obs_lm[keep]
    order = np.argsort(obs_lm, kind="stable")
    cam_s = obs_cam[order]
    lm_s = obs_lm[order]
    same = lm_s[1:] == lm_s[:-1]
    # chain edges: consecutive cameras of the same landmark
    rows = cam_s[:-1][same]
    cols = cam_s[1:][same]
    # star edges: landmark's first camera to each later one
    first_pos = np.searchsorted(lm_s, lm_s)  # first index of each lm
    rows2 = cam_s[first_pos]
    rows = np.concatenate([rows, rows2])
    cols = np.concatenate([cols, cam_s])
    data = np.ones(len(rows), dtype=np.int8)
    g = coo_matrix(
        (data, (rows, cols)), shape=(num_cameras, num_cameras)
    ).tocsr()
    perm = reverse_cuthill_mckee(g + g.T, symmetric_mode=True)
    pos = np.empty(num_cameras, dtype=np.int64)
    pos[perm] = np.arange(num_cameras, dtype=np.int64)
    return pos


def plan_camera_order(
    obs_cam: np.ndarray, obs_lm: np.ndarray, num_cameras: int,
    num_landmarks: int,
) -> Optional[np.ndarray]:
    """Choose the camera ordering the window planner works in: the
    best of {identity, RCM, RCM without heavy outlier landmarks} under
    the window_cost_model (modeled one-hot lanes(w)*w at each
    candidate's best width). Returns pos [N] or None for identity.

    Heavy landmarks (obs count >> median) act like loop closures:
    including their star edges drags every local span wider, so a
    candidate ordering excludes them and lets them ride the overflow
    partition instead."""
    obs_cam = np.asarray(obs_cam)
    obs_lm = np.asarray(obs_lm)

    def score(cam):
        # the same lanes(w)*w model the width choice minimizes
        w, cost = window_cost_model(cam, obs_lm, num_landmarks)
        return (cost, w)

    cands = [(score(obs_cam), None)]
    pos1 = rcm_camera_order(obs_cam, obs_lm, num_cameras)
    cands.append((score(pos1[obs_cam]), pos1))
    counts = np.bincount(obs_lm, minlength=num_landmarks)
    med = max(float(np.median(counts[counts > 0])), 1.0)
    heavy = counts > max(4.0 * med, 16.0)
    if heavy.any() and not heavy.all():
        pos2 = rcm_camera_order(
            obs_cam, obs_lm, num_cameras, lm_skip=heavy
        )
        cands.append((score(pos2[obs_cam]), pos2))
    return min(cands, key=lambda c: c[0])[1]


def _bucket_lanes(counts: np.ndarray) -> int:
    """Total slot lanes for per-row observation counts under the
    build_slot_plan_windowed bucket rule (exact up to SLOT_EXACT_MAX,
    next power of two above)."""
    counts = counts[counts > 0]
    small = counts <= SLOT_EXACT_MAX
    lanes = int(counts[small].sum())
    big = counts[~small]
    if len(big):
        lanes += int(
            (1 << np.ceil(np.log2(big)).astype(np.int64)).sum()
        )
    return lanes


def window_cost_model(
    obs_cam: np.ndarray, obs_lm: np.ndarray, num_landmarks: int
) -> tuple:
    """(best width, modeled one-hot contraction cost) over
    WINDOW_CHOICES: cost(w) = lanes(w) * w. Every slot lane (real or
    bucket pad) pays an O(w) one-hot gather/scatter per kernel pass,
    so the cost of a width is the EXACT lane count its plan would
    produce — including the extra grid-cell sub-rows that landmarks
    with span > w split into (build_window_plan) — times the width. A
    width whose overflow rows cost less than the wider window's
    universal 2-4x one-hot tax wins: one medium-span landmark
    population no longer forces the widest window on everyone (the
    round-2 overflow-budget rule did exactly that on mixed-span
    problems, a 0.22x throughput cliff)."""
    obs_cam = np.asarray(obs_cam, dtype=np.int64)
    obs_lm = np.asarray(obs_lm, dtype=np.int64)
    lo, hi = _lm_spans(obs_cam, obs_lm, num_landmarks)
    span = hi - lo  # inclusive span minus one; row is normal if < w
    lm_counts = np.bincount(obs_lm, minlength=num_landmarks)
    best_w, best_cost = None, None
    for w in WINDOW_CHOICES:
        normal = span < w
        lanes = _bucket_lanes(lm_counts[normal])
        ovf = ~normal[obs_lm]
        if ovf.any():
            # one sub-row per occupied (landmark, width-w grid cell)
            key = obs_lm[ovf] * (int(obs_cam.max()) // w + 2) + (
                obs_cam[ovf] // w
            )
            _, cell_counts = np.unique(key, return_counts=True)
            lanes += _bucket_lanes(cell_counts)
        cost = lanes * w
        if best_cost is None or cost < best_cost:
            best_w, best_cost = w, cost
    return best_w, best_cost


def choose_window_width(
    obs_cam: np.ndarray, obs_lm: np.ndarray, num_landmarks: int
) -> int:
    """Window width minimizing the window_cost_model."""
    return window_cost_model(obs_cam, obs_lm, num_landmarks)[0]


def build_window_plan(
    obs_cam: np.ndarray,
    obs_lm: np.ndarray,
    num_landmarks: int,
    width: int = WINDOW_W,
):
    """Window packing of landmark slot ROWS by camera span.

    Landmarks whose camera span fits `width` pack greedily (sorted by
    their lowest camera) into windows with arbitrary starts, one row
    per landmark — the round-2 scheme. Landmarks whose span exceeds
    `width` (loop closures etc.) no longer make the plan infeasible:
    their observations are partitioned by camera into a fixed GRID of
    width-`width` cells, producing one sub-landmark row per occupied
    (landmark, cell); the per-landmark sums are then re-combined across
    rows by the caller (slot plan `combine`), mirroring how duplicated
    cameras across windows are combined on the camera side. This
    replaces the reference's arbitrary-incidence landmark blocks
    (sc/landmark_block.hpp:58-133) with no feasibility cliff.

    Returns (obs_row [O] i64 slot-row id per observation,
    row_window [R] i32, row_lm [R] i64 canonical landmark per row,
    win_start [n_win] i64)."""
    obs_cam = np.asarray(obs_cam, dtype=np.int64)
    obs_lm = np.asarray(obs_lm, dtype=np.int64)
    lo, hi = _lm_spans(obs_cam, obs_lm, num_landmarks)
    normal = (hi - lo) < width

    # greedy packing of normal landmarks (one row per landmark)
    order = np.argsort(lo, kind="stable")
    order = order[normal[order]]
    row_of_lm = np.full(num_landmarks, -1, dtype=np.int64)
    row_window = []
    row_lm = []
    starts = []
    cur_start = None
    for m in order:
        if cur_start is None or hi[m] >= cur_start + width:
            cur_start = int(lo[m])
            starts.append(cur_start)
        row_of_lm[m] = len(row_lm)
        row_window.append(len(starts) - 1)
        row_lm.append(m)

    obs_row = row_of_lm[obs_lm]
    if not normal.all():
        # overflow rows: grid cells of stride `width`
        ovf = ~normal[obs_lm]
        cell = obs_cam[ovf] // width
        key = obs_lm[ovf] * (int(obs_cam.max()) // width + 2) + cell
        uniq, inv = np.unique(key, return_inverse=True)
        base = len(row_lm)
        obs_row[np.nonzero(ovf)[0]] = base + inv
        # window per occupied cell (dedup grid starts)
        first = np.zeros(len(uniq), dtype=np.int64)
        first[inv[::-1]] = np.nonzero(ovf)[0][::-1]  # first obs per row
        cell_of_row = obs_cam[first] // width
        grid_cells, grid_inv = np.unique(cell_of_row, return_inverse=True)
        gbase = len(starts)
        starts.extend((grid_cells * width).tolist())
        row_window.extend((gbase + grid_inv).tolist())
        row_lm.extend(obs_lm[first].tolist())

    return (
        obs_row,
        np.asarray(row_window, dtype=np.int32),
        np.asarray(row_lm, dtype=np.int64),
        np.asarray(starts, dtype=np.int64),
    )


class WindowedSlotPlan(NamedTuple):
    """Static host-side output of build_slot_plan_windowed.

    perm [O_pad]: original obs position per lane (pads repeat one);
    pad_weight [O_pad] 0/1; shapes: (rows, width) per part;
    lm_order [n_slot_rows]: canonical landmark id per slot row (pads
    point at landmark 0 but carry zero weight); lm_inv [M]: slot-row
    position of each landmark's PRIMARY row (valid only when rows are
    unique per landmark); block_window [n_blocks]: window of each
    aligned `pad_to` lane block; row_lm_ext [n_slot_rows]: landmark id
    with pads mapped to M (feeds the duplicate-row combine reduce);
    has_duplicates: whether any landmark owns several rows (overflow
    sub-landmarks), requiring the combine path in _seg_lm."""

    perm: np.ndarray
    pad_weight: np.ndarray
    shapes: tuple
    lm_order: np.ndarray
    lm_inv: np.ndarray
    block_window: np.ndarray
    row_lm_ext: np.ndarray
    has_duplicates: bool


def build_slot_plan_windowed(
    obs_row: np.ndarray,
    row_window: np.ndarray,
    row_lm: np.ndarray,
    num_landmarks: int,
    n_windows: int,
    pad_to: int,
) -> WindowedSlotPlan:
    """Window-major slot plan over landmark ROWS (build_window_plan):
    like build_slot_plan, but parts are laid out per (window,
    width-bucket) and each window's lane span is padded to a multiple
    of `pad_to`, so every aligned `pad_to` lane block lies entirely in
    one window. A landmark may own several rows (span-overflow
    sub-landmarks) — their per-row sums are re-combined by the caller
    through `row_lm_ext`."""
    obs_row = np.asarray(obs_row)
    n_rows = len(row_lm)
    order = np.argsort(obs_row, kind="stable")
    sorted_ids = obs_row[order]
    starts = np.searchsorted(sorted_ids, np.arange(n_rows), "left")
    ends = np.searchsorted(sorted_ids, np.arange(n_rows), "right")
    counts = ends - starts

    # bucketed lane width per row: exact up to SLOT_EXACT_MAX, next
    # power of two above (mirrored by _bucket_lanes' cost model)
    widths = np.where(
        counts <= SLOT_EXACT_MAX,
        np.maximum(counts, 1),
        1 << np.ceil(np.log2(np.maximum(counts, 1))).astype(np.int64),
    ).astype(np.int64)
    perm_parts = []
    weight_parts = []
    shapes = []
    lm_order_parts = []
    real_parts = []  # mirrors lm_order_parts: True for real rows
    block_window = []
    n_obs = len(obs_row)

    def flush_pad(win, win_lanes):
        if win_lanes % pad_to:
            tail = pad_to - win_lanes % pad_to
            perm_parts.append(np.zeros(tail, np.int64))
            weight_parts.append(np.zeros(tail))
            shapes.append((1, int(tail)))
            lm_order_parts.append(np.zeros(1, np.int64))
            real_parts.append(np.zeros(1, dtype=bool))
            win_lanes += tail
        block_window.extend([win] * (win_lanes // pad_to))

    # one vectorized batch per (window, width-bucket) group: rows are
    # lexsorted so groups are contiguous and windows ascend
    sort_idx = np.lexsort((np.arange(n_rows), widths, row_window))
    key_w = widths[sort_idx]
    key_win = row_window[sort_idx].astype(np.int64)
    change = (
        np.nonzero((np.diff(key_win) != 0) | (np.diff(key_w) != 0))[0]
        + 1
    )
    bounds = np.concatenate([[0], change, [n_rows]])
    cur_win = None
    win_lanes = 0
    for a, b in zip(bounds[:-1], bounds[1:]):
        if a == b:
            continue
        rows = sort_idx[a:b]
        win, w, g = int(key_win[a]), int(key_w[a]), len(rows)
        if cur_win is not None and win != cur_win:
            flush_pad(cur_win, win_lanes)
            win_lanes = 0
        cur_win = win
        cg = counts[rows]
        # lane k of a row: its k-th observation; lanes past the count
        # repeat a real observation with zero weight
        k = np.arange(w)
        idx = starts[rows][:, None] + np.minimum(
            k[None, :], np.maximum(cg - 1, 0)[:, None]
        )
        blk_idx = order[np.minimum(idx, max(n_obs - 1, 0))]
        blk_w = (k[None, :] < cg[:, None]).astype(np.float64)
        # slot-element-major: lane = k * G + g (see module comment)
        perm_parts.append(blk_idx.T.reshape(-1))
        weight_parts.append(blk_w.T.reshape(-1))
        shapes.append((g, w))
        lm_order_parts.append(row_lm[rows])
        real_parts.append(np.ones(g, dtype=bool))
        win_lanes += g * w
    if cur_win is not None:
        flush_pad(cur_win, win_lanes)
    perm = np.concatenate(perm_parts)
    pad_weight = np.concatenate(weight_parts)
    lm_order = np.concatenate(lm_order_parts).astype(np.int32)
    is_real = np.concatenate(real_parts)
    pos = np.arange(len(lm_order), dtype=np.int32)
    # pad slot rows point at landmark 0 with zero weight; they must not
    # claim lm_inv[0], so only real rows assign. With duplicate rows
    # the FIRST row in slot order wins (combine path ignores lm_inv).
    inv_pos = np.zeros(num_landmarks, dtype=np.int32)
    real_rows = pos[is_real][::-1]
    inv_pos[lm_order[real_rows]] = real_rows
    row_lm_ext = np.where(
        is_real, lm_order.astype(np.int64), num_landmarks
    )
    has_dup = len(lm_order[is_real]) != len(
        np.unique(lm_order[is_real])
    )
    return WindowedSlotPlan(
        perm=perm,
        pad_weight=pad_weight,
        shapes=tuple(shapes),
        lm_order=lm_order,
        lm_inv=inv_pos,
        block_window=np.asarray(block_window, dtype=np.int32),
        row_lm_ext=row_lm_ext,
        has_duplicates=bool(has_dup),
    )
