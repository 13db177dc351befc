"""Multi-chip windowed execution: shard_map over whole camera windows.

The round-2 sharded path (parallel/mesh.py) ran the slow XLA lowering
under GSPMD — correct, but the windowed Pallas kernels (the reason one
chip sustains ~16 Mobs/s) could not run sharded, so n chips lost to 1.
This module makes the windowed kernels themselves multi-chip:

  * Each device owns WHOLE camera windows. Its landmarks and
    observations are contiguous in the window-major slot order, so
    every landmark-side reduction stays device-local; only the small
    per-camera accumulators ([12,N] / [12,12,N]) all-reduce over ICI —
    exactly the communication pattern of the reference's mutex-guarded
    per-camera scatter (sc/landmark_block.hpp:383-410,
    linearization_power_varproj.hpp:364-453) mapped to a mesh
    (SURVEY.md §2.7/§5).

  * shard_map's single-program rule requires identical shapes on every
    device. The plan therefore UNIFORMIZES the per-device structure:
    every window of a class carries the same width-bucket profile
    (rows padded with zero-weight fakes), every device the same number
    of windows per class (fake windows), the same landmark count
    (fake landmarks, masked out of per-landmark solves), and the same
    row->landmark combine-reduce bucket shapes. The static Python
    structure seen by the traced program is then device-independent,
    while all per-device content (window maps, camera ids, indices)
    flows as sharded array data.

  * Because every class-c window shares one profile, the per-landmark
    slot reduction vectorizes across windows: one reshape+sum per
    (class, width) part covers all windows of the class
    (spmd_part_sums) instead of a Python loop per window.

Layout of the global (host-built) arrays: device-major concatenation —
device d's observations are lanes [d*O_dev, (d+1)*O_dev), its landmarks
ids [d*M_dev, (d+1)*M_dev). shard_map in_specs P('obs') then hand each
device exactly its chunk. The canonical<->padded landmark permutation
is exposed for the LM driver boundary.
"""

from __future__ import annotations

from collections import defaultdict
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from povar_tpu.solver.segments import (
    SLOT_EXACT_MAX,
    build_window_plan,
    choose_window_width,
    plan_camera_order,
)


# per-part row caps are padded to this so the [w, cap] reshape in
# spmd_part_sums / spmd_expand_rows keeps cap on the 128-lane tile
ROW_ALIGN = 128


def _width(c: int) -> int:
    if c <= SLOT_EXACT_MAX:
        return int(c) if c > 0 else 1
    return 1 << int(np.ceil(np.log2(c)))


class ClassLayout(NamedTuple):
    """Static per-device layout of one window class: n_windows windows,
    each with `parts` = ((cap, w), ...) rows and win_lanes total lanes
    (profile lanes + tail pad to the block alignment)."""

    n_windows: int
    parts: Tuple[Tuple[int, int], ...]
    win_lanes: int


class SpmdPlan(NamedTuple):
    """Host-built sharded windowed plan (all numpy; device-major)."""

    n_dev: int
    width: int
    layout: Tuple[ClassLayout, ...]  # static; identical per device
    n_win_dev: int  # total windows per device (sum of class counts)
    o_dev: int  # obs lanes per device
    m_dev: int  # landmark slots per device
    n_rows_dev: int  # slot rows per device
    # per-lane arrays [D * o_dev]
    perm: np.ndarray  # original obs index per lane (pads repeat 0)
    pad_weight: np.ndarray  # 0/1
    cam: np.ndarray  # original camera id per lane
    cam_local: np.ndarray  # window-local camera id
    lm_local: np.ndarray  # device-local landmark id per lane
    # per-block [D * n_blocks_dev]: device-local window index
    kmap: np.ndarray
    # per-window-column arrays [D * n_win_dev * width]
    win_gather: np.ndarray  # original camera id (clipped)
    win_scatter: np.ndarray  # original camera id or N (dropped)
    # per-slot-row arrays [D * n_rows_dev]
    lm_order: np.ndarray  # device-local landmark id (pads -> 0)
    row_lm_ext: np.ndarray  # device-local lm id, pads -> m_dev
    # per-landmark-slot arrays [D * m_dev]
    lm_mask: np.ndarray  # 1 real / 0 fake
    # canonical landmark id -> global padded position [n_lms]
    lm_perm: np.ndarray
    # whether any landmark owns several rows (span overflow)
    has_duplicates: bool
    # diagnostics
    lane_utilization: float  # real obs lanes / total lanes


def _assign_overflow(ovf_lms, ovf_obs_counts, n_dev):
    """Balance overflow landmarks over devices by observation count
    (largest first)."""
    loads = np.zeros(n_dev)
    assign = {}
    order = np.argsort(-ovf_obs_counts)
    for i in order:
        d = int(np.argmin(loads))
        assign[int(ovf_lms[i])] = d
        loads[d] += ovf_obs_counts[i]
    return assign


def build_spmd_plan(
    obs_cam: np.ndarray,
    obs_lm: np.ndarray,
    num_cameras: int,
    num_landmarks: int,
    n_dev: int,
    block_align: int,
) -> SpmdPlan:
    """Build the uniformized sharded windowed plan.

    Steps: choose the planning camera order and window width exactly
    like the single-chip path; build the row-based window plan; assign
    whole normal windows to devices contiguously and overflow
    landmarks by load; then uniformize (pad) every static dimension so
    shard_map sees one program."""
    obs_cam = np.asarray(obs_cam, dtype=np.int64)
    obs_lm = np.asarray(obs_lm, dtype=np.int64)
    o_real = len(obs_cam)

    pos = plan_camera_order(obs_cam, obs_lm, num_cameras, num_landmarks)
    if pos is None:
        cam_plan = obs_cam
        plan_to_orig = None
    else:
        cam_plan = pos[obs_cam]
        plan_to_orig = np.empty(num_cameras, dtype=np.int64)
        plan_to_orig[pos] = np.arange(num_cameras, dtype=np.int64)
    width = choose_window_width(cam_plan, obs_lm, num_landmarks)
    obs_row, row_window, row_lm, win_start = build_window_plan(
        cam_plan, obs_lm, num_landmarks, width=width
    )
    n_rows = len(row_lm)
    row_counts = np.bincount(obs_row, minlength=n_rows)
    row_width = np.array([_width(c) for c in row_counts], dtype=np.int64)

    # overflow landmarks own >1 row (a span > width always crosses >= 2
    # width-aligned grid cells); normal landmarks exactly 1
    lm_nrows = np.bincount(row_lm, minlength=num_landmarks)
    is_ovf_lm = lm_nrows > 1
    row_is_grid = is_ovf_lm[row_lm]

    # ---- clone construction ------------------------------------------
    # Natural windows vary wildly in row count; padding every window to
    # a max-over-windows profile wastes up to tens of percent. Instead
    # every window is SPLIT into fixed-profile CLONES (same camera
    # start; duplicated window columns combine like any shared camera):
    # per width w, at most cap_w rows per clone, with cap_w drawn from
    # the global row mix so a clone holds ~`budget` lanes. Padding is
    # then bounded by one partial chunk per width per window, and
    # devices balance by simply counting clones (all clones have equal
    # padded lane counts).
    WIDTHS = np.unique(row_width)
    norm_rows = ~row_is_grid

    def make_caps(mask, max_clones_per_dev):
        if not mask.any():
            return {}
        R = {
            int(w): int(np.sum(row_width[mask] == w)) for w in WIDTHS
        }
        R = {w: c for w, c in R.items() if c}
        total = sum(c * w for w, c in R.items())
        # smallest block-aligned clone budget that keeps the clone
        # count per device bounded: small clones bound the padding of
        # each window's PARTIAL last clone by one budget's worth
        budget = block_align * max(
            1,
            -(-total // (block_align * n_dev * max_clones_per_dev)),
        )
        # clamp by the global count: a width never needs more rows
        # per clone than it has rows in total (tiny problems)
        caps = {
            w: min(max(1, int(np.ceil(c * budget / total))), c)
            for w, c in R.items()
        }
        # ALIGN each cap to the lane tile (128): spmd_part_sums /
        # spmd_expand_rows reshape every part to [n_win, w, cap] and
        # reduce/broadcast over w. With cap % 128 == 0 that reshape is
        # a tile-preserving bitcast and the reduce a native sublane
        # sum; an unaligned cap forces XLA to relayout the whole lane
        # array per call (measured ~4.5x the copy floor at venice-89,
        # cap=1638). The extra rows are zero-weight fakes.
        caps = {
            w: -(-c // ROW_ALIGN) * ROW_ALIGN for w, c in caps.items()
        }
        # absorb the block-alignment pad into the dominant width so
        # full clones carry real rows in those lanes instead of pad —
        # in ROW_ALIGN steps so the cap stays tile-aligned
        lanes = sum(c * w for w, c in caps.items())
        pad = (-lanes) % block_align
        wd = max(R, key=R.get)
        caps[wd] += (pad // wd) // ROW_ALIGN * ROW_ALIGN
        return caps

    caps0 = make_caps(norm_rows, 256)
    caps1 = make_caps(row_is_grid, 64)

    def split_clones(rows, caps):
        """Rows of one window -> list of per-clone row lists (chunked
        per width by the fixed caps)."""
        by_w = {}
        for rr in rows:
            by_w.setdefault(int(row_width[rr]), []).append(rr)
        n_clones = max(
            (
                -(-len(v) // caps[w])
                for w, v in by_w.items()
            ),
            default=1,
        )
        clones = [[] for _ in range(n_clones)]
        for w, v in by_w.items():
            c = caps[w]
            for j in range(0, len(v), c):
                clones[j // c].extend(v[j : j + c])
        return clones

    # class 0: natural normal windows -> clones, in window order
    clones0 = []  # (start_plan, [rows])
    if norm_rows.any():
        rows_by_win = {}
        for rr in np.nonzero(norm_rows)[0]:
            rows_by_win.setdefault(int(row_window[rr]), []).append(rr)
        for wwin in sorted(rows_by_win):
            for rows in split_clones(rows_by_win[wwin], caps0):
                clones0.append((int(win_start[wwin]), rows))
    # contiguous equal-count device split (clones are equal-sized)
    n0 = len(clones0)
    clone0_dev = (
        np.arange(n0) * n_dev // max(n0, 1) if n0 else np.array([], int)
    )
    lm_dev = np.full(num_landmarks, -1, dtype=np.int64)
    for ci, (_st, rows) in enumerate(clones0):
        for rr in rows:
            lm_dev[row_lm[rr]] = clone0_dev[ci]

    # overflow landmarks: balance by obs count, then clone each
    # device's grid cells
    grid_rows_idx = np.nonzero(row_is_grid)[0]
    clones1_by_dev = {d: [] for d in range(n_dev)}
    ovf_lms = np.nonzero(is_ovf_lm)[0]
    if len(ovf_lms):
        ovf_counts = np.bincount(
            row_lm, weights=row_counts.astype(np.float64),
            minlength=num_landmarks,
        )[ovf_lms].astype(np.int64)
        assign = _assign_overflow(ovf_lms, ovf_counts, n_dev)
        for m, d in assign.items():
            lm_dev[m] = d
        # one pass over grid rows grouped by (device, cell) — not a
        # per-device rescan of all grid rows
        grid_dev = lm_dev[row_lm[grid_rows_idx]]
        grid_cell = win_start[row_window[grid_rows_idx]] // width
        by_dev_cell = defaultdict(list)
        for rr, gd, cell in zip(
            grid_rows_idx, grid_dev, grid_cell
        ):
            by_dev_cell[(int(gd), int(cell))].append(rr)
        for (d, cell) in sorted(by_dev_cell):
            for rows in split_clones(by_dev_cell[(d, cell)], caps1):
                clones1_by_dev[d].append((cell * width, rows))

    n_norm_dev = (
        int(np.bincount(clone0_dev, minlength=n_dev).max()) if n0 else 0
    )
    n_grid_dev = max(
        (len(v) for v in clones1_by_dev.values()), default=0
    )

    def class_layout(n_windows, caps):
        parts = tuple(
            (int(c), int(w)) for w, c in sorted(caps.items())
        )
        lanes = sum(c * w for c, w in parts)
        pad = (-lanes) % block_align
        return ClassLayout(
            n_windows=int(n_windows),
            parts=parts,
            win_lanes=lanes + pad,
        )

    layout = []
    if n_norm_dev:
        layout.append(class_layout(n_norm_dev, caps0))
    if n_grid_dev:
        layout.append(class_layout(n_grid_dev, caps1))
    layout = tuple(layout)
    n_win_dev = sum(cl.n_windows for cl in layout)
    o_dev = sum(cl.n_windows * cl.win_lanes for cl in layout)
    n_rows_dev = sum(
        cl.n_windows * sum(c for c, _w in cl.parts) for cl in layout
    )

    # ---- fill per-device arrays --------------------------------------
    order = np.argsort(obs_row, kind="stable")
    row_obs_start = np.searchsorted(obs_row[order], np.arange(n_rows))
    row_obs_end = np.searchsorted(obs_row[order], np.arange(n_rows) + 1)

    D = n_dev
    perm = np.zeros(D * o_dev, dtype=np.int64)
    pad_w = np.zeros(D * o_dev)
    cam_lane = np.zeros(D * o_dev, dtype=np.int64)
    cam_local = np.zeros(D * o_dev, dtype=np.int32)
    lm_lane = np.zeros(D * o_dev, dtype=np.int32)
    kmap_all = []
    win_gather = np.zeros(D * n_win_dev * width, dtype=np.int64)
    win_scatter = np.full(
        D * n_win_dev * width, num_cameras, dtype=np.int64
    )
    lm_order = np.zeros(D * n_rows_dev, dtype=np.int32)
    row_lm_ext_all = np.zeros(D * n_rows_dev, dtype=np.int64)

    m_dev = 0
    dev_lms: List[np.ndarray] = []
    for d in range(D):
        dl = np.nonzero(lm_dev == d)[0]
        dev_lms.append(dl)
        m_dev = max(m_dev, len(dl))
    m_dev = max(m_dev, 1)
    lm_mask = np.zeros(D * m_dev)
    lm_perm = np.zeros(num_landmarks, dtype=np.int64)

    real_lanes = 0
    for d in range(D):
        dl = dev_lms[d]
        lm_mask[d * m_dev : d * m_dev + len(dl)] = 1.0
        lm_perm[dl] = d * m_dev + np.arange(len(dl))
        local_of = np.zeros(num_landmarks, dtype=np.int64)
        local_of[dl] = np.arange(len(dl))

        # device-local windows: its class-0 clones in order, then its
        # grid clones, then fakes
        my0 = [clones0[i] for i in range(n0) if clone0_dev[i] == d]
        my1 = clones1_by_dev.get(d, [])
        lane_base = d * o_dev
        row_base = d * n_rows_dev
        kmap_dev = []
        lane_ofs = 0
        class_row_ofs = 0  # rows before the current class
        win_idx = 0  # device-local window index

        def fill_window(cl: ClassLayout, wi_c, rows_of_win, start_plan):
            """Fill one window's lanes + slot rows. Slot-row canonical
            order is (class, part, window, row-in-part) so the
            vectorized per-class reduce (spmd_part_sums) matches."""
            nonlocal lane_ofs, real_lanes
            cols = start_plan + np.arange(width)
            in_rng = (cols >= 0) & (cols < num_cameras)
            safe = np.clip(cols, 0, num_cameras - 1)
            if plan_to_orig is not None:
                safe = plan_to_orig[safe]
            gofs = (d * n_win_dev + win_idx) * width
            win_gather[gofs : gofs + width] = safe
            win_scatter[gofs : gofs + width] = np.where(
                in_rng, safe, num_cameras
            )
            p = 0  # lane offset within the window
            part_rows = 0  # rows of earlier parts (whole class)
            rows_np = np.asarray(rows_of_win, dtype=np.int64)
            for cap, w in cl.parts:
                rows_w = (
                    rows_np[row_width[rows_np] == w]
                    if len(rows_np)
                    else rows_np
                )
                n_r = len(rows_w)
                assert n_r <= cap, (n_r, cap, w)
                rbase = (
                    row_base + class_row_ofs
                    + part_rows * cl.n_windows + wi_c * cap
                )
                if n_r:
                    # vectorized over the part's rows (the plan builds
                    # ~1M rows at venice-1778; a per-row Python loop
                    # here was 60% of plan-build time)
                    counts = row_counts[rows_w]  # [R]
                    offs = row_obs_start[rows_w]  # [R]
                    j = np.arange(w)
                    # slot-element-major: lane = part_ofs + j*cap + i
                    lanes = (
                        lane_base + lane_ofs + p
                        + j[None, :] * cap
                        + np.arange(n_r)[:, None]
                    )  # [R, w]
                    live = j[None, :] < counts[:, None]
                    # pad lanes carry zero weight; any in-bounds obs
                    # index works (count 0: an unobserved landmark's
                    # row, which the single-chip plan also keeps)
                    safe_j = np.minimum(
                        j[None, :], np.maximum(counts[:, None] - 1, 0)
                    )
                    po_mat = order[offs[:, None] + safe_j]  # [R, w]
                    po_mat[counts == 0] = 0
                    perm[lanes] = po_mat
                    pad_w[lanes] = live.astype(pad_w.dtype)
                    real_lanes += int(counts.sum())
                    cam_lane[lanes] = np.where(
                        live, obs_cam[po_mat], 0
                    )
                    cam_local[lanes] = np.where(
                        live, cam_plan[po_mat] - start_plan, 0
                    ).astype(np.int32)
                    lm_loc = local_of[row_lm[rows_w]]  # [R]
                    lm_lane[lanes] = np.broadcast_to(
                        lm_loc[:, None], lanes.shape
                    ).astype(np.int32)
                    lm_order[rbase : rbase + n_r] = lm_loc
                    row_lm_ext_all[rbase : rbase + n_r] = lm_loc
                row_lm_ext_all[rbase + n_r : rbase + cap] = m_dev
                p += cap * w
                part_rows += cap
            lane_ofs += cl.win_lanes
            kmap_dev.extend(
                [win_idx] * (cl.win_lanes // block_align)
            )

        # class 0: normal-window clones
        if layout and n_norm_dev:
            cl0 = layout[0]
            for wi_c, (st, rows) in enumerate(my0):
                fill_window(cl0, wi_c, rows, st)
                win_idx += 1
            for wi_c in range(len(my0), cl0.n_windows):
                fill_window(cl0, wi_c, [], 0)  # fake window
                win_idx += 1
            class_row_ofs += cl0.n_windows * sum(
                c for c, _w in cl0.parts
            )
        # class 1: grid clones
        if n_grid_dev:
            cl1 = layout[-1]
            for wi_c, (st, rows) in enumerate(my1):
                fill_window(cl1, wi_c, rows, st)
                win_idx += 1
            for wi_c in range(len(my1), cl1.n_windows):
                fill_window(cl1, wi_c, [], 0)
                win_idx += 1
            class_row_ofs += cl1.n_windows * sum(
                c for c, _w in cl1.parts
            )
        assert lane_ofs == o_dev and class_row_ofs == n_rows_dev
        kmap_all.extend(kmap_dev)

    return SpmdPlan(
        n_dev=D,
        width=int(width),
        layout=layout,
        n_win_dev=n_win_dev,
        o_dev=o_dev,
        m_dev=m_dev,
        n_rows_dev=n_rows_dev,
        perm=perm,
        pad_weight=pad_w,
        cam=cam_lane,
        cam_local=cam_local,
        lm_local=lm_lane,
        kmap=np.asarray(kmap_all, dtype=np.int32),
        win_gather=win_gather,
        win_scatter=win_scatter,
        lm_order=lm_order,
        row_lm_ext=row_lm_ext_all,
        lm_mask=lm_mask,
        lm_perm=lm_perm,
        has_duplicates=bool(is_ovf_lm.any()),
        lane_utilization=real_lanes / max(D * o_dev, 1),
    )


# ---------------------------------------------------------------------
# Per-device reduces over the uniform layout. Because every window of a
# class shares one width profile, the per-row slot reduction vectorizes
# across windows: one reshape+sum per (class, part) covers all windows.
# Canonical slot-row order (shared with the plan builder): for each
# class, for each part, for each window, row-in-part.
# ---------------------------------------------------------------------


def _part_sums_xla(x, cl, lofs):
    """XLA reshape formulation for one class (fallback: f64 operands
    or oversized window blocks). Returns the per-part row sums."""
    n, lanes = cl.n_windows, cl.win_lanes
    blk = x[..., lofs : lofs + n * lanes].reshape(
        x.shape[:-1] + (n, lanes)
    )
    outs = []
    p = 0
    for cap, w in cl.parts:
        seg = blk[..., p : p + cap * w].reshape(
            x.shape[:-1] + (n, w, cap)
        )
        outs.append(
            seg.sum(axis=-2).reshape(x.shape[:-1] + (n * cap,))
        )
        p += cap * w
    return outs


def _expand_rows_xla(s_rows, cl, rofs):
    """XLA broadcast formulation for one class (fallback). Returns the
    class's lane array [..., n_win * win_lanes]."""
    import jax.numpy as jnp

    n = cl.n_windows
    win_parts = []
    used = 0
    for cap, w in cl.parts:
        seg = s_rows[..., rofs : rofs + n * cap].reshape(
            s_rows.shape[:-1] + (n, cap)
        )
        e = jnp.broadcast_to(
            seg[..., :, None, :],
            seg.shape[:-2] + (n, w, cap),
        ).reshape(s_rows.shape[:-1] + (n, w * cap))
        win_parts.append(e)
        rofs += n * cap
        used += w * cap
    win = (
        win_parts[0]
        if len(win_parts) == 1
        else jnp.concatenate(win_parts, axis=-1)
    )
    tail = cl.win_lanes - used
    if tail:
        pad = [(0, 0)] * (win.ndim - 1) + [(0, tail)]
        win = jnp.pad(win, pad)
    return win.reshape(s_rows.shape[:-1] + (n * cl.win_lanes,))


def _flat2(x):
    """[..., L] -> ([K, L], leading shape). Leading-dim merges keep
    the minor axis, so the reshape is layout-free."""
    lead = x.shape[:-1]
    k = 1
    for s in lead:
        k *= int(s)
    return x.reshape((max(k, 1), x.shape[-1])), lead


def spmd_part_sums(x, layout):
    """x [..., o_dev] -> per-slot-row sums [..., n_rows_dev].

    Streaming Pallas per class on TPU (ops/pallas_spmd.py: strided
    lane slices, no layout-hostile [n, w, cap] reshapes); XLA reshape
    fallback per class for f64 / oversized blocks."""
    import jax.numpy as jnp

    from povar_tpu.ops import pallas_spmd

    x2, lead = _flat2(x)
    k = x2.shape[0]
    outs = []
    lofs = 0
    for cl in layout:
        n, lanes = cl.n_windows, cl.win_lanes
        if pallas_spmd._class_eligible(k, cl, x2.dtype):
            xc = (
                x2
                if lofs == 0 and n * lanes == x2.shape[-1]
                else x2[:, lofs : lofs + n * lanes]
            )
            outs.extend(pallas_spmd.class_part_sums(xc, cl))
        else:
            outs.extend(_part_sums_xla(x2, cl, lofs))
        lofs += n * lanes
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return out.reshape(lead + out.shape[-1:])


def spmd_expand_rows(s_rows, layout):
    """Per-slot-row values [..., n_rows_dev] -> per-lane [..., o_dev]
    (window tail pad lanes get zeros). Pallas per class with XLA
    fallback, like spmd_part_sums."""
    import jax.numpy as jnp

    from povar_tpu.ops import pallas_spmd

    s2, lead = _flat2(s_rows)
    k = s2.shape[0]
    outs = []
    rofs = 0
    for cl in layout:
        n = cl.n_windows
        if pallas_spmd._class_eligible(k, cl, s2.dtype):
            parts = []
            for cap, _w in cl.parts:
                parts.append(s2[:, rofs : rofs + n * cap])
                rofs += n * cap
            outs.append(pallas_spmd.class_expand_rows(parts, cl))
        else:
            outs.append(_expand_rows_xla(s2, cl, rofs))
            rofs += n * sum(cap for cap, _w in cl.parts)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return out.reshape(lead + out.shape[-1:])


def spmd_reduce_reexpand(x, layout):
    """Fused per-slot-row reduce-then-broadcast [..., o_dev] ->
    [..., o_dev] (the E0 power-term inner op with unique rows): one
    streaming read + write per class instead of the part_sums +
    expand_rows pair. Tail pad lanes come back zero, matching
    expand_rows(part_sums(x))."""
    import jax.numpy as jnp

    from povar_tpu.ops import pallas_spmd

    x2, lead = _flat2(x)
    k = x2.shape[0]
    outs = []
    lofs = 0
    for cl in layout:
        n, lanes = cl.n_windows, cl.win_lanes
        if pallas_spmd._class_eligible(k, cl, x2.dtype):
            xc = (
                x2
                if lofs == 0 and n * lanes == x2.shape[-1]
                else x2[:, lofs : lofs + n * lanes]
            )
            outs.append(pallas_spmd.class_reduce_reexpand(xc, cl))
        else:
            rows = _part_sums_xla(x2, cl, lofs)
            rows = (
                rows[0]
                if len(rows) == 1
                else jnp.concatenate(rows, axis=-1)
            )
            outs.append(_expand_rows_xla(rows, cl, 0))
        lofs += n * lanes
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return out.reshape(lead + out.shape[-1:])


def build_uniform_combine(row_lm_ext, n_dev, n_rows_dev, m_dev):
    """Device-stacked slot-row -> local-landmark combine reduce with
    IDENTICAL bucket shapes on every device (shard_map's uniformity
    rule). Returns a PaddedReduce whose arrays are device-major
    concatenations on their first axis: idx/mask [D*G_b, L_b] per
    bucket, inv_order [D*(m_dev+1)] — sharding each on axis 0 hands
    every device exactly its [G_b, L_b] / [m_dev+1] slice."""
    from povar_tpu.solver.segments import (
        PaddedReduce,
        _build_padded_reduce,
    )
    import jax.numpy as jnp
    import numpy as _np

    reds = [
        _build_padded_reduce(
            row_lm_ext[d * n_rows_dev : (d + 1) * n_rows_dev],
            m_dev + 1,
        )
        for d in range(n_dev)
    ]
    # bucket set = union of lengths; G = max groups per bucket
    lengths = sorted(
        {int(i.shape[1]) for r in reds for i in r.idx}
    )
    g_max = {
        L: max(
            max(
                (int(i.shape[0]) for i in r.idx if i.shape[1] == L),
                default=0,
            )
            for r in reds
        )
        for L in lengths
    }
    idx_out = []
    mask_out = []
    inv_out = []
    for d, r in enumerate(reds):
        by_len = {int(i.shape[1]): k for k, i in enumerate(r.idx)}
        # positions shift when buckets are padded: recompute the
        # device's inv_order for the uniform bucket structure
        seg_pos = _np.zeros(m_dev + 1, dtype=_np.int64)
        pos0 = 0
        dev_idx = []
        dev_mask = []
        for L in lengths:
            G = g_max[L]
            if L in by_len:
                k = by_len[L]
                i_np = _np.asarray(r.idx[k])
                m_np = _np.asarray(r.mask[k])
                g = i_np.shape[0]
            else:
                i_np = _np.zeros((0, L), _np.int32)
                m_np = _np.zeros((0, L), bool)
                g = 0
            i_pad = _np.zeros((G, L), _np.int32)
            m_pad = _np.zeros((G, L), bool)
            i_pad[:g] = i_np
            m_pad[:g] = m_np
            dev_idx.append(i_pad)
            dev_mask.append(m_pad)
            # which segments live in this bucket, in group order: the
            # original inv_order maps segment -> concatenated position
            if g:
                inv = _np.asarray(r.inv_order)
                # original start position of bucket k
                orig_start = sum(
                    _np.asarray(r.idx[j]).shape[0] for j in range(k)
                )
                in_bucket = (inv >= orig_start) & (
                    inv < orig_start + g
                )
                seg_pos[in_bucket] = pos0 + (
                    inv[in_bucket] - orig_start
                )
            pos0 += G
        idx_out.append(dev_idx)
        mask_out.append(dev_mask)
        inv_out.append(seg_pos)
    idx = tuple(
        jnp.asarray(
            _np.concatenate([idx_out[d][b] for d in range(n_dev)], 0)
        )
        for b in range(len(lengths))
    )
    mask = tuple(
        jnp.asarray(
            _np.concatenate([mask_out[d][b] for d in range(n_dev)], 0)
        )
        for b in range(len(lengths))
    )
    inv_order = jnp.asarray(
        _np.concatenate(inv_out).astype(_np.int32)
    )
    return PaddedReduce(idx=idx, mask=mask, inv_order=inv_order)


# ---------------------------------------------------------------------
# Sharded solvers: Stage1Solver/Stage2Solver subclasses whose jitted
# entry points run inside shard_map over the mesh. The traced method
# bodies are the SAME structured-kernel code paths as single-chip; the
# only differences are (a) _seg_lm/_gather_lm_x ride the uniform
# layout, (b) _psum/_combine_cam_win all-reduce camera accumulators
# and scalars (hooks in the base classes), (c) fake-landmark masking.
# ---------------------------------------------------------------------

AXIS = "obs"

_ERR_KEYS = (
    "num_obs_all",
    "error_all",
    "residual_sum_all",
    "num_obs_valid",
    "error_valid",
    "residual_sum_valid",
    "is_numerically_valid",
)


def _shard_map(fn, mesh, in_specs, out_specs):
    import jax

    try:
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # older keyword
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


class _SpmdCommon:
    """Shared construction + landmark-layout overrides for the sharded
    stage solvers."""

    spmd_axis = AXIS
    # the raw _trial/_linearize graphs carry psums that must run inside
    # shard_map, so the single-jit device LM loop does not apply; the
    # host loop drives the per-trial shard_map executables instead
    supports_device_loop = False

    def _spmd_build_obs(self, plan: SpmdPlan, obs_uv, obs_weight, mesh):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from povar_tpu.solver.stage1 import Obs

        uv = np.asarray(obs_uv)
        if uv.ndim == 2 and uv.shape[-1] == 2:
            uv = uv.T  # [2, O]
        uv_slot = uv[:, plan.perm]
        w = plan.pad_weight.copy()
        if obs_weight is not None:
            w = w * np.asarray(obs_weight)[plan.perm]
        self.n_obs_live = int(np.sum(w > 0))

        combine = build_uniform_combine(
            plan.row_lm_ext, plan.n_dev, plan.n_rows_dev, plan.m_dev
        )
        sh = lambda spec: NamedSharding(mesh, spec)  # noqa: E731
        d = AXIS
        put = jax.device_put
        obs = Obs(
            cam=put(jnp.asarray(plan.cam, jnp.int32), sh(P(d))),
            lm=put(jnp.asarray(plan.lm_local, jnp.int32), sh(P(d))),
            uv=put(jnp.asarray(uv_slot, self.dtype), sh(P(None, d))),
            weight=put(jnp.asarray(w, self.dtype), sh(P(d))),
            cam_red=None,
            cam_onehot=None,
            lm_order=put(jnp.asarray(plan.lm_order), sh(P(d))),
            lm_inv=put(
                jnp.zeros(plan.n_dev * plan.m_dev, jnp.int32),
                sh(P(d)),
            ),
            cam_local=put(jnp.asarray(plan.cam_local), sh(P(d))),
            win_kmap=put(jnp.asarray(plan.kmap), sh(P(d))),
            win_gather=put(
                jnp.asarray(plan.win_gather.astype(np.int32)),
                sh(P(d)),
            ),
            win_scatter=put(
                jnp.asarray(plan.win_scatter.astype(np.int32)),
                sh(P(d)),
            ),
            lm_combine=jax.tree.map(
                lambda a: put(
                    a, sh(P(*((d,) + (None,) * (a.ndim - 1))))
                ),
                combine,
            ),
            lm_mask=put(
                jnp.asarray(plan.lm_mask, jnp.float32), sh(P(d))
            ),
        )
        return obs

    def _obs_specs(self):
        from jax.sharding import PartitionSpec as P
        from povar_tpu.solver.stage1 import Obs
        from povar_tpu.solver.segments import PaddedReduce

        d = AXIS
        comb = self.obs.lm_combine
        return Obs(
            cam=P(d), lm=P(d), uv=P(None, d), weight=P(d),
            cam_red=None, cam_onehot=None,
            lm_order=P(d), lm_inv=P(d), cam_local=P(d),
            win_kmap=P(d), win_gather=P(d), win_scatter=P(d),
            lm_combine=PaddedReduce(
                idx=tuple(P(d, None) for _ in comb.idx),
                mask=tuple(P(d, None) for _ in comb.mask),
                inv_order=P(d),
            ),
            lm_mask=P(d),
        )

    # landmark-axis layout overrides ----------------------------------
    def _seg_lm(self, obs, x):
        from povar_tpu.solver.segments import padded_segment_sum

        rows = spmd_part_sums(x, self.spmd_layout)
        # last combine segment is the fake-row bin
        return padded_segment_sum(rows, obs.lm_combine)[..., :-1]

    def _gather_lm_x(self, obs, s):
        import jax.numpy as jnp

        rows = jnp.take(s, obs.lm_order, axis=-1)
        return spmd_expand_rows(rows, self.spmd_layout)

    def _seg_lm_reexpand(self, obs, u):
        """Reduce-then-re-expand per landmark (E0 inner op) in slot
        ROW space — no canonical-order takes unless overflow rows
        duplicate landmarks (see stage1._seg_lm_reexpand)."""
        if not self.plan.has_duplicates:
            return spmd_reduce_reexpand(u, self.spmd_layout)
        rows = spmd_part_sums(u, self.spmd_layout)
        from povar_tpu.solver.segments import padded_segment_sum
        import jax.numpy as jnp

        s = padded_segment_sum(rows, obs.lm_combine)[..., :-1]
        return spmd_expand_rows(
            jnp.take(s, obs.lm_order, axis=-1), self.spmd_layout
        )

    # L space under SPMD (see stage1.CamWindows): with unique slot
    # rows per landmark, per-landmark tables live in device-local ROW
    # order and the reduce/expand round trips are gather-free; only
    # the landmark state crosses to/from the padded canonical order
    # (one take in at linearize, one combine out at the state update).
    # Overflow duplicates force the canonical combine path throughout.

    def _lm_rowspace(self, obs):
        return not self.plan.has_duplicates

    # L-space state threading under shard_map: unique-row plans keep
    # the landmark state in device-local ROW order (stage1.LmState)
    # across the whole LM stage — the per-entry canonical<->row
    # conversions (three ~1M-element gathers per iteration, the bulk
    # of the measured 1.24x layout overhead) collapse to one take in
    # lm_pack and one combine in lm_unpack per STAGE. Duplicate-row
    # plans (overflow landmarks cloned across devices) stay canonical:
    # their per-landmark reduces produce canonical-order increments,
    # so a rows-resident state would diverge across clones.
    def lm_pack(self, lm_p):
        from povar_tpu.solver.stage1 import LmState

        if isinstance(lm_p, LmState) or self.plan.has_duplicates:
            return lm_p
        return LmState(rows=self._jit_lm_pack(self.obs, lm_p))

    def lm_unpack(self, lm_p):
        from povar_tpu.solver.stage1 import LmState

        if not isinstance(lm_p, LmState):
            return lm_p
        return self._jit_lm_unpack(self.obs, lm_p.rows)

    def _seg_L(self, obs, x):
        rows = spmd_part_sums(x, self.spmd_layout)
        if self.plan.has_duplicates:
            from povar_tpu.solver.segments import padded_segment_sum

            return padded_segment_sum(rows, obs.lm_combine)[..., :-1]
        return rows

    def _expand_L(self, obs, s):
        if self.plan.has_duplicates:
            return self._gather_lm_x(obs, s)
        return spmd_expand_rows(s, self.spmd_layout)

    def _L_to_lm(self, obs, s):
        if self.plan.has_duplicates:
            return s
        from povar_tpu.solver.segments import padded_segment_sum

        return padded_segment_sum(s, obs.lm_combine)[..., :-1]

    def _lm_to_L(self, obs, s):
        if self.plan.has_duplicates:
            return s
        import jax.numpy as jnp

        return jnp.take(s, obs.lm_order, axis=-1)

    # state conversion ------------------------------------------------
    def pad_landmarks(self, lm):
        """Canonical [n_lms, k] -> sharded padded [D*m_dev, k]."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        lm = np.asarray(lm)
        out = np.zeros(
            (self.plan.n_dev * self.plan.m_dev,) + lm.shape[1:],
            dtype=lm.dtype,
        )
        out[self.plan.lm_perm] = lm
        return jax.device_put(
            jnp.asarray(out, self.dtype),
            NamedSharding(self.mesh, P(AXIS)),
        )

    def unpad_landmarks(self, lm_pad):
        """Sharded padded [D*m_dev, k] -> canonical numpy [n_lms, k]."""
        return np.asarray(lm_pad)[self.plan.lm_perm]


def _make_spmd_class():
    """Deferred class construction (keeps jax imports out of module
    import time for pure-numpy plan users)."""
    global SpmdStage1Solver, SpmdStage2Solver
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from povar_tpu.ops.pallas_pose import PART_ALIGN
    from povar_tpu.options import SolverType
    from povar_tpu.solver.stage1 import Lin1S, LmState, Stage1Solver
    from povar_tpu.solver.stage2 import Lin2S, Stage2Solver

    d = AXIS

    def _dispatch_state(canon, rows, argpos):
        """Pick the canonical- or rows-state jit per call based on the
        landmark argument's representation (mirrors the single-chip
        trace-time pytree branch in stage1.CamWindows)."""

        def f(*a):
            sel = rows if isinstance(a[argpos], LmState) else canon
            return sel(*a)

        return f

    def _common_scalars(self, options, dtype):
        if dtype != jnp.float64:
            raise ValueError(
                "SPMD windowed solvers keep the LM state in f64 "
                "(inner solves run in f32 under "
                "mixed_precision_solves, f64 otherwise)"
            )
        if options.detailed_timing:
            raise ValueError(
                "detailed_timing staging is not supported on the SPMD "
                "path (each stage sync would serialize the mesh); use "
                "the fused iteration"
            )
        self.opts = options
        self.dtype = dtype
        # pure-f64 configs run the SAME structured/windowed path: the
        # per-observation kernels dispatch to their XLA mirrors
        # (ops/xla_pose.py) and the slot reduce/expand falls back per
        # class (ops/pallas_spmd._class_eligible) — no GSPMD drop
        self.solve_dtype = (
            jnp.float32
            if options.mixed_precision_solves
            else jnp.float64
        )
        self.power_m = int(options.power_sc_iterations)
        self.use_pallas = True
        self.jacobi_eps = options.effective_jacobi_scaling_epsilon(
            self.solve_dtype
        )
        # reference quirk (stage1.Stage1Solver.__init__): only the
        # power linearizor scales Jl columns; the SC linearizor (PCG)
        # does not. Stage 2 always scales (overridden there).
        self.scale_jl = options.solver_type_step_1 in (
            SolverType.POWER_VARPROJ,
            SolverType.POWER_SCHUR_COMPLEMENT,
        )

    class SpmdStage1Solver(_SpmdCommon, Stage1Solver):
        """Stage-1 solver over an SPMD mesh (windowed kernels inside
        shard_map; see the module docstring)."""

        def __init__(
            self, plan, obs_uv, num_cameras, num_landmarks, options,
            mesh, dtype=jnp.float64, obs_weight=None,
        ):
            from povar_tpu.options import RobustNorm
            from povar_tpu.ops import pose_math

            _common_scalars(self, options, dtype)
            if options.solver_type_step_1 == SolverType.CHOLESKY:
                raise ValueError(
                    "CHOLESKY (dense direct) is a small-problem "
                    "single-chip solver; use POWER_VARPROJ or PCG on "
                    "the SPMD path"
                )
            self.mesh = mesh
            self.plan = plan
            self.n_cams = int(num_cameras)
            self.n_lms = int(num_landmarks)
            self.alpha = float(options.alpha)
            code = {
                RobustNorm.NONE: pose_math.ROBUST_NONE,
                RobustNorm.HUBER: pose_math.ROBUST_HUBER,
                RobustNorm.CAUCHY: pose_math.ROBUST_CAUCHY,
            }
            self.robust = code[options.residual.robust_norm]
            self.huber = float(options.residual.huber_parameter)
            self.n_win = plan.n_win_dev
            self.win_w = plan.width
            self.lm_shapes = None  # layout overrides replace it
            self.spmd_layout = plan.layout
            self.obs = self._spmd_build_obs(
                plan, obs_uv, obs_weight, mesh
            )
            self._setup_jits()

        def _setup_jits(self):
            ospec = self._obs_specs()
            lin_spec = Lin1S(
                ct=P(), x=P(None, d), r_w=P(None, d), sw=P(None, d),
                hll_raw=P(None, None, d), bl_raw=P(None, d),
                jl_scale=P(None, d), pose_scale=P(),
            )
            err_spec = {k: P() for k in _ERR_KEYS}
            sm = functools.partial(_shard_map, mesh=self.mesh)
            self._jit_compute_error = jax.jit(sm(
                self._compute_error,
                in_specs=(ospec, P(), P(d, None)),
                out_specs=err_spec,
            ))
            self._jit_initialize_varproj = jax.jit(sm(
                self._initialize_varproj,
                in_specs=(ospec, P()),
                out_specs=P(d, None),
            ))
            self._jit_linearize = jax.jit(sm(
                self._linearize,
                in_specs=(ospec, P(), P(d, None)),
                out_specs=lin_spec,
            ))

            def mk_power(ld):
                def f(obs, lin, lam):
                    return self._solve_power(
                        obs, lin, lam, landmark_damping=ld
                    )

                return jax.jit(sm(
                    f,
                    in_specs=(ospec, lin_spec, P()),
                    out_specs=(P(), P()),
                ))

            pow_jits = {False: mk_power(False), True: mk_power(True)}

            def solve_power(obs, lin, lam, landmark_damping=False):
                return pow_jits[bool(landmark_damping)](obs, lin, lam)

            self._jit_solve_power = solve_power
            self._jit_solve_pcg = jax.jit(sm(
                self._solve_pcg,
                in_specs=(ospec, lin_spec, P()),
                out_specs=(P(), P()),
            ))
            self._jit_apply = jax.jit(sm(
                self._apply,
                in_specs=(ospec, P(), P(d, None), lin_spec, P()),
                out_specs=(P(), P(d, None), P()),
            ))
            self._jit_apply_poba = jax.jit(sm(
                self._apply_poba,
                in_specs=(
                    ospec, P(), P(d, None), lin_spec, P(), P(),
                ),
                out_specs=(P(), P(d, None), P()),
            ))

            # fused LM trial (solve+apply+cost, stage1.Stage1Solver
            # ._trial) under ONE shard_map region: one multi-chip
            # dispatch per backtracking trial, collectives identical to
            # the staged pieces it composes
            self._jit_trial = jax.jit(sm(
                self._trial,
                in_specs=(ospec, P(), P(d, None), lin_spec, P()),
                out_specs=(P(), P(d, None), P(), P(), P(), err_spec),
            ))

            # L-space (row-order) state variants: every state-taking
            # entry gets a twin whose landmark argument is
            # LmState(rows=[K, L]) sharded on the row axis, plus the
            # per-stage pack/unpack conversions (see _SpmdCommon
            # .lm_pack). Dispatch per representation at call time, like
            # the single-chip trace-time pytree branch.
            if not self.plan.has_duplicates:
                rows_in = LmState(rows=P(None, d))
                self._jit_lm_pack = jax.jit(sm(
                    self._lm_pack_rows,
                    in_specs=(ospec, P(d, None)),
                    out_specs=P(None, d),
                ))
                self._jit_lm_unpack = jax.jit(sm(
                    self._lm_unpack_rows,
                    in_specs=(ospec, P(None, d)),
                    out_specs=P(d, None),
                ))

                dispatch = _dispatch_state

                self._jit_compute_error = dispatch(
                    self._jit_compute_error,
                    jax.jit(sm(
                        self._compute_error,
                        in_specs=(ospec, P(), rows_in),
                        out_specs=err_spec,
                    )),
                    2,
                )
                self._jit_linearize = dispatch(
                    self._jit_linearize,
                    jax.jit(sm(
                        self._linearize,
                        in_specs=(ospec, P(), rows_in),
                        out_specs=lin_spec,
                    )),
                    2,
                )
                self._jit_apply = dispatch(
                    self._jit_apply,
                    jax.jit(sm(
                        self._apply,
                        in_specs=(ospec, P(), rows_in, lin_spec, P()),
                        out_specs=(P(), rows_in, P()),
                    )),
                    2,
                )
                self._jit_apply_poba = dispatch(
                    self._jit_apply_poba,
                    jax.jit(sm(
                        self._apply_poba,
                        in_specs=(
                            ospec, P(), rows_in, lin_spec, P(), P(),
                        ),
                        out_specs=(P(), rows_in, P()),
                    )),
                    2,
                )
                self._jit_trial = dispatch(
                    self._jit_trial,
                    jax.jit(sm(
                        self._trial,
                        in_specs=(ospec, P(), rows_in, lin_spec, P()),
                        out_specs=(
                            P(), rows_in, P(), P(), P(), err_spec,
                        ),
                    )),
                    2,
                )

            def no_chol(*_a, **_k):
                raise ValueError("CHOLESKY unsupported on SPMD path")

            self._jit_solve_cholesky = no_chol

    class SpmdStage2Solver(_SpmdCommon, Stage2Solver):
        """Stage-2 Riemannian solver over an SPMD mesh."""

        def __init__(
            self, plan, obs_uv, num_cameras, num_landmarks, options,
            mesh, dtype=jnp.float64, obs_weight=None,
        ):
            from povar_tpu.options import RobustNorm
            from povar_tpu.ops import pose_math

            _common_scalars(self, options, dtype)
            self.mesh = mesh
            self.plan = plan
            self.n_cams = int(num_cameras)
            self.n_lms = int(num_landmarks)
            code = {
                RobustNorm.NONE: pose_math.ROBUST_NONE,
                RobustNorm.HUBER: pose_math.ROBUST_HUBER,
                RobustNorm.CAUCHY: pose_math.ROBUST_CAUCHY,
            }
            self.robust = code[options.residual.robust_norm]
            self.huber = float(options.residual.huber_parameter)
            self.use_valid_only = options.use_projection_validity_check()
            self.n_win = plan.n_win_dev
            self.win_w = plan.width
            self.lm_shapes = None
            self.spmd_layout = plan.layout
            self.obs = self._spmd_build_obs(
                plan, obs_uv, obs_weight, mesh
            )
            self._setup_jits()

        def _setup_jits(self):
            ospec = self._obs_specs()
            lin_spec = Lin2S(
                ct=P(), x4=P(None, d), mm=P(None, d), sw=P(None, d),
                r_w=P(None, d), jls8=P(None, d), jlns=P(None, d),
                hll_raw=P(None, None, d), bl_raw=P(None, d),
                jl_scale=P(None, d), pose_scale=P(),
                kernel_cam=P(), kernel_lm=P(None, None, d), kps=P(),
            )
            err_spec = {k: P() for k in _ERR_KEYS}
            sm = functools.partial(_shard_map, mesh=self.mesh)
            self._jit_compute_error = jax.jit(sm(
                self._compute_error,
                in_specs=(ospec, P(), P(d, None)),
                out_specs=err_spec,
            ))
            self._jit_linearize = jax.jit(sm(
                self._linearize,
                in_specs=(ospec, P(), P(d, None)),
                out_specs=lin_spec,
            ))
            self._jit_solve_power = jax.jit(sm(
                self._solve_power,
                in_specs=(ospec, lin_spec, P()),
                out_specs=(P(), P()),
            ))
            self._jit_solve_pcg = jax.jit(sm(
                self._solve_pcg,
                in_specs=(ospec, lin_spec, P()),
                out_specs=(P(), P()),
            ))
            self._jit_apply = jax.jit(sm(
                self._apply,
                in_specs=(
                    ospec, P(), P(d, None), lin_spec, P(), P(),
                ),
                out_specs=(P(), P(d, None), P()),
            ))

            # fused step-2 LM trial under ONE shard_map region (the
            # stage-1 trial's mirror; stage2.Stage2Solver._trial)
            self._jit_trial = jax.jit(sm(
                self._trial,
                in_specs=(ospec, P(), P(d, None), lin_spec, P()),
                out_specs=(P(), P(d, None), P(), P(), P(), err_spec),
            ))

            # L-space (row-order) state variants — same treatment as
            # SpmdStage1Solver (the step-2 state is the homogeneous
            # [M, 4], rows [4, L])
            if not self.plan.has_duplicates:
                rows_in = LmState(rows=P(None, d))
                self._jit_lm_pack = jax.jit(sm(
                    self._lm_pack_rows,
                    in_specs=(ospec, P(d, None)),
                    out_specs=P(None, d),
                ))
                self._jit_lm_unpack = jax.jit(sm(
                    self._lm_unpack_rows,
                    in_specs=(ospec, P(None, d)),
                    out_specs=P(d, None),
                ))
                self._jit_compute_error = _dispatch_state(
                    self._jit_compute_error,
                    jax.jit(sm(
                        self._compute_error,
                        in_specs=(ospec, P(), rows_in),
                        out_specs=err_spec,
                    )),
                    2,
                )
                self._jit_linearize = _dispatch_state(
                    self._jit_linearize,
                    jax.jit(sm(
                        self._linearize,
                        in_specs=(ospec, P(), rows_in),
                        out_specs=lin_spec,
                    )),
                    2,
                )
                self._jit_apply = _dispatch_state(
                    self._jit_apply,
                    jax.jit(sm(
                        self._apply,
                        in_specs=(
                            ospec, P(), rows_in, lin_spec, P(), P(),
                        ),
                        out_specs=(P(), rows_in, P()),
                    )),
                    2,
                )
                self._jit_trial = _dispatch_state(
                    self._jit_trial,
                    jax.jit(sm(
                        self._trial,
                        in_specs=(ospec, P(), rows_in, lin_spec, P()),
                        out_specs=(
                            P(), rows_in, P(), P(), P(), err_spec,
                        ),
                    )),
                    2,
                )

    return SpmdStage1Solver, SpmdStage2Solver


SpmdStage1Solver = None
SpmdStage2Solver = None


def get_spmd_solver_classes():
    global SpmdStage1Solver, SpmdStage2Solver
    if SpmdStage1Solver is None:
        SpmdStage1Solver, SpmdStage2Solver = _make_spmd_class()
    return SpmdStage1Solver, SpmdStage2Solver
