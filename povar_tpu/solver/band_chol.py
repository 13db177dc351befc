"""Banded direct Cholesky for the explicit reduced camera system (RCS).

The reference's LinearizationSC assembles the sparse RCS and factors it
with Eigen's SimplicialLLT (linearization_sc.hpp:236-245,
linearization_sc.cpp) — a general sparse solver with no camera-count
ceiling. A sparse right-looking supernodal factorization is a poor fit
for the TPU (data-dependent structure, scalar pivoting, pointer
chasing), so this module maps the same capability to the hardware
differently:

  1. Cameras are reordered by reverse Cuthill-McKee over the camera
     co-visibility graph (segments.rcm_camera_order — the same ordering
     the window planner uses). BAL problems have strong temporal
     locality, so the RCS becomes a BANDED block matrix: block (i, j)
     is nonzero only when cameras i and j co-observe a landmark, i.e.
     |pos_i - pos_j| <= bw, the max landmark camera-span in the
     ordering.

  2. A banded matrix with (block) bandwidth bw <= K is exactly BLOCK
     TRIDIAGONAL over supernodes of K consecutive cameras (B = 12K
     scalar dims). The factorization is then a `lax.scan` of dense
     [B, B] panels — Cholesky of the supernode diagonal and one
     triangular solve for the sub-diagonal coupling — all MXU-shaped
     matmuls with static shapes, the TPU-native analogue of a
     supernodal sparse LLT.

  3. Assembly: S = blockdiag(Hpp) + lam I - A A^T with A the
     camera-landmark coupling (W_o Hll^{-1/2}); -A A^T decomposes into
     per-landmark observation-pair products W_a W_b^T accumulated into
     the band by a bucketed segment-sum (segments.PaddedReduce) over
     host-precomputed (position, diagonal-offset) keys.

Used by Stage1Solver._solve_cholesky above the dense-RCS size cutoff,
removing the previous hard error at 1536 cameras.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from povar_tpu.solver.segments import (
    PaddedReduce,
    _build_padded_reduce,
    rcm_camera_order,
)

# pair-stream chunking for the band assembly: bounds the [C, 144]
# product intermediate (512k pairs * 576 B = ~300 MB)
PAIR_CHUNK = 512 * 1024

# supernode width cap: K = 256 gives B = 3072 dense panels (~37 MB
# f32); beyond this the problem has no useful band structure and the
# iterative solvers are the right tool
MAX_SUPERNODE = 256

# unbandable fallback ceiling: forcing bw = N - 1 degenerates the plan
# to a FULL band (a single dense supernode chain), which is still the
# reference's capability — SimplicialLLT on a dense-ish RCS fills to
# dense anyway (linearization_sc.hpp:236-245) — through the same
# pair-stream assembly and scan factorization. The block table is
# O(N^2): 576 N^2 bytes f32 = 2.4 GB at this cap, the practical
# single-chip limit alongside the problem arrays.
DENSE_UNBANDED_MAX = 2048


class BandMeta(NamedTuple):
    """Static shape metadata for the banded RCS solve (plain ints —
    safe to close over in jitted functions)."""

    n_cams: int
    bw: int  # block bandwidth in the RCM ordering
    K: int  # supernode width (cameras per supernode), K >= bw
    S: int  # number of supernodes (ceil(n/K))
    nb: int  # band storage rows = N * (bw + 1)


class BandArrays(NamedTuple):
    """Index arrays for the banded solve, passed as jit ARGUMENTS (the
    platform bakes closure-captured arrays into executables as
    literals; these are pair-count-sized)."""

    pos: np.ndarray  # [N] camera id -> band position (RCM)
    diag_rows: np.ndarray  # [N] band-storage row of block (pos, pos)
    pair_chunks: Tuple[Tuple[np.ndarray, np.ndarray, PaddedReduce], ...]
    d_idx: np.ndarray  # [S, K, K] int32 into the block table
    e_idx: np.ndarray  # [S, K, K] int32 into the block table


class BandPlan(NamedTuple):
    meta: "BandMeta"
    arrays: "BandArrays"


def _landmark_pairs(
    obs_cam: np.ndarray, obs_lm: np.ndarray, pos: np.ndarray,
    num_landmarks: int, bw: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Enumerate per-landmark observation pairs (a, b) ordered so
    pos[cam_a] <= pos[cam_b], including self-pairs (o, o), plus BOTH
    orders for distinct observations sharing a camera position (their
    products are not symmetric individually). Returns (ia, ib, key)
    with key = pos_a * (bw + 1) + (pos_b - pos_a)."""
    order = np.argsort(obs_lm, kind="stable")
    lm_sorted = obs_lm[order]
    starts = np.searchsorted(lm_sorted, np.arange(num_landmarks), "left")
    ends = np.searchsorted(lm_sorted, np.arange(num_landmarks), "right")

    ia_parts: List[np.ndarray] = []
    ib_parts: List[np.ndarray] = []
    counts = ends - starts
    # vectorize per distinct observation count
    for k in np.unique(counts):
        if k == 0:
            continue
        lms = np.nonzero(counts == k)[0]
        # [n_k, k] observation indices of each landmark
        rows = order[
            starts[lms][:, None] + np.arange(k)[None, :]
        ]
        aa, bb = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
        up = aa <= bb  # unordered pairs incl. self
        oa = rows[:, aa[up]].ravel()
        ob = rows[:, bb[up]].ravel()
        pa, pb = pos[obs_cam[oa]], pos[obs_cam[ob]]
        swap = pa > pb
        oa2 = np.where(swap, ob, oa)
        ob2 = np.where(swap, oa, ob)
        ia_parts.append(oa2)
        ib_parts.append(ob2)
        # same-position distinct-obs pairs: both orders hit the
        # diagonal block and the two products are mutual transposes
        dup = (pa == pb) & (oa != ob)
        if dup.any():
            ia_parts.append(ob[dup])
            ib_parts.append(oa[dup])
    ia = np.concatenate(ia_parts) if ia_parts else np.zeros(0, np.int64)
    ib = np.concatenate(ib_parts) if ib_parts else np.zeros(0, np.int64)
    pa, pb = pos[obs_cam[ia]], pos[obs_cam[ib]]
    key = pa * (bw + 1) + (pb - pa)
    return ia, ib, key


def build_band_plan(
    obs_cam: np.ndarray, obs_lm: np.ndarray, num_cameras: int,
    num_landmarks: int, live: Optional[np.ndarray] = None,
    allow_dense: bool = False,
) -> Optional[BandPlan]:
    """Build the banded-RCS plan, or None when the RCM bandwidth
    exceeds MAX_SUPERNODE (no exploitable band structure). With
    `allow_dense`, an unbandable graph at num_cameras <=
    DENSE_UNBANDED_MAX degenerates to the FULL band (bw = N - 1, one
    dense supernode chain) instead of failing — a direct factorization
    of arbitrary RCS sparsity within the O(N^2) memory bound. `live` is
    an optional per-observation mask excluding zero-weight padding
    lanes from the pair stream (their products are exact zeros)."""
    obs_cam = np.asarray(obs_cam)
    obs_lm = np.asarray(obs_lm)
    keep = None
    if live is not None:
        keep = np.nonzero(np.asarray(live) > 0)[0]
        obs_cam_l, obs_lm_l = obs_cam[keep], obs_lm[keep]
    else:
        obs_cam_l, obs_lm_l = obs_cam, obs_lm
    pos = rcm_camera_order(obs_cam_l, obs_lm_l, num_cameras)
    if pos is None:
        pos = np.arange(num_cameras, dtype=np.int64)
    pos = np.asarray(pos, np.int64)

    p_obs = pos[obs_cam_l]
    lo = np.full(num_landmarks, np.iinfo(np.int64).max)
    hi = np.full(num_landmarks, -1)
    np.minimum.at(lo, obs_lm_l, p_obs)
    np.maximum.at(hi, obs_lm_l, p_obs)
    seen = hi >= 0
    bw = int(np.max(hi[seen] - lo[seen])) if seen.any() else 0
    if bw > MAX_SUPERNODE:
        if not allow_dense or num_cameras > DENSE_UNBANDED_MAX:
            return None
        bw = num_cameras - 1  # full band: dense direct factorization
    # supernode width: >= bw, multiple of 32 so B = 12K is a multiple
    # of 384 (MXU-tileable), capped below the problem size
    K = max(32, int(np.ceil(max(bw, 1) / 32)) * 32)
    S = int(np.ceil(num_cameras / K))
    nb = num_cameras * (bw + 1)

    ia, ib, key = _landmark_pairs(
        obs_cam_l, obs_lm_l, pos, num_landmarks, bw
    )
    if keep is not None:
        ia, ib = keep[ia], keep[ib]
    chunks = []
    for c0 in range(0, len(ia), PAIR_CHUNK):
        sl = slice(c0, c0 + PAIR_CHUNK)
        chunks.append((
            ia[sl].astype(np.int32),
            ib[sl].astype(np.int32),
            _build_padded_reduce(key[sl], nb),
        ))

    # block table layout: [0, nb) = band blocks, [nb, 2nb) = their
    # transposes, 2nb = zero block, 2nb + 1 = identity block
    ZERO, EYE = 2 * nb, 2 * nb + 1

    def block_index(p: np.ndarray, q: np.ndarray) -> np.ndarray:
        """Vectorized index of block (p, q) in the table."""
        inb = (p >= 0) & (p < num_cameras) & (q >= 0) & (q < num_cameras)
        d = q - p
        upper = inb & (d >= 0) & (d <= bw)
        lower = inb & (d < 0) & (-d <= bw)
        idx = np.full(p.shape, ZERO, np.int64)
        idx[upper] = (p * (bw + 1) + d)[upper]
        idx[lower] = (q * (bw + 1) - d)[lower] + nb
        pad_diag = (p == q) & (p >= num_cameras) & (p < S * K)
        idx[pad_diag] = EYE
        return idx

    ii = np.arange(K)
    ss = np.arange(S)
    p_d = ss[:, None, None] * K + ii[None, :, None]
    q_d = ss[:, None, None] * K + ii[None, None, :]
    d_idx = block_index(
        np.broadcast_to(p_d, (S, K, K)).copy(),
        np.broadcast_to(q_d, (S, K, K)).copy(),
    ).astype(np.int32)
    q_e = (ss[:, None, None] - 1) * K + ii[None, None, :]
    e_idx = block_index(
        np.broadcast_to(p_d, (S, K, K)).copy(),
        np.broadcast_to(q_e, (S, K, K)).copy(),
    ).astype(np.int32)
    e_idx[0] = ZERO

    return BandPlan(
        meta=BandMeta(n_cams=num_cameras, bw=bw, K=K, S=S, nb=nb),
        arrays=BandArrays(
            pos=pos.astype(np.int32),
            diag_rows=(pos * (bw + 1)).astype(np.int32),
            pair_chunks=tuple(chunks),
            d_idx=d_idx, e_idx=e_idx,
        ),
    )


# ------------------------------------------------------------------
# traced pieces (imported lazily so plan building stays numpy-only)
# ------------------------------------------------------------------


def _solve_right_lower_t(col, lp):
    """X = col @ inv(lp)^T for col [B, 12], lp [12, 12] lower-tri.
    Unrolled forward substitution over the 12 columns."""
    import jax.numpy as jnp

    cols = []
    for j in range(12):
        s = col[:, j]
        for k in range(j):
            s = s - cols[k] * lp[j, k]
        cols.append(s / lp[j, j])
    return jnp.stack(cols, axis=1)


def _chol_blocked(a, K):
    """Dense lower Cholesky of a [B, B] SPD matrix via 12-wide panels
    (right-looking; trailing updates are [B,12]x[12,B] MXU matmuls)."""
    import jax
    import jax.numpy as jnp

    from povar_tpu.ops import linalg

    B = a.shape[0]
    rowi = jnp.arange(B)

    def body(p, carry):
        a_cur, l_out = carry
        off = p * 12
        d = jax.lax.dynamic_slice(a_cur, (off, off), (12, 12))
        lp = linalg.cholesky_smallf(d)
        col = jax.lax.dynamic_slice(a_cur, (0, off), (B, 12))
        x = _solve_right_lower_t(col, lp)
        # rows above the panel belong to already-finished columns
        x = jnp.where((rowi >= off)[:, None], x, 0.0)
        l_out = jax.lax.dynamic_update_slice(l_out, x, (0, off))
        below = jnp.where((rowi >= off + 12)[:, None], x, 0.0)
        a_cur = a_cur - below @ below.T
        return a_cur, l_out

    _, l_out = jax.lax.fori_loop(
        0, K, body, (a, jnp.zeros_like(a))
    )
    return l_out


def _tri_solve_right(e, l, K):
    """F = e @ inv(l)^T for e [B, B], l [B, B] lower-tri (panelled)."""
    import jax
    import jax.numpy as jnp

    B = e.shape[0]

    def body(p, carry):
        r, f = carry
        off = p * 12
        lp = jax.lax.dynamic_slice(l, (off, off), (12, 12))
        rcol = jax.lax.dynamic_slice(r, (0, off), (B, 12))
        fj = _solve_right_lower_t(rcol, lp)
        f = jax.lax.dynamic_update_slice(f, fj, (0, off))
        lcol = jax.lax.dynamic_slice(l, (0, off), (B, 12))
        # l is strictly lower outside finished panels, so this only
        # touches columns >= off
        r = r - fj @ lcol.T
        return r, f

    _, f = jax.lax.fori_loop(0, K, body, (e, jnp.zeros_like(e)))
    return f


def _fwd_solve(l, v, K):
    """y with l @ y = v, l [B, B] lower-tri, v [B] (panelled)."""
    import jax
    import jax.numpy as jnp

    B = v.shape[0]

    def body(p, carry):
        r, y = carry
        off = p * 12
        lp = jax.lax.dynamic_slice(l, (off, off), (12, 12))
        rp = jax.lax.dynamic_slice(r, (off,), (12,))
        yp = _solve_right_lower_t(rp[None, :], lp)[0]
        y = jax.lax.dynamic_update_slice(y, yp, (off,))
        lcol = jax.lax.dynamic_slice(l, (0, off), (B, 12))
        r = r - lcol @ yp
        return r, y

    _, y = jax.lax.fori_loop(0, K, body, (v, jnp.zeros_like(v)))
    return y


def _bwd_solve(l, v, K):
    """x with l^T @ x = v, l [B, B] lower-tri, v [B] (panelled)."""
    import jax
    import jax.numpy as jnp

    from povar_tpu.ops import linalg

    B = v.shape[0]

    def body(i, carry):
        r, x = carry
        p = K - 1 - i
        off = p * 12
        lp = jax.lax.dynamic_slice(l, (off, off), (12, 12))
        rp = jax.lax.dynamic_slice(r, (off,), (12,))
        xp = linalg.solve_upper_from_lowerf(lp, rp)
        x = jax.lax.dynamic_update_slice(x, xp, (off,))
        lrow = jax.lax.dynamic_slice(l, (off, 0), (12, B))
        r = r - lrow.T @ xp
        return r, x

    _, x = jax.lax.fori_loop(0, K, body, (v, jnp.zeros_like(v)))
    return x


def assemble_band(meta: BandMeta, arrs: BandArrays, wl, hpp, lam):
    """Accumulate the band storage [nb, 144]: wl [12, 3, O] f32
    (obs-LAST — a [O,12,3] layout would pad the 3-wide minor dim to
    128 lanes), hpp [12, 12, N], lam scalar."""
    import jax.numpy as jnp

    from povar_tpu.ops.small_einsum import small_einsum
    from povar_tpu.solver.segments import padded_segment_sum

    dt = wl.dtype
    s_acc = jnp.zeros((144, meta.nb), dt)
    for ia, ib, red in arrs.pair_chunks:
        va = jnp.take(wl, ia, axis=-1)
        vb = jnp.take(wl, ib, axis=-1)
        prod = small_einsum("iko,jko->ijo", va, vb)
        s_acc = s_acc + padded_segment_sum(
            -prod.reshape(144, ia.shape[0]), red
        )
    diag = jnp.transpose(hpp, (2, 0, 1)).astype(dt) + (
        lam.astype(dt) * jnp.eye(12, dtype=dt)[None]
    )
    return s_acc.T.at[arrs.diag_rows].add(diag.reshape(-1, 144))


def solve_band(meta: BandMeta, arrs: BandArrays, s_flat, rhs):
    """Factor + solve the banded RCS: rhs [12, N] (column-major per
    camera like the dense path), returns inc [12, N] (NOT negated)."""
    import jax
    import jax.numpy as jnp

    K, S, nb = meta.K, meta.S, meta.nb
    B = 12 * K
    dt = s_flat.dtype

    blocks = s_flat.reshape(nb, 12, 12)
    table = jnp.concatenate(
        [
            blocks,
            jnp.transpose(blocks, (0, 2, 1)),
            jnp.zeros((1, 12, 12), dt),
            jnp.eye(12, dtype=dt)[None],
        ],
        axis=0,
    )

    def supernode(idx):
        t = jnp.take(table, idx.reshape(-1), axis=0)
        t = t.reshape(S, K, K, 12, 12)
        return jnp.transpose(t, (0, 1, 3, 2, 4)).reshape(S, B, B)

    d_sn = supernode(arrs.d_idx)
    e_sn = supernode(arrs.e_idx)

    def factor_step(l_prev, inp):
        d_s, e_s = inp
        f = _tri_solve_right(e_s, l_prev, K)
        m = d_s - f @ f.T
        l_s = _chol_blocked(m, K)
        return l_s, (l_s, f)

    _, (l_d, l_f) = jax.lax.scan(
        factor_step, jnp.eye(B, dtype=dt), (d_sn, e_sn)
    )

    # rhs: camera-major [N*12] in band position order, padded to S*B
    r = jnp.zeros((S * K, 12), dt)
    r = r.at[arrs.pos].set(rhs.T.astype(dt))
    r = r.reshape(S, B)

    def fwd_step(y_prev, inp):
        l_s, f_s, r_s = inp
        y_s = _fwd_solve(l_s, r_s - f_s @ y_prev, K)
        return y_s, y_s

    _, ys = jax.lax.scan(
        fwd_step, jnp.zeros(B, dt), (l_d, l_f, r)
    )

    # backward: x_s = L_s^-T (y_s - F_{s+1}^T x_{s+1})
    f_next = jnp.concatenate(
        [l_f[1:], jnp.zeros((1, B, B), dt)], axis=0
    )

    def bwd_step(x_next, inp):
        l_s, f_n, y_s = inp
        x_s = _bwd_solve(l_s, y_s - f_n.T @ x_next, K)
        return x_s, x_s

    _, xs = jax.lax.scan(
        bwd_step, jnp.zeros(B, dt), (l_d, f_next, ys),
        reverse=True,
    )

    x = xs.reshape(S * K, 12)
    return jnp.take(x, arrs.pos, axis=0).T
