"""Sorted-segment reductions and the observation-last data layout.

Why this exists — two TPU facts drive the whole solver layout:

1. XLA tiles the **last two** dimensions of every array onto (sublane,
   lane) = (8, 128) vector registers. Arrays like `Jl [O, 4, 3]` pad the
   3-wide minor dimension to 128 lanes: a 40-50x memory blowup that
   OOMs HBM at venice scale. Putting the huge observation axis last
   (`Jl [4, 3, O]`) makes lanes = observations with near-zero padding
   and turns every per-observation operation into perfectly vectorized
   lane arithmetic.

2. `scatter-add` (the default lowering of segment_sum) serializes on
   TPU. Observations are stored sorted by landmark, so per-landmark
   sums are contiguous-range reductions: cumulative sum along the lane
   axis + gathers at segment boundaries. Per-camera sums use a static
   precomputed permutation that re-sorts observations by camera and the
   same boundary trick. This replaces the reference's mutex-guarded
   scatter (sc/landmark_block.hpp:383-410) with two XLA-friendly
   primitives (cumsum, gather).

Precision note: a segment sum computed as cs[end] - cs[start] loses
~log10(total/segment) digits relative to a tree reduction; in f64 at
BAL scales (~1e6 observations) that leaves >=10 significant digits,
far inside the 1e-6 relative cost-parity tolerance.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class SegmentLayout(NamedTuple):
    """Static per-problem reduction structure (host-precomputed).

    Observations are sorted by (landmark, camera). `lm_bounds[m] ..
    lm_bounds[m+1]` is landmark m's contiguous observation range.
    `cam_perm` re-sorts observations by camera; `cam_bounds` are the
    per-camera ranges in that order.
    """

    lm_bounds: jnp.ndarray  # [M+1] i32
    cam_perm: jnp.ndarray  # [O] i32
    cam_bounds: jnp.ndarray  # [N+1] i32


def build_segment_layout(
    obs_cam: np.ndarray,
    obs_lm: np.ndarray,
    num_cameras: int,
    num_landmarks: int,
) -> SegmentLayout:
    obs_cam = np.asarray(obs_cam)
    obs_lm = np.asarray(obs_lm)
    assert np.all(np.diff(obs_lm) >= 0), "observations must be lm-sorted"
    lm_bounds = np.searchsorted(
        obs_lm, np.arange(num_landmarks + 1)
    ).astype(np.int32)
    cam_perm = np.argsort(obs_cam, kind="stable").astype(np.int32)
    cam_sorted = obs_cam[cam_perm]
    cam_bounds = np.searchsorted(
        cam_sorted, np.arange(num_cameras + 1)
    ).astype(np.int32)
    return SegmentLayout(
        lm_bounds=jnp.asarray(lm_bounds),
        cam_perm=jnp.asarray(cam_perm),
        cam_bounds=jnp.asarray(cam_bounds),
    )


def segment_sum_sorted(x: jnp.ndarray, bounds: jnp.ndarray) -> jnp.ndarray:
    """Sum contiguous segments along the LAST axis.

    x [..., O], bounds [S+1] -> [..., S] with
    out[..., s] = sum(x[..., bounds[s]:bounds[s+1]]).
    """
    cs = jnp.cumsum(x, axis=-1)
    zero = jnp.zeros_like(cs[..., :1])
    cs = jnp.concatenate([zero, cs], axis=-1)
    return jnp.take(cs, bounds[1:], axis=-1) - jnp.take(
        cs, bounds[:-1], axis=-1
    )


def segment_sum_by_perm(
    x: jnp.ndarray, perm: jnp.ndarray, bounds: jnp.ndarray
) -> jnp.ndarray:
    """Segment sum along the last axis under a re-sorting permutation
    (the per-camera reduction)."""
    return segment_sum_sorted(jnp.take(x, perm, axis=-1), bounds)
