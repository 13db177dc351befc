"""Multi-chip scaling: shard the observation axis over a device mesh.

The reference's only parallelism is shared-memory TBB over landmarks
with mutex-guarded scatter into camera-indexed accumulators
(SURVEY.md §2.7). The TPU design: observations (the O axis, the bulk of
the memory and FLOPs — Jp is [O,4,12]) are sharded across the mesh;
camera and landmark state is replicated. Every per-camera / per-landmark
`segment_sum` then becomes a partial segment-sum per chip plus an
all-reduce that XLA GSPMD inserts automatically over ICI — the exact
analogue of the reference's mutex scatter, with the communication
pattern described in SURVEY.md §5 (a dense [num_cams x block]
all-reduce per power-series term / CG iteration).

No shard_map is needed: the solver's jitted functions are pure
gather/einsum/segment_sum programs, so annotating the input shardings is
sufficient for GSPMD to propagate the partitioning end-to-end.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

OBS_AXIS = "obs"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the observation axis. On a pod slice this rides
    ICI; the per-camera accumulators that get all-reduced are small
    ([N,12] / [N,12,12]), so bandwidth is dominated by the sharded
    obs-major arrays that never move."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (OBS_AXIS,))


def obs_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(OBS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_obs_to_multiple(
    obs_cam: np.ndarray,
    obs_lm: np.ndarray,
    obs_uv: np.ndarray,
    multiple: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad the observation arrays to a multiple of the mesh size with
    explicit zero-weight entries.

    Padded rows point at camera 0 / landmark 0 with uv = 0 and carry
    weight 0 through `obs_weight`, so they contribute exactly zero to
    every residual, Jacobian, and segment reduction. Returns
    (obs_cam, obs_lm, obs_uv, obs_weight)."""
    o = len(obs_cam)
    target = ((o + multiple - 1) // multiple) * multiple
    pad = target - o
    weight = np.ones(target)
    if pad:
        obs_cam = np.concatenate([obs_cam, np.zeros(pad, obs_cam.dtype)])
        obs_lm = np.concatenate([obs_lm, np.zeros(pad, obs_lm.dtype)])
        obs_uv = np.concatenate([obs_uv, np.zeros((pad, 2), obs_uv.dtype)])
        weight[o:] = 0.0
    return obs_cam, obs_lm, obs_uv, weight


def make_sharded_solver(solver_cls, problem, options, mesh: Mesh, **kw):
    """Construct a Stage1Solver/Stage2Solver whose observation arrays are
    padded to the mesh size (zero-weight padding rows) and sharded over
    the obs axis. Camera/landmark state stays replicated; GSPMD inserts
    the all-reduces for every per-camera/per-landmark segment_sum."""
    n_dev = int(mesh.devices.size)
    obs_cam, obs_lm, obs_uv, weight = pad_obs_to_multiple(
        problem.obs_cam, problem.obs_lm, problem.obs_uv, n_dev
    )
    sh = obs_sharding(mesh)
    solver = solver_cls(
        jax.device_put(jax.numpy.asarray(obs_cam, jax.numpy.int32), sh),
        jax.device_put(jax.numpy.asarray(obs_lm, jax.numpy.int32), sh),
        jax.device_put(jax.numpy.asarray(obs_uv), sh),
        problem.num_cameras,
        problem.num_landmarks,
        options,
        obs_weight=jax.device_put(jax.numpy.asarray(weight), sh),
        **kw,
    )
    return solver
