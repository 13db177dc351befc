"""Multi-chip scaling: shard the observation axis over a device mesh.

The reference's only parallelism is shared-memory TBB over landmarks
with mutex-guarded scatter into camera-indexed accumulators
(SURVEY.md §2.7). The TPU design: observations (the last axis of every
big array — Jp is [4,12,O]) are sharded across the mesh; camera and
landmark state is replicated. The padded gather/reduce segment sums
(solver/segments.py) then partition across chips with XLA GSPMD
inserting the gather collectives over ICI — the analogue of the
reference's mutex scatter, with the communication pattern described in
SURVEY.md §5 (small per-camera/per-landmark accumulator exchanges per
power-series term / CG iteration).

No shard_map is needed: the solver's jitted functions are pure
gather/einsum/reduce programs, so annotating the input shardings is
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
    ([12,N] / [12,12,N]), so bandwidth is dominated by the sharded
    obs-major arrays that never move."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (OBS_AXIS,))


def replicate(mesh: Mesh, *arrays):
    """Place arrays fully replicated on the mesh (camera/landmark state;
    the observation arrays are the only sharded operands)."""
    sh = NamedSharding(mesh, P())
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) != 1 else out[0]


def pad_obs_to_multiple(
    obs_cam: np.ndarray,
    obs_lm: np.ndarray,
    obs_uv: np.ndarray,
    multiple: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad the observation arrays to a multiple of the mesh size with
    explicit zero-weight entries.

    Padded rows repeat the LAST observation's camera/landmark indices —
    keeping the landmark-sorted order the segment reductions rely on —
    and carry weight 0, so they contribute exactly zero to every
    residual, Jacobian, and segment reduction. Returns
    (obs_cam, obs_lm, obs_uv, obs_weight)."""
    o = len(obs_cam)
    target = ((o + multiple - 1) // multiple) * multiple
    pad = target - o
    weight = np.ones(target)
    if pad:
        obs_cam = np.concatenate(
            [obs_cam, np.full(pad, obs_cam[-1], obs_cam.dtype)]
        )
        obs_lm = np.concatenate(
            [obs_lm, np.full(pad, obs_lm[-1], obs_lm.dtype)]
        )
        obs_uv = np.concatenate([obs_uv, np.zeros((pad, 2), obs_uv.dtype)])
        weight[o:] = 0.0
    return obs_cam, obs_lm, obs_uv, weight


def shard_obs(solver, mesh: Mesh) -> None:
    """Re-place a constructed solver's Obs pytree onto the mesh: the
    observation axis (last axis of uv, the only axis of cam/lm/weight/
    cam_perm) is sharded; boundary arrays are replicated."""
    from povar_tpu.solver.stage1 import Obs

    # pallas_call has no GSPMD partitioning rules — the sharded path
    # uses the XLA gather/one-hot lowering throughout
    solver.use_pallas = False
    sh_o = NamedSharding(mesh, P(OBS_AXIS))
    sh_uv = NamedSharding(mesh, P(None, OBS_AXIS))
    sh_rep = NamedSharding(mesh, P())
    obs = solver.obs
    # the gather/reduce plan is replicated; GSPMD resolves the
    # cross-shard gathers of the sharded obs-axis operands
    solver.obs = Obs(
        cam=jax.device_put(obs.cam, sh_o),
        lm=jax.device_put(obs.lm, sh_o),
        uv=jax.device_put(obs.uv, sh_uv),
        weight=(
            None
            if obs.weight is None
            else jax.device_put(obs.weight, sh_o)
        ),
        cam_red=jax.device_put(obs.cam_red, sh_rep),
        cam_onehot=(
            None
            if obs.cam_onehot is None
            else jax.device_put(
                obs.cam_onehot, NamedSharding(mesh, P(OBS_AXIS, None))
            )
        ),
        lm_order=jax.device_put(obs.lm_order, sh_rep),
        lm_inv=jax.device_put(obs.lm_inv, sh_rep),
        # window fields are a single-chip Pallas feature; the sharded
        # path runs the XLA lowering
        cam_local=None,
        win_kmap=None,
        win_gather=None,
        win_scatter=None,
    )
    solver.n_win = 0
    solver.win_w = 0


def make_sharded_solver(solver_cls, problem, options, mesh: Mesh, **kw):
    """Construct a Stage1Solver/Stage2Solver whose observation arrays are
    padded to the mesh size (zero-weight padding) and sharded over the
    obs axis. Camera/landmark state stays replicated; GSPMD inserts the
    collectives for every segment reduction."""
    n_dev = int(mesh.devices.size)
    obs_cam, obs_lm, obs_uv, weight = pad_obs_to_multiple(
        problem.obs_cam, problem.obs_lm, problem.obs_uv, n_dev
    )
    solver = solver_cls(
        obs_cam,
        obs_lm,
        obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        options,
        obs_weight=weight,
        **kw,
    )
    shard_obs(solver, mesh)
    return solver
