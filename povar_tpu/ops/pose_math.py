"""Batched residual + Jacobian math for stratified projective BA.

TPU-native re-derivation of the reference's per-observation math
(src/rootba_povar/bal/bal_bundle_adjustment_helper.cpp). Everything here
is written for *flat observation-major batches*: an operation takes the
per-observation gathered camera matrix `P [O, 3, 4]`, landmark `x`, and
measurement `uv [O, 2]` and returns `[O, ...]` residuals/Jacobians in
one fused XLA computation (no per-landmark loops, no mutexes).

Camera parameterization: the 12-vector pose is vec(P) row-major,
p = [P00 P01 P02 P03  P10..P13  P20..P23], matching the reference's
`camera_space_matrix` flattening (solver/linearizor_power_varproj.cpp:300-312)
and its additive increment `apply_inc_pose_pOSE` (bal/bal_problem.hpp:147-163).

Cost convention: 0.5 * ||r||^2 summed over observations (Ceres style,
helper.cpp:55).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from povar_tpu.ops.small_einsum import small_einsum


def sophus_eps_sqrt(dtype) -> jnp.ndarray:
    """Sophus::Constants<Scalar>::epsilonSqrt() (Sophus common.hpp):
    sqrt(1e-10) = 1e-5 for double, sqrt(1e-5f) for float. The reference
    uses it as the |z| projection-validity threshold
    (bal_camera.hpp:147). NOT the machine epsilon."""
    if jnp.dtype(dtype) == jnp.float32:
        return jnp.sqrt(jnp.float32(1e-5))
    return jnp.sqrt(jnp.asarray(1e-10, dtype))

# robust norm codes (BalResidualOptions::RobustNorm, bal_residual_options.hpp)
ROBUST_NONE = 0
ROBUST_HUBER = 1
ROBUST_CAUCHY = 2


def robust_error_and_weight(
    res_squared: jnp.ndarray, robust_norm: int, huber_parameter: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-observation robust cost and IRLS weight.

    Mirrors `compute_error_weight` (helper.cpp:50-74):
      NONE:   error = 0.5 r^2,                weight = 1
      HUBER:  w = 1 if r^2 < t^2 else t/|r|;  error = 0.5 (2 - w) w r^2
      CAUCHY: error = log(1 + r^2),           weight = 1
    `robust_norm` is a static Python int so the branch folds at trace time.
    """
    if robust_norm == ROBUST_HUBER:
        thresh = huber_parameter
        w = jnp.where(
            res_squared < thresh * thresh,
            jnp.ones_like(res_squared),
            thresh / jnp.sqrt(res_squared),
        )
        return 0.5 * (2.0 - w) * w * res_squared, w
    if robust_norm == ROBUST_CAUCHY:
        return jnp.log1p(res_squared), jnp.ones_like(res_squared)
    return 0.5 * res_squared, jnp.ones_like(res_squared)


def pose_matrix_tilde(
    P: jnp.ndarray, uv: jnp.ndarray, alpha: float
) -> jnp.ndarray:
    """The pOSE 'mixing' matrix A~ [O, 4, 4].

    rows (helper.cpp:250-254):
      0: sqrt(1-a) (P0 - u P2)
      1: sqrt(1-a) (P1 - v P2)
      2: sqrt(a)   P0
      3: sqrt(a)   P1
    """
    s_proj = jnp.sqrt(1.0 - alpha)
    s_aff = jnp.sqrt(alpha)
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    r0 = s_proj * (P[..., 0, :] - u * P[..., 2, :])
    r1 = s_proj * (P[..., 1, :] - v * P[..., 2, :])
    r2 = s_aff * P[..., 0, :]
    r3 = s_aff * P[..., 1, :]
    return jnp.stack([r0, r1, r2, r3], axis=-2)


def pose_residual(
    P: jnp.ndarray, x: jnp.ndarray, uv: jnp.ndarray, alpha: float
) -> jnp.ndarray:
    """pOSE residual r [O, 4] (helper.cpp:256-261).

    r = A~ [x; 1], with r2 -= sqrt(a) u, r3 -= sqrt(a) v.
    """
    A = pose_matrix_tilde(P, uv, alpha)
    xh = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    r = small_einsum("...ij,...j->...i", A, xh)
    s_aff = jnp.sqrt(alpha)
    corr = jnp.concatenate(
        [jnp.zeros_like(uv), s_aff * uv], axis=-1
    )  # [0, 0, sqrt(a) u, sqrt(a) v]
    return r - corr


def pose_jacobians(
    P: jnp.ndarray, x: jnp.ndarray, uv: jnp.ndarray, alpha: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """pOSE residual + Jacobians: (r [O,4], Jp [O,4,12], Jl [O,4,3]).

    Jp is d r / d vec(P) with the row-major 12-vector layout
    (helper.cpp:269-306); Jl = A~[:, :3] (helper.cpp:308-311).

    The residual is *affine in the landmark*, which is why the VarProj
    closed form v*(u) is exact (helper.cpp:218-241).
    """
    A = pose_matrix_tilde(P, uv, alpha)
    r = pose_residual(P, x, uv, alpha)
    Jl = A[..., :, :3]

    s_proj = jnp.sqrt(1.0 - alpha)
    s_aff = jnp.sqrt(alpha)
    xh = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)  # [O, 4]
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    zero4 = jnp.zeros_like(xh)

    # rows of Jp in blocks of the 3 camera-matrix rows
    row0 = s_proj * jnp.concatenate([xh, zero4, -u * xh], axis=-1)
    row1 = s_proj * jnp.concatenate([zero4, xh, -v * xh], axis=-1)
    row2 = s_aff * jnp.concatenate([xh, zero4, zero4], axis=-1)
    row3 = s_aff * jnp.concatenate([zero4, xh, zero4], axis=-1)
    Jp = jnp.stack([row0, row1, row2, row3], axis=-2)
    return r, Jp, Jl


# ---------------------------------------------------------------------
# Observation-last ("_t") variants: the obs axis is the LAST axis of
# every array (P [3,4,O], x [3,O], uv [2,O] -> r [4,O], Jp [4,12,O],
# Jl [4,3,O]). This is the layout the solver uses on TPU: lanes =
# observations, so tile padding is ~1x instead of the 10-50x that
# batch-first [O,4,12]/[O,4,3] arrays suffer. Semantics identical to the
# batch-first functions above (tested against them).
# ---------------------------------------------------------------------


def pose_matrix_tilde_t(
    P: jnp.ndarray, uv: jnp.ndarray, alpha: float
) -> jnp.ndarray:
    """A~ [4, 4, O] from P [3, 4, O], uv [2, O]."""
    s_proj = jnp.sqrt(1.0 - alpha)
    s_aff = jnp.sqrt(alpha)
    u = uv[0][None]  # [1, O]
    v = uv[1][None]
    r0 = s_proj * (P[0] - u * P[2])  # [4, O]
    r1 = s_proj * (P[1] - v * P[2])
    r2 = s_aff * P[0]
    r3 = s_aff * P[1]
    return jnp.stack([r0, r1, r2, r3], axis=0)


def pose_residual_t(
    P: jnp.ndarray, x: jnp.ndarray, uv: jnp.ndarray, alpha: float
) -> jnp.ndarray:
    """pOSE residual r [4, O]."""
    A = pose_matrix_tilde_t(P, uv, alpha)
    xh = jnp.concatenate([x, jnp.ones_like(x[:1])], axis=0)  # [4, O]
    r = small_einsum("ijo,jo->io", A, xh)
    s_aff = jnp.sqrt(alpha)
    corr = jnp.concatenate([jnp.zeros_like(uv), s_aff * uv], axis=0)
    return r - corr


def pose_jacobians_t(
    P: jnp.ndarray, x: jnp.ndarray, uv: jnp.ndarray, alpha: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(r [4,O], Jp [4,12,O], Jl [4,3,O])."""
    A = pose_matrix_tilde_t(P, uv, alpha)
    r = pose_residual_t(P, x, uv, alpha)
    Jl = A[:, :3, :]

    s_proj = jnp.sqrt(1.0 - alpha)
    s_aff = jnp.sqrt(alpha)
    xh = jnp.concatenate([x, jnp.ones_like(x[:1])], axis=0)  # [4, O]
    u = uv[0][None]
    v = uv[1][None]
    zero4 = jnp.zeros_like(xh)
    row0 = s_proj * jnp.concatenate([xh, zero4, -u * xh], axis=0)  # [12,O]
    row1 = s_proj * jnp.concatenate([zero4, xh, -v * xh], axis=0)
    row2 = s_aff * jnp.concatenate([xh, zero4, zero4], axis=0)
    row3 = s_aff * jnp.concatenate([zero4, xh, zero4], axis=0)
    Jp = jnp.stack([row0, row1, row2, row3], axis=0)
    return r, Jp, Jl


def varproj_init_normal_eq_t(
    P: jnp.ndarray, uv: jnp.ndarray, alpha: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(G^T G [3,3,O], G^T z [3,O]) for the closed-form landmark init."""
    A = pose_matrix_tilde_t(P, uv, alpha)
    G = A[:, :3, :]  # [4, 3, O]
    s_aff = jnp.sqrt(alpha)
    corr = jnp.concatenate([jnp.zeros_like(uv), s_aff * uv], axis=0)
    z = corr - A[:, 3, :]  # [4, O]
    gtg = small_einsum("kio,kjo->ijo", G, G)
    gtz = small_einsum("kio,ko->io", G, z)
    return gtg, gtz


def homogeneous_residual_t(
    P: jnp.ndarray, xh: jnp.ndarray, uv: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(r [2, O], valid [O]) from P [3,4,O], xh [4,O], uv [2,O]."""
    p = small_einsum("ijo,jo->io", P, xh)  # [3, O]
    z = p[2]
    proj = p[:2] / z[None]
    eps_sqrt = sophus_eps_sqrt(xh.dtype)
    return proj - uv, jnp.abs(z) >= eps_sqrt


def homogeneous_jacobians_t(
    P: jnp.ndarray, xh: jnp.ndarray, uv: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(r [2,O], Jp [2,12,O], Jl [2,4,O], valid [O])."""
    p = small_einsum("ijo,jo->io", P, xh)
    x_, y_, z_ = p[0], p[1], p[2]
    inv_z = 1.0 / z_
    r = jnp.stack([x_ * inv_z, y_ * inv_z], axis=0) - uv
    eps_sqrt = sophus_eps_sqrt(xh.dtype)
    valid = jnp.abs(z_) >= eps_sqrt

    xh_z = xh * inv_z[None]  # [4, O]
    xz2 = (x_ * inv_z * inv_z)[None] * xh
    yz2 = (y_ * inv_z * inv_z)[None] * xh
    zero4 = jnp.zeros_like(xh)
    Jp_row0 = jnp.concatenate([xh_z, zero4, -xz2], axis=0)  # [12, O]
    Jp_row1 = jnp.concatenate([zero4, xh_z, -yz2], axis=0)
    Jp = jnp.stack([Jp_row0, Jp_row1], axis=0)

    dproj = jnp.stack(
        [
            jnp.stack(
                [inv_z, jnp.zeros_like(inv_z), -x_ * inv_z * inv_z], axis=0
            ),
            jnp.stack(
                [jnp.zeros_like(inv_z), inv_z, -y_ * inv_z * inv_z], axis=0
            ),
        ],
        axis=0,
    )  # [2, 3, O]
    Jl = small_einsum("iko,kjo->ijo", dproj, P)  # [2, 4, O]
    return r, Jp, Jl, valid


def varproj_init_normal_eq(
    P: jnp.ndarray, uv: jnp.ndarray, alpha: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-observation contribution to the closed-form VarProj landmark init.

    The reference stacks G [4k, 3], z [4k] per landmark and solves the
    least squares v*(u0) = G^+ z via thin SVD (helper.cpp:75-99,220-241).
    Being a 3-unknown LS problem we solve the normal equations instead:
    return (G_i^T G_i [O,3,3], G_i^T z_i [O,3]) for segment-summing over
    each landmark's observations followed by a batched 3x3 solve.

    G_i = A~[:, :3]; z_i = -A~[:, 3] + [0, 0, sqrt(a) u, sqrt(a) v]
    (equivalently: r(x) = G_i x - z_i).
    """
    A = pose_matrix_tilde(P, uv, alpha)
    G = A[..., :, :3]
    s_aff = jnp.sqrt(alpha)
    corr = jnp.concatenate([jnp.zeros_like(uv), s_aff * uv], axis=-1)
    z = corr - A[..., :, 3]
    gtg = small_einsum("...ki,...kj->...ij", G, G)
    gtz = small_einsum("...ki,...k->...i", G, z)
    return gtg, gtz


def homogeneous_residual(
    P: jnp.ndarray, xh: jnp.ndarray, uv: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Step-2 projective reprojection residual.

    Returns (r [O, 2], valid [O] bool).

    p = [P; 0 0 0 1] @ X_h; r = (p_x / p_z, p_y / p_z) - uv
    (helper.cpp:315-344 with
    BalCamera::project_projective_refinement_matrix_space_without_distortion,
    basalt_custom/camera/bal_camera.hpp:120-167 — no distortion applied).
    valid: |p_z| >= Sophus::Constants::epsilonSqrt() (bal_camera.hpp:147)
    — sqrt(1e-10) = 1e-5 in double, sqrt(1e-5f) in float (the Sophus
    constants, not the machine epsilon).
    """
    p = small_einsum("...ij,...j->...i", P, xh)  # [O, 3]; 4th row not needed
    z = p[..., 2]
    proj = p[..., :2] / z[..., None]
    valid = jnp.abs(z) >= sophus_eps_sqrt(xh.dtype)
    return proj - uv, valid


def homogeneous_jacobians(
    P: jnp.ndarray, xh: jnp.ndarray, uv: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Step-2 residual + Jacobians: (r [O,2], Jp [O,2,12], Jl [O,2,4], valid).

    d_proj/d_p3d [2, 4] = [[1/z, 0, -x/z^2, 0], [0, 1/z, -y/z^2, 0]]
    Jp = d_proj/d_p3d @ d_p/d_vec(P)  (helper.cpp:350-371)
    Jl = d_proj/d_p3d @ [P; 0 0 0 1]  (helper.cpp:374-377)
    """
    p = small_einsum("...ij,...j->...i", P, xh)
    x_, y_, z_ = p[..., 0], p[..., 1], p[..., 2]
    inv_z = 1.0 / z_
    r = jnp.stack([x_ * inv_z, y_ * inv_z], axis=-1) - uv
    eps_sqrt = sophus_eps_sqrt(xh.dtype)
    valid = jnp.abs(z_) >= eps_sqrt

    # Jp: row k of the projection touches only the k-th camera-matrix row
    # block of vec(P): d p_k / d P_kj = X_j. Compose with d_proj rows.
    zero12 = jnp.zeros(xh.shape[:-1] + (12,), dtype=xh.dtype)
    xh_z = xh * inv_z[..., None]  # [O, 4]
    xz2 = (x_ * inv_z * inv_z)[..., None] * xh  # [O, 4]
    yz2 = (y_ * inv_z * inv_z)[..., None] * xh
    zero4 = jnp.zeros_like(xh)
    Jp_row0 = jnp.concatenate([xh_z, zero4, -xz2], axis=-1)
    Jp_row1 = jnp.concatenate([zero4, xh_z, -yz2], axis=-1)
    Jp = jnp.stack([Jp_row0, Jp_row1], axis=-2)
    del zero12

    # Jl = d_proj (2x4 over [x,y,z,w]) @ [P; e4] (4x4). The w column of
    # d_proj is zero, so only the 3 P rows contribute.
    dproj = jnp.stack(
        [
            jnp.stack(
                [inv_z, jnp.zeros_like(inv_z), -x_ * inv_z * inv_z], axis=-1
            ),
            jnp.stack(
                [jnp.zeros_like(inv_z), inv_z, -y_ * inv_z * inv_z], axis=-1
            ),
        ],
        axis=-2,
    )  # [O, 2, 3]
    Jl = small_einsum("...ik,...kj->...ij", dproj, P)  # [O, 2, 4]
    return r, Jp, Jl, valid
