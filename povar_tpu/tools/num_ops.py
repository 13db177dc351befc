"""Analytic FLOP-count models for the solver variants.

Equivalent of scripts/num_ops/compute_num_ops.py: closed-form operation
counts parameterized on (n_poses, n_landmarks, n_obs) for comparing
Schur-complement, power-series, and CG strategies, extended with the
pOSE VarProj dimensions of this framework (4-dim residual, 12-dof
poses, 3-dim landmarks; step-2: 2-dim residual, 11-dof tangent).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class ProblemDims:
    n_poses: int
    n_landmarks: int
    n_obs: int


def pose_varproj_linearize_flops(d: ProblemDims) -> float:
    """pOSE residual + Jp/Jl evaluation + robust weighting + scaling."""
    per_obs = (
        4 * 4 * 2  # A~ rows
        + 4 * 4 * 2  # residual
        + 4 * 12  # Jp fill (scaled copies)
        + 4 * (12 + 3 + 1)  # weighting
        + 2 * 4 * (12 + 3)  # column-norm accumulation + scaling
    )
    return float(d.n_obs * per_obs)


def schur_prepare_flops(d: ProblemDims) -> float:
    """Hll (3x3) + Hpp diag (12x12) + gradient assembly."""
    per_obs = 2 * 4 * 9 + 2 * 4 * 144 + 2 * 4 * (12 + 3) * 2
    per_lm = 42  # 3x3 inverse
    per_pose = 12**3 / 3 * 2  # 12x12 Cholesky inverse
    return float(
        d.n_obs * per_obs + d.n_landmarks * per_lm + d.n_poses * per_pose
    )


def power_term_flops(d: ProblemDims) -> float:
    """One power-series term: E0 matvec + block-diagonal B^-1 apply."""
    e0 = d.n_obs * 2 * 4 * (12 + 3) * 2 + d.n_landmarks * 18
    b_inv = d.n_poses * 2 * 144
    return float(e0 + b_inv)


def cg_iteration_flops(d: ProblemDims) -> float:
    """One implicit-SC CG iteration: one S matvec + preconditioner +
    vector ops."""
    matvec = power_term_flops(d) + d.n_poses * 2 * 144
    precond = d.n_poses * 2 * 144
    vecs = 6 * d.n_poses * 12
    return float(matvec + precond + vecs)


def explicit_sc_assembly_flops(d: ProblemDims, obs_per_lm: float) -> float:
    """Explicit RCS assembly is quadratic in per-landmark observation
    count (all camera-pair blocks; add_Hb_pOSE in the reference)."""
    pair_cost = 2 * 12 * 3 * 12 + 2 * 12 * 12 * 3
    return float(d.n_landmarks * obs_per_lm**2 * pair_cost)


def solve_flops(
    d: ProblemDims,
    method: str = "power_varproj",
    power_terms: int = 10,
    cg_iterations: int = 100,
) -> float:
    """Total FLOPs for one LM iteration under the given linear solver."""
    base = pose_varproj_linearize_flops(d) + schur_prepare_flops(d)
    if method == "power_varproj":
        return base + power_terms * power_term_flops(d)
    if method == "pcg":
        return base + cg_iterations * cg_iteration_flops(d)
    if method == "cholesky":
        n = d.n_poses * 12
        return base + explicit_sc_assembly_flops(
            d, d.n_obs / d.n_landmarks
        ) + 2.0 / 3.0 * n**3
    raise ValueError(method)


if __name__ == "__main__":
    # venice-1778 scale, matching the reference script's example numbers
    d = ProblemDims(n_poses=1778, n_landmarks=993923, n_obs=5001946)
    for m in ("power_varproj", "pcg", "cholesky"):
        print(f"{m:16s} {solve_flops(d, m):.3e} flops/LM-iteration")
