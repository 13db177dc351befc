"""Configuration surface, mirroring the reference option structs.

Field names, defaults and ranges follow the reference so that existing
`rootba_config.toml` files and CLI habits carry over:
  - SolverOptions        (src/rootba_povar/bal/solver_options.hpp:46-308)
  - BalResidualOptions   (src/rootba_povar/bal/bal_residual_options.hpp:44-66)
  - BalDatasetOptions    (src/rootba_povar/bal/bal_dataset_options.hpp:44-97)
  - BalAppOptions        (src/rootba_povar/bal/bal_app_options.hpp:44-53)

Note the documented reference gotchas we preserve: `alpha` defaults to
0.01 (solver_options.hpp:129, not README's 0.1) and `power_sc_iterations`
defaults to 10 (solver_options.hpp:290-292, not README's 20).
"""

from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


class SolverType(enum.Enum):
    """Step-1 linear solver (solver_options.hpp:60-69)."""

    PCG = "PCG"
    POWER_SCHUR_COMPLEMENT = "POWER_SCHUR_COMPLEMENT"
    POWER_VARPROJ = "POWER_VARPROJ"
    CHOLESKY = "CHOLESKY"


class SolverTypeRiemannian(enum.Enum):
    """Step-2 linear solver (solver_options.hpp:71-76)."""

    RIPOBA = "RIPOBA"
    RIPCG = "RIPCG"


class OptimizedCost(enum.Enum):
    """Which cost gates LM accept/reject (solver_options.hpp:52-57)."""

    ERROR = "ERROR"
    ERROR_VALID = "ERROR_VALID"
    ERROR_VALID_AVG = "ERROR_VALID_AVG"


class PreconditionerType(enum.Enum):
    IDENTITY = "IDENTITY"
    JACOBI = "JACOBI"
    SCHUR_JACOBI = "SCHUR_JACOBI"


class RobustNorm(enum.Enum):
    NONE = "NONE"
    HUBER = "HUBER"
    CAUCHY = "CAUCHY"


@dataclass
class BalResidualOptions:
    """bal_residual_options.hpp:44-66."""

    robust_norm: RobustNorm = RobustNorm.NONE
    huber_parameter: float = 1.0


@dataclass
class SolverOptions:
    """solver_options.hpp:46-308 (fields not meaningful on TPU, e.g.
    num_threads, are kept for config compatibility but see notes)."""

    solver_type_step_1: SolverType = SolverType.POWER_VARPROJ
    solver_type_step_2: SolverTypeRiemannian = SolverTypeRiemannian.RIPOBA

    verbosity_level: int = 2
    debug: bool = False
    # accepted for config parity; TPU analogue of thread count is the
    # device mesh shape, see povar_tpu.parallel
    num_threads: int = 0

    residual: BalResidualOptions = field(default_factory=BalResidualOptions)

    # pOSE affine-part weight (solver_options.hpp:129; code default 0.01)
    alpha: float = 0.01

    optimized_cost: OptimizedCost = OptimizedCost.ERROR

    max_num_iterations_step_1: int = 50
    max_num_iterations_step_2: int = 50

    min_relative_decrease: float = 0.0

    initial_trust_region_radius: float = 1e4
    min_trust_region_radius: float = 1e-32
    max_trust_region_radius: float = 1e16

    # LM diagonal clamps (reference: only affect its ceres path)
    min_lm_diagonal: float = 1e-6
    max_lm_diagonal: float = 1e32

    min_linear_solver_iterations: int = 0
    max_linear_solver_iterations: int = 500

    # forcing sequence / tolerances (solver_options.hpp:206-218)
    eta: float = 1e-2
    r_tolerance: float = -1.0

    jacobi_scaling: bool = True
    jacobi_scaling_epsilon: float = 0.0

    preconditioner_type: PreconditionerType = PreconditionerType.SCHUR_JACOBI

    # only used in explicit_power_schur in the reference; kept for parity
    power_order: float = 2.0

    function_tolerance: float = 1e-6
    gradient_tolerance: float = 0.0
    parameter_tolerance: float = 0.0

    # power series order (solver_options.hpp:290-292; code default 10)
    power_sc_iterations: int = 10

    initial_vee: float = 2.0
    vee_factor: float = 2.0

    # --- povar_tpu extensions (not in the reference) ---
    # residual reset period for PCG (conjugate_gradient.hpp: Options)
    residual_reset_period: int = 10

    # Run the inner linear-system matvecs (power series / CG) in f32
    # while keeping residuals, gradients, costs, and state updates in
    # f64. The LM forcing tolerance (eta) dominates the inner-solve
    # inexactness, so final-cost parity with the double-precision
    # reference is preserved; on TPU (no native f64) this roughly
    # halves the hot-loop cost. Disable for bitwise-strict f64 solves.
    mixed_precision_solves: bool = True

    # Fused Pallas camera-gather/scatter kernels (ops/pallas_cam.py).
    # "auto": on TPU backends whenever the problem shape supports them
    # (f32 inner solves, <= ~2k cameras); "on": force (interpreter mode
    # off-TPU — slow, for tests); "off": always use the XLA lowering.
    pallas_kernels: str = "auto"

    # Staged execution with per-stage timing: split each LM iteration's
    # fused device programs at the reference's timing boundaries
    # (jacobian eval / scaling / Hll / prepare / solve / back-sub /
    # camera update, solver_summary.hpp:186-212) and sync between
    # stages so the iteration log carries real stage wall times. Costs
    # a few extra dispatches per iteration; disable for maximum
    # throughput (timings then cover the fused calls only).
    detailed_timing: bool = True

    def use_projection_validity_check(self) -> bool:
        """solver_options.cpp:41-52: false iff optimized_cost == ERROR."""
        return self.optimized_cost != OptimizedCost.ERROR

    def effective_jacobi_scaling_epsilon(self, dtype) -> float:
        """linearizor_base.cpp:94-100: explicit epsilon, or sqrt(float eps)."""
        import numpy as np

        if self.jacobi_scaling_epsilon > 0:
            return float(self.jacobi_scaling_epsilon)
        return float(np.sqrt(np.finfo(dtype).eps))


@dataclass
class BalDatasetOptions:
    """bal_dataset_options.hpp:44-97."""

    input: str = ""
    input_type: str = "AUTO"
    save_output: bool = False
    output_optimized_path: str = "optimized.npz"
    normalize: bool = True
    normalization_scale: float = 100.0
    rotation_sigma: float = 0.0
    translation_sigma: float = 0.0
    point_sigma: float = 0.0
    random_seed: int = 38401
    init_depth_threshold: float = 0.0
    quiet: bool = False
    create_dataset: bool = False


@dataclass
class BalAppOptions:
    """bal_app_options.hpp:44-53 aggregate."""

    dataset: BalDatasetOptions = field(default_factory=BalDatasetOptions)
    solver: SolverOptions = field(default_factory=SolverOptions)


_ENUM_FIELDS = {
    "solver_type_step_1": SolverType,
    "solver_type_step_2": SolverTypeRiemannian,
    "optimized_cost": OptimizedCost,
    "preconditioner_type": PreconditionerType,
    "robust_norm": RobustNorm,
}


def _apply_dict(obj: Any, data: Dict[str, Any]) -> None:
    for key, value in data.items():
        if not hasattr(obj, key):
            # tolerate unknown keys like the reference tolerates
            # /batch_run, /slurm (cli/bal_cli_utils.cpp:109-111)
            continue
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _apply_dict(current, value)
        elif key in _ENUM_FIELDS and isinstance(value, str):
            setattr(obj, key, _ENUM_FIELDS[key](value.upper()))
        else:
            setattr(obj, key, type(current)(value) if current is not None else value)


def load_toml(path: str) -> BalAppOptions:
    """Load a reference-style rootba_config.toml
    (cli/bal_cli_utils.cpp:51-130 config layering: defaults <- toml)."""
    import tomllib

    with open(path, "rb") as f:
        data = tomllib.load(f)
    opts = BalAppOptions()
    if "dataset" in data:
        _apply_dict(opts.dataset, data["dataset"])
    if "solver" in data:
        _apply_dict(opts.solver, data["solver"])
    return opts


def options_to_dict(obj: Any) -> Dict[str, Any]:
    """Recursively dump options to plain dicts (for --dump-config and logs)."""
    out: Dict[str, Any] = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            out[f.name] = options_to_dict(v)
        elif isinstance(v, enum.Enum):
            out[f.name] = v.value
        else:
            out[f.name] = v
    return out
