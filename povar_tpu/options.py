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
    num_threads, are kept for config compatibility but see notes).

    Deliberately NOT ported (reference TOML configs containing them
    still load — unknown keys are tolerated by load_config):
    check_gradients / gradient_check_relative_precision /
    gradient_check_numeric_derivative_relative_step_size
    (solver_options.hpp:260-264, ceres-only debug switches; the
    equivalent coverage here is tests/test_pose_math.py's
    finite-difference Jacobian checks) and jp_t_jl_on_the_fly /
    reallocate_cache (solver_options.hpp:282-283, experimental C++
    landmark-block allocator knobs with no XLA analogue — buffer
    layout is the compiler's job)."""

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

    # Fully fused power-series E0 term (ops/pallas_pose.e0_term_parts):
    # one kernel per slot-width part computes gather, per-landmark
    # reduce, re-expand AND scatter of a power term in a single pass
    # (the composed three-step pipeline pays two extra kernel launches
    # per obs tile plus an HBM round trip per term). Applies on the
    # small-N structured path when the slot parts are narrow enough
    # to unroll; wide-part suffixes fall back to the composed kernels.
    fused_power_term: bool = True

    # Whole-solve-on-device LM driver: run the ENTIRE trust-region loop
    # (linearize, trial, accept/reject, vee damping, ftol / lambda-max
    # termination) as ONE lax.while_loop executable, returning the
    # final state plus per-iteration trace arrays from which the host
    # reconstructs the iteration log. Removes every per-iteration
    # host<->device round trip (the host loop pays ~4-8 scalar syncs +
    # 2 dispatches per trial — more wall time than the trial itself on
    # remote/tunneled backends). The control flow is the same IEEE-f64
    # arithmetic as the host loop; trajectories are decision-identical
    # with values tracking to fusion-context rounding (~1 ulp per
    # iteration; tests/test_device_loop.py).
    # "auto": used whenever the fused trial is available and per-stage
    # timing is off; "on": require it (error if unsupported); "off":
    # host-driven loop. The reference has no analogue (its driver is a
    # CPU loop, bal_bundle_adjustment.cpp:252-542); this is the
    # TPU-native expression of the same algorithm.
    device_lm_loop: str = "auto"

    # Staged execution with per-stage timing: split each LM iteration's
    # fused device programs at the reference's timing boundaries
    # (jacobian eval / scaling / Hll / prepare / solve / back-sub /
    # camera update, solver_summary.hpp:186-212) and sync between
    # stages so the iteration log carries real stage wall times. Unlike
    # the reference's nanosecond timing macros (linearizor_base.cpp:
    # 42-44), staging costs real dispatches + a device sync per stage
    # (~10 extra syncs/iteration — larger than a whole venice-89
    # iteration on tunneled backends), so the default is the fused
    # maximum-throughput path; experiments that want the per-stage
    # schema opt in (tools/experiments sets it, or --detailed-timing).
    detailed_timing: bool = False

    def use_projection_validity_check(self) -> bool:
        """solver_options.cpp:41-52: false iff optimized_cost == ERROR."""
        return self.optimized_cost != OptimizedCost.ERROR

    def device_loop_cache_token(self) -> str:
        """Cache key for the compiled whole-solve device LM loop:
        every option the loop bakes into the executable as a constant
        (solver/device_loop.py)."""
        return repr((
            self.function_tolerance,
            self.min_relative_decrease,
            self.vee_factor,
            self.initial_vee,
            self.initial_trust_region_radius,
            self.min_trust_region_radius,
            self.max_trust_region_radius,
            self.optimized_cost.value,
            self.solver_type_step_1.value,
            self.solver_type_step_2.value,
        ))

    def effective_jacobi_scaling_epsilon(self, dtype) -> float:
        """linearizor_base.cpp:94-100: explicit epsilon, or
        Sophus::Constants<Scalar>::epsilonSqrt() — sqrt(1e-10) = 1e-5
        for double, sqrt(1e-5) for float (Sophus common.hpp constants,
        NOT the machine epsilon; the reference's help text says
        'floating point epsilon' but the code calls Sophus)."""
        import numpy as np

        if self.jacobi_scaling_epsilon > 0:
            return float(self.jacobi_scaling_epsilon)
        return sophus_epsilon_sqrt(dtype)


def sophus_epsilon_sqrt(dtype) -> float:
    """Sophus::Constants<Scalar>::epsilonSqrt(): sqrt(1e-10) for double,
    sqrt(1e-5f) for float (Sophus common.hpp). Used by the reference for
    jacobi-scaling epsilon (linearizor_base.cpp:94-100) and the
    projection validity z-threshold (bal_camera.hpp:147)."""
    import numpy as np

    if np.dtype(dtype) == np.float32:
        return float(np.sqrt(np.float32(1e-5)))
    return float(np.sqrt(1e-10))


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


# Per-field (range, help) metadata — the visitable-options meta the
# reference attaches with VISITABLE_META(..., init().range().help())
# (options/options_interface.hpp:80-120; ranges/help text from
# solver_options.hpp:95-308, bal_residual_options.hpp:44-66,
# bal_dataset_options.hpp:44-97). `range` is an inclusive (lo, hi) or
# None when the reference declares no range.
OPTION_META: Dict[type, Dict[str, tuple]] = {
    SolverOptions: {
        "solver_type_step_1": (None, "linear solver for step 1 (pOSE "
                               "VarProj): POWER_VARPROJ, "
                               "POWER_SCHUR_COMPLEMENT, PCG, CHOLESKY"),
        "solver_type_step_2": (None, "linear solver for step 2 "
                               "(Riemannian): RIPOBA, RIPCG"),
        "verbosity_level": ((0, 2), "output verbosity level; 0: "
                            "silent, 1: brief, 2: full"),
        "num_threads": ((0, 1000), "accepted for config parity; the "
                        "TPU analogue is the device mesh size "
                        "(--mesh-devices)"),
        "alpha": ((0.0, 1.0), "weight in front of the affine part of "
                  "the pOSE cost"),
        "optimized_cost": (None, "which cost the LM accept/reject and "
                           "termination decisions use"),
        "max_num_iterations_step_1": ((0, 10000), "maximum LM "
                                      "iterations for pOSE step"),
        "max_num_iterations_step_2": ((0, 10000), "maximum LM "
                                      "iterations for joint "
                                      "homogeneous step"),
        "min_relative_decrease": (None, "lower bound on the relative "
                                  "decrease before a step is rejected"),
        "initial_trust_region_radius": ((1e-10, 1e16), "determines the "
                                        "initial damping"),
        "min_trust_region_radius": ((1e-32, 1e16), "terminate when the "
                                    "trust region radius falls below "
                                    "this"),
        "max_trust_region_radius": ((1e-16, 1e16), "defines the "
                                    "minimum damping always added"),
        "min_lm_diagonal": ((1e-32, 1.0), "ceres-path LM diagonal "
                            "clamp (kept for parity)"),
        "max_lm_diagonal": ((1.0, 1e32), "ceres-path LM diagonal "
                            "clamp (kept for parity)"),
        "min_linear_solver_iterations": ((0, 100000), "minimum inner "
                                         "solver iterations"),
        "max_linear_solver_iterations": ((0, 100000), "maximum inner "
                                         "solver iterations"),
        "eta": (None, "forcing-sequence parameter: per-solve relative "
                "decrease of the q model (power series / CG)"),
        "r_tolerance": (None, "residual tolerance for the inner solve "
                        "(negative disables)"),
        "jacobi_scaling": (None, "scale Jacobian columns by "
                           "1/(eps + column norm)"),
        "jacobi_scaling_epsilon": ((0.0, 1.0), "epsilon for Jacobi "
                                   "scaling; 0 means sqrt(float eps)"),
        "preconditioner_type": (None, "preconditioner for PCG: "
                                "IDENTITY, JACOBI, SCHUR_JACOBI"),
        "power_order": (None, "only used in explicit power Schur "
                        "(kept for parity)"),
        "function_tolerance": ((0.0, 1.0), "terminate when "
                               "|new_cost - old_cost| < "
                               "function_tolerance * old_cost"),
        "gradient_tolerance": (None, "only for the ceres path (kept "
                               "for parity)"),
        "parameter_tolerance": (None, "only for the ceres path (kept "
                                "for parity)"),
        "power_sc_iterations": ((0, 1000), "number of power-series "
                                "terms (inner iterations) of the "
                                "power Schur complement"),
        "initial_vee": ((1.0, 100.0), "initial decrease factor for "
                        "trust-region backtracking"),
        "vee_factor": ((1.0, 100.0), "growth of the decrease factor "
                       "during backtracking"),
        "residual_reset_period": ((1, 10000), "recompute the true CG "
                                  "residual every this many "
                                  "iterations"),
        "mixed_precision_solves": (None, "run inner matvecs in f32 "
                                   "under the f64 LM loop (TPU has no "
                                   "native f64)"),
        "pallas_kernels": (None, "fused Pallas kernels: auto, on, off"),
        "device_lm_loop": (None, "whole-solve-on-device LM driver: "
                           "auto, on, off"),
        "fused_power_term": (None, "single-kernel fused power-series "
                             "E0 term on the small-N structured path"),
        "detailed_timing": (None, "staged execution with per-stage "
                            "wall times in the iteration log"),
    },
    BalResidualOptions: {
        "robust_norm": (None, "robust norm: NONE, HUBER, CAUCHY"),
        "huber_parameter": ((0.0, 10.0), "huber parameter for robust "
                            "norm, in pixels"),
    },
    BalDatasetOptions: {
        "input": (None, "path to the input BAL problem"),
        "input_type": (None, "input format: AUTO, BAL, ECCV"),
        "save_output": (None, "save the optimized problem"),
        "output_optimized_path": (None, "path for the optimized "
                                  "problem (npz)"),
        "normalize": (None, "median+MAD normalize the map"),
        "normalization_scale": ((1e-6, 1e6), "target scale of the "
                                "normalized map"),
        "rotation_sigma": ((0.0, 1e3), "stddev of camera rotation "
                           "perturbation"),
        "translation_sigma": ((0.0, 1e3), "stddev of camera "
                              "translation perturbation"),
        "point_sigma": ((0.0, 1e3), "stddev of landmark perturbation"),
        "random_seed": (None, "seed for dataset randomization"),
        "init_depth_threshold": ((0.0, 1e6), "drop observations with "
                                 "initial depth below this"),
        "quiet": (None, "suppress dataset loading output"),
        "create_dataset": (None, "randomize cameras, write "
                           "data_custom/<name>, and exit"),
    },
}


def option_meta(cls: type, name: str):
    """(range, help) for a field, or (None, None)."""
    return OPTION_META.get(cls, {}).get(name, (None, None))


def validate_options(obj: Any, prefix: str = "") -> list:
    """Range-check every field against OPTION_META (the reference
    enforces these via pprint_value range asserts in its options
    visitors). Returns a list of violation messages."""
    errors = []
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        label = f"{prefix}{f.name}"
        if dataclasses.is_dataclass(v):
            errors += validate_options(v, prefix=label + ".")
            continue
        rng, _help = option_meta(type(obj), f.name)
        if rng is not None and isinstance(v, (int, float)):
            lo, hi = rng
            if not (lo <= v <= hi):
                errors.append(
                    f"{label} = {v!r} outside valid range "
                    f"[{lo}, {hi}]"
                )
    return errors


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


def _toml_value(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)  # repr round-trips floats exactly
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    raise TypeError(f"cannot TOML-serialize {type(v)}")


def options_to_toml(opts: "BalAppOptions") -> str:
    """Serialize options as a reloadable rootba_config.toml — the
    reference's --dump-config prints its effective config in the same
    format it loads (bal_cli_utils.cpp:118-126 via options._print), so
    dump -> rerun round-trips. load_toml(dump(opts)) == opts is pinned
    by test_io.test_dump_config_toml_roundtrip."""
    lines: list = []

    def emit(d: Dict[str, Any], prefix: str):
        scalars = {k: v for k, v in d.items() if not isinstance(v, dict)}
        tables = {k: v for k, v in d.items() if isinstance(v, dict)}
        if prefix:
            lines.append(f"[{prefix}]")
        for k, v in scalars.items():
            lines.append(f"{k} = {_toml_value(v)}")
        for k, v in tables.items():
            lines.append("")
            emit(v, f"{prefix}.{k}" if prefix else k)

    d = options_to_dict(opts)
    first = True
    for section, body in d.items():
        if not first:
            lines.append("")
        first = False
        if isinstance(body, dict):
            emit(body, section)
        else:
            lines.append(f"{section} = {_toml_value(body)}")
    return "\n".join(lines) + "\n"
