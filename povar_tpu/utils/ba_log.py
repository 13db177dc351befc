"""ba_log.json writer with the reference's schema.

Mirrors BaLog (bal/ba_log.hpp:54-273) + log_summary (ba_log_utils.cpp)
so the reference's offline Python tooling (python/rootba/log.py, the
tables/plots generators) consumes our logs unchanged: sections
`problem_info`, `timing`, `solver`/`solver1`, `iterations{1,2}` with the
same field names per iteration.
"""

from __future__ import annotations

import json
from typing import List, Optional

from povar_tpu.problem.problem import DatasetSummary
from povar_tpu.utils.summary import IterationSummary, SolverSummary


def _stats(summary: DatasetSummary) -> dict:
    return {
        "mean": summary.per_lm_obs_mean,
        "min": summary.per_lm_obs_min,
        "max": summary.per_lm_obs_max,
        "stddev": summary.per_lm_obs_stddev,
    }


def _iteration_record(it: IterationSummary) -> dict:
    """BaIteration fields (ba_log.hpp:147-245 + ba_log_utils.cpp copy)."""
    cost = it.cost
    rec = {
        "iteration": it.iteration,
        "linear_solver_type": it.linear_solver_type,
        "step_is_valid": it.step_is_valid,
        "step_is_nonmonotonic": False,
        "step_is_successful": it.step_is_successful,
        "num_obs": cost.all.num_obs if cost else 0,
        "num_obs_valid": cost.valid.num_obs if cost else 0,
        "cost": cost.all.error if cost else 0.0,
        "cost_valid": cost.valid.error if cost else 0.0,
        "cost_avg_valid": cost.valid.error_avg() if cost else 0.0,
        "residual_block_mean": cost.all.residual_mean() if cost else 0.0,
        "residual_block_valid_mean": (
            cost.valid.residual_mean() if cost else 0.0
        ),
        "relative_decrease": it.relative_decrease,
        "trust_region_radius": it.trust_region_radius,
        "linear_solver_iterations": it.linear_solver_iterations,
        "iteration_time": it.iteration_time_in_seconds,
        "cumulative_time": it.cumulative_time_in_seconds,
        "step_solver_time": it.step_solver_time_in_seconds,
        "residual_evaluation_time": it.residual_evaluation_time_in_seconds,
        "jacobian_evaluation_time": it.jacobian_evaluation_time_in_seconds,
        "scale_landmark_jacobian_time": (
            it.scale_landmark_jacobian_time_in_seconds
        ),
        "scale_pose_jacobian_time": it.scale_pose_jacobian_time_in_seconds,
        "landmark_damping_time": it.landmark_damping_time_in_seconds,
        "prepare_time": it.prepare_time_in_seconds,
        "solve_reduced_system_time": (
            it.solve_reduced_system_time_in_seconds
        ),
        "back_substitution_time": it.back_substitution_time_in_seconds,
        "update_cameras_time": it.update_cameras_time_in_seconds,
        "stage1_time": it.stage1_time_in_seconds,
        "stage2_time": it.stage2_time_in_seconds,
        "perform_qr_time": it.perform_qr_time_in_seconds,
        "compute_preconditioner_time": (
            it.compute_preconditioner_time_in_seconds
        ),
        "resident_memory": it.resident_memory,
        "resident_memory_peak": it.resident_memory_peak,
    }
    return rec


def _solver_record(s: SolverSummary) -> dict:
    """BaSolver (ba_log.hpp:107-145)."""
    return {
        "solver_type": s.solver_type,
        "termination_type": s.termination_type,
        "message": s.message,
        "num_successful_steps": s.num_successful_steps,
        "num_unsuccessful_steps": s.num_unsuccessful_steps,
        "logging_time_in_seconds": s.logging_time_in_seconds,
        "preprocessor_time_in_seconds": s.preprocessor_time_in_seconds,
        "minimizer_time_in_seconds": s.minimizer_time_in_seconds,
        "postprocessor_time_in_seconds": s.postprocessor_time_in_seconds,
        "total_time_in_seconds": s.total_time_in_seconds,
        "linear_solver_time_in_seconds": s.linear_solver_time_in_seconds,
        "num_linear_solves": s.num_linear_solves,
        "residual_evaluation_time_in_seconds": (
            s.residual_evaluation_time_in_seconds
        ),
        "num_residual_evaluations": s.num_residual_evaluations,
        "jacobian_evaluation_time_in_seconds": (
            s.jacobian_evaluation_time_in_seconds
        ),
        "num_jacobian_evaluations": s.num_jacobian_evaluations,
        "num_threads_given": s.num_threads_given,
        "num_threads_used": s.num_threads_used,
        "num_threads_available": s.num_threads_available,
        "resident_memory_peak": s.resident_memory_peak,
    }


def save_json(
    path: str,
    dataset_summary: DatasetSummary,
    summary_step1: SolverSummary,
    summary_step2: Optional[SolverSummary] = None,
    timing: Optional[dict] = None,
    save_ubjson: bool = False,
    device_memory: Optional[dict] = None,
) -> None:
    """Write the combined log (ba_log.cpp save_json:60-150; the
    reference logs step-2 under `solver`/`iterations` and step-1 under
    `solver1`/`iterations1` because step 2 finishes last)."""
    timing = timing or {}
    log = {
        "problem_info": {
            "type": dataset_summary.type,
            "input_path": dataset_summary.input_path,
            "num_cameras": dataset_summary.num_cameras,
            "num_landmarks": dataset_summary.num_landmarks,
            "num_observations": dataset_summary.num_observations,
            "rcs_sparsity": dataset_summary.rcs_sparsity,
            "per_lm_obs": _stats(dataset_summary),
            "per_host_lms": {
                "mean": 0.0, "min": 0.0, "max": 0.0, "stddev": 0.0
            },
        },
        "timing": {
            "total": timing.get("total", 0.0),
            "load": timing.get("load_time", 0.0),
            "preprocess": timing.get("preprocess_time", 0.0),
            "optimize": timing.get("optimize_time", 0.0),
            "postprocess": timing.get("postprocess_time", 0.0),
        },
        "solver1": _solver_record(summary_step1),
        "iterations1": [
            _iteration_record(it) for it in summary_step1.iterations
        ],
    }
    if summary_step2 is not None:
        log["solver"] = _solver_record(summary_step2)
        log["iterations"] = [
            _iteration_record(it) for it in summary_step2.iterations
        ]
    if device_memory:
        # device-side memory view the reference lacks (its RSS sampling
        # is host-only, system_utils.cpp:52-89)
        log["device_memory"] = device_memory
    with open(path, "w") as f:
        json.dump(log, f, indent=1)
    if save_ubjson:
        from povar_tpu.utils import ubjson

        ub_path = path[: -len(".json")] + ".ubjson" if path.endswith(
            ".json"
        ) else path + ".ubjson"
        with open(ub_path, "wb") as f:
            f.write(ubjson.dumps(log))
