#!/usr/bin/env python3
"""Generate the venice-89 solver-matrix results artifact.

Runs the FULL step-1 x step-2 solver surface — all four step-1 solvers
(POWER_VARPROJ, POWER_SCHUR_COMPLEMENT, PCG, CHOLESKY;
solver_options.hpp:60-69) crossed with both step-2 solvers (RIPOBA,
RIPCG) — to CONVERGENCE (reference defaults: <=50 LM iterations per
step with function_tolerance termination) on one chip, writing
reference-style run directories (status.log protocol, output.log,
ba_log.json) and regenerating the report, whose tables rank solvers by
time-to-cost-tolerance like python/rootba/latex/performance_profiles.py.

Usage:
  python scripts/gen_solver_matrix.py [--out docs/results-venice89] \
      [--quick]   (--quick: 5/5 iterations, smoke only)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from povar_tpu.options import (  # noqa: E402
    SolverOptions,
    SolverType,
    SolverTypeRiemannian,
)
from povar_tpu.problem.synthetic import (  # noqa: E402
    synthetic_bal_problem_fast,
)
from povar_tpu.solver.pipeline import bundle_adjust  # noqa: E402
from povar_tpu.utils import ba_log  # noqa: E402
from povar_tpu.problem.problem import DatasetSummary  # noqa: E402

STEP1 = {
    "power_varproj": SolverType.POWER_VARPROJ,
    "power_schur_complement": SolverType.POWER_SCHUR_COMPLEMENT,
    "pcg": SolverType.PCG,
    "cholesky": SolverType.CHOLESKY,
}
STEP2 = {
    "ripoba": SolverTypeRiemannian.RIPOBA,
    "ripcg": SolverTypeRiemannian.RIPCG,
}


def run_combo(problem_args, s1_name, s2_name, run_dir, max_it):
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "status.log"), "w") as f:
        f.write("Created\n")
    problem = synthetic_bal_problem_fast(*problem_args, seed=0)
    opts = SolverOptions()
    opts.solver_type_step_1 = STEP1[s1_name]
    opts.solver_type_step_2 = STEP2[s2_name]
    opts.max_num_iterations_step_1 = max_it
    opts.max_num_iterations_step_2 = max_it
    opts.detailed_timing = True  # per-stage spans in the log

    lines = []

    def log(s):
        lines.append(s)

    t0 = time.perf_counter()
    problem, sum1, sum2 = bundle_adjust(problem, opts, log=log)
    total = time.perf_counter() - t0
    with open(os.path.join(run_dir, "output.log"), "w") as f:
        f.write("\n".join(lines) + "\n")
    ds = problem.summarize(compute_sparsity=True)
    ds.type = "synthetic"
    ds.input_path = problem.input_path
    ba_log.save_json(
        os.path.join(run_dir, "ba_log.json"),
        ds,
        sum1,
        sum2,
        timing={"total": total, "optimize_time": total},
    )
    with open(os.path.join(run_dir, "status.log"), "a") as f:
        f.write("Completed\n")
    print(
        f"{s1_name}-{s2_name}: step1 {sum1.final_cost.all.error:.4e} "
        f"({len(sum1.iterations)} its, {sum1.termination_type}), "
        f"step2 {sum2.final_cost.all.error:.4e} "
        f"({len(sum2.iterations)} its, {sum2.termination_type}), "
        f"wall {total:.0f}s"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/results-venice89")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    max_it = 5 if args.quick else 50
    problem_args = (89, 110_973, 5)

    for s1 in STEP1:
        for s2 in STEP2:
            name = f"{s1}-{s2}"
            if args.only and args.only not in name:
                continue
            run_dir = os.path.join(args.out, "runs", name, "venice-89")
            run_combo(problem_args, s1, s2, run_dir, max_it)


if __name__ == "__main__":
    main()
