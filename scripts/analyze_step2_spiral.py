#!/usr/bin/env python3
"""Root-cause evidence for the venice-89 poBA->RIPCG step-2 tail
(docs/results-venice89: every combo ends NO_CONVERGENCE; the
power_schur_complement-ripcg run showed a post-convergence reject
spiral with NaN trial costs from iteration ~38).

Reproduces the scenario in three executions on the SAME start state
(the step-1 POWER_SCHUR_COMPLEMENT final at venice-89 scale,
homogenized — exactly what gen_solver_matrix.py feeds step 2):

  1. the Eigen f64 reference harness (csrc/ref_step2_solver.cpp,
     RIPCG mode) — the reference's own math;
  2. the framework in pure f64 (harness-comparable mode);
  3. the framework in production mixed precision (f64 LM state,
     f32 inner solves) — the solver-matrix configuration.

Writes a JSON side-by-side of the three trajectories' tails
(accept/valid decisions, lambda schedule, where/if NaN trial costs
appear) to the --out path. See docs/results-venice89/README.md for
the written analysis of the result.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from povar_tpu.options import (  # noqa: E402
    SolverOptions,
    SolverType,
    SolverTypeRiemannian,
)
from povar_tpu.problem.bal_io import (  # noqa: E402
    write_state_dump_homogeneous,
)
from povar_tpu.problem.synthetic import (  # noqa: E402
    synthetic_bal_problem_fast,
)
from povar_tpu.solver.lm import optimize_step1, optimize_step2  # noqa: E402
from povar_tpu.solver.stage1 import Stage1Solver  # noqa: E402
from povar_tpu.solver.stage2 import (  # noqa: E402
    Stage2Solver,
    create_homogeneous,
)
from povar_tpu.utils.summary import SolverSummary  # noqa: E402
from povar_tpu.utils.timer import Timer  # noqa: E402

HARNESS2 = os.path.join(REPO, "csrc", "ref_step2_solver")


def _summary_rows(summary):
    rows = []
    for it in summary.iterations:
        rows.append(
            {
                "it": it.iteration,
                "cost": it.cost.all.error if it.cost else None,
                "accept": bool(it.step_is_successful),
                "valid": bool(it.step_is_valid),
                "trust_region_radius": it.trust_region_radius,
            }
        )
    return rows


def run_framework_step2(problem, cams_h, lms_h, mixed, max_iters):
    opts = SolverOptions()
    opts.mixed_precision_solves = mixed
    opts.pallas_kernels = "off"
    opts.max_num_iterations_step_2 = max_iters
    opts.solver_type_step_2 = SolverTypeRiemannian.RIPCG
    s2 = Stage2Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
        dtype=jnp.float64,
    )
    summary = SolverSummary()
    t0 = time.perf_counter()
    optimize_step2(
        s2, jnp.asarray(cams_h), jnp.asarray(lms_h), opts, summary,
        Timer(), log=lambda s: None,
    )
    return _summary_rows(summary), time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default="docs/results-venice89/step2-spiral-analysis.json"
    )
    ap.add_argument("--n-cams", type=int, default=89)
    ap.add_argument("--n-lms", type=int, default=110_973)
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--skip-harness", action="store_true")
    args = ap.parse_args()

    problem = synthetic_bal_problem_fast(
        args.n_cams, args.n_lms, 5, seed=0
    )

    # --- step 1: poBA to its 50-iteration final (pure f64, the
    # harness-comparable mode; the solver matrix ran mixed precision,
    # which tracks this trajectory to ~1e-3 relative)
    opts1 = SolverOptions()
    opts1.mixed_precision_solves = False
    opts1.pallas_kernels = "off"
    opts1.solver_type_step_1 = SolverType.POWER_SCHUR_COMPLEMENT
    opts1.max_num_iterations_step_1 = args.max_iters
    s1 = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts1,
        dtype=jnp.float64,
    )
    sum1 = SolverSummary()
    t0 = time.perf_counter()
    cams, lms = optimize_step1(
        s1, jnp.asarray(problem.cam_space, jnp.float64),
        jnp.asarray(problem.lm_p, jnp.float64), opts1, sum1, Timer(),
        log=lambda s: None,
    )
    print(
        f"step1 poBA: {len(sum1.iterations)} its, final "
        f"{sum1.final_cost.all.error:.6e}, {time.perf_counter()-t0:.0f}s",
        flush=True,
    )

    cams_h, lms_h = create_homogeneous(cams, lms)

    out = {
        "config": {
            "n_cams": args.n_cams, "n_lms": args.n_lms,
            "step1": "power_schur_complement (pure f64)",
            "step2": "ripcg", "max_iters": args.max_iters,
        },
        "step1_final_cost": sum1.final_cost.all.error,
    }

    # --- 1. the reference's math (Eigen f64 harness)
    if not args.skip_harness:
        subprocess.run(
            ["make", "-C", os.path.join(REPO, "csrc"),
             "ref_step2_solver"],
            check=True, capture_output=True,
        )
        state2 = "/tmp/state2_spiral.txt"
        write_state_dump_homogeneous(
            np.asarray(cams_h), np.asarray(lms_h),
            problem.obs_lm, problem.obs_cam, problem.obs_uv, state2,
            max_iters=args.max_iters,
        )
        t0 = time.perf_counter()
        r = subprocess.run(
            [HARNESS2, state2, "ripcg"], capture_output=True,
            timeout=7200,
        )
        r.check_returncode()
        ref = json.loads(r.stdout.decode())
        out["reference_harness"] = {
            "iterations": ref["iterations"],
            "final_cost": ref["final_cost"],
            "wall_s": time.perf_counter() - t0,
        }
        print(
            f"harness ripcg: {len(ref['iterations'])} its, final "
            f"{ref['final_cost']:.6e}, {out['reference_harness']['wall_s']:.0f}s",
            flush=True,
        )

    # --- 2. framework pure f64
    rows, wall = run_framework_step2(
        problem, cams_h, lms_h, mixed=False, max_iters=args.max_iters
    )
    out["framework_f64"] = {"iterations": rows, "wall_s": wall}
    print(
        f"framework f64: {len(rows)} its, last cost {rows[-1]['cost']}",
        flush=True,
    )

    # --- 3. framework mixed precision (production / solver-matrix mode)
    rows, wall = run_framework_step2(
        problem, cams_h, lms_h, mixed=True, max_iters=args.max_iters
    )
    out["framework_mixed"] = {"iterations": rows, "wall_s": wall}
    print(
        f"framework mixed: {len(rows)} its, last cost {rows[-1]['cost']}",
        flush=True,
    )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
