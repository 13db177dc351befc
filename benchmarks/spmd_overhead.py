"""SPMD layout overhead on ONE chip: the cost of the uniformized
sharded layout relative to the plain single-chip windowed path.

Multi-chip hardware is unavailable in CI (one real TPU), so the
multi-chip claim decomposes into (a) this measurement — a 1-device
mesh runs the EXACT sharded program (clone layout, combine reduces,
psum that degenerates to a copy) against the tuned single-chip
windowed solver on the same problem — and (b) the jaxpr-verified
communication pattern (tests/test_spmd.py): per-camera accumulators
and scalars only, [144,N] f32 per power term, microseconds on ICI.
n-chip time ≈ (single-chip time x overhead) / n + collectives.

The two phases run in SEPARATE subprocesses: measuring them in one
process contaminates the second phase (live executables + device
arrays from the first phase were measured inflating the SPMD iteration
~30x). Syncs happen on replicated scalars only — `block_until_ready`
on a sharded (NamedSharding) output takes seconds per call on the
tunneled platform.

Usage: python benchmarks/spmd_overhead.py [--cams 1778] [--lms 993923]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from povar_tpu.options import SolverOptions  # noqa: E402
from povar_tpu.ops.pallas_pose import PART_ALIGN  # noqa: E402
from povar_tpu.parallel.spmd import (  # noqa: E402
    build_spmd_plan,
    get_spmd_solver_classes,
)
from povar_tpu.problem.synthetic import (  # noqa: E402
    synthetic_bal_problem_fast,
)
from povar_tpu.solver.stage1 import Stage1Solver  # noqa: E402


def _time_steps(step, state, lam, reps):
    c, l = state
    # warm up THREE iterations, synced: beyond compilation, the first
    # 1-2 EXECUTIONS of a freshly loaded sharded program take tens of
    # seconds on the tunneled platform (measured: reps 0-1 at 57s/43s,
    # rep 2+ steady at ~0.29s) — timing must start in steady state
    for _ in range(3):
        c, l, e = step(c, l, lam)
        _ = float(np.asarray(e))
    t0 = time.perf_counter()
    for _ in range(reps):
        c, l, e = step(c, l, lam)
    _ = float(np.asarray(e))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=1778)
    ap.add_argument("--lms", type=int, default=993_923)
    ap.add_argument("--obs-per-lm", type=int, default=5)
    ap.add_argument("--locality", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--phase", choices=["plain", "spmd"], default=None,
        help="run one measurement phase (default: both, each in its "
        "own subprocess, then print the ratio)",
    )
    args = ap.parse_args()

    if args.phase is None:
        import re
        import subprocess
        import sys

        times = {}
        for phase in ("plain", "spmd"):
            out = subprocess.run(
                [sys.executable, __file__, "--phase", phase,
                 "--cams", str(args.cams), "--lms", str(args.lms),
                 "--obs-per-lm", str(args.obs_per_lm),
                 "--locality", str(args.locality),
                 "--reps", str(args.reps)],
                capture_output=True, text=True, check=True,
            ).stdout
            print(out, end="")
            m = re.search(r"(?:windowed|1 dev\)): ([0-9.]+) ms", out)
            times[phase] = float(m.group(1))
        r = times["spmd"] / times["plain"]
        print(f"layout overhead: {r:.3f}x "
              f"(n-chip speedup estimate ~ n / {r:.3f})")
        return

    problem = synthetic_bal_problem_fast(
        args.cams, args.lms, args.obs_per_lm, seed=0,
        locality=args.locality,
    )
    opts = SolverOptions()
    opts.power_sc_iterations = 10
    opts.eta = 0.0
    opts.r_tolerance = -1.0

    run_plain = args.phase == "plain"
    # plain single-chip windowed solver
    if run_plain:
        _measure_plain(problem, opts, args)
    else:
        _measure_spmd(problem, opts, args)


def _measure_plain(problem, opts, args):
    plain = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    assert plain.n_win > 0, "expected the windowed path"
    cams = jnp.asarray(problem.cam_space)
    lam = jnp.asarray(1e-4, jnp.float64)

    def step_plain(c, l, la):
        lin = plain.linearize(c, l)
        inc, _ = plain.solve_power(lin, la)
        nc, nl, _ld = plain.apply(c, l, lin, inc)
        err = plain.compute_error(nc, nl)
        return nc, nl, err["error_all"]

    # thread the landmark state in L space, like the LM driver
    lms0 = plain.lm_pack(plain.initialize_varproj(cams))
    t_plain = _time_steps(step_plain, (cams, lms0), lam, args.reps)
    print(f"plain windowed: {t_plain * 1e3:.1f} ms/iter "
          f"({problem.num_observations / t_plain / 1e6:.1f} Mobs/s)")


def _measure_spmd(problem, opts, args):
    cams = jnp.asarray(problem.cam_space)
    lam = jnp.asarray(1e-4, jnp.float64)
    # 1-device-mesh SPMD solver (same chip, sharded program)
    t0 = time.perf_counter()
    plan = build_spmd_plan(
        problem.obs_cam, problem.obs_lm, problem.num_cameras,
        problem.num_landmarks, 1, PART_ALIGN,
    )
    print(f"spmd plan build: {time.perf_counter() - t0:.1f}s, "
          f"util {plan.lane_utilization:.3f}")
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("obs",))
    S1, _ = get_spmd_solver_classes()
    spmd = S1(
        plan, problem.obs_uv, problem.num_cameras,
        problem.num_landmarks, opts, mesh,
    )

    def step_spmd(c, l, la):
        lin = spmd.linearize(c, l)
        inc, _ = spmd.solve_power(lin, la)
        nc, nl, _ld = spmd.apply(c, l, lin, inc)
        err = spmd.compute_error(nc, nl)
        return nc, nl, err["error_all"]

    # thread the landmark state in L space, like the LM driver
    lms0s = spmd.lm_pack(spmd.initialize_varproj(cams))
    t_spmd = _time_steps(step_spmd, (cams, lms0s), lam, args.reps)
    print(f"spmd layout (1 dev): {t_spmd * 1e3:.1f} ms/iter "
          f"({problem.num_observations / t_spmd / 1e6:.1f} Mobs/s)")


if __name__ == "__main__":
    main()
