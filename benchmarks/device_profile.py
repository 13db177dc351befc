"""On-device kernel-time attribution for the venice-89 LM iteration.

Tunnel-based host timing cannot attribute time across stages (~30 ms
dispatch latency dwarfs most stages), so this captures a real
jax.profiler trace ON the device and aggregates per-op device time
from the trace events — the numbers PERFORMANCE.md's budget table
cites (VERDICT r2 weak #3 / next #5).

Usage:
  python benchmarks/device_profile.py [--stage2] [--reps N]

Prints a table of (op-name bucket, device ms, %), the total device
time per iteration, and the HBM-roofline floor for comparison.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import tempfile
import time
from collections import defaultdict

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from povar_tpu.options import SolverOptions  # noqa: E402
from povar_tpu.problem.synthetic import (  # noqa: E402
    synthetic_bal_problem_fast,
)

N_CAMS, N_LMS, OBS = 89, 110_973, 5


def _bucket(name: str) -> str:
    """Group raw HLO op names into readable buckets."""
    n = name.lower()
    for key in (
        "prepare", "hpp_b", "e0_u", "e0_scatter", "e0_factor",
        "ldiff", "poba", "error", "custom-call", "fusion", "copy",
        "dot", "reduce", "transpose", "convert", "scatter", "gather",
        "dynamic", "broadcast", "iota", "select", "concatenate",
    ):
        if key in n:
            return key
    return n.split(".")[0][:40]


def _device_events(trace_dir):
    """Yield (name, dur_us) for device-track complete events from the
    captured chrome trace."""
    paths = glob.glob(
        os.path.join(
            trace_dir, "plugins", "profile", "*", "*.trace.json.gz"
        )
    )
    assert paths, f"no trace found under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device pids: process names containing 'TPU' or 'device'
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "").lower()
            if "tpu" in pname or ("xla" in pname and "host" not in pname):
                dev_pids.add(e["pid"])
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            yield e.get("name", "?"), float(e.get("dur", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage2", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    problem = synthetic_bal_problem_fast(N_CAMS, N_LMS, OBS, seed=0)
    opts = SolverOptions()
    opts.power_sc_iterations = 10
    opts.eta = 0.0
    opts.r_tolerance = -1.0

    if args.stage2:
        from povar_tpu.solver.stage1 import Stage1Solver
        from povar_tpu.solver.stage2 import (
            Stage2Solver,
            create_homogeneous,
        )

        s1 = Stage1Solver(
            problem.obs_cam, problem.obs_lm, problem.obs_uv,
            N_CAMS, N_LMS, opts,
        )
        cams = jnp.asarray(problem.cam_space)
        lms = s1.initialize_varproj(cams)
        cams, lms_h = create_homogeneous(cams, lms)
        solver = Stage2Solver(
            problem.obs_cam, problem.obs_lm, problem.obs_uv,
            N_CAMS, N_LMS, opts,
        )
        lam = jnp.asarray(1e-4, solver.dtype)

        def step(c, l):
            lin = solver.linearize(c, l)
            inc, _ = solver.solve_power(lin, lam)
            nc, nl, _ld = solver.apply(c, l, lin, inc, lam)
            err = solver.compute_error(nc, nl)
            return nc, nl, err["error_all"]

        state = (cams, lms_h)
    else:
        from povar_tpu.solver.stage1 import Stage1Solver

        solver = Stage1Solver(
            problem.obs_cam, problem.obs_lm, problem.obs_uv,
            N_CAMS, N_LMS, opts,
        )
        cams = jnp.asarray(problem.cam_space)
        lms = solver.initialize_varproj(cams)
        lam = jnp.asarray(1e-4, solver.dtype)

        def step(c, l):
            lin = solver.linearize(c, l)
            inc, _ = solver.solve_power(lin, lam)
            nc, nl, _ld = solver.apply(c, l, lin, inc)
            err = solver.compute_error(nc, nl)
            return nc, nl, err["error_all"]

        state = (cams, lms)

    # warmup/compile
    c, l = state
    c, l, e = step(c, l)
    _ = float(np.asarray(e))

    trace_dir = args.out or tempfile.mkdtemp(prefix="povar-trace-")
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.reps):
        c, l, e = step(c, l)
    _ = float(np.asarray(e))
    jax.profiler.stop_trace()
    wall = (time.perf_counter() - t0) / args.reps

    agg = defaultdict(float)
    total = 0.0
    for name, dur in _device_events(trace_dir):
        agg[_bucket(name)] += dur
        total += dur
    per_it = total / args.reps / 1e3  # ms
    which = "stage-2" if args.stage2 else "stage-1"
    print(f"\n== venice-89 {which} iteration device profile ==")
    print(f"host wall/iter: {wall * 1e3:.2f} ms;  "
          f"device time/iter: {per_it:.2f} ms;  trace: {trace_dir}")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    for name, dur in rows[:25]:
        ms = dur / args.reps / 1e3
        print(f"  {name:<28} {ms:8.3f} ms  {100 * dur / total:5.1f}%")

    # HBM roofline: bytes moved per iteration by the structured path
    o = problem.num_observations
    m = opts.power_sc_iterations
    # compact operands (x, uv, sw, r_w ~ 10 f32/obs) read ~3x + the
    # 9-float E0 factor h read per power term + slot reduce traffic
    bytes_floor = o * 4 * (10 * 3 + 9 * (m + 1) + 6)
    print(f"  HBM floor (structured operands): "
          f"{bytes_floor / 1e6:.0f} MB/iter ≈ "
          f"{bytes_floor / 819e9 * 1e3:.2f} ms at 819 GB/s")


if __name__ == "__main__":
    main()
