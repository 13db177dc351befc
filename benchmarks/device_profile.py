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

N_CAMS, N_LMS, OBS = 89, 110_973, 5  # venice-89 defaults


def _device_tracks(trace_dir):
    """Return (modules, ops): lists of complete events from the device
    'XLA Modules' and 'XLA Ops' tracks. Modules are whole-executable
    spans (one per jit call); ops are the leaf HLO ops within them —
    keeping the tracks separate avoids double-counting nested spans."""
    paths = glob.glob(
        os.path.join(
            trace_dir, "plugins", "profile", "*", "*.trace.json.gz"
        )
    )
    assert paths, f"no trace found under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pnames[e["pid"]] = e.get("args", {}).get("name", "")
            elif e.get("name") == "thread_name":
                tnames[(e["pid"], e.get("tid"))] = e.get(
                    "args", {}
                ).get("name", "")
    mods, ops = [], []
    for e in events:
        if e.get("ph") != "X":
            continue
        if "device" not in pnames.get(e["pid"], "").lower():
            continue
        track = tnames.get((e["pid"], e.get("tid")), "")
        if track == "XLA Modules":
            mods.append(e)
        elif track == "XLA Ops":
            ops.append(e)
    mods.sort(key=lambda e: e["ts"])
    return mods, ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage2", action="store_true")
    ap.add_argument(
        "--spmd", action="store_true",
        help="profile the D=1-mesh SPMD stage-1 solver instead of the "
        "plain windowed one (layout-overhead attribution)",
    )
    ap.add_argument("--cams", type=int, default=N_CAMS)
    ap.add_argument("--lms", type=int, default=N_LMS)
    ap.add_argument("--obs-per-lm", type=int, default=OBS)
    ap.add_argument("--locality", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    n_cams, n_lms = args.cams, args.lms
    problem = synthetic_bal_problem_fast(
        n_cams, n_lms, args.obs_per_lm, seed=0, locality=args.locality,
    )
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
            n_cams, n_lms, opts,
        )
        cams = jnp.asarray(problem.cam_space)
        lms = s1.initialize_varproj(cams)
        cams, lms_h = create_homogeneous(cams, lms)
        solver = Stage2Solver(
            problem.obs_cam, problem.obs_lm, problem.obs_uv,
            n_cams, n_lms, opts,
        )
        # thread the landmark state in L space, like the LM driver
        lms_h = solver.lm_pack(lms_h)
        lam = jnp.asarray(1e-4, solver.dtype)

        def step(c, l):
            lin = solver.linearize(c, l)
            inc, _ = solver.solve_power(lin, lam)
            nc, nl, _ld = solver.apply(c, l, lin, inc, lam)
            err = solver.compute_error(nc, nl)
            return nc, nl, err["error_all"]

        state = (cams, lms_h)
    elif args.spmd:
        from jax.sharding import Mesh
        from povar_tpu.ops.pallas_pose import PART_ALIGN
        from povar_tpu.parallel.spmd import (
            build_spmd_plan,
            get_spmd_solver_classes,
        )

        plan = build_spmd_plan(
            problem.obs_cam, problem.obs_lm, n_cams, n_lms, 1,
            PART_ALIGN,
        )
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("obs",))
        S1, _ = get_spmd_solver_classes()
        solver = S1(
            plan, problem.obs_uv, n_cams, n_lms, opts, mesh,
        )
        cams = jnp.asarray(problem.cam_space)
        lms = solver.lm_pack(solver.initialize_varproj(cams))
        lam = jnp.asarray(1e-4, solver.dtype)

        def step(c, l):
            lin = solver.linearize(c, l)
            inc, _ = solver.solve_power(lin, lam)
            nc, nl, _ld = solver.apply(c, l, lin, inc)
            err = solver.compute_error(nc, nl)
            return nc, nl, err["error_all"]

        state = (cams, lms)
    else:
        from povar_tpu.solver.stage1 import Stage1Solver

        solver = Stage1Solver(
            problem.obs_cam, problem.obs_lm, problem.obs_uv,
            n_cams, n_lms, opts,
        )
        cams = jnp.asarray(problem.cam_space)
        # thread the landmark state in L space, like the LM driver
        lms = solver.lm_pack(solver.initialize_varproj(cams))
        lam = jnp.asarray(1e-4, solver.dtype)

        def step(c, l):
            lin = solver.linearize(c, l)
            inc, _ = solver.solve_power(lin, lam)
            nc, nl, _ld = solver.apply(c, l, lin, inc)
            err = solver.compute_error(nc, nl)
            return nc, nl, err["error_all"]

        state = (cams, lms)

    # warmup/compile (sharded programs: the first 1-2 EXECUTIONS are
    # tens of seconds on the tunneled platform — see spmd_overhead.py)
    c, l = state
    for _ in range(3 if args.spmd else 1):
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

    import bisect

    mods, ops = _device_tracks(trace_dir)
    mod_agg = defaultdict(float)
    for m in mods:
        mod_agg[m["name"].split("(")[0]] += m["dur"]
    total = sum(mod_agg.values())
    per_it = total / args.reps / 1e3  # ms
    which = "stage-2" if args.stage2 else "stage-1"
    print(f"\n== {n_cams}-cam {which} iteration device profile ==")
    print(f"host wall/iter: {wall * 1e3:.2f} ms;  "
          f"device time/iter: {per_it:.2f} ms;  trace: {trace_dir}")
    print("\nper-module (whole jit executables):")
    for name, dur in sorted(mod_agg.items(), key=lambda kv: -kv[1]):
        ms = dur / args.reps / 1e3
        print(f"  {name:<32} {ms:8.3f} ms  {100 * dur / total:5.1f}%")

    # leaf ops grouped by enclosing module (timestamp containment)
    mstarts = [m["ts"] for m in mods]

    def _modname(ts):
        i = bisect.bisect_right(mstarts, ts) - 1
        if i >= 0 and ts < mods[i]["ts"] + mods[i]["dur"]:
            return mods[i]["name"].split("(")[0]
        return "<outside-module>"

    per_mod = defaultdict(lambda: defaultdict(float))
    for o in ops:
        per_mod[_modname(o["ts"])][o["name"]] += o["dur"]
    for mn, d in sorted(
        per_mod.items(), key=lambda kv: -sum(kv[1].values())
    ):
        print(f"\n{mn}: top leaf ops")
        for n, v in sorted(d.items(), key=lambda kv: -kv[1])[:10]:
            print(f"   {n:<44} {v / args.reps / 1e3:7.3f} ms")

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
