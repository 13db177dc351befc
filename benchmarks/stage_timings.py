"""Per-stage wall-time breakdown of one step-1 LM iteration at
venice-89 scale, amortized over repeated dispatches (the tunnel sync
latency is reported separately). Complements bench.py.

Usage: python benchmarks/stage_timings.py [n_cams n_lms obs_per_lm]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from povar_tpu.options import SolverOptions  # noqa: E402
from povar_tpu.problem.synthetic import synthetic_bal_problem_fast  # noqa: E402
from povar_tpu.solver.stage1 import Stage1Solver  # noqa: E402


def main() -> None:
    n_cams, n_lms, k = 89, 110_973, 5
    if len(sys.argv) == 4:
        n_cams, n_lms, k = map(int, sys.argv[1:])
    problem = synthetic_bal_problem_fast(n_cams, n_lms, k, seed=0)
    opts = SolverOptions()
    opts.power_sc_iterations = 10
    opts.eta = 0.0
    s = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    cams = jnp.asarray(problem.cam_space)
    lms = s.initialize_varproj(cams)
    lam = jnp.asarray(1e-4, lms.dtype)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    # warm all stages
    lin = s.linearize(cams, lms)
    inc, _ = s.solve_power(lin, lam)
    out = s.apply(cams, lms, lin, inc)
    sync(out[0])
    err = s.compute_error(cams, lms)
    sync(err["error_all"])

    reps = 10
    stages = [
        ("linearize", lambda: s.linearize(cams, lms),
         lambda r: r.r if hasattr(r, "r") else r.r_w),
        (
            "solve_power(m=10)",
            lambda: s.solve_power(lin, lam)[0],
            lambda r: r,
        ),
        (
            "apply",
            lambda: s.apply(cams, lms, lin, inc),
            lambda r: r[2],
        ),
        (
            "compute_error",
            lambda: s.compute_error(cams, lms),
            lambda r: r["error_all"],
        ),
    ]
    for name, fn, pick in stages:
        t0 = time.time()
        for _ in range(reps):
            r = fn()
        sync(pick(r))
        print(f"{name}: {(time.time() - t0) / reps * 1e3:.1f} ms")
    t0 = time.time()
    for _ in range(reps):
        sync(lam)
    print(f"sync latency: {(time.time() - t0) / reps * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
