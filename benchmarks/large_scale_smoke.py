"""Large-scale smoke: one full step-1 LM iteration at venice-1778 scale
(1778 cams, 993,923 landmarks, ~5M observations) or BAL final-13682
scale (13,682 cams, 4.8M landmarks, ~24M observations) — validates HBM
fit and reports throughput + peak device memory. Camera one-hot is
disabled automatically at this N*O (falls back to bucketed gathers).

Usage:
  python benchmarks/large_scale_smoke.py [venice-1778|final-13682]
  python benchmarks/large_scale_smoke.py final-13682 --stage2

--stage2 measures a steady step-2 Riemannian LM iteration (linearize +
11-dof tangent power solve + joint apply + double-float cost eval)
through the structured kernels instead of step 1.
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


# (cams, lms, obs/lm, camera locality): real BAL sequences are
# temporally coherent — landmarks are seen by nearby frames — which the
# camera-window layout exploits (segments.build_window_plan)
SCALES = {
    "venice-1778": (1778, 993_923, 5, 64),
    "final-13682": (13_682, 4_585_579, 5, 64),
    # uniform camera draws (no locality): exercises the XLA fallback
    "venice-1778-uniform": (1778, 993_923, 5, 0),
    # heavy-tailed obs counts + mixed spans + 1% global-span loop
    # closures + scrambled camera ids (synthetic_bal_problem_adversarial)
    "venice-1778-adversarial": (1778, 993_923, 5, -1),
    "final-13682-adversarial": (13_682, 4_585_579, 5, -1),
}


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--stage2"]
    stage2 = "--stage2" in sys.argv[1:]
    scale = argv[0] if argv else "venice-1778"
    n_cams, n_lms, obs_per_lm, locality = SCALES[scale]
    t0 = time.time()
    if locality < 0:
        from povar_tpu.problem.synthetic import (
            synthetic_bal_problem_adversarial,
        )

        problem = synthetic_bal_problem_adversarial(
            n_cams, n_lms, mean_obs_per_lm=obs_per_lm, seed=0
        )
    else:
        problem = synthetic_bal_problem_fast(
            n_cams, n_lms, obs_per_lm, seed=0, locality=locality
        )
    print(f"generated {problem.num_observations} obs in {time.time()-t0:.1f}s",
          flush=True)
    opts = SolverOptions()
    opts.power_sc_iterations = 10
    opts.eta = 0.0
    s = Stage1Solver(
        problem.obs_cam, problem.obs_lm, problem.obs_uv,
        problem.num_cameras, problem.num_landmarks, opts,
    )
    print(f"path: {'windowed pallas (n_win=%d)' % s.n_win if s.n_win else ('pallas' if s.use_pallas else 'xla')}",
          flush=True)
    cams = jnp.asarray(problem.cam_space)
    t0 = time.time()
    lms = s.initialize_varproj(cams)
    e0 = float(np.asarray(s.compute_error(cams, lms)["error_all"]))
    print(f"init+error: {time.time()-t0:.1f}s cost0={e0:.6e}", flush=True)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    lam = jnp.asarray(1e-4, lms.dtype)
    lms_packed = s.lm_pack(lms)
    if stage2:
        from povar_tpu.solver.stage2 import (
            Stage2Solver,
            create_homogeneous,
        )

        cams2, lms_h = create_homogeneous(cams, lms)
        s2 = Stage2Solver(
            problem.obs_cam, problem.obs_lm, problem.obs_uv,
            problem.num_cameras, problem.num_landmarks, opts,
            obs_weight=getattr(problem, "obs_weight", None),
        )
        lms_h = s2.lm_pack(lms_h)
        lam2 = jnp.asarray(1e-4, s2.dtype)

        def iter2(c, l):
            lin = s2.linearize(c, l)
            inc, _ = s2.solve_power(lin, lam2)
            nc, nl, _ld = s2.apply(c, l, lin, inc, lam2)
            err = s2.compute_error(nc, nl)
            return nc, nl, err["error_all"]

        t0 = time.time()
        c, l, e = iter2(cams2, lms_h)
        sync(e)
        print(f"first stage-2 iteration (incl compile): "
              f"{time.time()-t0:.1f}s", flush=True)
        # 2 more warm executions (fresh tunneled executables are slow
        # on their first runs), then the timed loop
        for _ in range(2):
            c, l, e = iter2(cams2, lms_h)
        sync(e)
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            c, l, e = iter2(cams2, lms_h)
        e1 = sync(e)
        dt = (time.time() - t0) / reps
        print(
            f"steady stage-2 LM iteration (incl df32 cost eval): "
            f"{dt*1e3:.0f} ms "
            f"({problem.num_observations/dt/1e6:.1f} Mobs/s); "
            f"cost at step-2 start: {e1:.6e}",
            flush=True,
        )
    else:
        t0 = time.time()
        lin = s.linearize(cams, lms_packed)
        inc, terms = s.solve_power(lin, lam)
        out = s.apply(cams, lms_packed, lin, inc)
        sync(out[2])
        print(f"first iteration (incl compile): {time.time()-t0:.1f}s",
              flush=True)
        # 2 more warm executions (fresh tunneled executables are slow
        # on their first runs), then the timed loop
        for _ in range(2):
            lin = s.linearize(cams, lms_packed)
            inc, _ = s.solve_power(lin, lam)
            out = s.apply(cams, lms_packed, lin, inc)
        sync(out[2])

        reps = 3
        t0 = time.time()
        for _ in range(reps):
            lin = s.linearize(cams, lms_packed)
            inc, _ = s.solve_power(lin, lam)
            out = s.apply(cams, lms_packed, lin, inc)
        sync(out[2])
        dt = (time.time() - t0) / reps
        e1 = float(
            np.asarray(s.compute_error(out[0], out[1])["error_all"])
        )
        out = (out[0], s.lm_unpack(out[1]), out[2])
        print(
            f"steady LM iteration: {dt*1e3:.0f} ms "
            f"({problem.num_observations/dt/1e6:.1f} Mobs/s); "
            f"cost after 1 step: {e1:.6e} (from {e0:.6e})",
            flush=True,
        )
    from povar_tpu.utils.profiling import device_memory_stats

    for dev, stats in device_memory_stats().items():
        print(
            f"{dev}: peak {stats['peak_bytes_in_use']/2**30:.2f} GiB "
            f"of {stats['bytes_limit']/2**30:.2f} GiB",
            flush=True,
        )


if __name__ == "__main__":
    main()
