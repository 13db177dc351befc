"""Window-plan quality on adversarial problem structure (CPU-only).

The windowed kernels' per-observation cost is proportional to
(slot lanes / real observations) x window width: every lane (real or
pad) pays the O(W) one-hot gather/scatter contraction. This script
builds the EXACT plan the solver would use (make_obs, window_w=-1 —
RCM reordering, adaptive width, overflow grid rows) for the
locality-64 benchmark distribution and for the adversarial
distribution (heavy-tailed obs counts, mixed spans, 1% global-span
loop closures, scrambled ids; synthetic_bal_problem_adversarial), and
reports the predicted throughput retention — no TPU needed. The
device-measured counterpart is large_scale_smoke.py
venice-1778[-adversarial].

Usage: python benchmarks/adversarial_plan.py [n_cams n_lms]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from povar_tpu.problem.synthetic import (  # noqa: E402
    add_loop_closures_and_scramble,
    synthetic_bal_problem_adversarial,
    synthetic_bal_problem_fast,
)


def plan_metrics(problem, label):
    from povar_tpu.solver.stage1 import make_obs

    t0 = time.time()
    obs, shapes, n_win, win_w = make_obs(
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        problem.num_cameras,
        problem.num_landmarks,
        jnp.float64,
        None,
        solve_dtype=jnp.float32,
        build_onehot=False,
        window_w=-1,
    )
    o = problem.num_observations
    lanes = sum(r * w for r, w in shapes)
    util = o / lanes
    combine = getattr(obs, "lm_combine", None)
    # overflow = obs on duplicated (grid-cell) rows; bound it by the
    # weight-carrying lanes beyond one row per landmark
    n_rows = sum(r for r, _ in shapes)
    cost = lanes * win_w  # one-hot contraction cost model
    print(
        f"{label:24s} width={win_w:4d} n_win={n_win:5d} "
        f"lanes={lanes} rows={n_rows} util={util:.3f} "
        f"overflow_combine={'yes' if combine is not None else 'no':3s} "
        f"cost/obs={cost/o:.1f} plan_time={time.time()-t0:.1f}s",
        flush=True,
    )
    return cost / o


def main() -> None:
    n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 1778
    n_lms = int(sys.argv[2]) if len(sys.argv) > 2 else 993_923
    t0 = time.time()
    base = synthetic_bal_problem_fast(
        n_cams, n_lms, 5, seed=0, locality=64
    )
    adv = synthetic_bal_problem_adversarial(
        n_cams, n_lms, mean_obs_per_lm=5.0, seed=0
    )
    print(
        f"generated {base.num_observations} + {adv.num_observations} "
        f"obs in {time.time()-t0:.1f}s",
        flush=True,
    )
    loops = add_loop_closures_and_scramble(base, 0.01, seed=1)
    c_base = plan_metrics(base, "locality-64")
    c_loops = plan_metrics(loops, "loc-64+1%loops+scramble")
    c_adv = plan_metrics(adv, "adversarial")
    print(
        f"predicted throughput retention vs locality-64: "
        f"loops+scramble {c_base / c_loops:.2f}x, "
        f"adversarial {c_base / c_adv:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
