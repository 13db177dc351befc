"""Micro-timings of the step-1 hot-path pieces at venice-89 scale.

Isolates each sub-stage of linearize / prepare_Hb / power term / apply
as its own jitted call to locate where the LM-iteration wall time goes
(complement of stage_timings.py, which times the fused stages).
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
from povar_tpu.ops import pose_math  # noqa: E402


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out,
    )
    # force host sync through a scalar pull
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jnp.sum(leaf))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {dt:.2f} ms")
    return out


def main():
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
    obs = s.obs
    cams = jnp.asarray(problem.cam_space)
    lms = s.initialize_varproj(cams)
    lam = jnp.asarray(1e-4, lms.dtype)
    lin = s.linearize(cams, lms)
    sd = s.solve_dtype

    # --- linearize pieces
    def jac_only(cam_space, lm_p):
        P = s._gather_cams(obs, cam_space.astype(sd))
        x = s._gather_lm_x(obs, lm_p.astype(sd).T)
        r, Jp, Jl = pose_math.pose_jacobians_t(
            P, x, obs.uv.astype(sd), s.alpha
        )
        return r, Jp, Jl

    r, Jp, Jl = bench("linearize: jacobians only", jax.jit(jac_only), cams, lms)

    bench("linearize: seg_lm(JlJl sum) [3,O]->[3,M]",
          jax.jit(lambda Jl: s._seg_lm(obs, jnp.sum(Jl * Jl, axis=0))), Jl)
    bench("linearize: seg_cam(JpJp sum) [12,O]->[12,N]",
          jax.jit(lambda Jp: s._seg_cam(obs, jnp.sum(Jp * Jp, axis=0))), Jp)
    scale = jnp.ones((3, n_lms), sd)
    bench("linearize: Jl rescale (gather_lm + mul)",
          jax.jit(lambda Jl, sc: Jl * s._gather_lm_x(obs, sc)[None]),
          Jl, scale)
    pscale = jnp.ones((12, n_cams), sd)
    bench("linearize: Jp rescale (gather_cam + mul)",
          jax.jit(lambda Jp, sc: Jp * s._gather_cam_x(obs, sc)[None]),
          Jp, pscale)
    bench("full linearize", lambda c, l: s.linearize(c, l), cams, lms)

    # --- prepare pieces
    bench("prepare_hb total",
          jax.jit(lambda lin, lam: s._prepare_hb(obs, lin, lam, False)),
          lin, lam)
    from povar_tpu.ops.small_einsum import small_einsum
    from povar_tpu.ops import linalg

    bench("prepare: hll + inv3x3",
          jax.jit(lambda lin: linalg.inv3x3f(
              s._seg_lm(obs, small_einsum("kio,kjo->ijo", lin.Jl, lin.Jl)))),
          lin)
    bench("prepare: hpp seg_cam_outer [12,12,O]->N",
          jax.jit(lambda lin: s._seg_cam_outer(obs, lin.Jp, lin.Jp)), lin)
    hpp = s._seg_cam_outer(obs, lin.Jp, lin.Jp) + 1e-4 * jnp.eye(
        12, dtype=sd)[:, :, None]
    bench("prepare: inv_psd_small12 [12,12,N]",
          jax.jit(linalg.inv_psd_smallf), hpp)

    b, b_inv, hll_inv = s._prepare_hb(obs, lin, lam, False)

    # --- power-series pieces
    W = bench("e0_factor (W build)",
              jax.jit(lambda lin, hll_inv: s._e0_factor(obs, lin, hll_inv, sd)),
              lin, hll_inv)
    x0 = (-b).astype(sd)
    bench("one power term: e0_w_matvec",
          jax.jit(lambda x, W: s._e0_w_matvec(x, obs, W)), x0, W)
    b_inv_s = b_inv.astype(sd)
    bench("one power term: b_inv apply",
          jax.jit(lambda v, bi: small_einsum("ijn,jn->in", bi, v)),
          x0, b_inv_s)
    bench("solve_power total (m=10)",
          lambda lin, lam: s.solve_power(lin, lam), lin, lam)

    # --- apply
    inc, _ = s.solve_power(lin, lam)
    bench("apply total", lambda c, l, lin, i: s.apply(c, l, lin, i),
          cams, lms, lin, inc)
    bench("compute_error (f64)", lambda c, l: s.compute_error(c, l),
          cams, lms)


if __name__ == "__main__":
    main()
