import sys, time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from povar_tpu.options import SolverOptions
from povar_tpu.problem.synthetic import synthetic_bal_problem_fast
from povar_tpu.solver.stage1 import Stage1Solver, _mask_rows
from povar_tpu.ops import pose_math, linalg

problem = synthetic_bal_problem_fast(89, 110_973, 5, seed=0)
opts = SolverOptions(); opts.power_sc_iterations = 10; opts.eta = 0.0
s = Stage1Solver(problem.obs_cam, problem.obs_lm, problem.obs_uv,
                 problem.num_cameras, problem.num_landmarks, opts)
cams = jnp.asarray(problem.cam_space)
lms = s.initialize_varproj(cams)
lms.block_until_ready()
print("init ok", flush=True)

obs = s.obs
which = sys.argv[1]

def run(name, fn, *a):
    t0=time.time()
    out = jax.jit(fn)(*a)
    jax.block_until_ready(out)
    t1=time.time()
    out = jax.jit(fn)(*a)
    jax.block_until_ready(out)
    print(f"{name}: compile {t1-t0:.1f}s steady {time.time()-t1:.3f}s", flush=True)

if which == "jac":
    def f(cams, lms):
        P = s._gather_cams(obs, cams)
        x = lms.T[:, obs.lm]
        r, Jp, Jl = pose_math.pose_jacobians_t(P, x, obs.uv, s.alpha)
        return r.sum()+Jp.sum()+Jl.sum()
    run("jacobians", f, cams, lms)
elif which == "jlscale":
    def f(cams, lms):
        P = s._gather_cams(obs, cams)
        x = lms.T[:, obs.lm]
        r, Jp, Jl = pose_math.pose_jacobians_t(P, x, obs.uv, s.alpha)
        jl_sq = s._seg_lm(obs, jnp.sum(Jl*Jl, axis=0))
        jl_scale = 1.0/(s.jacobi_eps + jnp.sqrt(jl_sq))
        Jl = Jl * jl_scale[:, obs.lm][None]
        return Jl.sum()
    run("jlscale", f, cams, lms)
elif which == "jpscale":
    def f(cams, lms):
        P = s._gather_cams(obs, cams)
        x = lms.T[:, obs.lm]
        r, Jp, Jl = pose_math.pose_jacobians_t(P, x, obs.uv, s.alpha)
        jp_sq = s._seg_cam(obs, jnp.sum(Jp*Jp, axis=0))
        pose_scale = 1.0/(s.jacobi_eps + jnp.sqrt(jp_sq))
        Jp = Jp * pose_scale[:, obs.cam][None]
        return Jp.sum()
    run("jpscale", f, cams, lms)
elif which == "lin":
    run("linearize", lambda c,l: s._linearize(obs,c,l), cams, lms)
