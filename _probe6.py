import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from povar_tpu.options import SolverOptions
from povar_tpu.problem.synthetic import synthetic_bal_problem_fast
from povar_tpu.solver.stage1 import Stage1Solver

problem = synthetic_bal_problem_fast(89, 110_973, 5, seed=0)
opts = SolverOptions(); opts.power_sc_iterations = 10; opts.eta = 0.0
s = Stage1Solver(problem.obs_cam, problem.obs_lm, problem.obs_uv,
                 problem.num_cameras, problem.num_landmarks, opts)
cams = jnp.asarray(problem.cam_space)
lms = s.initialize_varproj(cams)
lam = jnp.asarray(1e-4, lms.dtype)

def sync(x): return float(np.asarray(jnp.sum(x)))

# warm all stages
lin = s.linearize(cams, lms); inc,_ = s.solve_power(lin, lam); o = s.apply(cams, lms, lin, inc); sync(o[0])
e = s.compute_error(cams, lms); sync(e["error_all"])

# per-stage amortized (K dispatches, one sync)
K = 10
t0=time.time()
for _ in range(K): lin = s.linearize(cams, lms)
sync(lin.r); print(f"linearize: {(time.time()-t0)/K*1e3:.1f} ms", flush=True)
t0=time.time()
for _ in range(K): inc, terms = s.solve_power(lin, lam)
sync(inc); print(f"solve_power(m=10): {(time.time()-t0)/K*1e3:.1f} ms", flush=True)
t0=time.time()
for _ in range(K): o = s.apply(cams, lms, lin, inc)
sync(o[2]); print(f"apply: {(time.time()-t0)/K*1e3:.1f} ms", flush=True)
t0=time.time()
for _ in range(K): e = s.compute_error(cams, lms)
sync(e["error_all"]); print(f"error: {(time.time()-t0)/K*1e3:.1f} ms", flush=True)
# single scalar roundtrip latency
t0=time.time()
for _ in range(K): sync(lam)
print(f"sync latency: {(time.time()-t0)/K*1e3:.1f} ms", flush=True)
