import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from povar_tpu.options import SolverOptions
from povar_tpu.problem.synthetic import synthetic_bal_problem_fast
from povar_tpu.solver.stage1 import Stage1Solver
from povar_tpu.solver.segments import padded_segment_sum
from povar_tpu.ops.small_einsum import small_einsum

problem = synthetic_bal_problem_fast(89, 110_973, 5, seed=0)
opts = SolverOptions()
s = Stage1Solver(problem.obs_cam, problem.obs_lm, problem.obs_uv,
                 problem.num_cameras, problem.num_landmarks, opts)
obs = s.obs
rng = np.random.default_rng(0)
O = problem.num_observations
Jp = jnp.asarray(rng.standard_normal((4,12,O)))
Jl = jnp.asarray(rng.standard_normal((4,3,O)))
xN = jnp.asarray(rng.standard_normal((12,89)))
sM = jnp.asarray(rng.standard_normal((3,110_973)))
x12O = jnp.asarray(rng.standard_normal((12,O)))
x3O = jnp.asarray(rng.standard_normal((3,O)))
x4O = jnp.asarray(rng.standard_normal((4,O)))

def bench(name, fn, *a, reps=20):
    f = jax.jit(fn)
    r = f(*a); _ = float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(r)[0])))
    t0=time.time()
    for _i in range(reps): r = f(*a)
    _ = float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(r)[0])))
    print(f"{name}: {(time.time()-t0)/reps*1e3:.2f} ms", flush=True)

bench("gather_cam [12,N]->[12,O]", lambda x: x[:, obs.cam], xN)
bench("gather_lm  [3,M]->[3,O]", lambda x: x[:, obs.lm], sM)
bench("seg_cam [12,O]->[12,N]", lambda x: padded_segment_sum(x, obs.seg.cam), x12O)
bench("seg_lm  [3,O]->[3,M]", lambda x: padded_segment_sum(x, obs.seg.lm), x3O)
bench("einsum ijo,jo->io (Jp x)", lambda a,b: small_einsum("ijo,jo->io", a, b), Jp, x12O)
bench("einsum ijo,io->jo (Jp^T v)", lambda a,b: small_einsum("ijo,io->jo", a, b), Jp, x4O)
bench("elementwise mul-sum [4,12,O]", lambda a: (a*a).sum(axis=0), Jp)
