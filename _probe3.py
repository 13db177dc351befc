# Minimal compile-time probe with persistent compilation cache.
import sys, time
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

O = 554_865
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((4, 12, O)))
which = sys.argv[1]

def run(name, fn, *a):
    t0=time.time()
    out = jax.jit(fn)(*a); jax.block_until_ready(out)
    t1=time.time()
    out = jax.jit(fn)(*a); jax.block_until_ready(out)
    print(f"{name}: compile {t1-t0:.1f}s steady {time.time()-t1:.3f}s", flush=True)

if which == "sum":
    run("sum", lambda x: (x*x).sum(), x)
elif which == "cumsum":
    run("cumsum", lambda x: jnp.cumsum(jnp.sum(x*x,axis=0), axis=-1)[..., -1].sum(), x)
elif which == "gatherO":
    idx = jnp.asarray(rng.integers(0, 89, O), jnp.int32)
    small = jnp.asarray(rng.standard_normal((12, 89)))
    run("gatherO", lambda s, i: (s[:, i]).sum(), small, idx)
elif which == "permO":
    perm = jnp.asarray(rng.permutation(O), jnp.int32)
    run("permO", lambda x, p: jnp.take(x, p, axis=-1).sum(), x, perm)
elif which == "concatstack":
    u = jnp.asarray(rng.standard_normal((2, O)))
    xh = jnp.asarray(rng.standard_normal((4, O)))
    def f(xh, u):
        z = jnp.zeros_like(xh)
        r0 = jnp.concatenate([xh, z, -u[0][None]*xh], axis=0)
        r1 = jnp.concatenate([z, xh, -u[1][None]*xh], axis=0)
        r2 = jnp.concatenate([xh, z, z], axis=0)
        r3 = jnp.concatenate([z, xh, z], axis=0)
        return jnp.stack([r0,r1,r2,r3], axis=0).sum()
    run("concatstack", f, xh, u)
