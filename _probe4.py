import sys, time
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
import numpy as np

O = 554_865
C = 512
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((9, O)))

def blocked_cumsum(x, C=512):
    o = x.shape[-1]
    b = -(-o // C)
    pad = b * C - o
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    xb = xp.reshape(x.shape[:-1] + (b, C))
    within = jnp.cumsum(xb, axis=-1)
    totals = within[..., -1]
    offsets = jnp.cumsum(totals, axis=-1) - totals
    cs = within + offsets[..., None]
    return cs.reshape(x.shape[:-1] + (b * C,))[..., :o]

def run(name, fn, *a):
    t0=time.time(); out = jax.jit(fn)(*a); jax.block_until_ready(out)
    t1=time.time(); out = jax.jit(fn)(*a); jax.block_until_ready(out)
    print(f"{name}: compile {t1-t0:.1f}s steady {(time.time()-t1)*1e3:.2f}ms", flush=True)

run("blocked_cumsum", lambda x: blocked_cumsum(x).sum(), x)
# correctness
got = np.asarray(blocked_cumsum(x))
want = np.cumsum(np.asarray(x), axis=-1)
print("max err", np.abs(got-want).max())
