import sys, time
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
from jax import lax
import numpy as np

rng = np.random.default_rng(0)
O = 554_865
C = 512

def run(name, fn, *a):
    t0=time.time(); out = jax.jit(fn)(*a); jax.block_until_ready(out)
    t1=time.time(); out = jax.jit(fn)(*a); jax.block_until_ready(out)
    print(f"{name}: compile {t1-t0:.1f}s steady {(time.time()-t1)*1e3:.2f}ms", flush=True)

which = sys.argv[1]
if which == "small":
    xs = jnp.asarray(rng.standard_normal((9, C)))
    run("cumsum_small", lambda x: jnp.cumsum(x, axis=-1).sum(), xs)
elif which == "scan":
    x = jnp.asarray(rng.standard_normal((9, O)))
    def scan_cumsum(x):
        o = x.shape[-1]
        b = -(-o // C)
        xp = jnp.pad(x, [(0,0)]*(x.ndim-1) + [(0, b*C-o)])
        xb = jnp.moveaxis(xp.reshape(x.shape[:-1] + (b, C)), -2, 0)  # [B, .., C]
        def body(carry, xc):
            cs = jnp.cumsum(xc, axis=-1) + carry[..., None]
            return cs[..., -1], cs
        _, css = lax.scan(body, jnp.zeros(x.shape[:-1], x.dtype), xb)
        css = jnp.moveaxis(css, 0, -2).reshape(x.shape[:-1] + (b*C,))
        return css[..., :o]
    run("scan_cumsum", lambda x: scan_cumsum(x).sum(), x)
    got = np.asarray(scan_cumsum(x)); want = np.cumsum(np.asarray(x), -1)
    print("max err", np.abs(got-want).max(), flush=True)
elif which == "assoc":
    x = jnp.asarray(rng.standard_normal((9, O)))
    run("assoc_scan", lambda x: lax.associative_scan(jnp.add, x, axis=-1).sum(), x)
