import time
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

O = 554_865
T = 8192
OP = ((O + T - 1)//T)*T
rng = np.random.default_rng(0)
a64 = jnp.asarray(np.pad(rng.standard_normal((12, O)), ((0,0),(0,OP-O))))
b64 = jnp.asarray(np.pad(rng.standard_normal((12, O)), ((0,0),(0,OP-O))))

def kern(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] * b_ref[:] + a_ref[:]

def run(dtype, name):
    a = a64.astype(dtype); b = b64.astype(dtype)
    f = jax.jit(lambda a, b: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((12, OP), dtype),
        grid=(OP//T,),
        in_specs=[pl.BlockSpec((12, T), lambda i: (0, i), memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec((12, T), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(a, b))
    t0=time.time(); r = f(a,b); s=float(np.asarray(jnp.sum(r)))
    t1=time.time()
    for _ in range(20): r = f(a,b)
    s=float(np.asarray(jnp.sum(r)))
    print(f"pallas {name}: compile {t1-t0:.1f}s steady {(time.time()-t1)/20*1e3:.2f} ms", flush=True)

run(jnp.float32, "f32")
run(jnp.float64, "f64")
# plain XLA comparison
for dt,name in [(jnp.float32,"f32"),(jnp.float64,"f64")]:
    a = a64.astype(dt); b=b64.astype(dt)
    f = jax.jit(lambda a,b: a*b+a)
    r=f(a,b); float(np.asarray(jnp.sum(r)))
    t0=time.time()
    for _ in range(20): r=f(a,b)
    float(np.asarray(jnp.sum(r)))
    print(f"xla {name}: steady {(time.time()-t0)/20*1e3:.2f} ms", flush=True)
