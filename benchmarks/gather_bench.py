"""Microbenchmark: fixed-permutation gather throughput on the device.

Informs the large-N design (cameras > the in-VMEM one-hot limit): the
camera-slot layout turns every camera gather/scatter into reshape
broadcasts/sums, at the price of permuting small per-observation
arrays ([3, O] / [12, O]) between landmark-slot and camera-slot order
twice per power-series term. This measures what that permutation
actually costs through XLA's gather lowering, in both layouts, plus a
one-hot matmul reference point.

Usage: python benchmarks/gather_bench.py [n_obs_millions]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    mo = float(sys.argv[1]) if len(sys.argv) > 1 else 24.0
    o = int(mo * 1e6)
    o = (o // 8192) * 8192
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(o), jnp.int32)
    x3 = jnp.asarray(rng.standard_normal((3, o)), jnp.float32)
    x3r = jnp.asarray(np.ascontiguousarray(np.asarray(x3).T))  # [O, 3]
    x4r = jnp.pad(x3r, ((0, 0), (0, 1)))  # [O, 4] padded rows
    x1 = x3[0]

    @jax.jit
    def take_lanes(x, p):
        return jnp.take(x, p, axis=1)

    @jax.jit
    def take_rows(x, p):
        return jnp.take(x, p, axis=0)

    @jax.jit
    def take_1d(x, p):
        return x[p]

    for name, fn, args, nbytes in [
        ("take [3,O] lanes", take_lanes, (x3, perm), 2 * x3.nbytes),
        ("take [O,3] rows", take_rows, (x3r, perm), 2 * x3r.nbytes),
        ("take [O,4] rows", take_rows, (x4r, perm), 2 * x4r.nbytes),
        ("take [O] 1d", take_1d, (x1, perm), 2 * x1.nbytes),
    ]:
        dt, _ = timeit(fn, *args)
        print(
            f"{name}: {dt*1e3:.2f} ms  "
            f"{nbytes/dt/2**30:.1f} GiB/s  "
            f"({o/dt/1e6:.0f} Mobs/s)",
            flush=True,
        )

    # table gather: y[:, o] = X[:, cam[o]] — the camera-state gather
    # every power-series term needs at N beyond the one-hot limit
    for n_cams, rows in [(1778, 12), (13682, 12), (13682, 3)]:
        table = jnp.asarray(
            rng.standard_normal((rows, n_cams)), jnp.float32
        )
        cam = jnp.asarray(rng.integers(0, n_cams, o), jnp.int32)

        @jax.jit
        def table_gather(tbl, c):
            return jnp.take(tbl, c, axis=1)

        dt, _ = timeit(table_gather, table, cam)
        out_bytes = rows * o * 4
        print(
            f"table gather [{rows},{n_cams}] -> [{rows},O]: "
            f"{dt*1e3:.2f} ms  {out_bytes/dt/2**30:.1f} GiB/s out  "
            f"({o/dt/1e6:.0f} Mobs/s)",
            flush=True,
        )

        @jax.jit
        def table_scatter(vals, c):
            return jax.ops.segment_sum(
                vals.T, c, num_segments=n_cams
            ).T

        vals = jnp.asarray(rng.standard_normal((rows, o)), jnp.float32)
        dt, _ = timeit(table_scatter, vals, cam)
        print(
            f"segment_sum [{rows},O] -> [{rows},{n_cams}]: "
            f"{dt*1e3:.2f} ms ({o/dt/1e6:.0f} Mobs/s)",
            flush=True,
        )

    # sort-based permutation: apply a fixed permutation as a key-sort
    # (TPU sorts are O(n log n) but avoid random access)
    inv = jnp.asarray(np.argsort(np.asarray(perm)), jnp.int32)

    @jax.jit
    def sort_perm(x, keys):
        _, out = jax.lax.sort_key_val(keys, x)
        return out

    dt, _ = timeit(sort_perm, x1, inv)
    print(f"sort_key_val [O] 1d: {dt*1e3:.2f} ms "
          f"({o/dt/1e6:.0f} Mobs/s)", flush=True)


if __name__ == "__main__":
    main()
