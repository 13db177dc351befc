"""Tiny-dimension contractions as broadcast-multiply + sum.

On TPU, f64 `dot_general` is emulated with multi-pass f32 products; for
contractions over tiny static dims (3, 4, 11, 12) XLA materializes the
stacked emulation passes as [6-8, O, ...] intermediates — gigabytes at
BAL scale — and the MXU could not help at these shapes anyway. Lowering
the contraction to explicit broadcast-multiply + axis-sum keeps it in
the VPU as fused elementwise work with no blowup.

`small_einsum` supports exactly the two-operand patterns the solver
uses (no repeated letters within an operand, no ellipsis).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp


_BATCH_LETTERS = "ZYXWVU"


@lru_cache(maxsize=256)
def _plan(spec: str, a_ndim: int, b_ndim: int):
    ins, out = spec.split("->")
    sa, sb = ins.split(",")
    if "..." in spec:
        # expand '...' to concrete batch letters (same rank for every
        # occurrence, inferred from the operand that carries it)
        n_batch = None
        for s, nd in ((sa, a_ndim), (sb, b_ndim)):
            if "..." in s:
                nb = nd - (len(s) - 3)
                n_batch = nb if n_batch is None else max(n_batch, nb)
        assert n_batch is not None and n_batch <= len(_BATCH_LETTERS)
        batch = _BATCH_LETTERS[:n_batch]
        sa = sa.replace("...", batch[len(batch) - (a_ndim - (len(sa) - 3)):])
        sb = sb.replace("...", batch[len(batch) - (b_ndim - (len(sb) - 3)):])
        out = out.replace("...", batch)
    assert len(sa) == a_ndim and len(sb) == b_ndim, (spec, a_ndim, b_ndim)
    contracted = [c for c in sa + sb if c not in out]
    # dedupe preserving order
    seen = set()
    contracted = [
        c for c in contracted if not (c in seen or seen.add(c))
    ]
    union = contracted + list(out)

    def axes_plan(s: str) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
        present = [c for c in union if c in s]
        perm = tuple(s.index(c) for c in present)
        expand_axes = tuple(
            i for i, c in enumerate(union) if c not in s
        )
        return perm, expand_axes

    return axes_plan(sa), axes_plan(sb), tuple(range(len(contracted)))


def small_einsum(spec: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """einsum(spec, a, b) via broadcast-multiply + sum (two operands)."""
    (pa, ea), (pb, eb), sum_axes = _plan(spec, a.ndim, b.ndim)
    aa = jnp.expand_dims(jnp.transpose(a, pa), ea)
    bb = jnp.expand_dims(jnp.transpose(b, pb), eb)
    prod = aa * bb
    return prod.sum(axis=sum_axes) if sum_axes else prod
