"""Tiny-dimension contractions for observation-last arrays.

On TPU, f64 `dot_general` is emulated with multi-pass f32 products; for
contractions over tiny static dims (3, 4, 11, 12) XLA materializes the
stacked emulation passes as [6-8, O, ...] intermediates — gigabytes at
BAL scale — and the MXU could not help at these shapes anyway.

A broadcast-multiply + axis-sum formulation avoids dot_general but
creates rank-4 temporaries like [4, 3, 3, O]; XLA's layout assignment
sometimes places a small dim minor-most on those, padding it to 128
lanes (observed: a 227 MB temp padded to 9.5 GB). So the default path
here fully *unrolls* the static dims: every multiply/add operates on a
clean [O] (or [batch]) vector — the one shape class that cannot be
padded badly — and the output is assembled with one stack+reshape. The
static dims are <= 12, so the unrolled op count stays in the hundreds
and fuses into a single elementwise kernel.

`small_einsum` supports the two-operand patterns the solver uses.
Specs where the last letter of both operands and the output coincide
(the big axis) take the unrolled path; anything else (pure small-batch
specs, ellipsis specs) falls back to broadcast-multiply + sum.
"""

from __future__ import annotations

import itertools
from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp

_BATCH_LETTERS = "ZYXWVU"


@lru_cache(maxsize=256)
def _bcast_plan(spec: str, a_ndim: int, b_ndim: int):
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


def _broadcast_einsum(spec: str, a: jnp.ndarray, b: jnp.ndarray):
    (pa, ea), (pb, eb), sum_axes = _bcast_plan(spec, a.ndim, b.ndim)
    aa = jnp.expand_dims(jnp.transpose(a, pa), ea)
    bb = jnp.expand_dims(jnp.transpose(b, pb), eb)
    prod = aa * bb
    return prod.sum(axis=sum_axes) if sum_axes else prod


@lru_cache(maxsize=256)
def _unroll_plan(spec: str):
    """Plan for specs of the form '<small>v,<small>v-><small>v' where v
    (the big vector axis) is the trailing letter everywhere. Returns
    None if the spec doesn't qualify."""
    if "..." in spec:
        return None
    ins, out = spec.split("->")
    sa, sb = ins.split(",")
    if not out or not sa or not sb:
        return None
    v = out[-1]
    if sa[-1] != v or sb[-1] != v:
        return None
    sa_s, sb_s, out_s = sa[:-1], sb[:-1], out[:-1]
    if v in sa_s or v in sb_s or v in out_s:
        return None
    if len(set(sa_s)) != len(sa_s) or len(set(sb_s)) != len(sb_s):
        return None
    contracted = []
    for c in sa_s + sb_s:
        if c not in out_s and c not in contracted:
            contracted.append(c)
    return sa_s, sb_s, out_s, tuple(contracted)


# below this vector length the broadcast path is used: its rank-3/4
# temporaries run ~25% faster than the unrolled form and the worst-case
# layout padding (~40x on a [4,3,O] temp) stays under ~2 GB; above it,
# the unrolled form is required to fit HBM (venice-1778+: a 227 MB temp
# was observed padded to 9.5 GB)
UNROLL_MIN_LANES = 1 << 20


def small_einsum(spec: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """einsum(spec, a, b) with layout-safe lowering (see module doc)."""
    plan = _unroll_plan(spec)
    if plan is None or a.shape[-1] < UNROLL_MIN_LANES:
        return _broadcast_einsum(spec, a, b)
    sa_s, sb_s, out_s, contracted = plan

    dims = {}
    for i, c in enumerate(sa_s):
        dims[c] = a.shape[i]
    for i, c in enumerate(sb_s):
        dims[c] = b.shape[i]

    def sl(x, s_static, assign):
        return x[tuple(assign[c] for c in s_static)]

    outs = []
    for combo in itertools.product(*[range(dims[c]) for c in out_s]):
        assign = dict(zip(out_s, combo))
        acc = None
        for ccombo in itertools.product(
            *[range(dims[c]) for c in contracted]
        ):
            assign.update(zip(contracted, ccombo))
            term = sl(a, sa_s, assign) * sl(b, sb_s, assign)
            acc = term if acc is None else acc + term
        outs.append(acc)
    stacked = jnp.stack(outs, axis=0)
    out_shape = tuple(dims[c] for c in out_s) + (a.shape[-1],)
    return stacked.reshape(out_shape)
