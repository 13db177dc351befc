"""Streaming SPMD slot reduce/expand kernels vs the XLA reshape
formulation (ops/pallas_spmd.py vs the _*_xla fallbacks in
parallel/spmd.py).

The two formulations are exact-equal permutation-free sums of the
same f32 lanes in the same order, so comparisons are exact (==), not
approximate. Covers multiple classes, multiple parts per class, w=1
parts, tail pad lanes, leading-dim shapes, the f64 fallback, and the
fused reduce-reexpand.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from povar_tpu.parallel.spmd import (
    ClassLayout,
    _expand_rows_xla,
    _part_sums_xla,
    spmd_expand_rows,
    spmd_part_sums,
    spmd_reduce_reexpand,
)

pytestmark = pytest.mark.quick

# two classes: multi-part with a tail, and a single w=1 part with tail
LAYOUT = (
    ClassLayout(n_windows=3, parts=((128, 3), (256, 2)), win_lanes=1024),
    ClassLayout(n_windows=2, parts=((128, 1),), win_lanes=256),
)


def _o_dev(layout):
    return sum(cl.n_windows * cl.win_lanes for cl in layout)


def _rows_dev(layout):
    return sum(
        cl.n_windows * cap for cl in layout for cap, _w in cl.parts
    )


def _xla_part_sums(x, layout):
    outs = []
    lofs = 0
    for cl in layout:
        outs.extend(_part_sums_xla(x, cl, lofs))
        lofs += cl.n_windows * cl.win_lanes
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def _xla_expand(rows, layout):
    outs = []
    rofs = 0
    for cl in layout:
        outs.append(_expand_rows_xla(rows, cl, rofs))
        rofs += cl.n_windows * sum(cap for cap, _w in cl.parts)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


@pytest.mark.parametrize("lead", [(), (4,), (3, 3)])
def test_part_sums_matches_xla(lead):
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal(lead + (_o_dev(LAYOUT),)), jnp.float32
    )
    got = spmd_part_sums(x, LAYOUT)
    want = _xla_part_sums(x, LAYOUT)
    assert got.shape == lead + (_rows_dev(LAYOUT),)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("lead", [(), (4,), (3, 3)])
def test_expand_rows_matches_xla(lead):
    rng = np.random.default_rng(1)
    rows = jnp.asarray(
        rng.standard_normal(lead + (_rows_dev(LAYOUT),)), jnp.float32
    )
    got = spmd_expand_rows(rows, LAYOUT)
    want = _xla_expand(rows, LAYOUT)
    assert got.shape == lead + (_o_dev(LAYOUT),)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_reduce_reexpand_matches_composed():
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.standard_normal((3, _o_dev(LAYOUT))), jnp.float32
    )
    got = spmd_reduce_reexpand(x, LAYOUT)
    want = _xla_expand(_xla_part_sums(x, LAYOUT), LAYOUT)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_f64_takes_xla_fallback_exactly():
    # f64 is ineligible for the Pallas path; results must still match
    # the XLA formulation bit-for-bit (it IS the XLA formulation).
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.standard_normal((2, _o_dev(LAYOUT))), jnp.float64
    )
    np.testing.assert_array_equal(
        np.asarray(spmd_part_sums(x, LAYOUT)),
        np.asarray(_xla_part_sums(x, LAYOUT)),
    )
    rows = jnp.asarray(
        rng.standard_normal((2, _rows_dev(LAYOUT))), jnp.float64
    )
    np.testing.assert_array_equal(
        np.asarray(spmd_expand_rows(rows, LAYOUT)),
        np.asarray(_xla_expand(rows, LAYOUT)),
    )


def test_unaligned_caps_take_xla_fallback():
    # caps not multiples of 128 are Pallas-ineligible; the dispatcher
    # must fall back per class and still produce identical results.
    layout = (
        ClassLayout(n_windows=2, parts=((96, 2), (64, 3)), win_lanes=512),
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(
        rng.standard_normal((3, _o_dev(layout))), jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(spmd_part_sums(x, layout)),
        np.asarray(_xla_part_sums(x, layout)),
    )
    rows = jnp.asarray(
        rng.standard_normal((3, _rows_dev(layout))), jnp.float32
    )
    np.testing.assert_array_equal(
        np.asarray(spmd_expand_rows(rows, layout)),
        np.asarray(_xla_expand(rows, layout)),
    )
    np.testing.assert_array_equal(
        np.asarray(spmd_reduce_reexpand(x, layout)),
        np.asarray(_xla_expand(_xla_part_sums(x, layout), layout)),
    )
