"""Shared solver-layer pieces: residual accounting and segment reductions.

ResidualInfo mirrors bal/residual_info.hpp:36-104; the parallel-reduce
accumulator of the reference becomes a couple of masked `jnp.sum`s.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp


class StagedTiming:
    """Mixin for staged (timed) execution: cache per-stage jitted
    sub-functions and measure synced device wall times around them.
    The reference's per-iteration stage timers
    (solver_summary.hpp:186-212) are host wall clocks around serial
    phases; splitting the fused jit graphs at the same boundaries and
    blocking between them recovers the same observability."""

    def _jit_cached(self, name, fn, **kw):
        key = "_jitc_" + name
        if not hasattr(self, key):
            setattr(self, key, jax.jit(fn, **kw))
        return getattr(self, key)

    @staticmethod
    def _timed(fn, *args):
        import time

        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        return out, time.perf_counter() - t0


def segment_sum(
    x: jnp.ndarray, idx: jnp.ndarray, num_segments: int, sorted_: bool = False
) -> jnp.ndarray:
    """Per-camera / per-landmark accumulation over the observation axis —
    the TPU replacement for the reference's mutex-guarded scatter-add
    (sc/landmark_block.hpp:383-410 etc.)."""
    return jax.ops.segment_sum(
        x, idx, num_segments=num_segments, indices_are_sorted=sorted_
    )


@dataclass
class ResidualItem:
    num_obs: int = 0
    error: float = 0.0
    residual_sum: float = 0.0

    def error_avg(self) -> float:
        return self.error / self.num_obs if self.num_obs > 0 else 0.0

    def residual_mean(self) -> float:
        return self.residual_sum / self.num_obs if self.num_obs > 0 else 0.0


@dataclass
class ResidualInfo:
    all: ResidualItem
    valid: ResidualItem
    is_numerically_valid: bool = True

    @staticmethod
    def from_device(d: Dict[str, jnp.ndarray]) -> "ResidualInfo":
        return ResidualInfo(
            all=ResidualItem(
                num_obs=int(d["num_obs_all"]),
                error=float(d["error_all"]),
                residual_sum=float(d["residual_sum_all"]),
            ),
            valid=ResidualItem(
                num_obs=int(d["num_obs_valid"]),
                error=float(d["error_valid"]),
                residual_sum=float(d["residual_sum_valid"]),
            ),
            is_numerically_valid=bool(d["is_numerically_valid"]),
        )


def accumulate_residual_info(
    weighted_error: jnp.ndarray,  # [O]
    res_norm: jnp.ndarray,  # [O]
    projection_valid: jnp.ndarray,  # [O] bool
    numerically_valid: jnp.ndarray,  # [O] bool
    num_obs_all=None,  # live-observation count (excl. padding rows)
) -> Dict[str, jnp.ndarray]:
    """Device-side ResidualInfoAccu (residual_info.cpp:96-109): `all`
    sums everything; `valid` sums projection-valid observations;
    is_numerically_valid is the AND over observations."""
    validf = projection_valid.astype(weighted_error.dtype)
    if num_obs_all is None:
        num_obs_all = weighted_error.shape[0]
    return {
        "num_obs_all": jnp.asarray(num_obs_all, jnp.int64),
        "error_all": jnp.sum(weighted_error),
        "residual_sum_all": jnp.sum(res_norm),
        "num_obs_valid": jnp.sum(projection_valid.astype(jnp.int64)),
        "error_valid": jnp.sum(weighted_error * validf),
        "residual_sum_valid": jnp.sum(res_norm * validf),
        "is_numerically_valid": jnp.all(numerically_valid),
    }


def error_summary_oneline(info: ResidualInfo, valid_first: bool) -> str:
    """residual_info.cpp:78-95."""
    warn = "" if info.is_numerically_valid else "!NaN! "

    def one(item: ResidualItem) -> str:
        return (
            f"{item.error:.4e} (mean res: {item.residual_mean():.2f}, "
            f"num: {item.num_obs})"
        )

    if valid_first:
        return f"{warn}error valid: {one(info.valid)}, error: {one(info.all)}"
    return f"{warn}error: {one(info.all)}, error valid: {one(info.valid)}"
