"""Tracing / profiling (SURVEY.md §5 aux subsystem).

The reference instruments every pipeline stage with hand-rolled wall
timers (util/time_utils.hpp Timer + ~15 per-stage IterationSummary
fields). This framework keeps the same per-stage timing schema in the
summaries/ba_log (utils/summary.py), and adds the device-level view the
reference lacks: jax profiler traces viewable in TensorBoard/Perfetto,
plus named trace annotations around solver stages.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(dir_path: Optional[str]) -> Iterator[None]:
    """Capture a jax profiler trace for the enclosed block (no-op when
    dir_path is None). View with TensorBoard or ui.perfetto.dev."""
    if not dir_path:
        yield
        return
    jax.profiler.start_trace(dir_path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory stats (bytes) where the backend exposes them —
    the device-side analogue of the reference's /proc RSS sampling
    (util/system_utils.cpp:52-89)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0),
            }
    return out
