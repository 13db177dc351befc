"""Log model: load ba_log.json files into numpy-friendly objects.

Equivalent of python/rootba/log.py (Log munch wrapper with __index /
__values run-length decoding): loads both this framework's logs and the
reference's ba_log.json/ubjson files, exposing per-iteration arrays.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np


class AttrDict(dict):
    """Attribute-style access like the reference's munch objects."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return AttrDict(v) if isinstance(v, dict) else v


def _decode_rle(obj: Any) -> Any:
    """Decode the reference's {__index: [...], __values: [...]} sparse
    run-length arrays (python/rootba/log.py semantics): values are
    placed at the given indices, other slots repeat the previous value
    (0 before the first index)."""
    if (
        isinstance(obj, dict)
        and "__index" in obj
        and "__values" in obj
    ):
        idx = np.asarray(obj["__index"], dtype=np.int64)
        vals = np.asarray(obj["__values"])
        n = int(idx[-1]) + 1 if len(idx) else 0
        out = np.zeros(n, dtype=vals.dtype)
        cur = 0
        k = 0
        for i in range(n):
            if k < len(idx) and idx[k] == i:
                cur = vals[k]
                k += 1
            out[i] = cur
        return out
    return obj


class Log:
    """A loaded ba_log.json with convenient iteration arrays."""

    def __init__(self, data: Dict[str, Any]):
        self.data = AttrDict(data)

    @staticmethod
    def load(path: str) -> "Log":
        if path.endswith(".ubjson"):
            from povar_tpu.utils import ubjson

            with open(path, "rb") as f:
                return Log(ubjson.loads(f.read()))
        with open(path) as f:
            return Log(json.load(f))

    @property
    def problem_info(self) -> AttrDict:
        return AttrDict(self.data.get("problem_info", {}))

    def _iterations(self, section: str) -> List[Dict[str, Any]]:
        return self.data.get(section, [])

    def iteration_array(
        self, field: str, section: str = "iterations"
    ) -> np.ndarray:
        its = self._iterations(section)
        return np.array([_decode_rle(it.get(field, 0.0)) for it in its])

    def cost_curve(self, section: str = "iterations"):
        """(cumulative_time, cost) over successful iterations (the
        convergence curve used by the reference's plots)."""
        its = self._iterations(section)
        t = [
            it["cumulative_time"]
            for it in its
            if it.get("step_is_successful")
        ]
        c = [it["cost"] for it in its if it.get("step_is_successful")]
        return np.asarray(t), np.asarray(c)

    def final_cost(self, section: str = "iterations") -> Optional[float]:
        its = self._iterations(section)
        for it in reversed(its):
            if it.get("step_is_successful"):
                return float(it["cost"])
        return None

    def total_time(self, section_solver: str = "solver") -> float:
        s = self.data.get(section_solver, {})
        return float(s.get("total_time_in_seconds", 0.0))
