"""Tests for the experiment tooling (log model, runs, tables, profiles,
FLOP models) — the python/rootba equivalents."""

import json
import os

import numpy as np

from povar_tpu.tools.log import Log, _convert
from povar_tpu.tools.run import Experiment, Run
from povar_tpu.tools.tables import (
    performance_profile,
    results_table,
    time_to_cost_tolerance,
)
from povar_tpu.tools.num_ops import ProblemDims, solve_flops


def _fake_log(costs, dt=1.0):
    its = []
    for i, c in enumerate(costs):
        its.append(
            {
                "iteration": i,
                "step_is_successful": True,
                "cost": c,
                "cumulative_time": (i + 1) * dt,
            }
        )
    return Log({"iterations": its, "solver": {"total_time_in_seconds": 9.0}})


def test_log_cost_curve_and_final():
    log = _fake_log([10.0, 5.0, 2.0, 1.0])
    t, c = log.cost_curve()
    np.testing.assert_allclose(c, [10, 5, 2, 1])
    assert log.final_cost() == 1.0
    assert log.total_time() == 9.0


def test_reference_index_values_decode(tmp_path):
    """Reference-format `<name>__index/<name>__values` fields must decode
    with the SPLIT-at-start-indices semantics of python/rootba/log.py:56-63
    (values concatenated, __index = start offset of each row)."""
    raw = {
        "solver": {
            "cg_iter__index": [0, 3, 5],
            "cg_iter__values": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
            "even__index": [0, 2],
            "even__values": [10.0, 11.0, 20.0, 21.0],
            "plain": 5,
        }
    }
    out = _convert(raw)
    rows = out["solver"]["cg_iter"]
    assert len(rows) == 3
    np.testing.assert_allclose(rows[0], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(rows[1], [4.0, 5.0])
    np.testing.assert_allclose(rows[2], [6.0, 7.0])
    # equal-length rows stack into a 2-D array like the reference
    np.testing.assert_allclose(
        out["solver"]["even"], [[10.0, 11.0], [20.0, 21.0]]
    )
    assert out["solver"]["plain"] == 5

    # end-to-end through Log.load
    p = tmp_path / "ba_log.json"
    p.write_text(json.dumps(raw))
    log = Log.load(str(p))
    assert len(log.data["solver"]["cg_iter"]) == 3


def test_time_to_cost_tolerance():
    log = _fake_log([10.0, 5.0, 2.0, 1.0])
    # threshold 1.0 * 1.5 = 1.5 -> first reached at iteration 3 (t=4)
    assert time_to_cost_tolerance(log, 0.5) == 4.0
    # tolerance 9 -> threshold 10 -> reached at t=1
    assert time_to_cost_tolerance(log, 9.0) == 1.0


def test_results_table_renders():
    runs = {
        "ladybug-49": {"power": _fake_log([5.0, 1.0])},
        "venice-89": {"power": _fake_log([8.0, 2.0]), "pcg": None},
    }
    runs["venice-89"].pop("pcg")
    txt = results_table(runs)
    assert "ladybug-49" in txt and "power" in txt


def test_performance_profile():
    times = {"a": [1.0, 2.0, None], "b": [2.0, 2.0, 5.0]}
    taus, prof = performance_profile(times, taus=[1.0, 2.0, 10.0])
    # a is best on problem 0, tied on 1, fails 2
    np.testing.assert_allclose(prof["a"], [2 / 3, 2 / 3, 2 / 3])
    np.testing.assert_allclose(prof["b"], [2 / 3, 1.0, 1.0])


def test_run_failure_detection(tmp_path):
    d1 = tmp_path / "run1"
    d1.mkdir()
    (d1 / "status.log").write_text("Created\nCompleted\n")
    d2 = tmp_path / "run2"
    d2.mkdir()
    (d2 / "status.log").write_text("Created\n")
    exp = Experiment.load("test", str(tmp_path / "run*"))
    assert not exp.runs["run1"].is_failed
    assert exp.runs["run2"].is_failed
    assert exp.failed_runs == ["run2"]


def test_experiment_cache(tmp_path):
    d1 = tmp_path / "runA"
    d1.mkdir()
    (d1 / "status.log").write_text("Completed")
    cache = str(tmp_path / "cache")
    e1 = Experiment.load("x", str(tmp_path / "run*"), cache_dir=cache)
    assert len(os.listdir(cache)) == 1
    e2 = Experiment.load("x", str(tmp_path / "run*"), cache_dir=cache)
    assert list(e2.runs) == list(e1.runs)


def test_flop_models_ordering():
    d = ProblemDims(n_poses=1778, n_landmarks=993923, n_obs=5001946)
    p = solve_flops(d, "power_varproj", power_terms=10)
    c = solve_flops(d, "cholesky")
    assert p > 0
    # direct Cholesky of a 21336^2 system dwarfs 10 power terms
    assert c > p


def test_ubjson_roundtrip():
    from povar_tpu.utils import ubjson

    doc = {
        "a": 1,
        "b": -3.5,
        "c": "hello",
        "d": [1, 2.0, "x", None, True, False],
        "nested": {"k": [255, 70000, 2**40]},
    }
    assert ubjson.loads(ubjson.dumps(doc)) == doc


def test_ubjson_log_load(tmp_path):
    from povar_tpu.utils import ubjson

    data = {
        "iterations": [
            {"iteration": 0, "step_is_successful": True, "cost": 5.0,
             "cumulative_time": 1.0},
            {"iteration": 1, "step_is_successful": True, "cost": 2.0,
             "cumulative_time": 2.0},
        ]
    }
    p = tmp_path / "ba_log.ubjson"
    p.write_bytes(ubjson.dumps(data))
    log = Log.load(str(p))
    assert log.final_cost() == 2.0
