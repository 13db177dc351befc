"""The produced ba_log.json must be consumable by the reference's
offline tooling (VERDICT r3 #2).

The reference reads a FLAT column-major log: per-iteration fields as
top-level arrays, `_type: "rootba_povar"`, and
`_static: {problem_info, timing, solver}` (ba_log.cpp:60-150). Its
Python tooling (python/rootba/log.py, metric.py) is not installable
here (munch/ubjson deps), so this test vendors the ~40 relevant lines
of its loading semantics (Log._convert, log.py:51-84) and then
evaluates the reference metric accessor patterns
(metric.py:126-172) against a log produced by a real two-step solve.
"""

import json
import numbers

import numpy as np
import pytest

from povar_tpu import SolverOptions, bundle_adjust
from povar_tpu.problem.problem import DatasetSummary
from povar_tpu.problem.synthetic import synthetic_bal_problem
from povar_tpu.utils import ubjson
from povar_tpu.utils.ba_log import build_log, save_json

pytestmark = pytest.mark.quick


def _convert(data):
    """Vendored semantics of the reference loader's Log._convert
    (python/rootba/log.py:51-84): recursively turn 1-D/2-D lists of
    numbers into numpy arrays (dicts stay dicts; the reference uses
    Munch, where attribute access == item access)."""
    if isinstance(data, dict):
        return {k: _convert(v) for k, v in data.items()}
    if isinstance(data, list) and data:
        if isinstance(data[0], dict):
            return [_convert(x) for x in data]
        if isinstance(data[0], numbers.Number):
            return np.array(data)
    return data


@pytest.fixture(scope="module")
def solved():
    prob, _ = synthetic_bal_problem(
        n_cams=8, n_lms=50, obs_per_lm=4, seed=7, noise=0.01
    )
    prob.sort_observations()
    opts = SolverOptions()
    opts.max_num_iterations_step_1 = 6
    opts.max_num_iterations = 4
    _, s1, s2 = bundle_adjust(prob, opts, log=lambda s: None)
    ds = DatasetSummary(
        input_path="synthetic://tiny",
        num_cameras=prob.num_cameras,
        num_landmarks=prob.num_landmarks,
        num_observations=prob.num_observations,
    )
    return ds, s1, s2


@pytest.fixture(scope="module")
def log(solved):
    ds, s1, s2 = solved
    raw = build_log(ds, s1, s2, timing={"total": 1.0})
    # JSON round-trip first: what the tooling sees is the file
    return _convert(json.loads(json.dumps(raw)))


def test_type_and_static_sections(log):
    # ba_log.cpp:110-113
    assert log["_type"] == "rootba_povar"
    st = log["_static"]
    assert set(st) >= {"problem_info", "timing", "solver"}
    # metric.py accessor patterns: l._static.solver.<field>
    sv = st["solver"]
    assert isinstance(sv["solver_type"], str)
    assert sv["num_linear_solves"] > 0
    assert sv["num_residual_evaluations"] > 0
    assert sv["num_jacobian_evaluations"] > 0
    assert isinstance(sv["total_time_in_seconds"], float)
    assert isinstance(sv["linear_solver_time_in_seconds"], float)
    assert sv["termination_type"] in (
        "CONVERGENCE", "NO_CONVERGENCE", "FAILURE",
    )
    pi = st["problem_info"]
    assert pi["num_cameras"] == 8
    assert pi["num_observations"] > 0


def test_flat_iteration_arrays(log, solved):
    """Every BaIteration field is a top-level array spanning BOTH steps
    (the reference appends step-2 iterations to the same summary,
    bal_bundle_adjustment.cpp:556-583)."""
    _, s1, s2 = solved
    n = len(s1.iterations) + len(s2.iterations)
    fields = [
        "iteration", "step_is_valid", "step_is_successful", "cost",
        "cost_valid", "cost_avg_valid", "cost_change",
        "relative_decrease", "trust_region_radius",
        "linear_solver_iterations", "iteration_time",
        "cumulative_time", "step_solver_time",
        "residual_evaluation_time", "jacobian_evaluation_time",
        "stage1_time", "stage2_time", "prepare_time",
        "solve_reduced_system_time", "back_substitution_time",
        "update_cameras_time", "num_obs", "num_obs_valid",
        "resident_memory", "resident_memory_peak", "step_norm",
        "grad_norm", "grad_max_norm",
    ]
    for f in fields:
        assert f in log, f"missing flat field {f}"
        assert isinstance(log[f], np.ndarray), f
        assert len(log[f]) == n, f

    # the iteration counter restarts at 0 at the step-2 boundary
    it = log["iteration"]
    assert it[0] == 0
    assert it[len(s1.iterations)] == 0
    # metric accessor patterns (metric.py:139-166)
    last = n - 1
    assert log["cost"][last] > 0
    assert log["cost_valid"][last] > 0
    assert float(log["stage1_time"].sum()) >= 0.0
    assert float(log["stage2_time"].sum()) >= 0.0
    assert (
        log["stage1_time"].sum()
        + log["stage2_time"].sum()
        + log["step_solver_time"].sum()
        + log["back_substitution_time"].sum()
    ) >= 0.0


def test_carry_forward_on_unsuccessful(log, solved):
    """Unsuccessful iterations repeat the previous cost fields and zero
    the change fields (ba_log_utils.cpp:125-141) — so within one step,
    the cost array is non-increasing."""
    _, s1, s2 = solved
    n1 = len(s1.iterations)
    cost = log["cost"]
    succ = log["step_is_successful"]
    for a, b in ((0, n1), (n1, len(cost))):
        seg = cost[a:b]
        assert np.all(np.diff(seg) <= 1e-12)
    for k in range(1, len(cost)):
        if k == n1:
            continue  # step boundary: different cost function
        if not succ[k]:
            assert cost[k] == cost[k - 1]
            assert log["cost_change"][k] == 0.0
            assert log["relative_decrease"][k] == 0.0


def test_ubjson_roundtrip_matches_json(solved, tmp_path):
    ds, s1, s2 = solved
    path = str(tmp_path / "ba_log.json")
    save_json(path, ds, s1, s2, timing={"total": 1.0}, save_ubjson=True)
    with open(path) as f:
        j = json.load(f)
    with open(str(tmp_path / "ba_log.ubjson"), "rb") as f:
        u = ubjson.loads(f.read())
    assert u == j
    assert j["_type"] == "rootba_povar"


def test_own_tools_still_read_the_log(solved, tmp_path):
    """povar_tpu.tools reads the kept nested sections."""
    from povar_tpu.tools.log import Log

    ds, s1, s2 = solved
    path = str(tmp_path / "ba_log.json")
    save_json(path, ds, s1, s2, timing={"total": 1.0})
    l = Log.load(path)
    assert l.final_cost() > 0
    assert l.final_cost("iterations1") > 0
    assert l.problem_info.num_cameras == 8
