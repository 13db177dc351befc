"""Dataset I/O tests: BAL text round-trip through --create-dataset and
load_bal_eccv, native vs python tokenizer equality, npz persistence,
normalize/filter behavior, and the CLI app end-to-end."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from povar_tpu.options import BalDatasetOptions
from povar_tpu.problem import bal_io
from povar_tpu.problem.problem import BalProblem
from povar_tpu.problem.synthetic import synthetic_bal_problem, write_bal_text
from povar_tpu.utils import native

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.quick


@pytest.fixture
def bal_file(tmp_path):
    problem, gt = synthetic_bal_problem(
        n_cams=5, n_lms=30, obs_per_lm=4, seed=41
    )
    path = tmp_path / "problem-5-30-pre.txt"
    write_bal_text(
        str(path),
        problem.num_cameras,
        problem.num_landmarks,
        problem.obs_cam,
        problem.obs_lm,
        problem.obs_uv,
        lm_p=problem.lm_p,
    )
    return str(path), problem


def test_create_dataset_and_load(bal_file, tmp_path, monkeypatch):
    path, orig = bal_file
    monkeypatch.chdir(tmp_path)
    out = bal_io.create_dataset(path, seed=7)
    assert os.path.exists(out)

    loaded = bal_io.load_bal_eccv(out, seed=7)
    assert loaded.num_cameras == orig.num_cameras
    assert loaded.num_landmarks == orig.num_landmarks
    assert loaded.num_observations == orig.num_observations
    # third space-matrix row is [0,0,0,1] (random projective init)
    np.testing.assert_allclose(
        loaded.cam_space[:, 2, :],
        np.tile([0.0, 0.0, 0.0, 1.0], (orig.num_cameras, 1)),
    )
    # rows 0-1 are N(0,1) draws: check they're not degenerate
    assert np.abs(loaded.cam_space[:, :2, :]).std() > 0.3
    # y axis inverted relative to the file
    sorted_orig = orig  # already sorted
    # match observations by (lm, cam)
    key_o = sorted_orig.obs_lm.astype(np.int64) * 10**6 + sorted_orig.obs_cam
    key_l = loaded.obs_lm.astype(np.int64) * 10**6 + loaded.obs_cam
    np.testing.assert_array_equal(np.sort(key_o), np.sort(key_l))
    oo = np.argsort(key_o)
    ll = np.argsort(key_l)
    np.testing.assert_allclose(
        loaded.obs_uv[ll][:, 1], -sorted_orig.obs_uv[oo][:, 1], atol=2e-6
    )
    np.testing.assert_allclose(
        loaded.obs_uv[ll][:, 0], sorted_orig.obs_uv[oo][:, 0], atol=2e-6
    )


def test_native_tokenizer_matches_python(bal_file):
    path, _ = bal_file
    if not native.available():
        pytest.skip("native library not built")
    nat = native.parse_tokens(path)
    with open(path, "rb") as f:
        py = np.array(f.read().split(), dtype=np.float64)
    np.testing.assert_allclose(nat, py)


def test_npz_roundtrip(bal_file, tmp_path):
    _, problem = bal_file
    p = str(tmp_path / "state.npz")
    problem.save_npz(p)
    loaded = BalProblem.load_npz(p)
    np.testing.assert_allclose(loaded.cam_space, problem.cam_space)
    np.testing.assert_allclose(loaded.lm_p, problem.lm_p)
    np.testing.assert_array_equal(loaded.obs_cam, problem.obs_cam)


def test_normalize_median_mad():
    problem, _ = synthetic_bal_problem(
        n_cams=5, n_lms=51, obs_per_lm=4, seed=42
    )
    problem.normalize(100.0)
    m = problem.num_landmarks
    mid = m // 2
    median = np.partition(problem.lm_p, mid, axis=0)[mid]
    np.testing.assert_allclose(median, 0.0, atol=1e-9)
    dev = np.abs(problem.lm_p - median).sum(axis=1)
    mad = np.partition(dev, mid)[mid]
    np.testing.assert_allclose(mad, 100.0, rtol=1e-9)


def test_filter_obs_drops_and_reindexes():
    problem, _ = synthetic_bal_problem(
        n_cams=6, n_lms=40, obs_per_lm=4, seed=43, random_cameras=False
    )
    # push some landmarks behind the threshold
    problem.lm_p[::3, 2] = -5.0
    n_before = problem.num_landmarks
    problem.filter_obs(0.1)
    assert problem.num_landmarks < n_before
    counts = np.bincount(problem.obs_lm, minlength=problem.num_landmarks)
    assert counts.min() >= 2
    assert problem.obs_lm.max() == problem.num_landmarks - 1


def test_rcs_sparsity_simple():
    # two cameras, all landmarks seen by both: RCS is dense -> sparsity 0
    obs_cam = np.array([0, 1, 0, 1], dtype=np.int32)
    obs_lm = np.array([0, 0, 1, 1], dtype=np.int32)
    problem = BalProblem(
        cam_space=np.zeros((2, 3, 4)),
        intrinsics=np.zeros((2, 3)),
        lm_p=np.zeros((2, 3)),
        obs_cam=obs_cam,
        obs_lm=obs_lm,
        obs_uv=np.zeros((4, 2)),
    )
    assert problem.compute_rcs_sparsity() == 0.0


def test_cli_end_to_end(bal_file, tmp_path, monkeypatch):
    path, _ = bal_file
    monkeypatch.chdir(tmp_path)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO_ROOT
    env.pop("XLA_FLAGS", None)
    # create-dataset exits 0 after writing
    r = subprocess.run(
        [sys.executable, "-m", "povar_tpu.cli", "--input", path,
         "--create-dataset"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    custom = os.path.join(str(tmp_path), "data_custom",
                          os.path.basename(path))
    assert os.path.exists(custom)

    r = subprocess.run(
        [sys.executable, "-m", "povar_tpu.cli", "--input", custom,
         "--solver-max-num-iterations-step-1", "4",
         "--solver-max-num-iterations-step-2", "4",
         "--log-file", "ba_log.json"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    log = json.load(open(os.path.join(str(tmp_path), "ba_log.json")))
    assert log["problem_info"]["num_cameras"] == 5
    assert len(log["iterations1"]) >= 2
    assert len(log["iterations"]) >= 2
    assert log["solver1"]["solver_type"] == "power_variable_projection"
    costs1 = [it["cost"] for it in log["iterations1"]]
    assert costs1[-1] < costs1[0]


def test_cli_dump_config(tmp_path):
    """--dump-config emits reloadable TOML (bal_cli_utils.cpp:118-126:
    the reference prints its effective config in the format it loads)."""
    import tomllib

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO_ROOT
    r = subprocess.run(
        [sys.executable, "-m", "povar_tpu.cli", "--dump-config",
         "--solver-alpha", "0.25"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr
    cfg = tomllib.loads(r.stdout)
    assert cfg["solver"]["alpha"] == 0.25
    assert cfg["solver"]["solver_type_step_1"] == "POWER_VARPROJ"


def test_dump_config_toml_roundtrip(tmp_path):
    """dump -> load -> identical options, including non-default enums
    and nested residual options (VERDICT r3 #8)."""
    from povar_tpu.options import (
        BalAppOptions, RobustNorm, SolverType, load_toml,
        options_to_dict, options_to_toml,
    )

    opts = BalAppOptions()
    opts.solver.alpha = 0.125
    opts.solver.solver_type_step_1 = SolverType.PCG
    opts.solver.residual.robust_norm = RobustNorm.HUBER
    opts.solver.residual.huber_parameter = 2.5
    opts.dataset.input = "some/problem.txt"
    opts.dataset.random_seed = 99
    path = tmp_path / "rootba_config.toml"
    path.write_text(options_to_toml(opts))
    loaded = load_toml(str(path))
    assert options_to_dict(loaded) == options_to_dict(opts)


def test_toml_config(tmp_path):
    cfg = tmp_path / "rootba_config.toml"
    cfg.write_text(
        """
[dataset]
input = "foo.txt"
random_seed = 123

[solver]
alpha = 0.5
solver_type_step_1 = "PCG"
max_num_iterations_step_1 = 7

[solver.residual]
robust_norm = "HUBER"
huber_parameter = 2.0

[batch_run]
ignored_key = true
"""
    )
    from povar_tpu.options import RobustNorm, SolverType, load_toml

    opts = load_toml(str(cfg))
    assert opts.dataset.input == "foo.txt"
    assert opts.dataset.random_seed == 123
    assert opts.solver.alpha == 0.5
    assert opts.solver.solver_type_step_1 == SolverType.PCG
    assert opts.solver.max_num_iterations_step_1 == 7
    assert opts.solver.residual.robust_norm == RobustNorm.HUBER
    assert opts.solver.residual.huber_parameter == 2.0


def test_cli_option_range_validation(tmp_path, capsys):
    """Out-of-range option values are rejected with a clear error
    (the reference's VISITABLE_META range() enforcement)."""
    from povar_tpu.cli import main

    rc = main(["--input", "nonexistent.txt", "--solver-alpha", "3.0"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "alpha" in err and "range" in err


def test_option_validate_ranges():
    from povar_tpu.options import SolverOptions, validate_options

    opts = SolverOptions()
    assert validate_options(opts) == []
    opts.alpha = -0.5
    opts.power_sc_iterations = -3
    errs = validate_options(opts)
    assert len(errs) == 2
    assert any("alpha" in e for e in errs)


def test_autodetect_input_type(bal_file, tmp_path, monkeypatch):
    """AUTO resolves by camera-block arity: 9 -> original BAL,
    15 -> data_custom/ECCV (VERDICT r3 #4; the reference's own
    autodetect, bal_problem.cpp:131-133, always returns BAL and
    misparses mismatched files — we error instead)."""
    path, _ = bal_file
    monkeypatch.chdir(tmp_path)
    assert bal_io.autodetect_input_type(path) == "BAL"
    out = bal_io.create_dataset(path, seed=7)
    assert bal_io.autodetect_input_type(out) == "ECCV"

    # an original BAL file without --create-dataset errors clearly
    opts = BalDatasetOptions(input=path)
    with pytest.raises(ValueError, match="create-dataset"):
        bal_io.load_normalized_bal_problem(opts)

    # explicit ECCV on a 9-number file: arity mismatch error
    opts = BalDatasetOptions(input=path, input_type="ECCV")
    with pytest.raises(ValueError, match="arity"):
        bal_io.load_normalized_bal_problem(opts)

    # --create-dataset on an already-randomized file errors
    opts = BalDatasetOptions(input=out, create_dataset=True)
    with pytest.raises(ValueError, match="already randomized"):
        bal_io.load_normalized_bal_problem(opts)

    # the valid paths still work
    opts = BalDatasetOptions(input=out)
    p = bal_io.load_normalized_bal_problem(opts)
    assert p.num_cameras == 5
    opts = BalDatasetOptions(input=out, input_type="ECCV")
    p = bal_io.load_normalized_bal_problem(opts)
    assert p.num_cameras == 5
    opts = BalDatasetOptions(input=path, create_dataset=True)
    with pytest.raises(SystemExit):
        bal_io.load_normalized_bal_problem(opts)

    # garbage token count: clear error naming both grammars
    bad = tmp_path / "bad.txt"
    bad.write_text("2 3 4\n1 2 3 4\n")
    with pytest.raises(ValueError, match="neither"):
        bal_io.autodetect_input_type(str(bad))

    # unknown explicit type
    opts = BalDatasetOptions(input=out, input_type="CEREAL")
    with pytest.raises(ValueError, match="input_type"):
        bal_io.load_normalized_bal_problem(opts)


def test_committed_bal_fixture_full_chain(tmp_path, monkeypatch):
    """The committed miniature original-format BAL fixture (realistic
    Rodrigues/translation/f/k1/k2 magnitudes, BAL -z projection; see
    scripts/gen_bal_fixture.py — real archives are not downloadable in
    CI) exercises the full --create-dataset -> load -> solve chain on
    actual BAL text (VERDICT r3 missing #4)."""
    import jax.numpy as jnp

    from povar_tpu.options import SolverOptions
    from povar_tpu.solver.pipeline import bundle_adjust

    fixture = os.path.join(
        os.path.dirname(__file__), "data", "mini-bal-12-48-pre.txt"
    )
    assert bal_io.autodetect_input_type(fixture) == "BAL"
    # original BAL parse: realistic magnitudes survived the round trip
    n_c, n_l, n_o, _oc, _ol, ouv, cam9, lmp = bal_io.load_bal_text(
        fixture
    )
    assert (n_c, n_l) == (12, 48)
    assert 300 < np.abs(cam9[:, 6]).mean() < 700  # f in pixels
    assert np.abs(ouv).max() < 2000  # pixel-scale measurements

    monkeypatch.chdir(tmp_path)
    out = bal_io.create_dataset(fixture, seed=3)
    opts = BalDatasetOptions(input=out, random_seed=3)
    problem = bal_io.load_normalized_bal_problem(opts)
    assert problem.num_cameras == 12

    so = SolverOptions()
    so.max_num_iterations_step_1 = 8
    so.max_num_iterations_step_2 = 4
    _, s1, s2 = bundle_adjust(problem, so, log=lambda s: None)
    c1 = [it.cost.all.error for it in s1.iterations
          if it.step_is_successful and it.cost is not None]
    assert len(c1) >= 3 and c1[-1] < 0.05 * c1[0]
    assert s2.num_successful_steps >= 1
