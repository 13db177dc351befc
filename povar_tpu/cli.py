"""Command-line app mirroring `bin/bal` (src/app/bal.cpp:44-103).

Pipeline: parse (TOML config + CLI overrides, cli/bal_cli_utils.cpp:51-130)
-> load + normalize problem -> two-step bundle adjustment -> postprocess
(save optimized state) -> save ba_log.json.

Every option field is exposed as a generated kebab-case flag
(--solver-<field>, --dataset-<field>, with --no- boolean forms), like
the reference's options-visitor CLI generation (cli/cli_options.cpp:43-147).

Usage:
  python -m povar_tpu.cli --input data_custom/problem-49-7776-pre.txt
  python -m povar_tpu.cli --input problem.txt --create-dataset
  python -m povar_tpu.cli --config rootba_config.toml --dump-config
"""

from __future__ import annotations

import argparse
import dataclasses
import enum
import json
import os
import sys
from typing import Any

from povar_tpu.options import (
    BalAppOptions,
    load_toml,
    options_to_dict,
    options_to_toml,
)
from povar_tpu.problem.bal_io import load_normalized_bal_problem
from povar_tpu.problem.problem import DatasetSummary
from povar_tpu.utils import ba_log
from povar_tpu.utils.timer import Timer


def _add_dataclass_args(
    parser: argparse.ArgumentParser, obj: Any, prefix: str
) -> None:
    """Generate --<prefix>-<kebab-field> flags from a dataclass, like
    the reference's CliArgumentsOptionsVisitor, with help text and
    range annotations from the options metadata
    (cli/cli_options.cpp:43-147)."""
    from povar_tpu.options import option_meta

    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            _add_dataclass_args(parser, v, prefix)
            continue
        flag = f"--{prefix}-{f.name.replace('_', '-')}"
        rng, help_text = option_meta(type(obj), f.name)
        help_text = help_text or ""
        if rng is not None:
            help_text += f" (range [{rng[0]:g}, {rng[1]:g}])"
        help_text += f" (default: {v.value if isinstance(v, enum.Enum) else v})"
        if isinstance(v, bool):
            parser.add_argument(
                flag, dest=f"{prefix}__{f.name}", default=None,
                action="store_true", help=help_text,
            )
            parser.add_argument(
                f"--no-{prefix}-{f.name.replace('_', '-')}",
                dest=f"{prefix}__{f.name}", action="store_false",
                help=argparse.SUPPRESS,
            )
        elif isinstance(v, enum.Enum):
            parser.add_argument(
                flag, dest=f"{prefix}__{f.name}", default=None,
                type=str, help=help_text,
            )
        elif isinstance(v, int):
            parser.add_argument(
                flag, dest=f"{prefix}__{f.name}", default=None,
                type=int, help=help_text,
            )
        elif isinstance(v, float):
            parser.add_argument(
                flag, dest=f"{prefix}__{f.name}", default=None,
                type=float, help=help_text,
            )
        else:
            parser.add_argument(
                flag, dest=f"{prefix}__{f.name}", default=None,
                type=str, help=help_text,
            )


def _apply_overrides(obj: Any, ns: argparse.Namespace, prefix: str) -> None:
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            _apply_overrides(v, ns, prefix)
            continue
        val = getattr(ns, f"{prefix}__{f.name}", None)
        if val is None:
            continue
        if isinstance(v, enum.Enum):
            setattr(obj, f.name, type(v)(str(val).upper()))
        else:
            setattr(obj, f.name, type(v)(val))


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="povar-tpu bal",
        description="TPU-native initialization-free stratified projective "
        "bundle adjustment on BAL problems",
    )
    parser.add_argument("--config", default=None,
                        help="rootba_config.toml-style config file")
    parser.add_argument("--input", default=None, help="input BAL problem")
    parser.add_argument("--create-dataset", action="store_true",
                        help="randomize cameras and write data_custom/")
    parser.add_argument("--dump-config", action="store_true",
                        help="print effective config and exit")
    parser.add_argument("--log-file", default="ba_log.json")
    parser.add_argument("--log-ubjson", action="store_true",
                        help="also write the log as UBJSON next to the "
                        "JSON file (ba_log SaveLogFlags analogue)")
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax profiler trace of the solve "
                        "into this directory (TensorBoard/Perfetto)")
    parser.add_argument("--mesh-devices", default=0, type=int,
                        help="shard the observation axis over this many "
                        "devices (0 = single device); the multi-chip "
                        "analogue of the reference's --num-threads")
    defaults = BalAppOptions()
    _add_dataclass_args(parser, defaults.solver, "solver")
    _add_dataclass_args(parser, defaults.dataset, "dataset")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # config layering: defaults <- toml <- CLI flags
    if args.config and os.path.exists(args.config):
        opts = load_toml(args.config)
    elif os.path.exists("rootba_config.toml") and args.config is None:
        opts = load_toml("rootba_config.toml")
    else:
        opts = BalAppOptions()
    _apply_overrides(opts.solver, args, "solver")
    _apply_overrides(opts.dataset, args, "dataset")

    from povar_tpu.options import validate_options

    violations = validate_options(opts.solver) + validate_options(
        opts.dataset
    )
    if violations:
        for msg in violations:
            print(f"error: option {msg}", file=sys.stderr)
        return 1
    if args.input:
        opts.dataset.input = args.input
    if args.create_dataset:
        opts.dataset.create_dataset = True

    if args.dump_config:
        # reloadable TOML, like the reference's effective-config print
        # (bal_cli_utils.cpp:118-126): dump -> rerun round-trips
        print(options_to_toml(opts), end="")
        return 0

    if not opts.dataset.input:
        print("error: no --input problem given", file=sys.stderr)
        return 1

    import jax

    # honor JAX_PLATFORMS explicitly: some environments pre-register a
    # platform plugin that otherwise overrides the env var
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_enable_x64", True)
    from povar_tpu.solver.pipeline import bundle_adjust

    timer_total = Timer()
    timing: dict = {}
    dataset_summary = DatasetSummary()
    try:
        problem = load_normalized_bal_problem(
            opts.dataset, dataset_summary, timing
        )
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    from povar_tpu.utils.profiling import trace

    mesh = None
    if args.mesh_devices:
        from povar_tpu.parallel.mesh import make_mesh

        n_avail = len(jax.devices())
        if args.mesh_devices > n_avail:
            print(
                f"error: --mesh-devices {args.mesh_devices} but only "
                f"{n_avail} devices available",
                file=sys.stderr,
            )
            return 1
        mesh = make_mesh(args.mesh_devices)

    t_opt = Timer()
    with trace(args.profile_dir):
        problem, s1, s2 = bundle_adjust(problem, opts.solver, mesh=mesh)
    timing["optimize_time"] = t_opt.elapsed()

    t_post = Timer()
    if opts.dataset.save_output:
        problem.save_npz(opts.dataset.output_optimized_path)
    timing["postprocess_time"] = t_post.elapsed()
    timing["total"] = timer_total.elapsed()

    from povar_tpu.utils.profiling import device_memory_stats

    ba_log.save_json(
        args.log_file, dataset_summary, s1, s2, timing,
        save_ubjson=args.log_ubjson,
        device_memory=device_memory_stats(),
    )
    print(f"Saved log to {args.log_file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
