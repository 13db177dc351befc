#!/usr/bin/env python3
"""Batch runner: execute every rootba_config_*.toml under a folder.

Equivalent of the reference's scripts/run-all-in.sh + run-one.sh +
rerun-failed-in.sh protocol: for each config, create a timestamped run
directory, write status.log ("Created" -> "Completed"), tee solver
output to output.log, save config.json and ba_log.json. `--rerun-failed`
re-executes runs whose status.log lacks "Completed".

Usage:
  python scripts/run_batch.py <folder> [--rerun-failed] [--dry-run]
"""

from __future__ import annotations

import argparse
import datetime
import glob
import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(config_path: str, run_dir: str, dry_run: bool = False) -> bool:
    os.makedirs(run_dir, exist_ok=True)
    status = os.path.join(run_dir, "status.log")
    with open(status, "w") as f:
        f.write("Created\n")
    cmd = [
        sys.executable,
        "-m",
        "povar_tpu.cli",
        "--config",
        os.path.abspath(config_path),
        "--log-file",
        os.path.join(run_dir, "ba_log.json"),
    ]
    if dry_run:
        print(" ".join(cmd))
        return True
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    with open(os.path.join(run_dir, "output.log"), "w") as out:
        proc = subprocess.run(
            cmd, cwd=run_dir, env=env, stdout=out, stderr=subprocess.STDOUT
        )
    if proc.returncode == 0:
        with open(status, "a") as f:
            f.write("Completed\n")
        return True
    with open(status, "a") as f:
        f.write(f"Failed (exit {proc.returncode})\n")
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("folder")
    ap.add_argument("--rerun-failed", action="store_true")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--only", default=None,
                    help="run only this config file (used by the SLURM "
                    "fan-out, scripts/slurm-run-all.sh)")
    args = ap.parse_args()

    configs = sorted(
        glob.glob(os.path.join(args.folder, "**", "rootba_config_*.toml"),
                  recursive=True)
        + glob.glob(os.path.join(args.folder, "rootba_config.toml"))
    )
    if args.only:
        only = os.path.abspath(args.only)
        configs = [c for c in configs if os.path.abspath(c) == only]
    if not configs:
        print(f"no rootba_config_*.toml under {args.folder}")
        return 1

    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    n_ok = n_fail = n_skip = 0
    for cfg in configs:
        base = os.path.splitext(os.path.basename(cfg))[0]
        parent = os.path.dirname(cfg)
        if args.rerun_failed:
            # find existing run dirs for this config; rerun failed ones
            existing = sorted(glob.glob(os.path.join(parent, base + "_*")))
            failed = [
                d
                for d in existing
                if os.path.isdir(d)
                and "Completed"
                not in open(os.path.join(d, "status.log")).read()
            ]
            if not failed:
                n_skip += 1
                continue
            targets = failed
        else:
            targets = [os.path.join(parent, f"{base}_{stamp}")]
        for run_dir in targets:
            ok = run_one(cfg, run_dir, args.dry_run)
            n_ok += ok
            n_fail += not ok
            print(f"[{'ok' if ok else 'FAIL'}] {run_dir}")
    print(f"done: {n_ok} ok, {n_fail} failed, {n_skip} skipped")
    return 0 if n_fail == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
