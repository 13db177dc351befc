"""Results tables and performance profiles.

Equivalent of python/rootba/generate_tables.py +
latex/performance_profiles.py: per-problem results tables (final cost,
time-to-tolerance, iterations) and Dolan-More performance profiles
comparing solver configurations by time to reach cost thresholds.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from povar_tpu.tools.log import Log


def time_to_cost_tolerance(
    log: Log, tolerance: float, section: str = "iterations"
) -> Optional[float]:
    """Wall time until the cost first reaches
    min_cost * (1 + tolerance) (the reference's performance-profile
    metric: time-to-cost-tolerance relative to the best cost achieved)."""
    t, c = log.cost_curve(section)
    if len(c) == 0:
        return None
    threshold = c.min() * (1.0 + tolerance)
    idx = np.argmax(c <= threshold)
    if c[idx] > threshold:
        return None
    return float(t[idx])


def results_table(
    runs: Dict[str, Dict[str, Log]],
    tolerance: float = 0.01,
) -> str:
    """Plain-text results table: rows = problems, cols = solvers,
    cells = final cost / time-to-tolerance."""
    solvers = sorted({s for per in runs.values() for s in per})
    lines = ["problem".ljust(28) + "".join(s.ljust(26) for s in solvers)]
    for prob in sorted(runs):
        row = prob.ljust(28)
        for s in solvers:
            log = runs[prob].get(s)
            if log is None:
                row += "-".ljust(26)
                continue
            fc = log.final_cost()
            tt = time_to_cost_tolerance(log, tolerance)
            cell = f"{fc:.4e} / {tt:.2f}s" if fc is not None else "-"
            row += cell.ljust(26)
        lines.append(row)
    return "\n".join(lines)


def performance_profile(
    times: Dict[str, List[Optional[float]]],
    taus: Optional[Sequence[float]] = None,
) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Dolan-More performance profile.

    times[solver][i] = time of solver on problem i (None = failed).
    Returns (taus, {solver: fraction of problems solved within
    tau * best_time}).
    """
    solvers = list(times)
    n_prob = len(next(iter(times.values())))
    mat = np.full((len(solvers), n_prob), np.inf)
    for si, s in enumerate(solvers):
        for pi, t in enumerate(times[s]):
            if t is not None:
                mat[si, pi] = t
    best = mat.min(axis=0)
    if taus is None:
        taus = np.linspace(1.0, 10.0, 200)
    taus = np.asarray(taus)
    profiles = {}
    for si, s in enumerate(solvers):
        ratio = mat[si] / best
        profiles[s] = np.array(
            [(ratio <= tau).mean() for tau in taus]
        )
    return taus, profiles


def latex_results_table(
    runs: Dict[str, Dict[str, Log]], tolerance: float = 0.01
) -> str:
    """LaTeX variant of the results table (generate_tables.py output)."""
    solvers = sorted({s for per in runs.values() for s in per})
    header = (
        "\\begin{tabular}{l" + "c" * len(solvers) + "}\n\\toprule\n"
        + "problem & " + " & ".join(solvers) + " \\\\\n\\midrule\n"
    )
    body = ""
    for prob in sorted(runs):
        cells = []
        for s in solvers:
            log = runs[prob].get(s)
            if log is None or log.final_cost() is None:
                cells.append("--")
            else:
                tt = time_to_cost_tolerance(log, tolerance)
                tts = f"{tt:.2f}" if tt is not None else "--"
                cells.append(f"{log.final_cost():.3e} / {tts}s")
        body += prob.replace("_", "\\_") + " & " + " & ".join(cells)
        body += " \\\\\n"
    return header + body + "\\bottomrule\n\\end{tabular}\n"
