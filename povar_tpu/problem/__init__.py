from povar_tpu.problem.problem import BalProblem, DatasetSummary
from povar_tpu.problem.bal_io import (
    load_bal_text,
    load_bal_eccv,
    create_dataset,
    load_normalized_bal_problem,
)
from povar_tpu.problem.synthetic import synthetic_bal_problem

__all__ = [
    "BalProblem",
    "DatasetSummary",
    "load_bal_text",
    "load_bal_eccv",
    "create_dataset",
    "load_normalized_bal_problem",
    "synthetic_bal_problem",
]
