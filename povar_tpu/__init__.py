"""povar_tpu — TPU-native Power Variable Projection bundle adjustment.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tum-vision/povar (ECCV 2024, "Power Variable Projection for
Initialization-Free Large-Scale Bundle Adjustment"): initialization-free
stratified projective bundle adjustment on BAL datasets.

Pipeline (reference: src/rootba_povar/solver/bal_bundle_adjustment.cpp:848-876):
  step 1  pOSE VarProj over 12-dof projective camera matrices, landmarks
          eliminated in closed form; linear solvers POWER_VARPROJ /
          POWER_SCHUR_COMPLEMENT / PCG / CHOLESKY.
  step 2  Riemannian refinement on the quotient manifold (homogeneous
          landmarks, normalized cameras); solvers RIPOBA / RIPCG.

Design: instead of the reference's per-landmark heap blocks + TBB +
mutexes, all state lives in flat observation-major device arrays;
per-camera/per-landmark accumulation is `segment_sum` over the
camera-landmark bipartite graph; LM inner loops are jit-ed; landmarks
shard across a `jax.sharding.Mesh` with XLA-inserted collectives.

Double precision is required for cost parity with the reference
(README.md:75); we enable jax x64 at import (set POVAR_TPU_NO_X64=1 to
opt out and run f32).
"""

import os

if not os.environ.get("POVAR_TPU_NO_X64"):
    import jax

    jax.config.update("jax_enable_x64", True)

# persistent compilation cache: TPU compiles of the big f64 programs are
# expensive (minutes via AOT services); cache them across processes
if not os.environ.get("POVAR_TPU_NO_COMPILATION_CACHE"):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "POVAR_TPU_CACHE_DIR",
            os.path.expanduser("~/.cache/povar_tpu_xla"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from povar_tpu.options import (  # noqa: E402
    BalDatasetOptions,
    BalResidualOptions,
    SolverOptions,
)
from povar_tpu.problem.problem import BalProblem  # noqa: E402
from povar_tpu.solver.pipeline import bundle_adjust  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "BalProblem",
    "BalDatasetOptions",
    "BalResidualOptions",
    "SolverOptions",
    "bundle_adjust",
]
