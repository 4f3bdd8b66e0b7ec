"""Optimizer layer: jitted LM / dogleg-TR loops + hybrid controller."""

from psba_tpu.solvers.types import (
    ProblemArrays,
    SolverConfig,
    resolve_damping,
)
from psba_tpu.solvers.lm import lm_run
from psba_tpu.solvers.tr import tr_run
from psba_tpu.solvers.hybrid import solve

__all__ = [
    "ProblemArrays", "SolverConfig", "resolve_damping", "lm_run",
    "tr_run", "solve",
]
