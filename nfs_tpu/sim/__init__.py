"""Self-contained JAX fluid data generators (replacing the reference's
external mantaflow C++ dependency — SURVEY.md §2 native-code table: the
reference vendors no native code; its data generator is the external
mantaflow binary driven by ``scene/*.py``. Here the solvers are jittable
JAX so the framework is self-contained for tests and benchmarks)."""

from nfs_tpu.sim.smoke import SmokeSolver, smoke_sequence
from nfs_tpu.sim.flip import FlipSolver, liquid_sequence

__all__ = ["SmokeSolver", "smoke_sequence", "FlipSolver", "liquid_sequence"]
