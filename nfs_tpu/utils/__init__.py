"""Observability: profiler traces, iteration timing, structured metrics
(SURVEY.md §5 — the reference had only stdout loss prints; the rebuild
makes iters/sec and per-stage timing first-class outputs)."""

from nfs_tpu.utils.profiling import trace, IterationTimer, timed
from nfs_tpu.utils.metrics import MetricsLogger

__all__ = ["trace", "IterationTimer", "timed", "MetricsLogger"]
