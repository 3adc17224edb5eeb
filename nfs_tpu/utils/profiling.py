"""Profiling helpers (SURVEY.md §5 "tracing/profiling": jax.profiler trace
dumps + block_until_ready-bracketed iteration timing; per-stage
jax.named_scope annotation).

Usage:
    with trace("/tmp/jax-trace"):          # view in xprof/tensorboard
        run_octave(...)

    timer = IterationTimer()
    with timer:                             # sync-bracketed wall time
        step(...)
    print(timer.last_ms, timer.mean_ms)
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """jax.profiler trace context; degrades to a no-op if the backend
    doesn't support profiling (the axon tunnel may not)."""
    started = False
    try:
        jax.profiler.start_trace(log_dir,
                                 create_perfetto_link=create_perfetto_link)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class IterationTimer:
    """Wall-clock timer that syncs the device on exit so asynchronous
    dispatch doesn't hide compute (SURVEY.md §5)."""

    def __init__(self):
        self.times_ms = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        # sync: wait for everything in flight on the default device
        try:
            jax.effects_barrier()
        except Exception:
            pass
        self.times_ms.append((time.perf_counter() - self._t0) * 1000.0)
        return False

    @property
    def last_ms(self) -> float:
        return self.times_ms[-1] if self.times_ms else 0.0

    @property
    def mean_ms(self) -> float:
        return (sum(self.times_ms) / len(self.times_ms)
                if self.times_ms else 0.0)


def timed(fn, *args, n: int = 10, warmup: int = 1):
    """Measure the steady-state latency of a jitted callable.

    Returns (mean_ms, last_result). Blocks on results so compile time is
    excluded (after `warmup` calls) and async dispatch is not miscounted.
    """
    result = None
    for _ in range(max(warmup, 1)):
        result = fn(*args)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(n):
        result = fn(*args)
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / n * 1000.0, result


def enable_compile_cache(path: str = "/tmp/nfs_tpu_jax_cache",
                         min_compile_secs: float = 0.5) -> None:
    """Enable JAX's persistent compilation cache (verified working through
    the axon remote-compile path: cross-process recompiles drop from
    seconds/minutes to ~20 ms). Safe to call multiple times.

    The cache dir is keyed by backend platform: CPU AOT executables are
    machine-feature-targeted, and a CPU run loading entries written by the
    TPU-client process hits cpu_aot_loader machine-mismatch errors (and
    stalls). NOTE: this initializes the backend — call any
    ``jax.config.update("jax_platforms", ...)`` override BEFORE this.
    """
    import os

    if os.environ.get("NFS_TPU_PLATFORM"):
        # explicit platform override, honored BEFORE the backend probe
        # below locks the platform. A plain JAX_PLATFORMS env var is NOT
        # sufficient in environments whose interpreter-startup site hook
        # force-selects a platform (e.g. the remote-TPU relay here) —
        # tests/CI set NFS_TPU_PLATFORM=cpu to run CLIs hermetically.
        try:
            jax.config.update("jax_platforms",
                              os.environ["NFS_TPU_PLATFORM"])
        except Exception:
            pass
    path = f"{path}_{jax.default_backend()}"
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
