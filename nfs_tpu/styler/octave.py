"""Octave Adam driver (reference: the host-driven octave loop with numpy
Adam moments, SURVEY.md §3.2). TPU-native redesign: optax Adam state lives
on device and each octave's whole iteration loop is ONE jitted
``lax.scan`` — no host<->device crossing per iteration (the reference
crossed every iteration, a major inefficiency SURVEY.md §3.2 calls out).

``run_octave`` is engine-agnostic: it optimizes any pytree of variables
under ``loss_fn(params, key, data) -> scalar`` where ``data`` is a pytree
of (traced) constants for the octave — densities, VGG weights, Gram
targets, view pools. Passing data as arguments (rather than closing over
device arrays) keeps compiled executables free of giant embedded constants
and lets the jit cache hit across frames of a sequence: the cache key is
(loss_fn identity, shapes), so engines cache one loss_fn per structural
signature and stream frames through it.

Iterations run in chunks of ``log_every`` so the host can log/checkpoint
between chunks without recompiling (one compile per octave shape).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _scan_chunk_core(params, opt_state, keys, data, loss_fn, optimizer):
    """Unjitted chunk body — parallel engines vmap this over a keyframe
    batch (parallel/particles.py) instead of calling the jitted wrapper."""
    def step(carry, key):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, key, data)
        updates, s = optimizer.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), keys)
    return params, opt_state, losses


_scan_chunk = partial(jax.jit, static_argnames=("loss_fn", "optimizer"),
                      donate_argnums=(0, 1))(_scan_chunk_core)


def run_octave(
    params,
    loss_fn: Callable,
    data,
    key: jax.Array,
    iters: int,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    log_every: int = 10,
    callback: Callable = None,
    optimizer=None,
    init_opt_state=None,
    start_iter: int = 0,
    state_callback: Callable = None,
) -> Tuple[object, np.ndarray, object]:
    """Optimize `params` with Adam for `iters` steps.

    Args:
      params: pytree of optimization variables.
      loss_fn: (params, key, data) -> scalar loss. Must be jit-traceable
        and have a STABLE identity across calls (cache it!) so the jitted
        scan is compiled once per shape signature.
      data: pytree of octave-constant arrays threaded through the scan.
      key: PRNG key; split per iteration for view sampling.
      callback: optional host fn(step, mean_chunk_loss) called between
        chunks (logging hook).
      optimizer: optional optax transformation with a stable identity; by
        default an optax.adam is built per call (fine for single frames —
        sequences should pass a cached one to avoid recompiles).
      init_opt_state: resume the optimizer from a checkpointed state
        (SURVEY.md §5 checkpoint-resume) instead of a fresh init.
      start_iter: resume point — the first `start_iter` iterations are
        considered already done (the per-iteration PRNG stream continues
        from the chunk boundary, so a resumed run matches a straight run
        chunk-for-chunk as long as log_every is unchanged).
      state_callback: optional host fn(done, params, opt_state) called
        after each chunk — the checkpoint hook.

    Returns:
      (optimized params, per-iteration losses from this run, opt_state).
    """
    if optimizer is None:
        optimizer = optax.adam(lr, b1=b1, b2=b2)
    opt_state = (init_opt_state if init_opt_state is not None
                 else optimizer.init(params))
    # no observers => run the whole octave as ONE device dispatch (each
    # chunk boundary otherwise costs a host sync, which over a remote TPU
    # tunnel is an RTT)
    chunk = log_every if (callback is not None
                          or state_callback is not None) else iters
    all_losses = []
    done = 0
    while done < iters:
        n = min(chunk, iters - done)
        key, sub = jax.random.split(key)
        if done + n <= start_iter:  # fast-forward PRNG stream on resume
            done += n
            continue
        keys = jax.random.split(sub, n)
        params, opt_state, losses = _scan_chunk(
            params, opt_state, keys, data, loss_fn, optimizer)
        done += n
        all_losses.append(losses)  # stays on device until the end
        # checkpoint BEFORE the logging callback: a crash in user logging
        # must not lose the finished chunk
        if state_callback is not None:
            state_callback(done, params, opt_state)
        if callback is not None:
            callback(done, float(jnp.mean(losses)))
    # losses stay ON DEVICE (async): converting here would force a host
    # sync per octave, which over a remote-TPU tunnel costs ~an RTT.
    losses_out = (jnp.concatenate(all_losses) if all_losses
                  else jnp.zeros((0,), jnp.float32))
    return params, losses_out, opt_state
