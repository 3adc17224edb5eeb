"""Per-stage performance breakdown of the stylization step (SURVEY.md §5
tracing/profiling; VERDICT r2 next-round #2: account for the non-VGG
share of the step before calling an MFU number the roofline).

Honest timing over the axon remote-TPU tunnel: ``block_until_ready`` is a
no-op there, so each measured call's INPUT depends (through a tiny scalar
fold) on the previous call's OUTPUT, and the loop ends with a host read —
the measured wall necessarily covers n real executions (see CLAUDE.md).

Usage: imported by bench.py (stage_breakdown) or standalone:

    python bench/stages.py            # full headline shape on the TPU
    python bench/stages.py --small    # quick CPU-sized check
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np


def _scalar(y):
    """Tiny scalar depending on EVERY output leaf — folding it into the
    next input keeps the whole computation live (folding only one leaf
    lets XLA dead-code-eliminate the rest: a value_and_grad leg whose
    grads go unused silently drops its entire backward pass)."""
    import jax.numpy as jnp
    leaves = [l for l in __import__("jax").tree_util.tree_leaves(y)
              if hasattr(l, "dtype")]
    return sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)


def honest_ms(fn, x0, n: int = 6, repeats: int = 3):
    """Steady-state latency of jitted `fn(x)` with data-dependent
    chaining + terminal host read (tunnel-proof). Runs `repeats` passes
    of `n` chained calls and returns the BEST pass's mean ms — the axon
    tunnel adds multi-second load spikes (CLAUDE.md), and noise is
    strictly additive, so min-of-passes is the honest hardware figure.

    CAVEAT: each chained call still pays the relay's per-dispatch floor
    (~1+ ms), so this measures DISPATCH GRANULARITY cost, not pure
    device time — fine for comparing same-call-count variants, wrong for
    absolute per-stage accounting. Use scanned_marginal_ms for that."""
    import jax.numpy as jnp

    y = fn(x0)                       # compile + warm
    float(_scalar(y))                # real sync (host read)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        x = x0
        for _ in range(n):
            y = fn(x)
            # fold a negligible function of y into the next input: forces
            # serialization without changing values measurably (eps*mean)
            x = x0 + jnp.float32(1e-30) * _scalar(y)
        float(_scalar(y))
        best = min(best, (time.perf_counter() - t0) / n * 1000.0)
    return best


def scanned_marginal_ms(fn, x0, n: int = 10, repeats: int = 3):
    """Pure device time per execution of `fn`: runs n and 2n iterations
    of a lax.scan whose body folds fn's output back into the carry (so
    every iteration really executes fn, on device, with NO per-iteration
    dispatch), and returns (min t_2n - min t_n) / n. Differential
    two-point measurement cancels the relay's per-dispatch floor AND the
    single compile/transfer constants (see bench/lnst_stages.py).

    Noise model: tunnel load spikes are strictly ADDITIVE, so min over
    repeats is the clean estimate of each point; differencing the two
    MINIMA (rather than min-of-differences, which a spike on t_n drives
    negative — the r3 BENCH artifact shipped -0.95 ms render times) keeps
    the marginal non-negative up to timer granularity."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("steps",))
    def scan_n(x, steps):
        def body(c, _):
            y = fn(c)
            return x0 + jnp.float32(1e-30) * _scalar(y), ()
        c, _ = jax.lax.scan(body, x, None, length=steps)
        return _scalar(fn(c))

    for steps in (n, 2 * n):         # compile both lengths
        float(scan_n(x0, steps))
    t_min = {n: float("inf"), 2 * n: float("inf")}
    for _ in range(repeats):
        for steps in (n, 2 * n):
            t0 = time.perf_counter()
            float(scan_n(x0, steps))
            t_min[steps] = min(t_min[steps], time.perf_counter() - t0)
    return max(0.0, (t_min[2 * n] - t_min[n]) / n * 1000.0)


def stage_breakdown(styler, d, n: int = 6, key_seed: int = 0):
    """Per-stage ms of one Adam iteration at the FINEST octave of
    `styler`'s config on density `d` (the dominant cost of a frame).
    Each stage is a scanned two-point differential (pure device time —
    the relay's per-dispatch floor and compile/transfer constants
    cancel; see scanned_marginal_ms).

    Stages:
      render      — apply_param + 9-view rotate/raymarch/resize forward
      loss_fwd    — render + VGG features + Gram losses (full forward)
      loss_grad   — jax.value_and_grad of the full loss
      full_step   — loss_grad + Adam update (the scanned production step)
    Derived:
      vgg_fwd ~ loss_fwd - render;  backward ~ loss_grad - loss_fwd;
      adam+apply ~ full_step - loss_grad.

    Self-consistency (VERDICT r3 weak #2): each stage is a superset of
    the previous, so the series MUST be non-decreasing. Residual noise
    that still violates that after the min-of-points differential is
    clamped to the running max; clamped stages are listed in
    ``monotonic_clamped`` and ``consistent`` is False — derived numbers
    are then non-negative by construction, never fiction presented as
    measurement.
    """
    import jax
    import jax.numpy as jnp
    import optax

    cfg = styler.cfg
    d = jnp.asarray(d, jnp.float32)
    shape = d.shape
    render_size = styler._octave_render_size(shape, shape)
    loss_fn = styler._get_loss_fn(d.ndim, 0, render_size)
    data = {"d": d, "pool": styler.view_pool, "vgg": styler.vgg_params,
            "targets": styler.gram_targets,
            "content": styler.content_feats}
    key = jax.random.PRNGKey(key_seed)
    param = styler.init_param(shape)

    render_fn = jax.jit(lambda p: styler._render(
        styler._apply_param(p, d), key, styler.view_pool, render_size))
    fwd_fn = jax.jit(lambda p: loss_fn(p, key, data))
    grad_fn = jax.jit(lambda p: jax.value_and_grad(loss_fn)(p, key, data))

    optimizer = styler._optimizer
    opt_state = optimizer.init(param)

    @jax.jit
    def step_fn(p):
        loss, g = jax.value_and_grad(loss_fn)(p, key, data)
        updates, _ = optimizer.update(g, opt_state, p)
        return optax.apply_updates(p, updates), loss

    raw = {
        "render_ms": scanned_marginal_ms(render_fn, param, n),
        "loss_fwd_ms": scanned_marginal_ms(fwd_fn, param, n),
        "loss_grad_ms": scanned_marginal_ms(grad_fn, param, n),
        "full_step_ms": scanned_marginal_ms(step_fn, param, n),
    }
    order = ("render_ms", "loss_fwd_ms", "loss_grad_ms", "full_step_ms")
    out, clamped, running = {}, [], 0.0
    for k in order:
        v = raw[k]
        if v < running:
            clamped.append(k)
            v = running
        running = v
        out[k] = round(v, 3)
    out["vgg_fwd_ms"] = round(out["loss_fwd_ms"] - out["render_ms"], 3)
    out["backward_ms"] = round(out["loss_grad_ms"] - out["loss_fwd_ms"], 3)
    out["adam_apply_ms"] = round(
        out["full_step_ms"] - out["loss_grad_ms"], 3)
    out["consistent"] = not clamped
    if clamped:
        out["monotonic_clamped"] = clamped
        out["raw_ms"] = {k: round(v, 3) for k, v in raw.items()}
    return out


def main():
    import argparse
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true",
                   help="CPU-sized smoke check")
    p.add_argument("--n", type=int, default=6)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from nfs_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import jax

    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.styler.grid import GridStyler

    shape = (24, 16, 24) if args.small else (112, 64, 112)
    rsize = (64, 64) if args.small else (256, 256)
    cfg = replace(StyleConfig(), **{
        "render.render_size": rsize,
        "render.n_views": 2 if args.small else 9,
        "render.view_pool": 4 if args.small else 32,
        "render.transmit": 0.01,
        "loss.style_layers": (("relu1_1", "relu2_1") if args.small else
                              ("relu1_1", "relu2_1", "relu3_1", "relu4_1")),
        "loss.style_layer_weights": ((1.0,) * 2 if args.small
                                     else (1.0,) * 4),
        "loss.features_dtype": "bfloat16",
    })
    style = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                          rsize + (3,)))
    styler = GridStyler(cfg, style_image=style)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    d = (2.0 * np.exp(-4 * sum(x ** 2 for x in g))).astype(np.float32)

    out = stage_breakdown(styler, d, n=args.n)
    out["shape"] = list(shape)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
