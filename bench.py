"""Benchmark harness (BASELINE.json metric: "Adam iters/sec + wall-clock
per stylized frame", 3D 112x64x112 smoke, 9 Poisson-disk views).

Runs BASELINE config #3 — single-frame 3D stylization at full reference
resolution with 9 views and multi-scale octaves — on the default backend
(the real TPU chip under the driver) and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline: the reference publishes no table (SURVEY.md §6); the papers
imply O(minutes) per 3D frame at ~O(1) Adam iters/sec on a Titan Xp-class
GPU, so vs_baseline = measured_iters_per_sec / 1.0.

NOTE (verify skill): never launch this via a backgrounded shell — the axon
TPU tunnel hangs for detached processes. Run it in the foreground.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax

    from nfs_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.styler.grid import GridStyler

    # BASELINE config #3
    shape = (112, 64, 112)
    octave_n = 3
    iters = 20  # per octave
    cfg = replace(
        StyleConfig(),
        **{
            "render.render_size": (256, 256),
            "render.n_views": 9,
            "render.view_pool": 32,
            "render.transmit": 0.01,
            "loss.style_layers": ("relu1_1", "relu2_1", "relu3_1",
                                  "relu4_1"),
            "loss.style_layer_weights": (1.0, 1.0, 1.0, 1.0),
            "loss.features_dtype": "bfloat16",
            "optim.octave_n": octave_n,
            "optim.octave_scale": 1.8,
            "optim.iters": iters,
            "optim.lr": 0.02,
            "optim.log_every": 10,
        },
    )
    style = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (256, 256, 3)))
    styler = GridStyler(cfg, style_image=style)

    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape],
                             indexing="ij")
    d = (2.0 * np.exp(-4 * (zz ** 2 + (yy + 0.2) ** 2 + xx ** 2))).astype(
        np.float32)

    # --- full frame wall-clock (includes per-octave compiles on 1st call)
    t0 = time.time()
    d_star, _, info = styler.stylize_frame(d)
    np.asarray(d_star)  # sync
    wall_first = time.time() - t0

    # --- steady-state frame (compiles cached) = the per-frame number for
    # sequence workloads, the regime the north-star target measures.
    # Best-of-3: the axon tunnel adds multi-second load spikes (CLAUDE.md)
    # and noise is strictly additive, so min is the honest figure.
    wall = float("inf")
    for _ in range(3):
        t0 = time.time()
        d_star, _, info = styler.stylize_frame(d)
        np.asarray(d_star)
        wall = min(wall, time.time() - t0)
    total_iters = octave_n * iters
    iters_per_sec = total_iters / wall

    # --- fresh-frame steady state (VERDICT r2 weak #8): a DIFFERENT
    # density with the same shapes — proves the steady number is the jit
    # cache, not per-frame data reuse
    d2 = (1.8 * np.exp(-4 * ((zz - 0.1) ** 2 + yy ** 2
                             + (xx + 0.15) ** 2))).astype(np.float32)
    wall_fresh = float("inf")
    for _ in range(2):
        t0 = time.time()
        d2_star, _, _ = styler.stylize_frame(d2)
        np.asarray(d2_star)
        wall_fresh = min(wall_fresh, time.time() - t0)

    # analytic MFU: FLOPs of the frame's 60 iterations vs v5e bf16 peak
    # (frozen-VGG fwd+bwd = 2x fwd; see nfs_tpu/utils/flops.py)
    from nfs_tpu.ops.resize import octave_shapes
    from nfs_tpu.utils.flops import (TPU_V5E_PEAK_BF16, mfu,
                                     styler_step_flops)
    frame_flops = 0.0
    for oshape in octave_shapes(shape, octave_n, cfg.optim.octave_scale):
        rsize = styler._octave_render_size(oshape, shape)
        frame_flops += iters * styler_step_flops(
            oshape, rsize, cfg.render.n_views, cfg.loss.style_layers)
    achieved = frame_flops / wall
    losses = [float(l[-1]) for l in info["octave_losses"]]

    # per-stage breakdown at the finest octave (SURVEY.md §5 tracing;
    # VERDICT r2 #2 — account for the non-VGG share of the step)
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "bench"))
    from stages import stage_breakdown
    stages = stage_breakdown(styler, d, n=6)
    result = {
        "metric": "3d_112x64x112_9view_adam_iters_per_sec",
        "value": round(iters_per_sec, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / 1.0, 3),
        "wall_clock_per_frame_s": round(wall, 3),
        "fresh_frame_steady_s": round(wall_fresh, 3),
        "first_frame_incl_compile_s": round(wall_first, 3),
        "total_iters": total_iters,
        "final_octave_loss": losses[-1],
        "frame_tflops": round(frame_flops / 1e12, 3),
        "achieved_tflops_per_s": round(achieved / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(mfu(achieved, TPU_V5E_PEAK_BF16), 4),
        "stages_ms_finest_octave": stages,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
