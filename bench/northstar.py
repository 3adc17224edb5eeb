"""North-star benchmark (BASELINE.json): stylize a 200-frame 112x64x112
smoke sequence END-TO-END and report wall-clock. Target: < 10 min on
v5e-8; this measures the single-chip sequential path (the
ParallelSequenceStyler spreads frames across a mesh on real multi-chip
hardware).

    python bench/northstar.py [--frames 200] [--iters 10]

Run in the FOREGROUND (axon tunnel hangs for backgrounded processes).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--iters", type=int, default=10,
                   help="per octave; sequence frames warm-start from the "
                        "advected previous solution (TNST §6), needing "
                        "fewer iterations than a cold single frame")
    p.add_argument("--window", type=int, default=1)
    p.add_argument("--fused", type=int, default=8,
                   help="frames per device dispatch (0 = streaming path)")
    p.add_argument("--sim_budget", type=float, default=420.0,
                   help="seconds of sim generation per invocation (clean "
                        "chunk-boundary exit + resume; avoids hard kills "
                        "that wedge the remote TPU tunnel)")
    p.add_argument("--warm_iters", type=int, default=None,
                   help="optim.warm_iters: schedule for warm-started "
                        "chain frames (see docs/QUALITY_warm.json)")
    p.add_argument("--warm_lr", type=float, default=None)
    p.add_argument("--out", default="BENCH_NORTHSTAR.json")
    p.add_argument("--sim_only", action="store_true",
                   help="generate + cache the sim data, then exit (lets "
                        "sim and stylization run in separate processes "
                        "under external timeouts)")
    args = p.parse_args()

    import jax

    from nfs_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.sim.smoke import SmokeConfig, smoke_sequence
    from nfs_tpu.styler.grid import GridStyler

    t_all = time.time()
    # 1. data generation (self-contained; excluded from the stylization
    #    clock like the reference's offline mantaflow step). Cached on
    #    disk so repeat benchmark runs skip it.
    import os

    from nfs_tpu.io.stream import (iter_sequence_blocks,
                                   load_sequence_cache,
                                   sequence_cache_complete)
    from nfs_tpu.sim.smoke import smoke_sequence_cached

    # chunk-DIRECTORY cache (nfs_tpu.io.stream): block reads overlap the
    # device's async compute — this disk reads at ~15-40 MB/s, so a
    # monolithic multi-GB npz load stalled the old pipeline for minutes
    cache = f"/tmp/northstar_{args.frames}"
    legacy = cache + ".npz"
    if os.path.exists(legacy):
        cache = legacy
    t0 = time.time()
    if not sequence_cache_complete(cache):
        # resumable chunked generation: the 3D solver compile alone is
        # O(minutes) on the remote TPU; progress survives a time-boxed
        # process (re-invoke --sim_only until it reports complete)
        complete = smoke_sequence_cached(
            SmokeConfig(shape=(112, 64, 112),
                        source_center=(0.5, 0.85, 0.5),
                        jacobi_iters=20, max_disp=2.0),
            args.frames, cache, warmup=10, budget_s=args.sim_budget)
        t_sim = time.time() - t0
        if not complete:
            print(f"sim: budget hit after {t_sim:.1f}s — partial progress "
                  f"saved, re-run to continue", flush=True)
            return
        print(f"sim: {args.frames} frames in {t_sim:.1f}s", flush=True)
    t_sim = time.time() - t0
    if args.sim_only:
        return

    cfg = replace(StyleConfig(), **{
        "render.render_size": (256, 256),
        "render.n_views": 9,
        "render.transmit": 0.01,
        "loss.style_layers": ("relu1_1", "relu2_1", "relu3_1", "relu4_1"),
        "loss.style_layer_weights": (1.0, 1.0, 1.0, 1.0),
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": 3,
        "optim.octave_scale": 1.8,
        "optim.iters": args.iters,
        "optim.lr": 0.02,
        "optim.window": args.window,
        "optim.fused_frames": args.fused,
        "optim.warm_iters": args.warm_iters,
        "optim.warm_lr": args.warm_lr,
    })
    style = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                          (256, 256, 3)))
    styler = GridStyler(cfg, style_image=style)

    first_unit = max(args.fused, 1)  # frames finished at first sync point
    t0 = time.time()
    n_done = 0
    t_first = None
    if args.fused > 1:
        # block-streamed: per-chunk disk reads + uploads overlap compute
        gen = styler.stylize_sequence_blocks(
            iter_sequence_blocks(cache, args.window,
                                 n_frames=args.frames),
            fused=args.fused)
    else:
        ds, vs = load_sequence_cache(cache)
        ds, vs = ds[:args.frames], vs[:args.frames]
        gen = styler.stylize_sequence(ds, vs)
    for t, d_star, _ in gen:
        n_done += 1
        if n_done == first_unit:
            np.asarray(d_star)
            t_first = time.time() - t0
            print(f"first dispatch unit ({first_unit} frames, incl. "
                  f"compiles): {t_first:.1f}s", flush=True)
        elif n_done % 25 == 0:
            print(f"frame {t}: {(time.time() - t0):.1f}s elapsed",
                  flush=True)
    np.asarray(d_star)
    wall = time.time() - t0

    # analytic MFU for the windowed sequence step (frozen-VGG 2x fwd;
    # 1 + 2*window rendered positions per iteration)
    from nfs_tpu.ops.resize import octave_shapes
    from nfs_tpu.utils.flops import (TPU_V5E_PEAK_BF16, mfu,
                                     styler_step_flops)
    shape = (112, 64, 112)
    iter_flops = 0.0
    for oshape in octave_shapes(shape, cfg.optim.octave_n,
                                cfg.optim.octave_scale):
        rsize = styler._octave_render_size(oshape, shape)
        iter_flops += styler_step_flops(
            oshape, rsize, cfg.render.n_views, cfg.loss.style_layers,
            n_window_renders=1 + 2 * args.window)
    # warm-started chain frames run warm_iters (frame 0 runs the full
    # schedule) — count the actual iterations, not iters * frames
    it_warm = (args.warm_iters if args.warm_iters is not None
               else args.iters)
    total_flops = iter_flops * (args.iters
                                + it_warm * (args.frames - 1))
    achieved = total_flops / wall
    result = {
        "metric": "200frame_112x64x112_sequence_end_to_end_s",
        "value": round(wall, 1),
        "unit": "s",
        "frames": args.frames,
        "iters_per_octave": args.iters,
        "warm_iters": args.warm_iters,
        "warm_lr": args.warm_lr,
        "window": args.window,
        "fused_frames": args.fused,
        "s_per_frame_steady": round(
            (wall - t_first) / max(n_done - first_unit, 1), 3),
        "sim_gen_s": round(t_sim, 1),
        "achieved_tflops_per_s": round(achieved / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(mfu(achieved, TPU_V5E_PEAK_BF16), 4),
        "north_star_target_s": 600,
        "beats_target_single_chip": wall < 600,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
