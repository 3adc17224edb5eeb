"""Quality scorecard (VERDICT r1 next-round #4): temporal coherence,
Gram-distance convergence, stylization strength — end-to-end on a small
smoke sequence, written to QUALITY.json.

    python bench/quality.py [--frames 12] [--shape 48 32 48] [--cpu]

Runs on the default backend (real TPU under the driver); --cpu forces the
CPU backend for a hardware-independent scorecard.
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
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--shape", type=int, nargs=3, default=[48, 32, 48])
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--window", type=int, default=1)
    p.add_argument("--fixed_views", action="store_true",
                   help="render.fixed_view_schedule: same per-iteration "
                        "view draws for every frame")
    p.add_argument("--warm_iters", type=int, default=None,
                   help="optim.warm_iters for warm-started frames")
    p.add_argument("--warm_lr", type=float, default=None,
                   help="optim.warm_lr for warm-started frames")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--render", type=int, default=128)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--out", default="QUALITY.json")
    args = p.parse_args()
    if args.cpu:
        # bf16 is emulated (slow) on CPU and big renders take minutes;
        # the scorecard's signal survives at small scale
        args.render = min(args.render, 64)
        args.views = min(args.views, 2)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from nfs_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.eval.quality import (coherence_gate, gram_convergence,
                                      gram_distance,
                                      stylization_strength,
                                      temporal_coherence)
    from nfs_tpu.features.losses import style_gram_targets
    from nfs_tpu.render.raymarch import render_views
    from nfs_tpu.sim.smoke import SmokeConfig, smoke_sequence
    from nfs_tpu.styler.grid import GridStyler

    shape = tuple(args.shape)
    t0 = time.time()
    ds, vs = smoke_sequence(
        SmokeConfig(shape=shape, source_center=(0.5, 0.85, 0.5),
                    jacobi_iters=15, max_disp=2.0),
        args.frames, warmup=8)
    print(f"sim: {time.time() - t0:.1f}s", flush=True)

    cfg = replace(StyleConfig(), **{
        "render.render_size": (args.render, args.render),
        "render.n_views": args.views,
        "render.transmit": 0.05,
        "loss.features_dtype": ("float32" if args.cpu else "bfloat16"),
        "optim.octave_n": 2,
        "optim.iters": args.iters,
        "optim.lr": 0.02,
        "optim.window": args.window,
        "optim.fused_frames": 4,
        "optim.warm_iters": args.warm_iters,
        "optim.warm_lr": args.warm_lr,
        "render.fixed_view_schedule": args.fixed_views,
    })
    style = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(1), (args.render, args.render, 3)))
    styler = GridStyler(cfg, style_image=style)

    # --- single-frame run for Gram convergence curves
    d_star0, _, info = styler.stylize_frame(ds[args.frames // 2])
    conv = gram_convergence(info["octave_losses"])
    strength = stylization_strength(d_star0, ds[args.frames // 2])

    # --- Gram distance of rendered views, before vs after
    views = np.asarray(styler.view_pool[0])
    def grams(d):
        imgs = render_views(jnp.asarray(d), views[:, 0], views[:, 1],
                            transmit=cfg.render.transmit,
                            out_size=(args.render, args.render))
        return gram_distance(styler.vgg_params, imgs, styler.gram_targets,
                             cfg.loss.style_layers)
    gd_before = grams(ds[args.frames // 2])
    gd_after = grams(d_star0)

    # --- sequence run for temporal coherence
    t0 = time.time()
    stylized = np.stack([np.asarray(d) for _, d, _ in
                         styler.stylize_sequence(ds, vs)])
    print(f"sequence: {time.time() - t0:.1f}s", flush=True)
    coh_styl = temporal_coherence(stylized, vs,
                                  max_disp=cfg.optim.max_disp)
    coh_sim = temporal_coherence(ds, vs, max_disp=cfg.optim.max_disp)

    result = {
        "gram_convergence": conv,
        "gram_distance": {
            "before": gd_before,
            "after": gd_after,
            "drop_pct": 100.0 * (gd_before - gd_after) / max(gd_before,
                                                             1e-12),
        },
        "stylization_strength": strength,
        "temporal_coherence": {
            "stylized": coh_styl,
            "sim_reference": coh_sim,
            # gate: the stylized sequence must track the flow within 3x
            # of the sim's own transport residual (the sim ratio is the
            # attainable floor; < 1.0 alone passed anything short of
            # total incoherence — VERDICT r2 weak #5)
            "coherent": coherence_gate(coh_styl["ratio"],
                                       coh_sim["ratio"]),
            "gate": "stylized.ratio < 3 * sim.ratio",
        },
        "config": {"shape": list(shape), "frames": args.frames,
                   "iters": args.iters, "window": args.window,
                   "fixed_views": args.fixed_views,
                   "warm_iters": args.warm_iters,
                   "warm_lr": args.warm_lr},
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result, indent=1), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
