"""Stylization CLI mirroring the reference's public flag surface
(reference: ``config.py`` argparse namespace + driver ``main.py``,
SURVEY.md §2 "Config/flags": --tag, data paths, frame range, octaves,
optimization, renderer, loss, parameterization knobs).

Usage:
  python -m nfs_tpu.cli.stylize --tag smoke_fire \\
      --data_dir data/smoke3d --target_frame 70 \\
      --style_target data/styles/fire.png --w_style 1.0 \\
      --octave_n 3 --iter 30 --n_views 9 --transmit 0.01

Outputs land in ``<log_dir>/<tag>/``: stylized ``d_%04d.npz`` frames,
per-frame preview PNGs, and a ``metrics.jsonl`` log (loss components,
iters/sec — SURVEY.md §5 observability). Frames whose output file already
exists are skipped (frame-granular resume, SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from nfs_tpu.core.config import (
    DataConfig, LossConfig, OptimConfig, ParallelConfig, ParticleConfig,
    RenderConfig, StyleConfig,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native neural flow stylization (TNST/LNST)")
    # run / data (reference --tag, --data_dir, ...)
    p.add_argument("--tag", default="run")
    p.add_argument("--data_dir", default="data/smoke")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--d_path", default="d_%04d.npz")
    p.add_argument("--v_path", default="v_%04d.npz")
    p.add_argument("--p_path", default="p_%04d.npz")
    p.add_argument("--num_frames", type=int, default=1)
    p.add_argument("--target_frame", type=int, default=0)
    p.add_argument("--frame_stride", type=int, default=1)
    p.add_argument("--manta_order", action="store_true",
                   help="input arrays use mantaflow (x,y,z) channel order")
    # mode
    p.add_argument("--mode", choices=["grid", "particle"], default="grid",
                   help="grid=TNST (smoke), particle=LNST (liquid/smoke)")
    # octaves / optimization (reference --octave_n, --octave_scale, --iter,
    # --lr)
    p.add_argument("--octave_n", type=int, default=3)
    p.add_argument("--octave_scale", type=float, default=1.8)
    p.add_argument("--iter", type=int, default=30, dest="iters")
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--warm_iter", type=int, default=None,
                   help="iterations per octave for warm-started sequence "
                        "frames (fewer steps = less temporal drift)")
    p.add_argument("--warm_lr", type=float, default=None,
                   help="Adam lr for warm-started sequence frames")
    p.add_argument("--parameterization", choices=["density", "velocity"],
                   default="density",
                   help="TNST §4.2: additive density vs transport (v-hat)")
    p.add_argument("--window", type=int, default=0,
                   help="temporal window half-width W (TNST §6)")
    p.add_argument("--window_sigma", type=float, default=1.0)
    # renderer (reference --transmit, --n_views, angle ranges,
    # --sample_type)
    p.add_argument("--transmit", type=float, default=0.01)
    p.add_argument("--render_size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--n_views", type=int, default=9)
    p.add_argument("--theta0", type=float, default=-10.0)
    p.add_argument("--theta1", type=float, default=10.0)
    p.add_argument("--phi0", type=float, default=-5.0)
    p.add_argument("--phi1", type=float, default=5.0)
    p.add_argument("--sample_type", choices=["poisson", "stratified"],
                   default="poisson")
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--fixed_view_schedule", action="store_true",
                   help="same per-iteration view draws for every frame "
                        "(temporal-coherence lever)")
    p.add_argument("--train_transfer", action="store_true",
                   help="jointly optimize the transfer-function control "
                        "points with the density (grid mode, single "
                        "frames and sequences; requires --transfer_fn)")
    p.add_argument("--transfer_fn", default=None,
                   help="density->RGB transfer function for colored "
                        "rendering: builtin colormap (fire, ice, viridis,"
                        " gray) or gradient-image path")
    p.add_argument("--tf_max_density", type=float, default=2.0)
    # loss (reference --style_target, --style_layer, --w_style,
    # --content_layer, --content_channel, --w_content)
    p.add_argument("--style_target", default=None,
                   help="style image path (Gram losses)")
    p.add_argument("--style_layer", default="relu1_1,relu2_1,relu3_1,"
                   "relu4_1,relu5_1")
    p.add_argument("--w_style_layer", default=None,
                   help="comma list of per-layer weights (default 1s)")
    p.add_argument("--w_style", type=float, default=1.0)
    p.add_argument("--content_target", default=None)
    p.add_argument("--content_layer", default=None)
    p.add_argument("--content_channel", type=int, default=None)
    p.add_argument("--w_content", type=float, default=0.0)
    p.add_argument("--w_tv", type=float, default=0.0)
    p.add_argument("--vgg_weights", default=None,
                   help=".npz of VGG-19 params (see scripts/"
                        "convert_vgg_weights.py); random init if absent")
    p.add_argument("--pool", choices=["avg", "max"], default="avg")
    # particle (LNST)
    p.add_argument("--opt_position", action="store_true", default=True)
    p.add_argument("--no_opt_position", dest="opt_position",
                   action="store_false")
    p.add_argument("--opt_density", action="store_true")
    p.add_argument("--opt_color", action="store_true")
    p.add_argument("--keyframe_stride", type=int, default=10)
    p.add_argument("--max_log_dens", type=float, default=None,
                   help="bound the per-particle density factor to "
                        "exp(+-x) (tanh-limited log scale)")
    p.add_argument("--grid_shape", type=int, nargs="+", default=None,
                   help="splat grid shape for particle mode")
    # parallel (no reference equivalent — single GPU there)
    p.add_argument("--fused", type=int, default=0,
                   help="frames per device dispatch for grid sequences "
                        "(0 = streaming; F>1 fuses the whole multi-octave "
                        "optimization of F frames into one dispatch — "
                        "fastest, but not compatible with in-frame "
                        "checkpointing)")
    p.add_argument("--checkpoint_in_frame", action="store_true",
                   help="checkpoint {param, Adam state} every log_every "
                        "iterations inside each frame; a restarted run "
                        "resumes the interrupted frame mid-octave and "
                        "bit-matches an uninterrupted run")
    p.add_argument("--parallel", action="store_true",
                   help="jointly optimize all frames on a (frames, views) "
                        "device mesh (ParallelSequenceStyler)")
    p.add_argument("--mesh_frames", type=int, default=None)
    p.add_argument("--mesh_views", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p


def config_from_args(args) -> StyleConfig:
    layers = tuple(s.strip() for s in args.style_layer.split(",") if s)
    if args.w_style_layer:
        lw = tuple(float(x) for x in args.w_style_layer.split(","))
    else:
        lw = tuple(1.0 for _ in layers)
    return StyleConfig(
        data=DataConfig(
            data_dir=args.data_dir, log_dir=args.log_dir, tag=args.tag,
            d_path=args.d_path, v_path=args.v_path, p_path=args.p_path,
            num_frames=args.num_frames, target_frame=args.target_frame,
            frame_stride=args.frame_stride),
        render=RenderConfig(
            transmit=args.transmit, render_size=tuple(args.render_size),
            n_views=args.n_views, theta0=args.theta0, theta1=args.theta1,
            phi0=args.phi0, phi1=args.phi1, sample_type=args.sample_type,
            gamma=args.gamma, transfer_fn=args.transfer_fn,
            tf_max_density=args.tf_max_density,
            fixed_view_schedule=args.fixed_view_schedule,
            train_transfer=args.train_transfer),
        loss=LossConfig(
            style_target=args.style_target, style_layers=layers,
            style_layer_weights=lw, w_style=args.w_style,
            content_layer=args.content_layer,
            content_channel=args.content_channel,
            content_target=args.content_target, w_content=args.w_content,
            w_tv=args.w_tv, vgg_weights=args.vgg_weights, pool=args.pool),
        optim=OptimConfig(
            octave_n=args.octave_n, octave_scale=args.octave_scale,
            iters=args.iters, lr=args.lr,
            warm_iters=args.warm_iter, warm_lr=args.warm_lr,
            parameterization=args.parameterization, window=args.window,
            window_sigma=args.window_sigma),
        particle=ParticleConfig(
            optimize_position=args.opt_position,
            optimize_density=args.opt_density,
            optimize_color=args.opt_color,
            keyframe_stride=args.keyframe_stride,
            max_log_dens=args.max_log_dens),
        parallel=ParallelConfig(
            frames=args.mesh_frames or 1,
            views=args.mesh_views or 1,
            halo=args.window),
        seed=args.seed,
    )


def main(argv=None):
    # NFS_TPU_PLATFORM=cpu runs the CLI hermetically on CPU — applied
    # inside enable_compile_cache, before the backend is locked
    from nfs_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    from nfs_tpu.io.npz import FrameStore
    from nfs_tpu.io.image import save_image
    from nfs_tpu.render.raymarch import render2d, render_volume
    import jax.numpy as jnp

    out_dir = os.path.join(cfg.data.log_dir, cfg.data.tag)
    os.makedirs(out_dir, exist_ok=True)
    store = FrameStore(cfg.data.data_dir, cfg.data.d_path, cfg.data.v_path,
                       cfg.data.p_path, manta_order=args.manta_order)
    out_store = FrameStore(out_dir, cfg.data.d_path, cfg.data.v_path,
                           cfg.data.p_path)
    metrics_path = os.path.join(out_dir, "metrics.jsonl")

    def log_metric(**kw):
        with open(metrics_path, "a") as f:
            f.write(json.dumps(kw) + "\n")

    def preview(frame, d_star):
        from nfs_tpu.render.transfer import resolve_transfer
        tf = resolve_transfer(cfg.render.transfer_fn)
        tf = jnp.asarray(tf) if tf is not None else None
        d_star = jnp.asarray(d_star)
        if d_star.ndim == 2:
            img = render2d(d_star, out_size=cfg.render.render_size,
                           tf_nodes=tf, tf_max=cfg.render.tf_max_density)
        else:
            img = render_volume(d_star, jnp.float32(0), jnp.float32(0),
                                transmit=cfg.render.transmit,
                                out_size=cfg.render.render_size,
                                tf_nodes=tf,
                                tf_max=cfg.render.tf_max_density)
        save_image(os.path.join(out_dir, f"preview_{frame:04d}.png"),
                   np.asarray(img))

    frames = list(range(cfg.data.target_frame,
                        cfg.data.target_frame + cfg.data.num_frames,
                        cfg.data.frame_stride))

    if args.mode == "grid" and args.parallel and len(frames) > 1:
        import jax
        from nfs_tpu.parallel.engine import ParallelSequenceStyler
        from nfs_tpu.parallel.mesh import make_mesh, mesh_shape_for
        from nfs_tpu.styler.grid import GridStyler

        from nfs_tpu.parallel.multihost import initialize_multihost

        initialize_multihost()
        styler = GridStyler(cfg)
        if cfg.parallel.frames > 1 or cfg.parallel.views > 1:
            mesh = make_mesh(cfg.parallel.frames, cfg.parallel.views)
        else:
            f_sh, v_sh = mesh_shape_for(len(jax.devices()))
            mesh = make_mesh(f_sh, v_sh)
        engine = ParallelSequenceStyler(styler, mesh)
        densities = np.stack([store.load_density(t) for t in frames])
        vels = None
        if os.path.exists(os.path.join(
                cfg.data.data_dir, cfg.data.v_path % frames[0])):
            vels = np.stack([store.load_velocity(t) for t in frames])
        t0 = time.time()
        d_star, _, info = engine.stylize(densities, vels)
        wall = time.time() - t0
        for i, t in enumerate(frames):
            out_store.save_density(t, np.asarray(d_star[i]))
            preview(t, d_star[i])
        log_metric(frames=len(frames), wall_s=wall,
                   mesh=dict(engine.mesh.shape),
                   final_loss=float(info["octave_losses"][-1][-1]))
        print(f"[parallel] {len(frames)} frames in {wall:.1f}s on mesh "
              f"{dict(engine.mesh.shape)}")
    elif args.mode == "grid":
        from nfs_tpu.styler.grid import GridStyler
        styler = GridStyler(cfg)
        if cfg.optim.window > 0 or len(frames) > 1:
            from nfs_tpu.io.checkpoint import SequenceManifest

            manifest = SequenceManifest(
                os.path.join(out_dir, "manifest.json"))
            # frame-granular resume: skip the fully-done prefix (the
            # recursive warm-start chain restarts at the first missing
            # frame — same seam the reference's re-run-the-frame recovery
            # has, SURVEY.md §5)
            start = 0
            while start < len(frames) and manifest.done(frames[start]):
                start += 1
            # fused dispatches persist the carry param only at chunk
            # boundaries; align the resume point to the last frame whose
            # param was saved so the recursive warm-start chain stays
            # exact (re-stylizes at most fused-1 already-done frames
            # instead of cold-starting the chain mid-sequence)
            if args.fused and args.fused > 1:
                while start > 0 and not os.path.exists(os.path.join(
                        out_dir, f"param_{frames[start - 1]:04d}.npz")):
                    start -= 1
            todo = frames[start:]
            if not todo:
                print("all frames already stylized (manifest)")
                return
            densities = [store.load_density(t) for t in todo]
            vels = None
            if os.path.exists(os.path.join(
                    cfg.data.data_dir, cfg.data.v_path % todo[0])):
                vels = [store.load_velocity(t) for t in todo]
            # warm resume: continue the recursive-init chain bit-exactly
            # from the last completed frame's saved param (+ its velocity,
            # for the forward transport into the first todo frame)
            init_param = prev_velocity = None
            if start > 0:
                prev_t = frames[start - 1]
                ppath = os.path.join(out_dir, f"param_{prev_t:04d}.npz")
                if os.path.exists(ppath):
                    with np.load(ppath) as z:
                        if "param" in z.files:
                            init_param = jnp.asarray(z["param"])
                        else:  # --train_transfer pytree carry
                            init_param = {
                                k[6:]: jnp.asarray(z[k])
                                for k in z.files if k.startswith("param/")}
                    vpath = os.path.join(cfg.data.data_dir,
                                         cfg.data.v_path % prev_t)
                    if os.path.exists(vpath):
                        prev_velocity = jnp.asarray(
                            store.load_velocity(prev_t))
            ckpt = (os.path.join(out_dir, "inframe_ckpt.npz")
                    if args.checkpoint_in_frame else None)
            t0 = time.time()
            for i, d_star, param in styler.stylize_sequence(
                    densities, vels, fused=args.fused,
                    checkpoint_path=ckpt, init_param=init_param,
                    prev_velocity=prev_velocity, frame_offset=start):
                t = todo[i]
                out_path = os.path.join(out_dir, cfg.data.d_path % t)
                out_store.save_density(t, np.asarray(d_star))
                if param is not None:
                    ppath = os.path.join(out_dir, f"param_{t:04d}.npz")
                    if isinstance(param, dict):
                        # --train_transfer pytree carry: field + tf nodes
                        np.savez(ppath, **{"param/" + k: np.asarray(v)
                                           for k, v in param.items()})
                        np.savez(
                            os.path.join(out_dir, f"tf_{t:04d}.npz"),
                            nodes=np.clip(np.asarray(param["tf"]), 0, 1))
                    else:
                        np.savez(ppath, param=np.asarray(param))
                preview(t, d_star)
                dt = time.time() - t0
                manifest.mark(t, out_path, wall_s=round(dt, 3))
                log_metric(frame=t, wall_s=dt,
                           iters=cfg.optim.iters * cfg.optim.octave_n)
                print(f"[frame {t}] {dt:.1f}s")
                t0 = time.time()
        else:
            t = frames[0]
            d = store.load_density(t)
            ckpt = (os.path.join(out_dir, "inframe_ckpt.npz")
                    if args.checkpoint_in_frame else None)
            t0 = time.time()
            d_star, _, info = styler.stylize_frame(d, checkpoint_path=ckpt)
            dt = time.time() - t0
            out_store.save_density(t, np.asarray(d_star))
            if "tf_nodes" in info:  # --train_transfer: export the
                # trained control points for render-CLI reuse
                np.savez(os.path.join(out_dir, f"tf_{t:04d}.npz"),
                         nodes=np.asarray(info["tf_nodes"]))
            preview(t, d_star)
            losses = [float(l[-1]) for l in info["octave_losses"]]
            n_iters = cfg.optim.iters * cfg.optim.octave_n
            log_metric(frame=t, wall_s=dt, iters=n_iters,
                       iters_per_sec=n_iters / dt, final_losses=losses)
            print(f"[frame {t}] {dt:.1f}s "
                  f"({n_iters / dt:.2f} iters/s) losses={losses}")
    else:  # particle / LNST
        from nfs_tpu.core.pytrees import ParticleSet
        from nfs_tpu.styler.particle import ParticleStyler
        psets = []
        for t in frames:
            raw = store.load_particles(t)
            psets.append(ParticleSet(
                x=jnp.asarray(raw["x"]),
                dens=(jnp.asarray(raw["dens"]) if "dens" in raw else None),
                color=(jnp.asarray(raw["color"]) if "color" in raw
                       else None)))
        ndim = int(psets[0].x.shape[-1])
        grid_shape = (tuple(args.grid_shape) if args.grid_shape
                      else (128,) * ndim)
        styler = ParticleStyler(cfg, grid_shape=grid_shape)
        if args.parallel and len(frames) > 1:
            from nfs_tpu.parallel.mesh import make_mesh
            from nfs_tpu.parallel.particles import ParallelKeyframeStyler

            mesh = (make_mesh(cfg.parallel.frames)
                    if cfg.parallel.frames > 1 else None)
            engine = ParallelKeyframeStyler(styler, mesh=mesh)
        else:
            engine = styler
        t0 = time.time()
        for i, styled in engine.stylize_keyframes(psets):
            t = frames[i]
            out_store.save_particles(
                t, x=np.asarray(styled.x), dens=np.asarray(styled.dens),
                **({"color": np.asarray(styled.color)}
                   if styled.color is not None else {}))
            preview(t, styler.rasterize(styled))
            kf_info = getattr(engine, "last_keyframe_infos",
                              {}).get(i, {})
            log_metric(frame=t, wall_s=time.time() - t0,
                       splat_overflow=kf_info.get("octave_overflow"))
            t0 = time.time()
    print(f"done -> {out_dir}")


if __name__ == "__main__":
    main()
