"""Result rendering / evaluation CLI (reference: ``util.py`` + log-dir
output, SURVEY.md §1 L7 / §3.5: load stylized frames -> render fixed view
-> PNG sequence -> video).

    python -m nfs_tpu.cli.render --data_dir log/smoke_fire \\
        --num_frames 200 --out log/smoke_fire/render --video out.mp4 \\
        --theta 0 --phi 0 --transmit 0.01
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from nfs_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="render stylized frames")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--d_path", default="d_%04d.npz")
    p.add_argument("--p_path", default="p_%04d.npz")
    p.add_argument("--mode", choices=["grid", "particle"], default="grid")
    p.add_argument("--grid_shape", type=int, nargs="+", default=None,
                   help="splat grid for particle mode")
    p.add_argument("--target_frame", type=int, default=0)
    p.add_argument("--num_frames", type=int, default=1)
    p.add_argument("--frame_stride", type=int, default=1)
    p.add_argument("--out", default=None,
                   help="output dir (default <data_dir>/render)")
    p.add_argument("--video", default=None,
                   help="also write a video file (imageio/ffmpeg if "
                        "available, else PNG sequence)")
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--render_size", type=int, nargs=2, default=(512, 512))
    p.add_argument("--theta", type=float, default=0.0, help="degrees")
    p.add_argument("--phi", type=float, default=0.0, help="degrees")
    p.add_argument("--transmit", type=float, default=0.01)
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--transfer_fn", default=None,
                   help="density->RGB transfer function: builtin colormap"
                        " (fire, ice, viridis, gray) or gradient-image "
                        "path; default grayscale")
    p.add_argument("--tf_max_density", type=float, default=2.0)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from nfs_tpu.io.image import save_image, save_video
    from nfs_tpu.io.npz import FrameStore
    from nfs_tpu.render.raymarch import render2d, render_volume
    from nfs_tpu.render.transfer import resolve_transfer

    tf_nodes = resolve_transfer(args.transfer_fn)
    tf_nodes = jnp.asarray(tf_nodes) if tf_nodes is not None else None

    out_dir = args.out or os.path.join(args.data_dir, "render")
    os.makedirs(out_dir, exist_ok=True)
    store = FrameStore(args.data_dir, d_path=args.d_path,
                       p_path=args.p_path)
    theta = np.radians(args.theta)
    phi = np.radians(args.phi)

    frames = []
    for t in range(args.target_frame,
                   args.target_frame + args.num_frames,
                   args.frame_stride):
        if args.mode == "grid":
            d = jnp.asarray(store.load_density(t))
        else:
            raw = store.load_particles(t)
            from nfs_tpu.ops.splat import splat

            ndim = raw["x"].shape[-1]
            shape = tuple(args.grid_shape or (128,) * ndim)
            dens = raw.get("dens")
            dens = (jnp.asarray(dens) if dens is not None
                    else jnp.ones(raw["x"].shape[0], jnp.float32))
            d = splat(jnp.asarray(raw["x"]), dens, shape)
        if d.ndim == 2:
            img = render2d(d, out_size=tuple(args.render_size),
                           gamma=args.gamma, tf_nodes=tf_nodes,
                           tf_max=args.tf_max_density)
        else:
            img = render_volume(d, jnp.float32(theta), jnp.float32(phi),
                                transmit=args.transmit,
                                out_size=tuple(args.render_size),
                                gamma=args.gamma, tf_nodes=tf_nodes,
                                tf_max=args.tf_max_density)
        img = np.asarray(img)
        save_image(os.path.join(out_dir, f"frame_{t:04d}.png"), img)
        frames.append(img)
        print(f"rendered frame {t}")

    if args.video:
        save_video(os.path.join(out_dir, args.video), frames, fps=args.fps)
    print(f"done -> {out_dir}")


if __name__ == "__main__":
    main()
