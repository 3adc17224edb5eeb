"""Multi-chip readiness bench (VERDICT r2 next-round #9): measures the
frame-parallel engine's scaling over mesh sizes in ONE command, ONE JSON.

    python bench/parallel_bench.py [--cpu] [--out BENCH_PARALLEL.json]

On the current hardware (one real TPU chip via axon) this runs
correctness + scaling-shape on the 8-device virtual CPU mesh — the
attainable evidence today. The day real multi-chip hardware exists, run
it there unchanged (drop --cpu): the same code paths measure real ICI
scaling. Reported per mesh: wall-clock for a fixed joint-optimization
workload, iters/s, and parallel efficiency vs the 1-device mesh.

Workload: T frames x iters Adam iterations of the windowed sequence
stylization (the north-star shape, scaled down so the CPU mesh finishes
in minutes). Frames axis scales 1 -> 8; a composed (frames, views,
space) mesh row exercises the 3-axis path.
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
    p.add_argument("--cpu", action="store_true",
                   help="force the 8-device virtual CPU mesh")
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--shape", type=int, nargs=3, default=[24, 16, 24])
    p.add_argument("--render", type=int, default=64)
    p.add_argument("--views", type=int, default=2)
    p.add_argument("--out", default="BENCH_PARALLEL.json")
    args = p.parse_args()

    if args.cpu:
        import os
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp  # noqa: F401  (device sync below)

    from nfs_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.parallel.engine import ParallelSequenceStyler
    from nfs_tpu.parallel.mesh import make_mesh
    from nfs_tpu.styler.grid import GridStyler

    n_dev = len(jax.devices())
    shape = tuple(args.shape)
    T = args.frames
    cfg = replace(StyleConfig(), **{
        "render.render_size": (args.render, args.render),
        "render.n_views": args.views,
        "optim.octave_n": 2,
        "optim.iters": args.iters,
        "optim.window": 1,
        "loss.features_dtype": ("float32" if args.cpu else "bfloat16"),
    })
    style = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(1), (args.render, args.render, 3)))

    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    d0 = np.exp(-4 * sum(x ** 2 for x in g)).astype(np.float32)
    ds = np.stack([d0 * (1 + 0.05 * t) for t in range(T)])
    vs = np.full((T,) + shape + (3,), 0.25, np.float32)

    meshes = [(f, 1, 1) for f in (1, 2, 4, 8) if f <= n_dev]
    if n_dev >= 8:
        meshes += [(4, 2, 1), (2, 2, 2)]

    # Throughput/efficiency columns are REAL-HARDWARE-ONLY (VERDICT r3
    # weak #4): on the oversubscribed virtual CPU mesh, wall-clock varies
    # with host scheduling, not parallel efficiency — publishing an
    # "efficiency" number there is noise presented as data. The CPU mesh
    # instead proves (a) loss parity across mesh shapes (collectives are
    # CORRECT: identical math under different shardings) and (b) that the
    # compiled step actually contains the collectives (HLO op counts).
    on_tpu = jax.default_backend() == "tpu"
    rows = []
    base_wall = None
    for f, v, s in meshes:
        styler = GridStyler(cfg, style_image=style)
        mesh = make_mesh(f, v, s)
        eng = ParallelSequenceStyler(styler, mesh)
        eng.capture_collectives = not on_tpu
        # warm-up compile pass, then the measured pass
        np.asarray(eng.stylize(ds, vs)[0])
        t0 = time.time()
        d_star, _, info = eng.stylize(ds, vs)
        np.asarray(d_star)  # async dispatch: sync before the clock
        wall = time.time() - t0
        n_iters = cfg.optim.iters * cfg.optim.octave_n
        if f == 1 and v == 1 and s == 1:
            base_wall = wall
        row = {
            "mesh": {"frames": f, "views": v, "space": s},
            "final_loss": float(info["octave_losses"][-1][-1]),
        }
        if on_tpu:
            row.update({
                "wall_s": round(wall, 3),
                "frame_iters_per_sec": round(T * n_iters / wall, 2),
                "efficiency_vs_1dev": (
                    round(base_wall / (wall * f * v * s), 3)
                    if base_wall else None),
            })
        else:
            row["collectives_in_hlo"] = eng.last_collectives
        rows.append(row)
        print(json.dumps(row), flush=True)

    losses = [r["final_loss"] for r in rows]
    loss_parity = {
        "ref_mesh": rows[0]["mesh"],
        "max_rel_diff": (max(abs(l - losses[0]) for l in losses)
                         / max(abs(losses[0]), 1e-12)),
    }
    print(json.dumps({"loss_parity": loss_parity}), flush=True)

    # LNST keyframe-DP scaling: B keyframes batched over the frames mesh
    # (parallel/particles.py) — same fixed workload, growing mesh
    from nfs_tpu.core.pytrees import ParticleSet
    from nfs_tpu.parallel.particles import ParallelKeyframeStyler
    from nfs_tpu.styler.particle import ParticleStyler

    pcfg = replace(cfg, **{"optim.window": 0,
                           "particle.optimize_position": True,
                           "particle.optimize_density": True,
                           "particle.keyframe_stride": 1})
    rng = np.random.default_rng(0)
    n_p = 5000
    px = rng.random((n_p, 3)).astype(np.float32) * (np.asarray(shape) - 2)
    psets = [ParticleSet(x=jnp.asarray(px + 0.05 * t),
                         dens=jnp.ones((n_p,), jnp.float32))
             for t in range(T)]
    lnst_rows = []
    lnst_base = None
    lnst_ref_x = None
    for f in (1, 2, 4, 8):
        if f > n_dev:
            continue
        pst = ParticleStyler(pcfg, grid_shape=shape, style_image=style)
        eng = ParallelKeyframeStyler(pst, mesh=make_mesh(frames=f))
        key = jax.random.PRNGKey(0)
        np.asarray(list(eng.stylize_keyframes(psets, key=key))[-1][1].x)
        t0 = time.time()
        outs = list(eng.stylize_keyframes(psets, key=key))
        x_last = np.asarray(outs[-1][1].x)
        wall = time.time() - t0
        if f == 1:
            lnst_base = wall
            lnst_ref_x = x_last
        row = {"mesh": {"frames": f}, "keyframes": T}
        # results are mesh-shape-invariant by construction (per-keyframe
        # fold_in PRNG): report the parity, which is meaningful on CPU
        row["result_parity_max_dx"] = (
            float(np.abs(x_last - lnst_ref_x).max())
            if lnst_ref_x is not None else 0.0)
        if on_tpu:
            row["wall_s"] = round(wall, 3)
            row["efficiency_vs_1dev"] = (
                round(lnst_base / (wall * f), 3) if lnst_base else None)
        lnst_rows.append(row)
        print(json.dumps({"lnst_keyframe_dp": row}), flush=True)

    out = {
        "workload": {"frames": T, "shape": list(shape),
                     "iters_per_octave": args.iters,
                     "octaves": cfg.optim.octave_n, "window": 1,
                     "render": args.render, "views": args.views},
        "device": str(jax.devices()[0]),
        "n_devices": n_dev,
        "note": ("virtual CPU mesh: loss-parity + collective presence "
                 "only — throughput/efficiency columns are withheld "
                 "(host-scheduling noise, not parallel efficiency); "
                 "re-run on real multi-chip hardware for ICI numbers"
                 if not on_tpu else "real hardware"),
        "results": rows,
        "loss_parity": loss_parity,
        "lnst_keyframe_dp": lnst_rows,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
