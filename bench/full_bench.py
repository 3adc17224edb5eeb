"""Full benchmark harness: all five BASELINE.json configs, measured on the
default backend (SURVEY.md §6: "the build must create its own rigorous
baseline ... (a) Adam iters/sec per config, (b) wall-clock/frame, (c)
end-to-end sequence time").

    python bench/full_bench.py [--quick] [--out BENCH_FULL.json]

Prints one JSON line per config and writes the collected results. Run in
the FOREGROUND (the axon TPU tunnel hangs for backgrounded processes —
see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _styler(cfg_over, style_size=(256, 256)):
    import jax
    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.styler.grid import GridStyler

    cfg = replace(StyleConfig(), **cfg_over)
    style = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(1), tuple(style_size) + (3,)))
    return cfg, GridStyler(cfg, style_image=style)


def _best_wall(run, k=2):
    """Best-of-k wall of `run` (a callable ending in a host sync). The
    axon tunnel adds multi-second load spikes; noise is strictly
    additive, so min is the honest steady-state figure."""
    wall = float("inf")
    for _ in range(k):
        t0 = time.time()
        run()
        wall = min(wall, time.time() - t0)
    return wall


def _blob(shape):
    grids = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape],
                        indexing="ij")
    return (2.0 * np.exp(-4 * sum(g ** 2 for g in grids))).astype(
        np.float32)


def bench_2d_single(quick):
    """Config #1: 2D 256x192 single-frame Gram stylization."""
    iters = 10 if quick else 30
    cfg, styler = _styler({
        "render.render_size": (256, 192),
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": 3, "optim.iters": iters,
    }, style_size=(256, 192))
    d = _blob((256, 192))
    np.asarray(styler.stylize_frame(d)[0])  # compile + sync
    # dispatch is async: each run ends in a host sync before the clock
    wall = _best_wall(lambda: np.asarray(styler.stylize_frame(d)[0]))
    total = 3 * iters
    return {"metric": "2d_256x192_frame", "iters_per_sec":
            round(total / wall, 2), "wall_s": round(wall, 3)}


def bench_2d_512(quick):
    """The BASELINE metric's 2D 512^2 headline shape."""
    iters = 10 if quick else 30
    cfg, styler = _styler({
        "render.render_size": (512, 512),
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": 3, "optim.iters": iters,
    }, style_size=(512, 512))
    d = _blob((512, 512))
    np.asarray(styler.stylize_frame(d)[0])
    wall = _best_wall(lambda: np.asarray(styler.stylize_frame(d)[0]))
    return {"metric": "2d_512x512_frame",
            "iters_per_sec": round(3 * iters / wall, 2),
            "wall_s": round(wall, 3)}


def bench_2d_sequence(quick):
    """Config #2: 2D sequence with window transport losses."""
    from nfs_tpu.sim.smoke import SmokeConfig, smoke_sequence

    T = 8 if quick else 24
    iters = 10 if quick else 20
    cfg, styler = _styler({
        "render.render_size": (256, 192),
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": 2, "optim.iters": iters, "optim.window": 1,
    }, style_size=(256, 192))
    ds, vs = smoke_sequence(SmokeConfig(shape=(256, 192),
                                        jacobi_iters=20), T)
    gen = styler.stylize_sequence(ds, vs)
    np.asarray(next(gen)[1])  # frame 0 incl. compile, synced
    t0 = time.time()
    n = 0
    for _, d_star, _ in gen:
        n += 1
    np.asarray(d_star)  # sync the in-flight tail
    wall = (time.time() - t0) / max(n, 1)
    return {"metric": "2d_256x192_seq_window_frame",
            "wall_s_per_frame": round(wall, 3),
            "iters_per_sec": round(2 * iters / wall, 2)}


def bench_3d_single(quick):
    """Config #3: 3D 112x64x112, 9 Poisson views (same as bench.py)."""
    iters = 10 if quick else 20
    cfg, styler = _styler({
        "render.render_size": (256, 256),
        "render.n_views": 9, "render.transmit": 0.01,
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": 3, "optim.iters": iters,
    })
    d = _blob((112, 64, 112))
    np.asarray(styler.stylize_frame(d)[0])
    wall = _best_wall(lambda: np.asarray(styler.stylize_frame(d)[0]))
    return {"metric": "3d_112x64x112_9view_frame",
            "iters_per_sec": round(3 * iters / wall, 2),
            "wall_s": round(wall, 3)}


def bench_3d_sequence_velocity(quick):
    """Config #4: 3D sequence, velocity (transport) parameterization,
    multi-scale octaves, window transport."""
    from nfs_tpu.sim.smoke import SmokeConfig, smoke_sequence

    T = 3 if quick else 6
    iters = 8 if quick else 20
    cfg, styler = _styler({
        "render.render_size": (256, 256),
        "render.n_views": 9, "render.transmit": 0.01,
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": 2, "optim.iters": iters, "optim.window": 1,
        "optim.parameterization": "velocity",
    })
    shape = (64, 48, 64) if quick else (112, 64, 112)
    ds, vs = smoke_sequence(SmokeConfig(
        shape=shape, source_center=(0.5, 0.85, 0.5), jacobi_iters=15), T)
    gen = styler.stylize_sequence(ds, vs)
    np.asarray(next(gen)[1])
    t0 = time.time()
    n = 0
    for _, d_star, _ in gen:
        n += 1
    np.asarray(d_star)
    wall = (time.time() - t0) / max(n, 1)
    return {"metric": "3d_seq_velocity_window_frame",
            "shape": list(shape),
            "wall_s_per_frame": round(wall, 3)}


def bench_particles(quick):
    """Config #5: LNST particle splat -> render -> per-particle opt."""
    import jax
    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.core.pytrees import ParticleSet
    from nfs_tpu.styler.particle import ParticleStyler
    import jax.numpy as jnp

    n_p = 50_000 if quick else 200_000
    iters = 10 if quick else 30
    cfg = replace(StyleConfig(), **{
        "render.render_size": (256, 256),
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": 2, "optim.iters": iters,
        "particle.optimize_position": True,
        "particle.optimize_density": True,
    })
    style = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                          (256, 256, 3)))
    grid = (128, 128)
    styler = ParticleStyler(cfg, grid_shape=grid, style_image=style)
    rng = np.random.default_rng(0)
    pset = ParticleSet(
        x=jnp.asarray(rng.random((n_p, 2)) * 100 + 14, jnp.float32),
        dens=jnp.ones((n_p,), jnp.float32))
    np.asarray(styler.stylize_frame(pset)[0].x)
    wall = _best_wall(lambda: np.asarray(styler.stylize_frame(pset)[0].x))
    return {"metric": "lnst_particles_frame", "n_particles": n_p,
            "iters_per_sec": round(2 * iters / wall, 2),
            "wall_s": round(wall, 3)}


def bench_particles_3d(quick):
    """Config #5 (3D variant): volumetric LNST — splat to a 3D grid,
    multi-view raymarch, per-particle optimization."""
    import jax
    import jax.numpy as jnp
    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.core.pytrees import ParticleSet
    from nfs_tpu.styler.particle import ParticleStyler

    n_p = 50_000 if quick else 200_000
    iters = 6 if quick else 20
    # octave schedule matches bench_3d_single (config #3) so the
    # LNST-vs-TNST per-iteration comparison shares its multi-scale
    # discount; coarse octaves run in grid space (particle.coarse_mode)
    cfg = replace(StyleConfig(), **{
        "render.render_size": (256, 256),
        "render.n_views": 9, "render.transmit": 0.05,
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": 3, "optim.iters": iters,
        "particle.optimize_position": True,
        "particle.optimize_density": True,
    })
    style = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                          (256, 256, 3)))
    grid = (96, 64, 96)
    styler = ParticleStyler(cfg, grid_shape=grid, style_image=style)
    rng = np.random.default_rng(0)
    pset = ParticleSet(
        x=jnp.asarray(rng.random((n_p, 3)) * np.array([80, 48, 80])
                      + np.array([8, 8, 8]), jnp.float32),
        dens=jnp.ones((n_p,), jnp.float32))
    np.asarray(styler.stylize_frame(pset)[0].x)
    wall = _best_wall(lambda: np.asarray(styler.stylize_frame(pset)[0].x))
    return {"metric": "lnst_particles3d_frame", "n_particles": n_p,
            "grid": list(grid),
            "iters_per_sec": round(3 * iters / wall, 2),
            "wall_s": round(wall, 3)}


def bench_lnst_vs_tnst_sequence(quick):
    """LNST's raison d'etre (LNST §5-6, the papers' ~10x headline): a
    SEQUENCE is stylized by optimizing keyframes only + interpolating
    per-particle attributes, while TNST must optimize every frame. Both
    run the same grid scale / iteration budget per optimized frame; the
    metric is per-frame wall-clock over the whole sequence."""
    import jax
    import jax.numpy as jnp
    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.core.pytrees import ParticleSet
    from nfs_tpu.styler.grid import GridStyler
    from nfs_tpu.styler.particle import ParticleStyler

    T = 10 if quick else 40
    n_p = 50_000 if quick else 200_000
    iters = 6 if quick else 20
    stride = 5 if quick else 10
    grid = (96, 64, 96)
    style = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                          (256, 256, 3)))
    common = {
        "render.render_size": (256, 256),
        "render.n_views": 9, "render.transmit": 0.05,
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": 2, "optim.iters": iters,
    }

    # shared scene: particles advected by a swirl flow; TNST sees the
    # splatted density sequence, LNST the particle sequence (identical
    # content, each engine's native representation)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((n_p, 3)) * np.array([80, 48, 80])
                     + np.array([8, 8, 8]), jnp.float32)
    dens = jnp.ones((n_p,), jnp.float32)

    @jax.jit
    def step_particles(x):
        c = jnp.asarray([48.0, 32.0, 48.0])
        r = x - c
        swirl = jnp.stack([-r[:, 2], 0.3 * jnp.ones_like(r[:, 0]),
                           r[:, 0]], axis=-1)
        return x + 0.02 * swirl

    xs = [x0]
    for _ in range(T - 1):
        xs.append(step_particles(xs[-1]))
    psets = [ParticleSet(x=x, dens=dens) for x in xs]

    lcfg = replace(StyleConfig(), **dict(
        common, **{"particle.optimize_position": True,
                   "particle.optimize_density": True,
                   "particle.keyframe_stride": stride}))
    lst = ParticleStyler(lcfg, grid_shape=grid, style_image=style)

    def run_lnst():
        # keep outputs device-resident, ONE terminal sync — the TNST run
        # below also downloads nothing per frame (in-order execution
        # means syncing the last enqueued result covers the whole chain)
        outs = [s.x for _, s in lst.stylize_keyframes(psets)]
        assert len(outs) == T
        np.asarray(outs[-1])

    gcfg = replace(StyleConfig(), **dict(common, **{"optim.fused_frames": 5}))
    gst = GridStyler(gcfg, style_image=style)
    ds = np.stack([np.asarray(lst.rasterize(p)) for p in psets])

    def run_tnst():
        for _, d_star, _ in gst.stylize_sequence(ds):
            pass
        np.asarray(d_star)

    # full warm pass each (compiles amortize across real sequences),
    # then the timed pass
    run_lnst()
    t0 = time.time()
    run_lnst()
    lnst_wall = time.time() - t0

    run_tnst()
    t0 = time.time()
    run_tnst()
    tnst_wall = time.time() - t0

    return {"metric": "lnst_vs_tnst_sequence",
            "frames": T, "n_particles": n_p,
            "keyframe_stride": stride,
            "lnst_s_per_frame": round(lnst_wall / T, 3),
            "tnst_s_per_frame": round(tnst_wall / T, 3),
            "lnst_speedup": round(tnst_wall / lnst_wall, 2)}


BENCHES = {
    "2d_single": bench_2d_single,
    "2d_512": bench_2d_512,
    "2d_sequence": bench_2d_sequence,
    "3d_single": bench_3d_single,
    "3d_seq_velocity": bench_3d_sequence_velocity,
    "particles": bench_particles,
    "particles_3d": bench_particles_3d,
    "lnst_vs_tnst_seq": bench_lnst_vs_tnst_sequence,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--only", choices=sorted(BENCHES), default=None)
    p.add_argument("--out", default="BENCH_FULL.json")
    args = p.parse_args()

    import jax

    from nfs_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    results = {"device": str(jax.devices()[0])}
    if args.only and Path(args.out).exists():
        # --only runs MERGE into the existing file, so configs can be
        # refreshed one bounded process at a time (remote-TPU runs must
        # stay under external timeouts — see CLAUDE.md)
        with open(args.out) as f:
            results = {**json.load(f), "device": results["device"]}
    for name, fn in BENCHES.items():
        if args.only and name != args.only:
            continue
        try:
            r = fn(args.quick)
        except Exception as e:  # keep going; record the failure
            r = {"error": f"{type(e).__name__}: {e}"}
        results[name] = r
        print(json.dumps({name: r}), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
