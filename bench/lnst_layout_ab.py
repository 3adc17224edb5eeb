"""A/B of the binned-chunk state layout (particle.binned_layout) at the
BENCH_FULL particles_3d config: flat slots vs the Pallas shifted-resident
layout (VERDICT r4 missing #4 — the LNST-vs-TNST per-iteration gap;
docs/LNST_TRACE.json attributes ~3 ms/iter to kernel-boundary plumbing
the shifted layout removes).

    python bench/lnst_layout_ab.py [--iters 20] [--quick]

Honest timing per CLAUDE.md: whole warm stylize_frame walls ending in a
host read (best of 3).
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()

    from nfs_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.core.pytrees import ParticleSet
    from nfs_tpu.styler.particle import ParticleStyler

    n_p = 50_000 if a.quick else 200_000
    grid = (96, 64, 96)
    style = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                          (256, 256, 3)))
    rng = np.random.default_rng(0)
    pset = ParticleSet(
        x=jnp.asarray(rng.random((n_p, 3)) * np.array([80, 48, 80])
                      + np.array([8, 8, 8]), jnp.float32),
        dens=jnp.ones((n_p,), jnp.float32))

    out = {"metric": "lnst_layout_ab", "n_particles": n_p,
           "grid": list(grid), "iters": a.iters,
           "device": str(jax.devices()[0])}
    for layout in ("slots", "auto"):
        cfg = replace(StyleConfig(), **{
            "render.render_size": (256, 256),
            "render.n_views": 9, "render.transmit": 0.05,
            "loss.features_dtype": "bfloat16",
            "optim.octave_n": 3, "optim.iters": a.iters,
            "particle.optimize_position": True,
            "particle.optimize_density": True,
            "particle.binned_layout": layout,
        })
        styler = ParticleStyler(cfg, grid_shape=grid, style_image=style)
        np.asarray(styler.stylize_frame(pset)[0].x)   # compile + warm
        best = float("inf")
        for _ in range(a.repeats):
            t0 = time.time()
            np.asarray(styler.stylize_frame(pset)[0].x)
            best = min(best, time.time() - t0)
        out[layout] = {"wall_s": round(best, 3),
                       "iters_per_sec": round(3 * a.iters / best, 2)}
        print(layout, out[layout], flush=True)

    out["speedup_shifted_vs_slots"] = round(
        out["slots"]["wall_s"] / out["auto"]["wall_s"], 3)
    print(json.dumps(out, indent=1))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
