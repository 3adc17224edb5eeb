"""Differential per-stage breakdown of the LNST (particle) step.

Why differential: standalone micro-benchmarks over the axon remote-TPU
tunnel have a multi-ms per-dispatch floor (a bare `fwd` and a full
`fwd+bwd` of the splat both measured ~6-7 ms standalone, while the same
ops inside the production lax.scan cost far less), so the only honest
decomposition is WHOLE-FRAME walls — one fused dispatch chain each —
with one knob varied at a time and the walls subtracted:

  iters I vs 2I            -> steady marginal ms/iter (compile excluded)
  n_views 9 vs 5           -> shared render+VGG cost per view
  splat binned_pallas/binned/flat -> splat implementation deltas
  optimize_density on/off  -> ddens slot-elementwise + Adam cost
  rebin_every r vs iters   -> amortized rebin (sort + permute) cost

Reference context: the LNST paper's headline is ~10x TNST in 3D
(SURVEY.md §6); VERDICT r2 next-round #3 requires LNST-3D marginal
per-iteration <= TNST-3D. This harness localizes the gap.

Usage:
    python bench/lnst_stages.py            # TPU, full 200k/96x64x96 shape
    python bench/lnst_stages.py --small    # CPU-sized sanity run
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _frame_wall(cfg_over, grid, n_p, style, seed=0):
    """Wall of ONE warm stylize_frame (terminal host sync), seconds."""
    import jax
    import jax.numpy as jnp

    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.core.pytrees import ParticleSet
    from nfs_tpu.styler.particle import ParticleStyler

    cfg = replace(StyleConfig(), **cfg_over)
    styler = ParticleStyler(cfg, grid_shape=grid, style_image=style)
    rng = np.random.default_rng(seed)
    lo = np.asarray(grid, np.float32) * 0.1
    span = np.asarray(grid, np.float32) * 0.8
    pset = ParticleSet(
        x=jnp.asarray(rng.random((n_p, len(grid))) * span + lo,
                      jnp.float32),
        dens=jnp.ones((n_p,), jnp.float32))
    np.asarray(styler.stylize_frame(pset)[0].x)      # compile + warm
    t0 = time.perf_counter()
    styled, _, _ = styler.stylize_frame(pset)
    np.asarray(styled.x)                             # real sync
    return time.perf_counter() - t0


def run(small: bool):
    import jax

    n_p = 20_000 if small else 200_000
    grid = (32, 24, 32) if small else (96, 64, 96)
    iters = 4 if small else 20
    views = 2 if small else 9
    rsize = (64, 64) if small else (256, 256)
    style = np.asarray(np.random.default_rng(1).random(rsize + (3,)),
                       np.float32)

    base = {
        "render.render_size": rsize,
        "render.n_views": views, "render.transmit": 0.05,
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": 2, "optim.iters": iters,
        "particle.optimize_position": True,
        "particle.optimize_density": True,
    }

    def wall(label, **over):
        w = _frame_wall(dict(base, **over), grid, n_p, style)
        print(f"  {label:38s} {w * 1e3:9.1f} ms", flush=True)
        return w

    print(f"LNST stage breakdown: n_p={n_p} grid={grid} iters={iters} "
          f"views={views} backend={jax.default_backend()}", flush=True)

    w_base = wall("base (auto splat)")
    w_2x = wall("2x iters", **{"optim.iters": 2 * iters})
    marg = (w_2x - w_base) / (2 * iters)   # per-octave marginal avg
    # per-view shared render+VGG cost (marginal in n_views)
    w_v = wall(f"{views - 4} views", **{"render.n_views": views - 4})
    per_view = (w_base - w_v) / 4 / (2 * iters)
    w_xla = wall("splat=binned (XLA window)",
                 **{"particle.splat_impl": "binned"})
    w_flat = wall("splat=flat scatter",
                  **{"particle.splat_impl": "flat"})
    w_nod = wall("no ddens (position only)",
                 **{"particle.optimize_density": False})
    w_rb = wall("single rebin per octave",
                **{"particle.rebin_every": iters})

    n_iters = 2 * iters
    out = {
        "metric": "lnst_stage_breakdown",
        "backend": jax.default_backend(),
        "n_particles": n_p, "grid": list(grid), "iters": iters,
        "n_views": views,
        "frame_wall_ms": round(w_base * 1e3, 1),
        "marginal_ms_per_iter": round(marg * 1e3, 2),
        "render_vgg_ms_per_view_iter": round(per_view * 1e3, 3),
        "render_vgg_ms_per_iter": round(per_view * views * 1e3, 2),
        "splat_pallas_vs_xla_ms_per_iter":
            round((w_xla - w_base) / n_iters * 1e3, 2),
        "splat_pallas_vs_flat_ms_per_iter":
            round((w_flat - w_base) / n_iters * 1e3, 2),
        "ddens_ms_per_iter": round((w_base - w_nod) / n_iters * 1e3, 2),
        "rebin_ms_per_iter": round((w_base - w_rb) / n_iters * 1e3, 2),
        "non_render_marginal_ms_per_iter":
            round((marg - per_view * views) * 1e3, 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    if a.small:
        import os
        os.environ.setdefault("NFS_TPU_PLATFORM", "cpu")
    import sys
    sys.path.insert(0, "/root/repo")
    from nfs_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    res = run(a.small)
    if a.out:
        with open(a.out, "w") as f:
            json.dump(res, f, indent=1)
