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


# leg name -> config override for its wall; one bounded process per leg
# on the remote TPU (--leg/--state), all in-process on CPU (--small).
def _legs(iters, views):
    return {
        "base": {},
        "iters2x": {"optim.iters": 2 * iters},
        "views-4": {"render.n_views": views - 4},
        "xla": {"particle.splat_impl": "binned"},
        "flat": {"particle.splat_impl": "flat"},
        "nodens": {"particle.optimize_density": False},
        "rebin1": {"particle.rebin_every": iters},
    }


def _params(small: bool):
    n_p = 20_000 if small else 200_000
    grid = (32, 24, 32) if small else (96, 64, 96)
    iters = 4 if small else 20
    views = 2 if small else 9
    rsize = (64, 64) if small else (256, 256)
    return n_p, grid, iters, views, rsize


def run_leg(small: bool, leg: str, state_file: str):
    """Measure ONE wall, merge it into the state JSON, exit cleanly —
    keeps every remote-TPU process under an external timeout without
    ever being killed mid-compile (CLAUDE.md tunnel rule)."""
    import jax

    n_p, grid, iters, views, rsize = _params(small)
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
    over = dict(base, **_legs(iters, views)[leg])
    w = _frame_wall(over, grid, n_p, style)
    print(f"  {leg:38s} {w * 1e3:9.1f} ms  "
          f"backend={jax.default_backend()}", flush=True)
    try:
        with open(state_file) as f:
            state = json.load(f)
    except FileNotFoundError:
        state = {}
    state[leg] = w
    with open(state_file, "w") as f:
        json.dump(state, f, indent=1)


def summarize(small: bool, walls: dict):
    import jax

    n_p, grid, iters, views, _ = _params(small)
    missing = sorted(set(_legs(iters, views)) - set(walls))
    if missing:
        raise SystemExit(f"missing legs: {missing}")
    w_base, w_2x, w_v = walls["base"], walls["iters2x"], walls["views-4"]
    w_xla, w_flat = walls["xla"], walls["flat"]
    w_nod, w_rb = walls["nodens"], walls["rebin1"]
    marg = (w_2x - w_base) / (2 * iters)   # per-octave marginal avg
    per_view = (w_base - w_v) / 4 / (2 * iters)

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


def run(small: bool):
    n_p, grid, iters, views, _ = _params(small)
    print(f"LNST stage breakdown: n_p={n_p} grid={grid} iters={iters} "
          f"views={views}", flush=True)
    walls = {}
    state = "/tmp/lnst_stages_state.json"
    for leg in _legs(iters, views):
        run_leg(small, leg, state)
    with open(state) as f:
        walls = json.load(f)
    return summarize(small, walls)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--leg", default=None,
                    help="measure one wall (bounded TPU process) and "
                         "merge into --state")
    ap.add_argument("--state", default="/tmp/lnst_stages_state.json")
    ap.add_argument("--summarize", action="store_true",
                    help="derive the breakdown from --state")
    a = ap.parse_args()
    if a.small:
        import os
        os.environ.setdefault("NFS_TPU_PLATFORM", "cpu")
    import sys
    sys.path.insert(0, "/root/repo")
    from nfs_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    if a.leg:
        run_leg(a.small, a.leg, a.state)
        res = None
    elif a.summarize:
        with open(a.state) as f:
            res = summarize(a.small, json.load(f))
    else:
        res = run(a.small)
    if a.out and res is not None:
        with open(a.out, "w") as f:
            json.dump(res, f, indent=1)
