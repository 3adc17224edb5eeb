"""Device-trace attribution of the LNST finest-octave step (the
BENCH_FULL particles_3d config): where the ~11 ms/iter splat surcharge
vs TNST-3D actually goes, by HLO category (the ROOFLINE.md treatment,
applied to the splat — VERDICT r3 next-round #2).

Traces one warm stylize_frame (finest octave only) with jax.profiler,
parses the xplane protobuf, and buckets per-op device time:

  pallas_splat   — the fused binsplat window kernels (fwd + bwd)
  conv           — VGG convolutions (render/loss, shared with TNST)
  copy/format    — layout copies, transposes, reshape materializations
  sort/rebin     — argsort + permute of the rebin (amortized over chunk)
  fusion/other   — elementwise fusions (frac prep, Adam, masks, render)

Usage:
    python bench/lnst_trace.py [--iters 20] [--out FILE]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def build_and_trace(iters: int, trace_dir: str, octaves: int = 1,
                    rebin: int | None = None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.core.pytrees import ParticleSet
    from nfs_tpu.styler.particle import ParticleStyler

    n_p = 200_000
    grid = (96, 64, 96)
    rsize = (256, 256)
    over = {
        "render.render_size": rsize,
        "render.n_views": 9, "render.transmit": 0.05,
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": octaves, "optim.iters": iters,
        "particle.optimize_position": True,
        "particle.optimize_density": True,
    }
    if rebin is not None:
        over["particle.rebin_every"] = rebin
    cfg = replace(StyleConfig(), **over)
    style = np.asarray(np.random.default_rng(1).random(rsize + (3,)),
                       np.float32)
    styler = ParticleStyler(cfg, grid_shape=grid, style_image=style)
    rng = np.random.default_rng(0)
    # match bench_particles_3d's particle box
    pset = ParticleSet(
        x=jnp.asarray(rng.random((n_p, 3)) * np.array([80, 48, 80])
                      + np.array([8, 8, 8]), jnp.float32),
        dens=jnp.ones((n_p,), jnp.float32))
    np.asarray(styler.stylize_frame(pset)[0].x)   # compile + warm
    with jax.profiler.trace(trace_dir):
        styled, _, _ = styler.stylize_frame(pset)
        np.asarray(styled.x)
    return iters


def build_and_trace_tnst(iters: int, trace_dir: str, octaves: int = 3):
    """Trace the TNST 3d_single bench config (the comparison bar) so
    LNST's device-vs-host split can be judged against the same split on
    the grid path."""
    import numpy as np
    import jax
    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.styler.grid import GridStyler

    cfg = replace(StyleConfig(), **{
        "render.render_size": (256, 256),
        "render.n_views": 9, "render.transmit": 0.01,
        "loss.features_dtype": "bfloat16",
        "optim.octave_n": octaves, "optim.iters": iters,
    })
    style = np.asarray(np.random.default_rng(1).random((256, 256, 3)),
                       np.float32)
    styler = GridStyler(cfg, style_image=style)
    shape = (112, 64, 112)
    z, y, x = np.meshgrid(*(np.linspace(-1, 1, s) for s in shape),
                          indexing="ij")
    d = np.exp(-4.0 * (z * z + y * y + x * x)).astype(np.float32)
    np.asarray(styler.stylize_frame(d)[0])
    with jax.profiler.trace(trace_dir):
        out = styler.stylize_frame(d)[0]
        np.asarray(out)
    return iters


def parse_xplane(trace_dir: str):
    """Aggregate device-plane event durations by op-name bucket."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa

    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.xplane.pb"))
    assert paths, f"no xplane.pb under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    totals = collections.Counter()       # bucket -> ns
    by_name = collections.Counter()      # op name -> ns
    n_calls = collections.Counter()      # op name -> event count
    for plane in xspace.planes:
        if "TPU" not in plane.name or "XLA Op" in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # XLA Modules / XLA Ops / XLA TraceMe lines exist; op-level
            # durations live on the line named 'XLA Ops'
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                by_name[name] += ev.duration_ps
                n_calls[name] += 1
    return by_name, n_calls


import re

_SLOT_DIM = re.compile(r"\b\d{7,9}\b")        # n_slots(+N) sized dims
_4D = re.compile(r"f32\[(?:3,)?(\d+),(\d+),(\d+),(\d+)\]")


def _is_bin_array(name: str) -> bool:
    """f32 (K, Z, Y, X) bin arrays — also the shifted-resident 5D
    (3, K, Zp, Yb, Xb) param/Adam arrays: small leading K, volume-sized
    rest (VGG activations are bf16[9, H, W, C])."""
    for m in _4D.finditer(name):
        k, z, y, x = (int(g) for g in m.groups())
        if 1 <= k <= 32 and z >= 32 and y >= 32 and x >= 32:
            return True
    return False


def bucket_of(name: str) -> str:
    """LNST-surcharge-oriented buckets. Ops whose shapes carry the
    binned slot dim (>=1e7... n_slots) or the (K, Z, Y, X) bin arrays
    are the particle-path surcharge; everything else (views-batched
    renders, VGG convs) is shared with TNST."""
    low = name.lower()
    if low.startswith("%while") or low.startswith("%conditional"):
        return "_control_wrapper"  # double-counts its body; excluded
    if "custom-call" in low and _is_bin_array(name):
        return "splat_kernels"   # window kernels on (K, Z, Y, X) bins
    if "splat" in low and "tpu_custom_call" in low:
        return "splat_kernels"
    if "sort" in low:
        return "rebin_sort"
    if _SLOT_DIM.search(name) or _is_bin_array(name):
        return "binned_elementwise"
    if "convolution" in low or "conv" in low:
        return "render_vgg_conv"
    if low.startswith("%copy") or "transpose" in low:
        return "copy_format"
    if "reduce-window" in low:
        return "pooling"
    return "fusion_other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--octaves", type=int, default=1)
    ap.add_argument("--rebin", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--trace_dir", default="/tmp/lnst_trace")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--tnst", action="store_true",
                    help="trace the TNST 3d_single config instead")
    a = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from nfs_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    if not a.parse_only:
        if a.tnst:
            build_and_trace_tnst(a.iters, a.trace_dir, octaves=a.octaves)
        else:
            build_and_trace(a.iters, a.trace_dir, octaves=a.octaves,
                            rebin=a.rebin)

    by_name, n_calls = parse_xplane(a.trace_dir)
    buckets = collections.Counter()
    for name, ps in by_name.items():
        buckets[bucket_of(name)] += ps
    buckets.pop("_control_wrapper", None)

    total_ms = sum(buckets.values()) / 1e9
    surcharge = sum(buckets[k] for k in
                    ("splat_kernels", "binned_elementwise",
                     "rebin_sort")) / 1e9
    out = {
        "metric": "lnst_trace_attribution",
        "iters": a.iters, "octaves": a.octaves,
        "device_total_ms": round(total_ms, 3),
        "device_ms_per_iter": round(total_ms / (a.iters * a.octaves), 3),
        "lnst_surcharge_ms_per_iter": round(surcharge / (a.iters * a.octaves), 3),
        "buckets_ms_per_iter": {
            k: round(v / 1e9 / (a.iters * a.octaves), 3)
            for k, v in buckets.most_common()},
        "top_ops_ms_per_iter": {
            n.split(" = ")[0] + " = " + n.split(" = ")[1][:120]:
                [round(v / 1e9 / (a.iters * a.octaves), 3), n_calls[n]]
            for n, v in by_name.most_common(40)
            if not n.startswith("%while")},
    }
    print(json.dumps(out, indent=1))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
