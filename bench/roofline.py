"""Analytic roofline for the headline TNST step on TPU v5e (VERDICT r2
next-round #2: either reach >=20% MFU or commit a roofline argument that
the small-batch conv mix bounds it).

Model, per conv layer of the step's VGG (bf16, XLA conv = implicit-GEMM
on the 128x128 MXU):

  compute ceiling   = tile efficiency te = (K / roundup(K, 128))
                      * (N / roundup(N, 128)), with GEMM dims
                      M = V*H*W (views batched), K = 9*C_in, N = C_out
                      (the systolic array multiplies zero-padded lanes at
                      full cost; M is large enough to ignore its padding)
  memory ceiling    = AI / AI_crit, AI = FLOPs / HBM bytes moved
                      (activations in + out + weights, bf16), AI_crit =
                      peak_flops / HBM_BW = 197e12 / 819e9 ~= 240 F/B
  layer bound       = min(te, AI / AI_crit)

The per-layer bounds are FLOP-weighted into a per-render-size bound,
then across the octave schedule of the bench config (render sizes scale
with octaves) into a single number: the highest MFU any schedule of
these convs can reach on this chip, before counting the renderer,
advection, Adam, and all elementwise/memory-bound stages (which add
wall-clock but no counted FLOPs, only dragging MFU further down).

Writes docs/ROOFLINE.md. Pure host arithmetic, no device needed:

    python bench/roofline.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

PEAK = 197e12          # v5e bf16 MXU peak, FLOP/s
HBM_BW = 819e9         # v5e HBM bandwidth, B/s
AI_CRIT = PEAK / HBM_BW


def _roundup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def conv_layers(render: tuple, layers: tuple) -> list:
    """Per-conv GEMM dims for a VGG-19 forward at `render`, evaluated as
    deep as the deepest requested relu (matching vgg_features)."""
    from nfs_tpu.features.vgg import VGG_ARCH
    from nfs_tpu.utils.flops import _layer_order

    deepest = max(layers, key=_layer_order)
    h, w, c_in = render[0], render[1], 3
    out = []
    for entry in VGG_ARCH:
        if entry == "pool":
            h, w = h // 2, w // 2
            continue
        name, c_out = entry
        out.append((name, h, w, c_in, c_out))
        c_in = c_out
        if f"relu{name[4:]}" == deepest:
            break
    return out


def layer_bound(h: int, w: int, c_in: int, c_out: int,
                n_views: int) -> dict:
    """MFU upper bound for one conv (fwd; d-input bwd has the same GEMM
    shape with K and N swapped — folded in by averaging both)."""
    flops = 2.0 * n_views * h * w * 9 * c_in * c_out

    def te(k, n):
        return (k / _roundup(k, 128)) * (n / _roundup(n, 128))

    te_fwd = te(9 * c_in, c_out)
    te_bwd = te(9 * c_out, c_in)
    # bytes: read input act + weights, write output act (bf16 = 2B);
    # bwd moves the same magnitudes
    bytes_fwd = 2.0 * (n_views * h * w * c_in + 9 * c_in * c_out
                       + n_views * h * w * c_out)
    ai = flops / bytes_fwd
    mem = min(1.0, ai / AI_CRIT)
    return {
        "flops": 2 * flops,                      # fwd + bwd
        "bound": min((te_fwd + te_bwd) / 2.0, mem),
        "te": (te_fwd + te_bwd) / 2.0,
        "ai": ai,
        "mem": mem,
    }


def schedule_bound(shape, octave_n, octave_scale, render_size, n_views,
                   layers, iters):
    """FLOP-weighted MFU bound over the bench config's octave schedule."""
    from nfs_tpu.ops.resize import octave_shapes
    from nfs_tpu.utils.flops import styler_step_flops, vgg_forward_flops

    rows = []
    tot_flops = 0.0
    tot_time = 0.0          # in units of FLOPs/PEAK (ideal seconds)
    step_flops_total = 0.0
    for oshape in octave_shapes(shape, octave_n, octave_scale):
        factor = oshape[0] / shape[0]
        rsize = tuple(max(64, int(round(s * factor / 8)) * 8)
                      for s in render_size)
        for (name, h, w, ci, co) in conv_layers(rsize, layers):
            b = layer_bound(h, w, ci, co, n_views)
            rows.append((oshape, rsize, name, h, w, ci, co, b))
            tot_flops += iters * b["flops"]
            tot_time += iters * b["flops"] / (PEAK * max(b["bound"], 1e-9))
        step_flops_total += iters * styler_step_flops(
            oshape, rsize, n_views, layers)
    vgg_bound = tot_flops / (PEAK * tot_time)
    return rows, vgg_bound, tot_flops, step_flops_total


def nonconv_memory_floor(shape, n_views, octave_n, octave_scale):
    """Ideal seconds/iter of the non-conv stages at HBM bandwidth: the
    three-shear renderer moves each rotated volume 3x(read+write) per
    view, raymarch another ~2x, doubled for the backward; Adam reads and
    writes param + 2 moments. f32 volumes (4 B)."""
    from nfs_tpu.ops.resize import octave_shapes

    total = 0.0
    for oshape in octave_shapes(shape, octave_n, octave_scale):
        vol = 4.0 * oshape[0] * oshape[1] * oshape[2]
        render = n_views * (3 * 2 + 2 * 2) * vol * 2   # fwd+bwd
        adam = 6.0 * vol
        total += (render + adam) / HBM_BW
    return total / 1.0       # per "iteration at each octave" == 1 iter


def main():
    shape = (112, 64, 112)
    layers = ("relu1_1", "relu2_1", "relu3_1", "relu4_1")
    n_views, iters, octave_n, octave_scale = 9, 20, 3, 1.8
    render_size = (256, 256)

    rows, vgg_bound, vgg_flops, step_flops = schedule_bound(
        shape, octave_n, octave_scale, render_size, n_views, layers, iters)
    conv_s = vgg_flops / (PEAK * vgg_bound)            # ideal conv seconds
    mem_s = iters * nonconv_memory_floor(shape, n_views, octave_n,
                                         octave_scale)
    composite = step_flops / (PEAK * (conv_s + mem_s))

    lines = []
    w = lines.append
    w("# Roofline: the headline TNST step on one TPU v5e chip")
    w("")
    w("Analytic upper bound on the MFU the bench config (BASELINE #3:")
    w(f"{shape[0]}x{shape[1]}x{shape[2]}, {n_views} views, layers up to "
      f"relu4_1, {octave_n} octaves x {iters} iters, bf16, per-octave")
    w("render scaling) can reach on v5e — produced by `bench/roofline.py`")
    w("(model documented there). Peak 197 TFLOP/s bf16, HBM 819 GB/s,")
    w(f"critical arithmetic intensity {AI_CRIT:.0f} FLOP/B.")
    w("")
    w("## Per-conv bounds (per octave render size)")
    w("")
    w("| octave vol | render | layer | GEMM M=V*H*W | K=9Cin | N=Cout |"
      " tile eff | AI F/B | mem ceil | bound |")
    w("|---|---|---|---|---|---|---|---|---|---|")
    seen = set()
    for (oshape, rsize, name, h, wd, ci, co, b) in rows:
        key = (rsize, name)
        if key in seen:
            continue
        seen.add(key)
        w(f"| {oshape[0]}x{oshape[1]}x{oshape[2]} | {rsize[0]}x{rsize[1]} "
          f"| {name} | {n_views * h * wd:,} | {9 * ci} | {co} "
          f"| {b['te']:.2f} | {b['ai']:.0f} | {b['mem']:.2f} "
          f"| {b['bound']:.2f} |")
    w("")
    w("## Composition")
    w("")
    w(f"- FLOP-weighted bound over all convs of the schedule (fwd + "
      f"d-input bwd, frozen VGG): **{vgg_bound:.1%} of peak** — if the "
      f"step were ONLY its convs, each running at its own roofline "
      f"(ideal conv time {conv_s * 1e3 / (octave_n * iters):.2f} "
      f"ms/iter).")
    mem_ms = mem_s * 1e3 / (octave_n * iters)
    w(f"- Non-conv memory floor (three-shear renderer + raymarch + "
      f"Adam at full HBM bandwidth): {mem_ms:.2f} ms/iter. These "
      f"stages add wall-clock with ~zero counted MXU FLOPs, so they "
      f"only LOWER achievable MFU.")
    w(f"- **Composite ceiling: {composite:.1%} MFU** "
      f"({(conv_s + mem_s) * 1e3 / (octave_n * iters):.2f} ms/iter "
      f"ideal vs 11.1 ms/iter measured at 90.1 it/s, BENCH_r02). VGG "
      f"conv FLOPs/frame {vgg_flops / 1e12:.2f} TF; analytic step "
      f"total {step_flops / 1e12:.2f} TF.")
    w("")
    w("## Reading")
    w("")
    w("1. The conv mix itself does NOT bound the step to ~12%: the "
      "idealized ceiling is far higher. What the table does show is "
      "the structural handicap of STYLE losses — they read shallow "
      "VGG layers (conv1_1 bound 0.06, conv1_2 0.45, conv2_1 0.70: "
      "K or N under the 128-lane MXU tile), and those layers carry a "
      "large FLOP share at 256^2 renders.")
    w("2. The measured gap between the composite ceiling and 12.4% is "
      "therefore PRACTICAL conv efficiency: XLA's implicit-GEMM conv "
      "at these shapes (huge M, small K*N) runs well below the tiling "
      "bound — it is bandwidth/latency-limited streaming weights "
      "through the MXU with thin reduction dims, plus fusion-boundary "
      "and layout-transpose overheads the model ignores. CLAUDE.md's "
      "measured 'VGG = 60-70% of the step' puts practical conv "
      "throughput near ~20% of peak, consistent with shallow-layer "
      "conv mixes on this class of hardware.")
    w("3. The octave schedule shrinks renders at coarse octaves — the "
      "right call for wall-clock — which further lowers achieved MFU "
      "(smaller M). MFU-optimal and time-optimal schedules differ; we "
      "optimize time and report MFU honestly rather than inflating the "
      "render sizes to flatter the metric.")
    w("4. Verification: bench.py emits `stages_ms_finest_octave` "
      "(render/VGG-fwd/bwd/adam split) in BENCH_r03 to localize the "
      "measured split against this model.")
    w("")
    w("## Measured attribution (round 3: jax.profiler device trace of "
      "10 scanned finest-octave steps on v5e)")
    w("")
    w("Pure device time 14.7 ms/iter (the scan has no dispatch floor; "
      "earlier per-dispatch stage numbers carried the axon relay's "
      "~1-5 ms per-call overhead). HLO-category split per iteration:")
    w("")
    w("| category | ms/iter | share | note |")
    w("|---|---|---|---|")
    w("| convolution fusions | 9.08 | 62% | largest: conv1_2 bwd 1.63, "
      "conv2_1 bwd 1.12, conv1_2 fwd 0.98 — 10-25% of the per-conv "
      "roofline each |")
    w("| data formatting (layout copies) | 2.88 | 20% | XLA materializes "
      "each styled activation twice: convs prefer {3,0,2,1}, "
      "pool/Gram consumers {2,3,1,0} (bf16[9,256,256,64] copies, "
      "0.5-0.6 ms each) |")
    w("| reduce-window (pooling) | 0.93 | 6% | |")
    w("| elementwise/loop+output fusions | 1.35 | 9% | render at 0.46 ms "
      "is INSIDE this + conv bucket — at its 0.29 ms memory floor |")
    w("")
    w("Attempted and rejected (measured end-to-end, no win): first-conv "
      "patches-einsum GEMM (standalone 1.19 -> 0.88 ms but flat "
      "in-program), reshape-mean pooling (spawned 6D broadcast copies "
      "in backward, +6% step time), reshape-free Gram einsum (layout "
      "copies persist — they come from XLA's conv-backward layout "
      "assignment, not the reshape). The remaining gap to the 65.7% "
      "composite ceiling lives inside XLA:TPU's conv codegen and "
      "layout assignment at batch-9 256^2 shapes; orchestration "
      "overhead (dispatch, Adam, renderer, splat plumbing) is already "
      "at or near its floor.")
    w("")
    print("\n".join(lines))
    with open("docs/ROOFLINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote docs/ROOFLINE.md")


if __name__ == "__main__":
    main()
