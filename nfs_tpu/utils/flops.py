"""Analytic FLOP accounting + MFU (model FLOP utilization) for the
stylization step (VERDICT r1 missing #6: report achieved FLOP/s vs peak,
not just iters/s, so the bench states how close the step runs to the
hardware roofline).

The step is VGG-dominated (~60-70%% measured, CLAUDE.md perf model); the
renderer's three-shear rotations are the next term. Elementwise ops are
ignored (memory-bound, not FLOP-bound — MFU is a compute-roofline metric).

Backward-pass convention: a conv's backward computes grads w.r.t. inputs
AND weights — but the loss network is FROZEN, so XLA prunes the weight-
gradient matmuls and the backward costs ~1x the forward (d-input only).
Total fwd+bwd multiplier for frozen-VGG = 2x (vs 3x for trainable nets).
"""

from __future__ import annotations

from typing import Sequence, Tuple

# bf16 systolic-array peak of one TPU v5e (v5litepod) chip
TPU_V5E_PEAK_BF16 = 197e12
# f32 VPU-assisted peak (convs not in bf16 run ~4x slower on v5e)
TPU_V5E_PEAK_F32 = 49e12


def vgg_forward_flops(height: int, width: int,
                      layers: Sequence[str]) -> float:
    """Multiply-add FLOPs (2 * MACs) of one VGG-19 forward over one image,
    evaluated only as deep as the deepest requested relu layer (matching
    ``vgg_features``' early exit)."""
    from nfs_tpu.features.vgg import VGG_ARCH

    deepest = max(layers, key=_layer_order) if layers else None
    h, w, c_in = height, width, 3
    total = 0.0
    for entry in VGG_ARCH:
        if entry == "pool":
            h, w = h // 2, w // 2
            continue
        name, c_out = entry
        total += 2.0 * h * w * 9 * c_in * c_out
        c_in = c_out
        if deepest is not None and f"relu{name[4:]}" == deepest:
            break
    return total


def _layer_order(layer: str) -> Tuple[int, int]:
    block, idx = layer.replace("relu", "").split("_")
    return int(block), int(idx)


def shear_rotate_flops(vol_shape: Sequence[int]) -> float:
    """Three-shear MXU rotation of one volume (ops/shear.py): each shear
    is a (len, len) interpolation matrix applied along one axis —
    2 * len^2 * (other axes) MACs, three shears per rotation."""
    z, y, x = vol_shape
    return 2.0 * (z * z * y * x) + 2.0 * (y * y * z * x) + 2.0 * (x * x * z * y)


def render_forward_flops(vol_shape: Sequence[int], out_size: Sequence[int],
                         n_views: int) -> float:
    """Per-view: one shear rotation + the resize-to-out contraction.
    Raymarch cumsum/compositing is elementwise (excluded)."""
    z, y, x = vol_shape
    oh, ow = out_size
    resize = 2.0 * (oh * (y * x) + ow * oh * x)  # separable contractions
    return n_views * (shear_rotate_flops(vol_shape) + resize)


def styler_step_flops(vol_shape: Sequence[int], render_size: Sequence[int],
                      n_views: int, layers: Sequence[str],
                      n_window_renders: int = 1) -> float:
    """One Adam iteration of the TNST grid styler: render + VGG over
    n_views images, n_window_renders times (1 + 2*window for the temporal
    window loss), forward + backward (2x, frozen VGG — see module doc)."""
    fwd = (render_forward_flops(vol_shape, render_size, n_views)
           + n_views * vgg_forward_flops(render_size[0], render_size[1],
                                         layers))
    return 2.0 * fwd * n_window_renders


def mfu(achieved_flops_per_s: float,
        peak: float = TPU_V5E_PEAK_BF16) -> float:
    """Fraction of peak (0..1)."""
    return achieved_flops_per_s / peak
