"""Analytic FLOP/MFU accounting sanity tests (nfs_tpu/utils/flops.py)."""

import numpy as np

from nfs_tpu.utils.flops import (
    TPU_V5E_PEAK_BF16,
    mfu,
    render_forward_flops,
    shear_rotate_flops,
    styler_step_flops,
    vgg_forward_flops,
)


class TestVGGFlops:
    def test_known_first_layer(self):
        # conv1_1 only: 2 * H*W * 9 * 3 * 64 MACs
        f = vgg_forward_flops(224, 224, ["relu1_1"])
        assert f == 2 * 224 * 224 * 9 * 3 * 64

    def test_depth_monotonic(self):
        shallow = vgg_forward_flops(128, 128, ["relu1_1"])
        mid = vgg_forward_flops(128, 128, ["relu3_1"])
        deep = vgg_forward_flops(128, 128, ["relu5_1"])
        assert shallow < mid < deep

    def test_full_vgg19_scale(self):
        # full VGG-19 at 224^2 is famously ~39 GFLOPs (2x MACs)
        f = vgg_forward_flops(224, 224, ["relu5_4"])
        assert 3.0e10 < f < 4.5e10

    def test_resolution_quadratic(self):
        f1 = vgg_forward_flops(128, 128, ["relu4_1"])
        f2 = vgg_forward_flops(256, 256, ["relu4_1"])
        assert abs(f2 / f1 - 4.0) < 0.05


class TestRenderFlops:
    def test_shear_symmetry(self):
        assert shear_rotate_flops((64, 64, 64)) == 3 * 2 * 64 ** 4

    def test_views_linear(self):
        f1 = render_forward_flops((64, 48, 64), (128, 128), 1)
        f9 = render_forward_flops((64, 48, 64), (128, 128), 9)
        assert abs(f9 / f1 - 9.0) < 1e-6


class TestStepAndMFU:
    def test_window_multiplier(self):
        base = styler_step_flops((64, 48, 64), (128, 128), 4,
                                 ["relu1_1", "relu2_1"])
        win = styler_step_flops((64, 48, 64), (128, 128), 4,
                                ["relu1_1", "relu2_1"],
                                n_window_renders=3)
        assert abs(win / base - 3.0) < 1e-6

    def test_mfu_fraction(self):
        assert mfu(TPU_V5E_PEAK_BF16) == 1.0
        assert abs(mfu(19.7e12) - 0.1) < 1e-6
