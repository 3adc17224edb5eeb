"""Renderer golden + gradient tests (SURVEY.md §4: renderer vs a
straight-line numpy implementation of exp(-tau*cumsum)-weighted
integration; Poisson-disk min-distance property)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfs_tpu.render import (
    render_volume, render_views, render2d,
    poisson_disk_2d, poisson_view_pool, sample_views_stratified,
)
from nfs_tpu.render.raymarch import raymarch


def numpy_raymarch(rho, transmit):
    rho = np.maximum(rho, 0.0)
    csum = np.cumsum(rho, axis=0) - rho
    trans = np.exp(-transmit * csum)
    return np.sum(transmit * rho * trans, axis=0)


class TestRaymarch:
    def test_matches_numpy(self):
        rho = np.random.default_rng(0).random((12, 10, 8)).astype(np.float32)
        ours = raymarch(jnp.asarray(rho), transmit=0.3)
        ref = numpy_raymarch(rho, 0.3)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_opacity_bounded(self):
        rho = 100.0 * jnp.ones((32, 8, 8))
        img = raymarch(rho, transmit=0.5)
        # discrete compositing sum is bounded by ~1/(1-e^-sigma*rho) scale;
        # for the continuum limit it approaches 1 - exp(-sigma*C) <= 1.
        assert float(jnp.max(img)) < 60.0  # finite, no blow-up

    def test_empty_volume_black(self):
        img = raymarch(jnp.zeros((8, 8, 8)), transmit=0.3)
        np.testing.assert_allclose(np.asarray(img), 0.0)

    def test_frontmost_occludes(self):
        # a dense front slab should dominate over a back slab
        rho = np.zeros((16, 4, 4), np.float32)
        rho[2] = 50.0   # front (low index = near camera)
        rho[12] = 50.0  # back
        img_front_only = numpy_raymarch(rho[:8], 1.0)
        img = np.asarray(raymarch(jnp.asarray(rho), transmit=1.0))
        np.testing.assert_allclose(img, img_front_only, atol=1e-4)

    def test_color_compositing(self):
        rho = jnp.ones((4, 4, 4))
        color = jnp.ones((4, 4, 4, 3)) * jnp.array([1.0, 0.5, 0.0])
        img = raymarch(rho, transmit=0.5, color=color)
        assert img.shape == (4, 4, 3)
        gray = raymarch(rho, transmit=0.5)
        np.testing.assert_allclose(np.asarray(img[..., 0]),
                                   np.asarray(gray), atol=1e-5)
        np.testing.assert_allclose(np.asarray(img[..., 2]), 0.0, atol=1e-7)

    def test_resize(self):
        rho = jax.random.uniform(jax.random.PRNGKey(1), (8, 10, 12))
        img = raymarch(rho, out_size=(20, 24))
        assert img.shape == (20, 24)


class TestRenderVolume:
    def test_views_shape_rgb(self):
        d = jax.random.uniform(jax.random.PRNGKey(2), (10, 12, 10))
        thetas = jnp.array([0.0, 0.2])
        phis = jnp.array([0.0, -0.1])
        imgs = render_views(d, thetas, phis, out_size=(16, 16))
        assert imgs.shape == (2, 16, 16, 3)
        # grayscale tiled: channels identical
        np.testing.assert_allclose(np.asarray(imgs[..., 0]),
                                   np.asarray(imgs[..., 1]))

    def test_grad_flows_to_density(self):
        d = jax.random.uniform(jax.random.PRNGKey(3), (8, 8, 8)) + 0.1
        g = jax.grad(
            lambda x: jnp.sum(render_volume(x, jnp.float32(0.1),
                                            jnp.float32(0.05),
                                            transmit=0.2) ** 2))(d)
        assert float(jnp.max(jnp.abs(g))) > 0.0
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_render2d(self):
        d = jax.random.uniform(jax.random.PRNGKey(4), (24, 32))
        img = render2d(d, out_size=(48, 64))
        assert img.shape == (48, 64, 3)
        assert float(jnp.min(img)) >= 0.0
        assert float(jnp.max(img)) <= 1.0


class TestCameraSampling:
    def test_poisson_min_distance(self):
        rng = np.random.default_rng(5)
        pts = poisson_disk_2d(16, (0.0, 0.0), (1.0, 1.0), rng)
        assert pts.shape == (16, 2)
        dists = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(dists, np.inf)
        # hex-packing radius estimate for 16 pts in unit box
        r = math.sqrt(1.0 / (2 * math.sqrt(3) * 16))
        assert dists.min() > 0.5 * r  # min-distance property (with retries)

    def test_poisson_determinism(self):
        p1 = poisson_view_pool(3, 9, (-10, 10), (-5, 5), seed=7)
        p2 = poisson_view_pool(3, 9, (-10, 10), (-5, 5), seed=7)
        np.testing.assert_array_equal(p1, p2)
        assert p1.shape == (3, 9, 2)
        # radians within the degree ranges
        assert np.abs(p1[..., 0]).max() <= math.radians(10) + 1e-6
        assert np.abs(p1[..., 1]).max() <= math.radians(5) + 1e-6

    def test_poisson_degenerate_range(self):
        rng = np.random.default_rng(6)
        pts = poisson_disk_2d(5, (0.0, 0.0), (0.0, 0.0), rng)
        assert pts.shape == (5, 2)
        np.testing.assert_allclose(pts, 0.0)

    def test_stratified_jittable(self):
        f = jax.jit(lambda k: sample_views_stratified(k, 9, (-30, 30),
                                                      (-10, 10)))
        out = f(jax.random.PRNGKey(0))
        assert out.shape == (9, 2)
        assert float(jnp.abs(out[:, 0]).max()) <= math.radians(30) + 1e-5
        out2 = f(jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(out), np.asarray(out2))


class TestRender2DCompress:
    def test_soft_compressor_keeps_gradients_in_saturation(self):
        # hard clip has zero gradient wherever d > 1 (optimization stalls
        # in saturated regions, VERDICT r1 weak #7); the soft Beer-Lambert
        # compressor must not
        d = jnp.full((8, 8), 2.5)  # deeply saturated

        def bright(dd, compress):
            return jnp.mean(render2d(dd, compress=compress))

        g_soft = jax.grad(bright)(d, "soft")
        g_clip = jax.grad(bright)(d, "clip")
        assert float(jnp.abs(g_soft).min()) > 1e-4
        assert float(jnp.abs(g_clip).max()) == 0.0

    def test_soft_matches_transmittance_form(self):
        d = jnp.asarray(np.linspace(0, 3, 16, dtype=np.float32)).reshape(4, 4)
        img = render2d(d, compress="soft")
        expect = 1.0 - np.exp(-np.asarray(d))
        assert np.allclose(np.asarray(img[..., 0]), expect, atol=1e-6)
