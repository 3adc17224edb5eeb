"""Golden + gradient tests for nfs_tpu.ops (SURVEY.md §4 test strategy:
grid_sample/advection vs scipy.ndimage.map_coordinates, gradient checks on
advection and splatting)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import ndimage

from nfs_tpu.ops import (
    grid_sample, advect, advect_maccormack, rotate3d, resize,
    octave_shapes, splat, splat_normalized,
)
from nfs_tpu.ops.advect import advect_chain
from nfs_tpu.ops.interp import identity_coords
from nfs_tpu.ops.splat import gather


class TestGridSample:
    @pytest.mark.parametrize("shape", [(16, 12), (8, 10, 6)])
    def test_matches_scipy(self, shape):
        ndim = len(shape)
        field = np.random.default_rng(0).random(shape).astype(np.float32)
        coords = np.random.default_rng(1).random((50, ndim)).astype(
            np.float32) * (np.array(shape) - 1)
        ours = grid_sample(jnp.asarray(field), jnp.asarray(coords))
        ref = ndimage.map_coordinates(field, coords.T, order=1,
                                      mode="nearest")
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_identity(self):
        field = np.random.default_rng(2).random((9, 7)).astype(np.float32)
        coords = identity_coords((9, 7))
        out = grid_sample(jnp.asarray(field), coords)
        np.testing.assert_allclose(np.asarray(out), field, atol=1e-6)

    def test_zero_mode_outside(self):
        field = jnp.ones((4, 4))
        coords = jnp.array([[-2.0, 1.0], [5.0, 1.0], [1.0, 1.0]])
        out = grid_sample(field, coords, mode="zero")
        np.testing.assert_allclose(np.asarray(out), [0.0, 0.0, 1.0])

    def test_channels(self):
        field = np.random.default_rng(3).random((6, 5, 3)).astype(np.float32)
        coords = np.array([[2.5, 1.5]], np.float32)
        out = grid_sample(jnp.asarray(field), jnp.asarray(coords))
        assert out.shape == (1, 3)
        for c in range(3):
            ref = ndimage.map_coordinates(field[..., c], coords.T, order=1,
                                          mode="nearest")
            np.testing.assert_allclose(out[:, c], ref, atol=1e-5)

    def test_grad_wrt_coords(self):
        from tests.gradcheck import check_grad
        field = jnp.asarray(
            np.random.default_rng(4).random((12, 12)).astype(np.float32))
        coords = jnp.array([[3.3, 4.7], [6.1, 2.2]])
        check_grad(lambda c: jnp.sum(grid_sample(field, c)), coords)


class TestAdvect:
    def test_constant_velocity_translation(self):
        # advecting by a constant velocity = shifting the field
        field = np.zeros((16, 16), np.float32)
        field[8, 8] = 1.0
        vel = np.zeros((16, 16, 2), np.float32)
        vel[..., 0] = 2.0  # move +2 cells along axis 0
        out = advect(jnp.asarray(field), jnp.asarray(vel))
        assert float(out[10, 8]) == pytest.approx(1.0, abs=1e-5)
        assert float(out[8, 8]) == pytest.approx(0.0, abs=1e-5)

    def test_zero_velocity_identity(self):
        field = np.random.default_rng(5).random((8, 9, 10)).astype(np.float32)
        vel = np.zeros((8, 9, 10, 3), np.float32)
        out = advect(jnp.asarray(field), jnp.asarray(vel))
        np.testing.assert_allclose(np.asarray(out), field, atol=1e-6)

    def test_grad_wrt_velocity(self):
        from tests.gradcheck import check_grad
        key = jax.random.PRNGKey(6)
        field = jax.random.uniform(key, (10, 10))
        vel = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (10, 10, 2))
        check_grad(lambda v: jnp.sum(advect(field, v) ** 2), vel)

    def test_maccormack_bounded(self):
        field = jax.random.uniform(jax.random.PRNGKey(8), (20, 20))
        vel = jax.random.normal(jax.random.PRNGKey(9), (20, 20, 2))
        out = advect_maccormack(field, vel)
        assert float(jnp.min(out)) >= float(jnp.min(field)) - 1e-5
        assert float(jnp.max(out)) <= float(jnp.max(field)) + 1e-5

    def test_advect_chain_matches_sequential(self):
        field = jax.random.uniform(jax.random.PRNGKey(10), (12, 12))
        vels = 0.5 * jax.random.normal(jax.random.PRNGKey(11), (3, 12, 12, 2))
        chained = advect_chain(field, vels)
        manual = field
        for i in range(3):
            manual = advect(manual, vels[i])
        np.testing.assert_allclose(np.asarray(chained), np.asarray(manual),
                                   atol=1e-6)


class TestRotate:
    def test_zero_rotation_identity(self):
        d = jax.random.uniform(jax.random.PRNGKey(12), (8, 8, 8))
        out = rotate3d(d, jnp.float32(0.0), jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(d), atol=1e-5)

    def test_90deg_about_y(self):
        # theta=90deg about the vertical axis maps x -> z
        d = np.zeros((9, 9, 9), np.float32)
        d[4, 4, 7] = 1.0  # off-center along x
        out = rotate3d(jnp.asarray(d), jnp.float32(np.pi / 2),
                       jnp.float32(0.0))
        # mass should move to an off-center z position, same y
        pos = np.unravel_index(np.argmax(np.asarray(out)), out.shape)
        assert pos[1] == 4
        assert pos[2] == 4 or pos[0] in (1, 7)

    def test_mass_approx_conserved_small_angles(self):
        d = jnp.zeros((16, 16, 16)).at[6:10, 6:10, 6:10].set(1.0)
        out = rotate3d(d, jnp.float32(0.1), jnp.float32(-0.07))
        assert float(jnp.sum(out)) == pytest.approx(float(jnp.sum(d)),
                                                    rel=0.05)

    def test_grad_wrt_angles(self):
        from tests.gradcheck import check_grad
        d = jax.random.uniform(jax.random.PRNGKey(13), (8, 8, 8))
        # f32 objective over 512 voxels: central differences need a larger
        # step to beat roundoff
        check_grad(lambda t: jnp.sum(rotate3d(d, t[0], 0.1 * t[0]) ** 2),
                   jnp.array([0.2], dtype=jnp.float32), eps=1e-2, rtol=5e-2)


class TestResize:
    def test_octave_shapes(self):
        shapes = octave_shapes((112, 64, 112), 3, 2.0)
        assert shapes[-1] == (112, 64, 112)
        assert shapes[0] == (28, 16, 28)
        assert len(shapes) == 3

    def test_velocity_rescale(self):
        v = jnp.ones((8, 8, 2))
        out = resize(v, (16, 16), is_velocity=True)
        np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)

    def test_scalar_roundtrip_shape(self):
        d = jax.random.uniform(jax.random.PRNGKey(14), (10, 14))
        up = resize(d, (20, 28))
        assert up.shape == (20, 28)


class TestSplat:
    @pytest.mark.parametrize("kernel", ["linear", "bspline"])
    @pytest.mark.parametrize("dim", [2, 3])
    def test_mass_conservation(self, kernel, dim):
        rng = np.random.default_rng(15)
        n = 100
        shape = (16,) * dim
        # keep particles away from borders so no mass is dropped
        x = 3.0 + rng.random((n, dim)).astype(np.float32) * 10.0
        attr = rng.random(n).astype(np.float32)
        g = splat(jnp.asarray(x), jnp.asarray(attr), shape, kernel=kernel)
        assert float(jnp.sum(g)) == pytest.approx(float(attr.sum()), rel=1e-4)

    def test_matches_bilinear_transpose(self):
        # linear splat of a one-particle unit mass = bilinear weights
        x = jnp.array([[2.25, 3.75]])
        attr = jnp.array([1.0])
        g = splat(x, attr, (8, 8), kernel="linear")
        np.testing.assert_allclose(float(g[2, 3]), 0.75 * 0.25, atol=1e-6)
        np.testing.assert_allclose(float(g[3, 4]), 0.25 * 0.75, atol=1e-6)

    def test_grad_wrt_positions(self):
        from tests.gradcheck import check_grad
        x = jnp.asarray(
            3.0 + np.random.default_rng(16).random((20, 2)) * 8.0,
            dtype=jnp.float32)
        attr = jnp.ones(20)
        target = jax.random.uniform(jax.random.PRNGKey(17), (14, 14))
        check_grad(
            lambda p: jnp.sum((splat(p, attr, (14, 14)) - target) ** 2), x)

    def test_normalized_constant_attr(self):
        rng = np.random.default_rng(18)
        x = jnp.asarray(4.0 + rng.random((200, 2)) * 8.0, dtype=jnp.float32)
        attr = jnp.full((200,), 2.5)
        g = splat_normalized(x, attr, (16, 16))
        occupied = splat(x, jnp.ones(200), (16, 16)) > 0.05
        vals = np.asarray(g)[np.asarray(occupied)]
        np.testing.assert_allclose(vals, 2.5, atol=1e-3)

    def test_channels(self):
        x = jnp.array([[4.5, 4.5]])
        attr = jnp.array([[1.0, 2.0, 3.0]])
        g = splat(x, attr, (9, 9), kernel="linear")
        assert g.shape == (9, 9, 3)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(g, axis=(0, 1))), [1.0, 2.0, 3.0], atol=1e-5)

    def test_gather_of_constant_grid(self):
        grid = jnp.full((12, 12), 7.0)
        x = jnp.asarray(
            2.0 + np.random.default_rng(19).random((30, 2)) * 8.0,
            dtype=jnp.float32)
        vals = gather(grid, x)
        np.testing.assert_allclose(np.asarray(vals), 7.0, atol=1e-4)


class TestAdvectWindow:
    """Gather-free bounded-displacement advection (TPU fast path)."""

    @pytest.mark.parametrize("dim", [2, 3])
    @pytest.mark.parametrize("mode", ["clamp", "zero"])
    def test_matches_gather_path(self, dim, mode):
        rng = np.random.default_rng(20)
        shape = (14,) * dim
        field = jnp.asarray(rng.random(shape), jnp.float32)
        vel = jnp.asarray(0.9 * rng.standard_normal(shape + (dim,)),
                          jnp.float32)
        fast = advect(field, vel, mode=mode, max_disp=2.0)
        ref = advect(field, jnp.clip(vel, -2.0, 2.0), mode=mode)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-6)

    def test_clamps_large_displacement(self):
        field = jnp.zeros((16, 16)).at[8, 8].set(1.0)
        vel = jnp.full((16, 16, 2), 5.0)  # beyond max_disp
        out = advect(field, vel, max_disp=2.0)
        # displacement clamped to 2: mass lands at (6, 6) backtraced
        assert float(out[10, 10]) == pytest.approx(1.0, abs=1e-5)

    def test_channels(self):
        rng = np.random.default_rng(21)
        field = jnp.asarray(rng.random((12, 12, 3)), jnp.float32)
        vel = jnp.asarray(0.5 * rng.standard_normal((12, 12, 2)),
                          jnp.float32)
        fast = advect(field, vel, max_disp=1.0)
        ref = advect(field, jnp.clip(vel, -1, 1))
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-6)

    def test_grad_matches_gather_path(self):
        rng = np.random.default_rng(22)
        field = jnp.asarray(rng.random((10, 10)), jnp.float32)
        vel = jnp.asarray(0.4 * rng.standard_normal((10, 10, 2)),
                          jnp.float32)
        g_fast = jax.grad(
            lambda v: jnp.sum(advect(field, v, max_disp=2.0) ** 2))(vel)
        g_ref = jax.grad(
            lambda v: jnp.sum(advect(field, v) ** 2))(vel)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-3)
        gf_fast = jax.grad(
            lambda f: jnp.sum(advect(f, vel, max_disp=2.0) ** 2))(field)
        gf_ref = jax.grad(lambda f: jnp.sum(advect(f, vel) ** 2))(field)
        np.testing.assert_allclose(np.asarray(gf_fast),
                                   np.asarray(gf_ref), atol=1e-4,
                                   rtol=1e-3)


def test_maccormack_channeled_matches_per_component():
    # the smoke solver advects all velocity components in ONE channeled
    # MacCormack call; must match per-component advection to float
    # reassociation tolerance
    from nfs_tpu.ops.advect import advect_maccormack
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((14, 10, 12, 3)) * 1.5, jnp.float32)
    f = jnp.asarray(rng.random((14, 10, 12, 3)), jnp.float32)
    fused = advect_maccormack(f, v, dt=1.0, max_disp=2.0)
    per = jnp.stack([advect_maccormack(f[..., i], v, dt=1.0, max_disp=2.0)
                     for i in range(3)], axis=-1)
    assert float(jnp.max(jnp.abs(fused - per))) < 1e-5
