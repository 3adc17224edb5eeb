"""Multi-device tests on the virtual 8-device CPU backend (SURVEY.md §4:
exercise frames/views mesh axes, psum reductions, ppermute halos on CPU —
the identical code path as real TPU ICI)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from functools import partial
from jax import shard_map
from jax.sharding import PartitionSpec as P

from nfs_tpu.parallel import (
    make_mesh, halo_exchange, shard_volume, make_sharded_window_step,
)
from nfs_tpu.parallel.mesh import mesh_shape_for

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


class TestMesh:
    def test_make_mesh(self):
        mesh = make_mesh(frames=4, views=2)
        assert mesh.shape == {"frames": 4, "views": 2}

    def test_too_big_raises(self):
        with pytest.raises(ValueError):
            make_mesh(frames=16, views=2)

    def test_mesh_shape_for(self):
        assert mesh_shape_for(8) == (4, 2)
        assert mesh_shape_for(1) == (1, 1)


class TestHaloExchange:
    def test_matches_global_neighbors(self):
        mesh = make_mesh(frames=8, views=1)
        T, L = 16, 2
        x = jnp.arange(T, dtype=jnp.float32).reshape(T, 1)

        def body(xl):
            left, right = halo_exchange(xl, 1, "frames")
            return jnp.concatenate([left, right], axis=0)

        out = shard_map(
            body, mesh=mesh, in_specs=P("frames"),
            out_specs=P("frames"), check_vma=False)(x)
        out = np.asarray(out).reshape(8, 2)
        for shard in range(8):
            lo = shard * L
            want_left = max(lo - 1, 0)          # clamped at global edge
            want_right = min(lo + L, T - 1)
            assert out[shard, 0] == want_left
            assert out[shard, 1] == want_right

    def test_halo_depth_2(self):
        mesh = make_mesh(frames=4, views=1)
        x = jnp.arange(12, dtype=jnp.float32).reshape(12, 1)

        def body(xl):
            left, right = halo_exchange(xl, 2, "frames")
            return jnp.concatenate([left, xl, right], axis=0)

        out = shard_map(body, mesh=mesh, in_specs=P("frames"),
                        out_specs=P("frames"), check_vma=False)(x)
        out = np.asarray(out).reshape(4, 7)
        # shard 1 holds frames 3..5; left halo = frames 1,2; right = 6,7
        np.testing.assert_allclose(out[1], [1, 2, 3, 4, 5, 6, 7])


class TestShardVolume:
    def test_spatial_sharding_roundtrip(self):
        mesh = make_mesh(frames=1, views=8)
        d = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16)
        ds = shard_volume(d, mesh, axis=-1, mesh_axis="views")
        np.testing.assert_array_equal(np.asarray(ds), np.asarray(d))
        # a jitted op over the sharded volume works
        out = jax.jit(lambda x: x * 2 + 1)(ds)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(d) * 2 + 1)


class TestShardedWindowStep:
    def _setup(self, window=1):
        mesh = make_mesh(frames=4, views=2)
        T, H, W = 8, 16, 12
        n_views = 4
        d = jnp.asarray(
            np.random.default_rng(0).random((T, H, W)), jnp.float32)
        vels = jnp.asarray(
            0.3 * np.random.default_rng(1).standard_normal(
                (T, H, W, 2)), jnp.float32)
        params = jnp.zeros((T, H, W), jnp.float32)
        view_sets = jnp.asarray(
            np.random.default_rng(2).random((T, n_views, 2)), jnp.float32)
        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(T, dtype=jnp.uint32))
        target = jnp.asarray(
            np.random.default_rng(3).random((H, W)), jnp.float32)

        def loss_one_frame(param, d_i, vels_w, views_i, key_i, aux):
            # toy differentiable loss with the real dataflow: apply param,
            # advect through the window, compare to a target; per-view
            # weight 1/n_views so view-shard partials sum to the full loss.
            from nfs_tpu.ops.advect import advect
            d_star = d_i + param
            total = jnp.mean((d_star - aux["target"]) ** 2)
            if vels_w is not None:
                W = vels_w.shape[0] // 2
                d_f = advect(d_star, vels_w[W])
                total = total + jnp.mean((d_f - aux["target"]) ** 2)
            # fake view dependence: scale by mean of view angles
            vw = 1.0 + 0.01 * jnp.mean(views_i)
            return total * vw / 2.0  # 2 view shards; partials sum to full

        optimizer = optax.adam(0.05)
        opt_state = optimizer.init(params)
        step = make_sharded_window_step(
            mesh, loss_one_frame, optimizer, window=window,
            n_views=n_views, opt_state_example=opt_state)
        aux = {"target": target}
        return step, params, opt_state, d, vels, view_sets, keys, aux

    def test_step_runs_and_learns(self):
        step, params, opt_state, d, vels, view_sets, keys, aux = \
            self._setup(window=1)
        p, s, loss0 = step(params, opt_state, d, vels, view_sets, keys, aux)
        assert np.isfinite(float(loss0))
        assert float(jnp.abs(p).max()) > 0.0  # params updated
        for _ in range(10):
            p, s, loss = step(p, s, d, vels, view_sets, keys, aux)
        assert float(loss) < float(loss0)

    def test_window_zero(self):
        step, params, opt_state, d, vels, view_sets, keys, aux = \
            self._setup(window=0)
        p, s, loss = step(params, opt_state, d, vels, view_sets, keys, aux)
        assert np.isfinite(float(loss))
