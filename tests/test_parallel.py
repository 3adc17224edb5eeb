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

    def test_halo_deeper_than_shard(self):
        # halo > local length: the all_gather fallback (window wider than
        # frames-per-shard used to silently truncate, VERDICT weak #3)
        mesh = make_mesh(frames=8, views=1)
        T, halo = 8, 3  # L = 1 < halo
        x = jnp.arange(T, dtype=jnp.float32).reshape(T, 1)

        def body(xl):
            left, right = halo_exchange(xl, halo, "frames")
            return jnp.concatenate([left, xl, right], axis=0)

        out = shard_map(body, mesh=mesh, in_specs=P("frames"),
                        out_specs=P("frames"), check_vma=False)(x)
        out = np.asarray(out).reshape(8, 2 * halo + 1)
        for shard in range(8):
            want = np.clip(np.arange(shard - halo, shard + halo + 1),
                           0, T - 1)
            np.testing.assert_allclose(out[shard], want)


class TestShardVolume:
    def test_spatial_sharding_roundtrip(self):
        mesh = make_mesh(frames=1, views=8)
        d = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16)
        ds = shard_volume(d, mesh, axis=-1, mesh_axis="views")
        np.testing.assert_array_equal(np.asarray(ds), np.asarray(d))
        # a jitted op over the sharded volume works
        out = jax.jit(lambda x: x * 2 + 1)(ds)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(d) * 2 + 1)


def _toy_problem(T=8, H=16, W=12, n_views=4):
    d = jnp.asarray(
        np.random.default_rng(0).random((T, H, W)), jnp.float32)
    vels = jnp.asarray(
        0.3 * np.random.default_rng(1).standard_normal(
            (T, H, W, 2)), jnp.float32)
    params = jnp.zeros((T, H, W), jnp.float32)
    pool = jnp.asarray(
        np.random.default_rng(2).random((5, n_views, 2)), jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(T, dtype=jnp.uint32))
    target = jnp.asarray(
        np.random.default_rng(3).random((H, W)), jnp.float32)

    def loss_one_frame(param, d_i, vels_w, views_i, key_i, aux):
        # toy differentiable loss with the real dataflow: apply param,
        # advect through the window, compare to a target; per-view
        # weighting = local_views / n_views so view-shard partials SUM
        # to the full per-frame loss.
        from nfs_tpu.ops.advect import advect
        d_star = d_i + param
        base = jnp.mean((d_star - aux["target"]) ** 2)
        if vels_w is not None:
            Wd = vels_w.shape[0] // 2
            d_f = advect(d_star, vels_w[Wd])
            base = base + jnp.mean((d_f - aux["target"]) ** 2)
        # view dependence: each view scales the loss by its first angle
        per_view = base * (1.0 + 0.1 * views_i[:, 0])
        return jnp.sum(per_view) / n_views

    aux = {"target": target}
    return params, d, vels, pool, keys, aux, loss_one_frame


class TestShardedWindowStep:
    def _build(self, mesh, loss_one_frame, params, window, n_views,
               n_iters=1):
        optimizer = optax.adam(0.05)
        opt_state = optimizer.init(params)
        step = make_sharded_window_step(
            mesh, loss_one_frame, optimizer, window=window,
            n_views=n_views, opt_state_example=opt_state, n_iters=n_iters)
        return step, opt_state

    def test_step_runs_and_learns(self):
        params, d, vels, pool, keys, aux, loss_fn = _toy_problem()
        mesh = make_mesh(frames=4, views=2)
        step, s = self._build(mesh, loss_fn, params, window=1, n_views=4)
        p, s, loss0 = step(params, s, d, vels, pool, keys, aux,
                           jnp.int32(0))
        assert np.isfinite(float(loss0[0]))
        assert float(jnp.abs(p).max()) > 0.0  # params updated
        for it in range(1, 11):
            p, s, loss = step(p, s, d, vels, pool, keys, aux,
                              jnp.int32(it))
        assert float(loss[0]) < float(loss0[0])

    def test_window_zero(self):
        params, d, vels, pool, keys, aux, loss_fn = _toy_problem()
        mesh = make_mesh(frames=4, views=2)
        step, s = self._build(mesh, loss_fn, params, window=0, n_views=4)
        p, s, loss = step(params, s, d, vels, pool, keys, aux,
                          jnp.int32(0))
        assert np.isfinite(float(loss[0]))

    def test_scan_chunks_match_single_steps(self):
        # one n_iters=4 dispatch == four n_iters=1 dispatches with it0
        params, d, vels, pool, keys, aux, loss_fn = _toy_problem()
        mesh = make_mesh(frames=4, views=2)
        step1, s1 = self._build(mesh, loss_fn, params, window=1, n_views=4)
        step4, s4 = self._build(mesh, loss_fn, params, window=1, n_views=4,
                                n_iters=4)
        p1 = params
        losses1 = []
        for it in range(4):
            p1, s1, l = step1(p1, s1, d, vels, pool, keys, aux,
                              jnp.int32(it))
            losses1.append(float(l[0]))
        p4, s4, losses4 = step4(params, s4, d, vels, pool, keys, aux,
                                jnp.int32(0))
        np.testing.assert_allclose(np.asarray(losses4), losses1, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(p4), np.asarray(p1),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("fv", [(4, 2), (2, 4), (8, 1)])
    def test_parity_with_unsharded(self, fv):
        # the sharded step must produce the SAME params as the same step
        # on a 1-device mesh (catches missing view-gradient psum: view
        # shards would otherwise apply only their local partial gradient,
        # ADVICE r1 high-severity finding)
        frames, views = fv
        params, d, vels, pool, keys, aux, loss_fn = _toy_problem()
        ref_mesh = make_mesh(frames=1, views=1)
        stepr, sr = self._build(ref_mesh, loss_fn, params, window=1,
                                n_views=4, n_iters=3)
        pr, _, lr = stepr(params, sr, d, vels, pool, keys, aux,
                          jnp.int32(0))
        mesh = make_mesh(frames=frames, views=views)
        steps, ss = self._build(mesh, loss_fn, params, window=1,
                                n_views=4, n_iters=3)
        ps, _, ls = steps(params, ss, d, vels, pool, keys, aux,
                          jnp.int32(0))
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lr),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ps), np.asarray(pr),
                                   rtol=1e-4, atol=1e-6)

    def test_parity_window_deeper_than_shard(self):
        # window=3 with frames=8 shards of T=8 (L=1): exercises the
        # all_gather deep-halo fallback inside the real step
        params, d, vels, pool, keys, aux, loss_fn = _toy_problem()
        ref_mesh = make_mesh(frames=1, views=1)
        stepr, sr = self._build(ref_mesh, loss_fn, params, window=3,
                                n_views=4)
        pr, _, lr = stepr(params, sr, d, vels, pool, keys, aux,
                          jnp.int32(0))
        mesh = make_mesh(frames=8, views=1)
        steps, ss = self._build(mesh, loss_fn, params, window=3, n_views=4)
        ps, _, ls = steps(params, ss, d, vels, pool, keys, aux,
                          jnp.int32(0))
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lr),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ps), np.asarray(pr),
                                   rtol=1e-4, atol=1e-6)
