"""Pallas window-advection kernels vs the XLA window formulation
(interpret mode — the CPU test backend can't compile Mosaic; the same
comparisons were validated on real v5e hardware, see git log)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call,
                                             interpret=True))


def _case(shape=(12, 10, 14), seed=0, vel_scale=0.8):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.random(shape), jnp.float32)
    v = jnp.asarray(vel_scale * rng.standard_normal(shape + (3,)),
                    jnp.float32)
    return f, v


class TestPallasAdvect:
    def test_forward_matches_window(self):
        from nfs_tpu.ops.advect import advect
        from nfs_tpu.ops.pallas_advect import pallas_window_advect

        f, v = _case()
        out = pallas_window_advect(f, v, max_disp=2.0, tz=4)
        ref = advect(f, v, mode="clamp", max_disp=2.0, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_vjp_matches_window(self):
        from nfs_tpu.ops.advect import advect
        from nfs_tpu.ops.pallas_advect import advect_pallas

        f, v = _case(seed=1)

        def lp(f, v):
            return jnp.sum(advect_pallas(f, v, 1.0, 2.0, 4) ** 2)

        def lr(f, v):
            return jnp.sum(
                advect(f, v, mode="clamp", max_disp=2.0, impl="xla") ** 2)

        gf_p, gv_p = jax.grad(lp, argnums=(0, 1))(f, v)
        gf_r, gv_r = jax.grad(lr, argnums=(0, 1))(f, v)
        np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_r),
                                   atol=1e-4)

    def test_vjp_fused_backward_matches_window(self):
        # The fused single-dispatch backward is a measured loser on v5e
        # (docs/ROOFLINE.md "Fused advect backward") but is kept behind
        # FUSED_BWD for A/B on future hardware — keep it correct.
        from nfs_tpu.ops import pallas_advect as pa
        from nfs_tpu.ops.advect import advect

        f, v = _case(seed=1)

        def lp(f, v):
            return jnp.sum(pa.advect_pallas(f, v, 1.0, 2.0, 4) ** 2)

        def lr(f, v):
            return jnp.sum(
                advect(f, v, mode="clamp", max_disp=2.0, impl="xla") ** 2)

        old = pa.FUSED_BWD
        pa.FUSED_BWD = True
        try:
            gf_p, gv_p = jax.grad(lp, argnums=(0, 1))(f, v)
        finally:
            pa.FUSED_BWD = old
        gf_r, gv_r = jax.grad(lr, argnums=(0, 1))(f, v)
        np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_r),
                                   atol=1e-4)

    def test_vjp_zero_velocity_nonzero_grad(self):
        """u == 0 everywhere (zero-init transport field) must still give
        a usable velocity gradient (the JAX abs-at-0 convention)."""
        from nfs_tpu.ops.advect import advect
        from nfs_tpu.ops.pallas_advect import advect_pallas

        rng = np.random.default_rng(2)
        f = jnp.asarray(rng.random((8, 8, 8)), jnp.float32)
        v0 = jnp.zeros((8, 8, 8, 3), jnp.float32)
        target = jnp.asarray(rng.random((8, 8, 8)), jnp.float32)

        def lp(v):
            return jnp.sum((advect_pallas(f, v, 1.0, 2.0, 4)
                            - target) ** 2)

        def lr(v):
            return jnp.sum((advect(f, v, mode="clamp", max_disp=2.0,
                                   impl="xla") - target) ** 2)

        gp = jax.grad(lp)(v0)
        gr = jax.grad(lr)(v0)
        assert float(jnp.abs(gr).max()) > 0.0
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=1e-4)

    def test_clipped_velocities(self):
        from nfs_tpu.ops.advect import advect
        from nfs_tpu.ops.pallas_advect import advect_pallas

        f, v = _case(seed=3, vel_scale=3.0)  # many |v| > max_disp
        out = advect_pallas(f, v, 1.0, 2.0, 4)
        ref = advect(f, v, mode="clamp", max_disp=2.0, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_impl_flag_pallas(self):
        from nfs_tpu.ops.advect import advect

        f, v = _case(seed=4)
        out = advect(f, v, mode="clamp", max_disp=2.0, impl="pallas")
        ref = advect(f, v, mode="clamp", max_disp=2.0, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_vmap_parity_fwd_and_grads(self):
        """Batched (vmapped) Pallas advect — the parallel engine's window
        loss is vmapped over local frames, so the kernels must hold
        value+grad parity under vmap (VERDICT r3 weak #5)."""
        from nfs_tpu.ops.advect import advect
        from nfs_tpu.ops.pallas_advect import advect_pallas

        B = 3
        fs = jnp.stack([_case(seed=10 + b)[0] for b in range(B)])
        vs = jnp.stack([_case(seed=10 + b)[1] for b in range(B)])

        out = jax.vmap(lambda f, v: advect_pallas(f, v, 1.0, 2.0, 4))(
            fs, vs)
        ref = jax.vmap(lambda f, v: advect(f, v, mode="clamp",
                                           max_disp=2.0, impl="xla"))(
            fs, vs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

        def lp(fs, vs):
            return jnp.sum(jax.vmap(
                lambda f, v: advect_pallas(f, v, 1.0, 2.0, 4))(fs, vs)
                ** 2)

        def lr(fs, vs):
            return jnp.sum(jax.vmap(
                lambda f, v: advect(f, v, mode="clamp", max_disp=2.0,
                                    impl="xla"))(fs, vs) ** 2)

        gf_p, gv_p = jax.grad(lp, argnums=(0, 1))(fs, vs)
        gf_r, gv_r = jax.grad(lr, argnums=(0, 1))(fs, vs)
        np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_r),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_r),
                                   atol=1e-4)

    def test_shard_map_frames_sharded(self):
        """Pallas advect inside shard_map with the volume UNSHARDED over
        space (frames-DP, each device holds full local volumes) — the
        engine's window-loss regime. Values + velocity grads must match
        the unsharded XLA reference."""
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        from nfs_tpu.ops.advect import advect
        from nfs_tpu.ops.pallas_advect import advect_pallas

        n = min(4, jax.device_count())
        mesh = Mesh(np.array(jax.devices()[:n]), ("frames",))
        B = 2 * n
        fs = jnp.stack([_case(seed=20 + b, shape=(8, 8, 16))[0]
                        for b in range(B)])
        vs = jnp.stack([_case(seed=20 + b, shape=(8, 8, 16))[1]
                        for b in range(B)])

        def local(fs, vs):
            return jax.vmap(
                lambda f, v: advect_pallas(f, v, 1.0, 2.0, 4))(fs, vs)

        # check_vma=False matches the engine's shard_map
        # (parallel/sharding.py) — Pallas out_shapes carry no vma
        sharded = shard_map(local, mesh=mesh,
                            in_specs=(P("frames"), P("frames")),
                            out_specs=P("frames"), check_vma=False)
        out = jax.jit(sharded)(fs, vs)
        ref = jax.vmap(lambda f, v: advect(f, v, mode="clamp",
                                           max_disp=2.0, impl="xla"))(
            fs, vs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

        def loss_sharded(vs):
            return jnp.sum(sharded(fs, vs) ** 2)

        def loss_ref(vs):
            return jnp.sum(jax.vmap(
                lambda f, v: advect(f, v, mode="clamp", max_disp=2.0,
                                    impl="xla"))(fs, vs) ** 2)

        gv = jax.jit(jax.grad(loss_sharded))(vs)
        gr = jax.grad(loss_ref)(vs)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(gr),
                                   atol=1e-4)
