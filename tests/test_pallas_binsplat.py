"""Pallas binned-splat kernels (ops/pallas_binsplat.py) vs the XLA
binned splat (ops/binsplat.py) — values and gradients, interpret mode
(the CPU test backend can't compile Mosaic; re-validate on hardware per
.claude/skills/verify/SKILL.md when these kernels change)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfs_tpu.ops import binsplat as B
from nfs_tpu.ops.pallas_binsplat import splat_binned_pallas


def _case(n, shape, seed=0, drift=0.0):
    """Binned positions/attrs; optional post-binning drift (LNST
    optimizes dx, so positions move between rebins)."""
    rng = np.random.default_rng(seed)
    spread = np.array(shape) + 6
    x = jnp.asarray(rng.random((n, len(shape))) * spread - 3.0,
                    jnp.float32)
    attr = jnp.asarray(rng.random((n,)), jnp.float32)
    K = B.bucket_k(int(B.max_bin_count(x, shape)))
    bn = B.bin_particles(x, shape, K)
    if drift:
        x = x + jnp.asarray(
            drift * rng.standard_normal(x.shape), jnp.float32)
    return x, attr, bn, K


@pytest.mark.parametrize("shape", [(12, 10, 14), (9, 7, 11)])
def test_forward_matches_binned(shape):
    x, attr, bn, K = _case(2500, shape)
    p_b, a_b = B.to_binned(bn, x), B.to_binned(bn, attr)
    got = splat_binned_pallas(p_b, a_b, bn.valid, shape, K)
    ref = B.splat_binned(p_b, a_b, bn.valid, shape, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-6)


def test_large_k_multi_slab():
    # K=8 across several z-slabs: the config whose full-K kernels OOM'd
    # scoped VMEM on v5e — exercises the per-bin grid accumulation in
    # BOTH kernels (fwd out-block revisiting, bwd per-k blocks)
    shape = (20, 8, 12)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((4000, 3)) * (np.array(shape) - 1),
                    jnp.float32)
    attr = jnp.asarray(rng.random((4000,)), jnp.float32)
    K = 8
    bn = B.bin_particles(x, shape, K)
    p_b, a_b = B.to_binned(bn, x), B.to_binned(bn, attr)
    h = jnp.asarray(rng.random(shape), jnp.float32)

    def loss(splat, p, a):
        return jnp.vdot(splat(p, a, bn.valid, shape, K), h)

    l_p, (gp_p, ga_p) = jax.value_and_grad(
        lambda p, a: loss(splat_binned_pallas, p, a), (0, 1))(p_b, a_b)
    l_x, (gp_x, ga_x) = jax.value_and_grad(
        lambda p, a: loss(B.splat_binned, p, a), (0, 1))(p_b, a_b)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_x),
                               atol=1e-5)


def test_forward_with_drift_and_overflow():
    # drifted positions + a crowded cluster that overflows K: parked
    # particles must be excluded identically in both impls
    shape = (10, 8, 12)
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        np.concatenate([rng.random((800, 3)) * (np.array(shape) - 1),
                        5.0 + 0.05 * rng.random((300, 3))]), jnp.float32)
    attr = jnp.asarray(rng.random((1100,)), jnp.float32)
    K = 4  # force overflow in the cluster cell
    bn = B.bin_particles(x, shape, K)
    assert int(bn.n_overflow) > 0
    x = x + jnp.asarray(0.3 * rng.standard_normal(x.shape), jnp.float32)
    p_b, a_b = B.to_binned(bn, x), B.to_binned(bn, attr)
    got = splat_binned_pallas(p_b, a_b, bn.valid, shape, K)
    ref = B.splat_binned(p_b, a_b, bn.valid, shape, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-6)


def test_gradients_match_binned():
    shape = (10, 8, 12)
    x, attr, bn, K = _case(1200, shape, seed=1, drift=0.2)
    p_b, a_b = B.to_binned(bn, x), B.to_binned(bn, attr)
    h = jnp.asarray(np.random.default_rng(2).random(shape), jnp.float32)

    def lp(p, a):
        return jnp.vdot(splat_binned_pallas(p, a, bn.valid, shape, K), h)

    def lr(p, a):
        return jnp.vdot(B.splat_binned(p, a, bn.valid, shape, K), h)

    gp_p, ga_p = jax.grad(lp, argnums=(0, 1))(p_b, a_b)
    gp_r, ga_r = jax.grad(lr, argnums=(0, 1))(p_b, a_b)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_r),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_r),
                               atol=5e-6)


def test_gradients_zero_velocity_convention():
    # zero drift => frac lands exactly on tap centers/half-integers;
    # the kernel's dw1d must match JAX's where/abs subgradients so the
    # pallas grads equal the XLA grads bit-for-branch
    shape = (8, 8, 8)
    n = 600
    rng = np.random.default_rng(4)
    # integer + half-integer positions: maximal tie density
    x = jnp.asarray(
        np.round(rng.random((n, 3)) * (np.array(shape) - 1) * 2) / 2.0,
        jnp.float32)
    attr = jnp.asarray(rng.random((n,)), jnp.float32)
    K = B.bucket_k(int(B.max_bin_count(x, shape)))
    bn = B.bin_particles(x, shape, K)
    p_b, a_b = B.to_binned(bn, x), B.to_binned(bn, attr)
    h = jnp.asarray(rng.random(shape), jnp.float32)

    gp_p = jax.grad(lambda p: jnp.vdot(
        splat_binned_pallas(p, a_b, bn.valid, shape, K), h))(p_b)
    gp_r = jax.grad(lambda p: jnp.vdot(
        B.splat_binned(p, a_b, bn.valid, shape, K), h))(p_b)
    np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_r),
                               atol=5e-6)


def test_parked_slots_get_zero_grad():
    shape = (10, 8, 12)
    rng = np.random.default_rng(5)
    x = jnp.asarray(
        np.concatenate([rng.random((500, 3)) * (np.array(shape) - 1),
                        4.0 + 0.05 * rng.random((200, 3))]), jnp.float32)
    attr = jnp.asarray(rng.random((700,)), jnp.float32)
    K = 2
    bn = B.bin_particles(x, shape, K)
    assert int(bn.n_overflow) > 0
    p_b, a_b = B.to_binned(bn, x), B.to_binned(bn, attr)
    n_slots = bn.valid.shape[0]
    h = jnp.ones(shape, jnp.float32)
    ga = jax.grad(lambda a: jnp.vdot(
        splat_binned_pallas(p_b, a, bn.valid, shape, K), h))(a_b)
    # parking region and invalid dense slots: exactly zero gradient
    assert float(jnp.abs(ga[n_slots:]).max()) == 0.0
    assert float(jnp.abs(jnp.where(bn.valid, 0.0, ga[:n_slots])).max()
                 ) == 0.0


def test_styler_pallas_matches_binned_3d():
    """End-to-end: ParticleStyler with splat_impl='binned_pallas' must
    reproduce the XLA binned path's trajectory on a 3D frame (identical
    math, fused kernels)."""
    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.core.pytrees import ParticleSet
    from nfs_tpu.styler.particle import ParticleStyler

    style = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                          (64, 64, 3)))
    rng = np.random.default_rng(0)
    pset = ParticleSet(
        x=jnp.asarray(rng.random((900, 3)) * 20 + 6, jnp.float32),
        dens=jnp.ones((900,), jnp.float32))
    out = {}
    for impl in ("binned", "binned_pallas"):
        cfg = replace(StyleConfig(), **{
            "render.render_size": (64, 64), "render.n_views": 2,
            "optim.octave_n": 2, "optim.iters": 4,
            "particle.optimize_position": True,
            "particle.optimize_density": True,
            "particle.splat_impl": impl,
            "particle.rebin_every": 2,
        })
        st = ParticleStyler(cfg, grid_shape=(32, 24, 32),
                            style_image=style)
        styled, param, info = st.stylize_frame(pset)
        out[impl] = (np.asarray(param["dx"]),
                     np.asarray(jnp.concatenate(info["octave_losses"])))
    dx_x, loss_x = out["binned"]
    dx_p, loss_p = out["binned_pallas"]
    np.testing.assert_allclose(loss_p, loss_x, rtol=1e-4)
    np.testing.assert_allclose(dx_p, dx_x, atol=1e-5)


def test_vmapped_matches_binned():
    # the keyframe-DP engine (parallel/particles.py) vmaps the splat
    # over keyframes; the pallas_calls carry ANY-memory-space operands,
    # which plain vmap-of-pallas_call can't batch on real TPUs — the
    # kernels use jax.custom_batching.sequential_vmap instead. Parity of
    # the batched value AND grads vs per-frame calls.
    shape = (10, 8, 12)
    cases = [_case(1500, shape, seed=s) for s in (0, 1)]
    K = max(c[3] for c in cases)
    bns = [B.bin_particles(c[0], shape, K) for c in cases]
    pb = jnp.stack([B.to_binned(bn, c[0])
                    for bn, c in zip(bns, cases)])
    ab = jnp.stack([B.to_binned(bn, c[1])
                    for bn, c in zip(bns, cases)])
    vb = jnp.stack([bn.valid for bn in bns])

    def loss(pb_, ab_, v_):
        return jnp.sum(splat_binned_pallas(pb_, ab_, v_, shape, K) ** 2)

    batched = jax.jit(jax.vmap(jax.value_and_grad(loss, argnums=(0, 1)),
                               in_axes=(0, 0, 0)))
    vals, (gp, ga) = batched(pb, ab, vb)
    for b in range(2):
        v_ref, (gp_ref, ga_ref) = jax.value_and_grad(
            loss, argnums=(0, 1))(pb[b], ab[b], vb[b])
        np.testing.assert_allclose(np.asarray(vals[b]),
                                   np.asarray(v_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gp[b]),
                                   np.asarray(gp_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ga[b]),
                                   np.asarray(ga_ref), atol=1e-5)
