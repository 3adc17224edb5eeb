"""Shifted-resident binned chunk (styler/particle.py layout='shifted' +
ops/pallas_binsplat.window_shifted): the LNST chunk state lives in the
Pallas kernel's (K, Zp, Yb, Xb) layout so the per-step pad/slice/reshape
plumbing at the kernel boundary vanishes. Interpret mode on CPU;
re-validate on hardware when changed (.claude/skills/verify/SKILL.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nfs_tpu.ops import binsplat as B
from nfs_tpu.ops.pallas_binsplat import (prep_shifted, shifted_layout,
                                         window_shifted)
from nfs_tpu.styler.particle import (_binned_chunk_core, _from_hybrid,
                                     _to_hybrid)


def _binned_case(n, shape, seed=0, K=None):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((n, 3)) * (np.array(shape) - 1),
                    jnp.float32)
    attr = jnp.asarray(rng.random((n,)), jnp.float32)
    if K is None:
        K = B.bucket_k(int(B.max_bin_count(x, shape)))
    bn = B.bin_particles(x, shape, K)
    return x, attr, bn, K


def _to_shifted_ops(bn, x, attr, shape, K):
    """Chunk-constant shifted operands the way the chunk core builds
    them (positions fill 1e4, attrs fill 0)."""
    pshape = B.padded_shape(shape)
    dims, _ = shifted_layout(shape)
    n_slots = bn.valid.shape[0]
    xb = B.to_binned(bn, x)
    ab = B.to_binned(bn, attr)
    x4 = tuple(prep_shifted(
        jnp.where(bn.valid, xb[d, :n_slots], 1e4).reshape((K,) + pshape),
        1e4, dims) for d in range(3))
    a4 = prep_shifted(
        jnp.where(bn.valid, ab[:n_slots], 0.0).reshape((K,) + pshape),
        0.0, dims)
    return x4, a4


@pytest.mark.parametrize("shape", [(12, 10, 14), (9, 7, 11)])
def test_window_shifted_matches_splat_binned(shape):
    x, attr, bn, K = _binned_case(2500, shape)
    x4, a4 = _to_shifted_ops(bn, x, attr, shape, K)
    got = window_shifted(a4, x4[0], x4[1], x4[2], shape, K, True)
    ref = B.splat_binned(B.to_binned(bn, x), B.to_binned(bn, attr),
                         bn.valid, shape, K)[
        tuple(slice(0, s) for s in shape)]
    # splat_binned returns the unpadded grid already; both are (*shape,)
    assert got.shape == tuple(shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-6)


def test_window_shifted_grads_match_and_stay_in_layout():
    shape = (10, 8, 12)
    x, attr, bn, K = _binned_case(1400, shape, seed=1)
    n_slots = bn.valid.shape[0]
    x4, a4 = _to_shifted_ops(bn, x, attr, shape, K)
    h = jnp.asarray(np.random.default_rng(2).random(shape), jnp.float32)

    ga4, gx4 = jax.grad(
        lambda a, px: jnp.vdot(
            window_shifted(a, px[0], px[1], px[2], shape, K, True), h),
        argnums=(0, 1))(a4, x4)
    # gradients arrive in the shifted layout
    assert ga4.shape == a4.shape and gx4[0].shape == x4[0].shape

    p_b, a_b = B.to_binned(bn, x), B.to_binned(bn, attr)
    gp_r, ga_r = jax.grad(
        lambda p, a: jnp.vdot(
            B.splat_binned(p, a, bn.valid, shape, K), h),
        argnums=(0, 1))(p_b, a_b)
    # compare on the dense region, mapped back from the shifted layout
    pshape = B.padded_shape(shape)
    sl = (slice(None),) + tuple(slice(2, 2 + s) for s in pshape)
    np.testing.assert_allclose(
        np.asarray(ga4[sl].reshape(n_slots)),
        np.asarray(jnp.where(bn.valid, ga_r[:n_slots], 0.0)), atol=5e-6)
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(gx4[d][sl].reshape(n_slots)),
            np.asarray(jnp.where(bn.valid, gp_r[d, :n_slots], 0.0)),
            atol=5e-6)
    # pad bands and empty slots: exactly zero gradient
    dense = np.zeros(a4.shape, bool)
    dense[sl] = np.asarray(bn.valid).reshape((K,) + pshape)
    assert float(jnp.abs(jnp.where(jnp.asarray(dense), 0.0, ga4)).max()
                 ) == 0.0


def test_hybrid_roundtrip_exact_with_overflow():
    shape = (10, 8, 12)
    x, attr, bn, K = _binned_case(900, shape, seed=3, K=2)
    # K=2 on a crowded case: force parked particles
    rng = np.random.default_rng(4)
    x = jnp.concatenate([x, 4.0 + 0.05 * jnp.asarray(
        rng.random((150, 3)), jnp.float32)])
    bn = B.bin_particles(x, shape, 2)
    assert int(bn.n_overflow) > 0
    n = x.shape[0]
    n_slots = bn.valid.shape[0]
    pshape = B.padded_shape(shape)
    dims, _ = shifted_layout(shape)
    tree = {"dx": jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
            "ddens": jnp.asarray(rng.standard_normal((n,)), jnp.float32),
            "count": jnp.int32(7)}
    h = _to_hybrid(bn, n_slots, 2, pshape, dims, n, tree)
    assert set(h["dx"]) == {"b", "t"} and h["dx"]["b"].ndim == 5
    back = _from_hybrid(bn, n_slots, 2, pshape, n, h)
    assert int(back["count"]) == 7
    np.testing.assert_array_equal(np.asarray(back["dx"]),
                                  np.asarray(tree["dx"]))
    np.testing.assert_array_equal(np.asarray(back["ddens"]),
                                  np.asarray(tree["ddens"]))


def _chunk_setup(seed=0, n=1200, shape=(12, 10, 14)):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.random((n, 3)) * (np.array(shape) - 2) + 1,
                    jnp.float32)
    dens = jnp.asarray(0.5 + rng.random((n,)), jnp.float32)
    param = {"dx": jnp.zeros((n, 3), jnp.float32),
             "ddens": jnp.zeros((n,), jnp.float32)}
    h = jnp.asarray(rng.random(shape), jnp.float32)

    def loss_slots(param_b, key, data_b):
        dxb = 2.0 * jnp.tanh(param_b["dx"] / 2.0)
        pb = data_b["xb"] + dxb
        dens_eff = data_b["densb"] * jnp.exp(param_b["ddens"])
        K = data_b["K"]
        grid = B.splat_binned(pb, dens_eff, data_b["valid"], shape, K)
        return (jnp.vdot(grid, h)
                + 1e-3 * jnp.sum(param_b["dx"] ** 2) / data_b["n_dx"])

    def loss_shifted(param_b, key, data_b):
        dxb = 2.0 * jnp.tanh(param_b["dx"]["b"] / 2.0)
        pb = tuple(data_b["xb4"][d] + dxb[d] for d in range(3))
        dens_eff = data_b["densb4"] * jnp.exp(param_b["ddens"]["b"])
        K = data_b["K"]
        grid = window_shifted(dens_eff, pb[0], pb[1], pb[2], shape, K,
                              True)
        t = jnp.where(data_b["parked"][:, None], param_b["dx"]["t"], 0.0)
        return (jnp.vdot(grid, h)
                + 1e-3 * (jnp.sum(param_b["dx"]["b"] ** 2)
                          + jnp.sum(t ** 2)) / data_b["n_dx"])

    return x, dens, param, loss_slots, loss_shifted


def test_chunk_core_shifted_matches_slots():
    """The full chunk (rebin + scan of Adam steps) must produce the same
    canonical params/opt-state/losses in both layouts."""
    shape = (12, 10, 14)
    x, dens, param, loss_slots, loss_shifted = _chunk_setup(shape=shape)
    K = B.bucket_k(int(B.max_bin_count(x, shape)) + 1)
    opt = optax.adam(0.05)
    state = opt.init(param)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    data = {"x": x, "dens": dens, "n_dx": float(param["dx"].size),
            "K": K}

    outs = {}
    for layout, lf in (("slots", loss_slots), ("shifted", loss_shifted)):
        p, s, losses, n_over = _binned_chunk_core(
            param, state, keys, data, lf, opt, shape, K, 1.0, 2.0,
            True, layout=layout)
        outs[layout] = (p, s, np.asarray(losses), int(n_over))

    p0, s0, l0, o0 = outs["slots"]
    p1, s1, l1, o1 = outs["shifted"]
    assert o0 == o1
    np.testing.assert_allclose(l1, l0, rtol=2e-5)
    for k in p0:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p0[k]),
                                   atol=1e-5)
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5)


def test_chunk_core_shifted_vmapped_matches_single():
    """The keyframe-DP engine vmaps the SAME core; the shifted layout
    must batch identically (sequential_vmap pallas + batched scatters)."""
    shape = (10, 8, 12)
    setups = [_chunk_setup(seed=s, n=800, shape=shape) for s in (0, 1)]
    K = max(B.bucket_k(int(B.max_bin_count(s[0], shape)) + 1)
            for s in setups)
    opt = optax.adam(0.05)
    loss_shifted = setups[0][4]
    keys = jnp.stack([jax.random.split(jax.random.PRNGKey(i), 3)
                      for i in range(2)])
    param_b = jax.tree.map(lambda *ls: jnp.stack(ls),
                           *[s[2] for s in setups])
    state_b = jax.vmap(opt.init)(param_b)
    data_b = {"x": jnp.stack([s[0] for s in setups]),
              "dens": jnp.stack([s[1] for s in setups]),
              "n_dx": float(setups[0][2]["dx"].size), "K": K}

    from functools import partial
    core = partial(_binned_chunk_core, loss_fn=loss_shifted,
                   optimizer=opt, shape=shape, K=K, scale=1.0,
                   max_offset=2.0, has_dx=True, layout="shifted")
    pv, sv, lv, ov = jax.vmap(
        core, in_axes=(0, 0, 0, {"x": 0, "dens": 0, "n_dx": None,
                                 "K": None}))(
        param_b, state_b, keys, data_b)
    for i, s in enumerate(setups):
        p1, s1, l1, o1 = core(s[2], opt.init(s[2]), keys[i],
                              {"x": s[0], "dens": s[1],
                               "n_dx": data_b["n_dx"], "K": K})
        np.testing.assert_allclose(np.asarray(lv[i]), np.asarray(l1),
                                   rtol=2e-5)
        for k in p1:
            np.testing.assert_allclose(np.asarray(pv[k][i]),
                                       np.asarray(p1[k]), atol=1e-5)
