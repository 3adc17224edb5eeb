"""Keyframe-parallel LNST engine tests (8 virtual CPU devices via
conftest). The engine must match B independent single-device
stylize_frame calls (same fold_in PRNG streams) and be invariant to the
mesh shape; non-binned configs fall back to the sequential path."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfs_tpu.core.config import StyleConfig, replace
from nfs_tpu.core.pytrees import ParticleSet
from nfs_tpu.parallel.mesh import make_mesh
from nfs_tpu.parallel.particles import ParallelKeyframeStyler
from nfs_tpu.styler.particle import (
    ParticleStyler,
    interp_sequence,
    keyframe_indices,
)

SHAPE = (16, 12, 16)


def _cfg(**over):
    base = {
        "render.render_size": (32, 32),
        "render.n_views": 2,
        "render.transmit": 0.3,
        "optim.octave_n": 2,
        "optim.iters": 4,
        "optim.lr": 0.05,
        "loss.style_layers": ("relu1_1",),
        "loss.style_layer_weights": (1.0,),
        "particle.optimize_position": True,
        "particle.optimize_density": True,
        "particle.keyframe_stride": 2,
        "particle.rebin_every": 3,
    }
    base.update(over)
    return replace(StyleConfig(), **base)


def _psets(T, n=350, seed=0):
    rng = np.random.default_rng(seed)
    x0 = rng.random((n, 3)) * (np.asarray(SHAPE) - 4.0) + 2.0
    drift = rng.normal(size=(n, 3)) * 0.15
    return [ParticleSet(x=jnp.asarray(x0 + t * drift, jnp.float32),
                        dens=jnp.ones((n,), jnp.float32))
            for t in range(T)]


def _style():
    return np.random.default_rng(3).random((32, 32, 3)).astype(np.float32)


def _run_parallel(cfg, psets, mesh, key):
    styler = ParticleStyler(cfg, grid_shape=SHAPE, style_image=_style())
    eng = ParallelKeyframeStyler(styler, mesh=mesh)
    return list(eng.stylize_keyframes(psets, key=key)), eng


class TestParallelKeyframes:
    def test_parity_vs_single_device(self):
        cfg = _cfg()
        psets = _psets(5)
        key = jax.random.PRNGKey(7)
        mesh = make_mesh(frames=4)
        outs, eng = _run_parallel(cfg, psets, mesh, key)
        assert [t for t, _ in outs] == list(range(5))

        # reference: independent single-device keyframe optimizations
        # with the engine's fold_in streams, then the same interpolation
        styler = ParticleStyler(cfg, grid_shape=SHAPE,
                                style_image=_style())
        kfs = keyframe_indices(5, cfg.particle.keyframe_stride)
        params = {}
        for kf in kfs:
            # the reference semantics are INDEPENDENT per-keyframe runs;
            # the styler's cross-frame bin-capacity plan cache is a
            # sequence-level optimization (keyframes here are unrelated
            # random clouds, the case the cache is not meant for)
            styler._k_cache.clear()
            _, p, _ = styler.stylize_frame(
                psets[kf], key=jax.random.fold_in(key, kf))
            params[kf] = p
        ref = dict(interp_sequence(psets, kfs, params,
                                   float(cfg.particle.max_offset),
                                   apply_fn=styler.apply_param))
        # tolerance note: bin capacities differ between the paths (the
        # engine pads every keyframe to the batch-max K, the single
        # styler probes per frame + cross-frame margin), so splat
        # summation order differs at FP level and the Adam loop
        # amplifies it — parity is algorithmic, not bitwise
        for t, styled in outs:
            np.testing.assert_allclose(np.asarray(styled.x),
                                       np.asarray(ref[t].x),
                                       rtol=4e-3, atol=4e-4)
            np.testing.assert_allclose(np.asarray(styled.dens),
                                       np.asarray(ref[t].dens),
                                       rtol=4e-3, atol=4e-4)
        # the optimization genuinely moved particles
        moved = max(float(jnp.abs(s.x - psets[t].x).max())
                    for t, s in outs)
        assert moved > 1e-5

    def test_mesh_shape_invariance(self):
        cfg = _cfg(**{"optim.iters": 3})
        psets = _psets(4, seed=5)
        key = jax.random.PRNGKey(11)
        outs2, _ = _run_parallel(cfg, psets, make_mesh(frames=2), key)
        outs8, _ = _run_parallel(cfg, psets, make_mesh(frames=8), key)
        for (t2, s2), (t8, s8) in zip(outs2, outs8):
            assert t2 == t8
            np.testing.assert_allclose(np.asarray(s2.x),
                                       np.asarray(s8.x),
                                       rtol=1e-4, atol=1e-5)

    def test_infos_and_losses(self):
        cfg = _cfg(**{"optim.iters": 3})
        psets = _psets(3, seed=2)
        outs, eng = _run_parallel(cfg, psets, make_mesh(frames=2),
                                  jax.random.PRNGKey(0))
        kfs = keyframe_indices(3, cfg.particle.keyframe_stride)
        assert sorted(eng.last_keyframe_infos) == kfs
        for kf in kfs:
            info = eng.last_keyframe_infos[kf]
            assert len(info["octave_losses"]) == cfg.optim.octave_n
            for ls in info["octave_losses"]:
                assert ls.shape == (cfg.optim.iters,)
                assert np.isfinite(np.asarray(ls)).all()

    def test_2d_keyframes(self):
        # 2D particle sets through the same engine (9-tap binned window)
        cfg = _cfg(**{"optim.iters": 2, "optim.octave_n": 1})
        shape2d = (24, 24)
        rng = np.random.default_rng(9)
        n = 200
        x0 = rng.random((n, 2)) * (np.asarray(shape2d) - 4.0) + 2.0
        psets = [ParticleSet(x=jnp.asarray(x0 + 0.2 * t, jnp.float32),
                             dens=jnp.ones((n,), jnp.float32))
                 for t in range(3)]
        styler = ParticleStyler(cfg, grid_shape=shape2d,
                                style_image=_style())
        eng = ParallelKeyframeStyler(styler, mesh=make_mesh(frames=2))
        outs = list(eng.stylize_keyframes(psets,
                                          key=jax.random.PRNGKey(3)))
        assert [t for t, _ in outs] == [0, 1, 2]
        moved = max(float(jnp.abs(s.x - p.x).max())
                    for (_, s), p in zip(outs, psets))
        assert moved > 1e-6

    def test_non_binned_falls_back(self):
        # support=1.5 is genuinely non-binnable (the binned layout
        # assumes unit support), so the engine must warn + fall back
        cfg = _cfg(**{"particle.kernel": "bspline",
                      "particle.support": 1.5, "optim.iters": 2,
                      "optim.octave_n": 1})
        psets = _psets(3, n=120, seed=4)
        styler = ParticleStyler(cfg, grid_shape=SHAPE,
                                style_image=_style())
        eng = ParallelKeyframeStyler(styler, mesh=make_mesh(frames=2))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            outs = list(eng.stylize_keyframes(psets,
                                              key=jax.random.PRNGKey(1)))
        assert [t for t, _ in outs] == [0, 1, 2]
        assert any("falling back" in str(x.message) for x in w)

    def test_linear_kernel_stays_binned_and_matches_sequential(self):
        # linear (tent/CIC) kernels are binnable since round 3: the
        # engine must NOT fall back, and must bin with the SAME kernel
        # it splats with (ADVICE r3 high) — parity vs the sequential
        # path is the end-to-end check of that
        cfg = _cfg(**{"particle.kernel": "linear", "optim.iters": 3,
                      "optim.octave_n": 1})
        psets = _psets(3, n=200, seed=6)
        key = jax.random.PRNGKey(13)
        styler = ParticleStyler(cfg, grid_shape=SHAPE,
                                style_image=_style())
        eng = ParallelKeyframeStyler(styler, mesh=make_mesh(frames=2))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            outs = list(eng.stylize_keyframes(psets, key=key))
        assert not any("falling back" in str(x.message) for x in w)

        ref_styler = ParticleStyler(cfg, grid_shape=SHAPE,
                                    style_image=_style())
        kfs = keyframe_indices(3, cfg.particle.keyframe_stride)
        params = {}
        for kf in kfs:
            _, p, _ = ref_styler.stylize_frame(
                psets[kf], key=jax.random.fold_in(key, kf))
            params[kf] = p
        ref = dict(interp_sequence(psets, kfs, params,
                                   float(cfg.particle.max_offset),
                                   apply_fn=ref_styler.apply_param))
        for t, styled in outs:
            np.testing.assert_allclose(np.asarray(styled.x),
                                       np.asarray(ref[t].x),
                                       rtol=2e-3, atol=2e-4)
            np.testing.assert_allclose(np.asarray(styled.dens),
                                       np.asarray(ref[t].dens),
                                       rtol=2e-3, atol=2e-4)
        moved = max(float(jnp.abs(s.x - psets[t].x).max())
                    for t, s in outs)
        assert moved > 1e-6

    def test_mesh_requires_frames_axis(self):
        from jax.sharding import Mesh

        cfg = _cfg()
        styler = ParticleStyler(cfg, grid_shape=SHAPE,
                                style_image=_style())
        bad = Mesh(np.array(jax.devices()[:2]), axis_names=("x",))
        with pytest.raises(ValueError, match="frames"):
            ParallelKeyframeStyler(styler, mesh=bad)
