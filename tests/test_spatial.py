"""Spatial (TP) sharding tests — 8 virtual CPU devices (conftest).
VERDICT r1 next-round #5: a stylization path where the volume is sharded
over a `space` axis end-to-end (advect -> shear-rotate -> raymarch -> VGG)
with numerical agreement vs the unsharded path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfs_tpu.core.config import StyleConfig, replace
from nfs_tpu.parallel.spatial import (
    SPACE_AXIS,
    persistent_state_bytes,
    prepare_spatial,
    shard_volume_spatial,
    spatial_mesh,
    stylize_frame_spatial,
)
from nfs_tpu.styler.grid import GridStyler


def _blob(shape):
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    return (1.5 * np.exp(-4 * sum(x ** 2 for x in g))).astype(np.float32)


def _cfg(**kw):
    base = {
        "render.render_size": (64, 64),
        "render.n_views": 2,
        "render.transmit": 0.05,
        "optim.octave_n": 2,
        "optim.iters": 4,
        "optim.lr": 0.02,
    }
    base.update(kw)
    return replace(StyleConfig(), **base)


def _style():
    return np.asarray(jax.random.uniform(jax.random.PRNGKey(7),
                                         (64, 64, 3)), np.float32)


class TestSpatialSharding:
    def test_mesh_and_placement(self):
        mesh = spatial_mesh(8)
        d = shard_volume_spatial(np.ones((8, 16, 8), np.float32), mesh)
        assert len(d.sharding.device_set) == 8
        # axis 1 sharded 8-ways: each shard holds 2 of 16 rows
        assert d.addressable_shards[0].data.shape == (8, 2, 8)

    def test_sharded_matches_unsharded(self):
        # same seed/config, sharded vs single-device; collectives reorder
        # float reductions so agreement is to optimization-noise tolerance
        shape = (12, 16, 12)
        d = _blob(shape)
        cfg = _cfg()

        st_ref = GridStyler(cfg, style_image=_style())
        ref, _, _ = st_ref.stylize_frame(d, key=jax.random.PRNGKey(3))
        ref = np.asarray(ref)

        mesh = spatial_mesh(8)
        st_sh = GridStyler(cfg, style_image=_style())
        out, param, _ = stylize_frame_spatial(
            st_sh, d, mesh, key=jax.random.PRNGKey(3))
        out = np.asarray(out)

        perturb = np.abs(ref - d).mean() + 1e-12
        err = np.abs(out - ref).mean()
        assert err < 0.05 * perturb, (err, perturb)

    def test_state_stays_sharded_through_octaves(self):
        # the core memory claim: the final full-res param (and with it the
        # Adam state that produced it) is partitioned over the mesh, not
        # gathered back to one device by some intermediate op
        shape = (8, 16, 8)
        mesh = spatial_mesh(8)
        st = GridStyler(_cfg(), style_image=_style())
        _, param, _ = stylize_frame_spatial(st, _blob(shape), mesh,
                                            key=jax.random.PRNGKey(0))
        assert len(param.sharding.device_set) == 8
        shard_shape = param.addressable_shards[0].data.shape
        assert shard_shape[SPACE_AXIS] == shape[SPACE_AXIS] // 8

    def test_velocity_parameterization_sharded(self):
        shape = (8, 16, 8)
        mesh = spatial_mesh(8)
        cfg = _cfg(**{"optim.parameterization": "velocity",
                      "optim.iters": 2})
        st = GridStyler(cfg, style_image=_style())
        out, param, _ = stylize_frame_spatial(st, _blob(shape), mesh,
                                              key=jax.random.PRNGKey(0))
        assert param.shape == shape + (3,)
        assert np.isfinite(np.asarray(out)).all()

    def test_memory_model(self):
        # 832^3 density-param persistent state exceeds one v5e's 16 GB
        # unsharded but fits 8-way sharded — the regime the TP path exists
        # for (exact OOM demo needs >1 real chip; the driver's
        # dryrun_multichip exercises the sharded program itself)
        full = persistent_state_bytes((832, 832, 832))
        assert full > 16e9
        assert full / 8 < 16e9
