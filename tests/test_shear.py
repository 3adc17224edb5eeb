"""Shear-decomposed rotation vs the exact trilinear gather rotation
(nfs_tpu/ops/shear.py — the MXU fast path for the renderer)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfs_tpu.ops.rotate import rotate3d
from nfs_tpu.ops.shear import rotate3d_shear, shear
from nfs_tpu.render.raymarch import raymarch, render_volume


def smooth_volume(shape=(32, 32, 32), seed=0, n_blobs=6):
    rng = np.random.default_rng(seed)
    grids = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape],
                        indexing="ij")
    v = np.zeros(shape, np.float32)
    for _ in range(n_blobs):
        c = rng.uniform(-0.5, 0.5, 3)
        s = rng.uniform(0.15, 0.3)
        v += np.exp(-sum((g - ci) ** 2 for g, ci in zip(grids, c))
                    / s ** 2).astype(np.float32)
    return jnp.asarray(v)


class TestShear:
    def test_zero_slope_identity(self):
        d = smooth_volume((12, 10, 14))
        out = shear(d, 0, 2, jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(d),
                                   atol=1e-5)

    def test_integer_shift_exact(self):
        # slope*drive = integer shifts reproduce exact translation per slice
        d = jnp.zeros((9, 1, 9)).at[4, 0, :].set(1.0)
        out = shear(d, 0, 2, jnp.float32(0.5))
        # at x=8 (drive offset +4 from center): out[i] = in(i - 2) -> peak
        # moves from z=4 to z=6
        assert float(out[6, 0, 8]) == pytest.approx(1.0, abs=1e-5)
        # at center x=4: unchanged
        assert float(out[4, 0, 4]) == pytest.approx(1.0, abs=1e-5)

    def test_rotation_matches_gather_zero_angles(self):
        d = smooth_volume((16, 12, 16))
        out = rotate3d_shear(d, jnp.float32(0.0), jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(d),
                                   atol=1e-5)

    @pytest.mark.parametrize("angles", [(0.2, -0.1), (0.5, 0.3),
                                        (-0.3, 0.2)])
    def test_rotation_close_to_gather(self, angles):
        t, p = angles
        d = smooth_volume((32, 32, 32))
        a = rotate3d(d, jnp.float32(t), jnp.float32(p), mode="zero")
        b = rotate3d_shear(d, jnp.float32(t), jnp.float32(p))
        rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
        assert rel < 0.06  # interpolation-smoothing difference only
        # the rendered images agree much tighter
        ia = raymarch(a, transmit=0.3)
        ib = raymarch(b, transmit=0.3)
        img_rel = float(jnp.abs(ia - ib).max() / jnp.abs(ia).max())
        assert img_rel < 0.02

    def test_center_of_mass_matches_gather(self):
        shape = (25, 25, 25)
        zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape],
                                 indexing="ij")
        g = np.exp(-((zz - 12) ** 2 + (yy - 12) ** 2 + (xx - 18) ** 2)
                   / 4.0).astype(np.float32)
        d = jnp.asarray(g)

        def com(a):
            a = np.asarray(a)
            s = a.sum()
            return np.array([(a * c).sum() / s for c in (zz, yy, xx)])

        for t, p in [(0.3, 0.0), (0.0, 0.3), (0.25, -0.2)]:
            ca = com(rotate3d(d, jnp.float32(t), jnp.float32(p),
                              mode="zero"))
            cb = com(rotate3d_shear(d, jnp.float32(t), jnp.float32(p)))
            np.testing.assert_allclose(ca, cb, atol=0.05)

    def test_grad_flows(self):
        d = smooth_volume((16, 12, 16))
        g = jax.grad(lambda x: jnp.sum(
            rotate3d_shear(x, jnp.float32(0.2), jnp.float32(0.1)) ** 2))(d)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0.0

    def test_bf16_operands_close(self):
        # render.rotation='shear_bf16': bf16 einsum OPERANDS, f32
        # accumulate. On TPU the default f32 matmul already computes
        # bf16 MXU passes (outputs bit-identical there); on CPU this
        # bounds the operand-rounding error the mode can introduce.
        d = smooth_volume((24, 16, 24))
        a = rotate3d_shear(d, jnp.float32(0.2), jnp.float32(-0.1))
        b = rotate3d_shear(d, jnp.float32(0.2), jnp.float32(-0.1),
                           dtype=jnp.bfloat16)
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-8))
        assert rel < 0.02
        c = render_volume(d, jnp.float32(0.2), jnp.float32(-0.1),
                          transmit=0.3, method="shear_bf16")
        assert c.shape == render_volume(
            d, jnp.float32(0.2), jnp.float32(-0.1), transmit=0.3,
            method="shear").shape

    def test_render_volume_method_switch(self):
        d = smooth_volume((16, 12, 16))
        a = render_volume(d, jnp.float32(0.2), jnp.float32(0.1),
                          transmit=0.3, method="gather")
        b = render_volume(d, jnp.float32(0.2), jnp.float32(0.1),
                          transmit=0.3, method="shear")
        assert a.shape == b.shape
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-8))
        assert rel < 0.03
        with pytest.raises(ValueError):
            render_volume(d, jnp.float32(0.0), jnp.float32(0.0),
                          method="nope")
