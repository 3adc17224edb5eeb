"""Tests for the self-contained JAX fluid data generators (SURVEY.md §2:
mantaflow replacement; SURVEY.md §4 integration strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nfs_tpu.sim import SmokeSolver, smoke_sequence, FlipSolver, liquid_sequence
from nfs_tpu.sim.smoke import SmokeConfig, _divergence, _jacobi_pressure, _gradient
from nfs_tpu.sim.flip import FlipConfig, seed_particles


class TestSmoke:
    def test_sequence_shapes_2d(self):
        cfg = SmokeConfig(shape=(32, 24), jacobi_iters=10)
        ds, vs = smoke_sequence(cfg, n_frames=5)
        assert ds.shape == (5, 32, 24)
        assert vs.shape == (5, 32, 24, 2)
        assert np.isfinite(ds).all() and np.isfinite(vs).all()

    def test_density_grows_from_source(self):
        cfg = SmokeConfig(shape=(32, 24), jacobi_iters=10)
        ds, _ = smoke_sequence(cfg, n_frames=6)
        assert ds[0].sum() > 0
        assert ds[-1].sum() > ds[0].sum() * 0.9
        assert ds.min() >= 0.0

    def test_smoke_rises(self):
        # center of mass should move toward lower index (up) over time
        cfg = SmokeConfig(shape=(48, 32), jacobi_iters=15,
                          source_center=(0.85, 0.5), buoyancy=0.4)
        ds, _ = smoke_sequence(cfg, n_frames=20)
        idx = np.arange(48)[:, None]
        com0 = (ds[2] * idx).sum() / max(ds[2].sum(), 1e-6)
        com1 = (ds[-1] * idx).sum() / max(ds[-1].sum(), 1e-6)
        assert com1 < com0  # moved up

    def test_projection_reduces_divergence(self):
        cfg = SmokeConfig(shape=(32, 32), jacobi_iters=40)
        ds, vs = smoke_sequence(cfg, n_frames=8)
        v = jnp.asarray(vs[-1])
        div = _divergence(v)
        # re-project: should already be nearly projected
        p = _jacobi_pressure(div, 40)
        v2 = v - _gradient(p)
        assert float(jnp.abs(_divergence(v2)).mean()) <= \
            float(jnp.abs(div).mean()) + 1e-5

    def test_3d_sequence(self):
        cfg = SmokeConfig(shape=(16, 12, 16),
                          source_center=(0.5, 0.85, 0.5),
                          jacobi_iters=8)
        ds, vs = smoke_sequence(cfg, n_frames=3)
        assert ds.shape == (3, 16, 12, 16)
        assert vs.shape == (3, 16, 12, 16, 3)
        assert np.isfinite(ds).all()


class TestFlip:
    def test_seed_particles_inside(self):
        cfg = FlipConfig(shape=(32, 32))
        p = seed_particles(cfg)
        assert p.x.shape[1] == 2
        assert float(p.x.min()) >= 0.0
        assert float(p.x.max()) <= 32.0

    def test_particles_fall_and_stay_inside(self):
        cfg = FlipConfig(shape=(32, 32), jacobi_iters=10,
                         block_lo=(0.1, 0.3), block_hi=(0.4, 0.7))
        xs, vels = liquid_sequence(cfg, n_frames=10)
        assert np.isfinite(xs).all()
        # stays in the domain
        assert xs.min() >= 0.5 and xs.max() <= 31.5
        # center of mass falls (axis0 index grows)
        com0 = xs[0][:, 0].mean()
        com1 = xs[-1][:, 0].mean()
        assert com1 > com0

    def test_particle_count_static(self):
        cfg = FlipConfig(shape=(24, 24), jacobi_iters=5)
        xs, _ = liquid_sequence(cfg, n_frames=3)
        assert xs.shape[0] == 3
        assert xs.shape[1] == seed_particles(cfg).x.shape[0]


class TestVorticity3D:
    def test_3d_confinement_runs_and_preserves_stability(self):
        cfg = SmokeConfig(shape=(16, 12, 16),
                          source_center=(0.5, 0.85, 0.5),
                          jacobi_iters=8, vorticity=0.3)
        ds, vs = smoke_sequence(cfg, n_frames=5)
        assert np.isfinite(ds).all() and np.isfinite(vs).all()
        assert ds.min() >= 0.0

    def test_confinement_force_orthogonal_to_vorticity(self):
        from nfs_tpu.sim.smoke import _vorticity_confinement_3d, _central_diff
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal((12, 12, 12, 3)), jnp.float32)
        f = _vorticity_confinement_3d(v, 1.0)
        vz, vy, vx = v[..., 0], v[..., 1], v[..., 2]
        wz = _central_diff(vx, 1) - _central_diff(vy, 2)
        wy = _central_diff(vz, 2) - _central_diff(vx, 0)
        wx = _central_diff(vy, 0) - _central_diff(vz, 1)
        # f = N x omega is orthogonal to omega pointwise
        dot = (f[..., 0] * wz + f[..., 1] * wy + f[..., 2] * wx)
        wmag = jnp.sqrt(wz**2 + wy**2 + wx**2)
        fmag = jnp.sqrt((f ** 2).sum(-1))
        rel = np.abs(np.asarray(dot)) / (np.asarray(wmag * fmag) + 1e-6)
        assert rel.max() < 1e-4


class TestResumableSequence:
    def test_budgeted_resume_bit_matches_one_shot(self, tmp_path):
        # smoke_sequence_cached with budget 0 finishes one chunk per
        # invocation; chained invocations must reproduce the one-shot
        # result bit-for-bit (the carry state round-trips through the
        # .part file exactly)
        from nfs_tpu.sim.smoke import smoke_sequence_cached

        cfg = SmokeConfig(shape=(12, 10, 12),
                          source_center=(0.5, 0.85, 0.5), jacobi_iters=6,
                          max_disp=2.0)
        ref_d, ref_v = smoke_sequence(cfg, 10, warmup=4, chunk=4)

        path = str(tmp_path / "seq.npz")
        n = 1
        while not smoke_sequence_cached(cfg, 10, path, warmup=4, chunk=4,
                                        budget_s=0):
            n += 1
            assert n < 10, "resume loop did not terminate"
        assert n > 1, "budget 0 should need several invocations"
        with np.load(path) as z:
            assert np.array_equal(ref_d, z["d"])
            assert np.array_equal(ref_v, z["v"])
        # idempotent once complete
        assert smoke_sequence_cached(cfg, 10, path, warmup=4, chunk=4)
