"""Sequence block-streaming tests (nfs_tpu/io/stream.py +
GridStyler.stylize_sequence_blocks): chunk-dir round trip, halo-context
correctness at sequence and chunk boundaries, and agreement of the
block-streamed stylizer with the in-memory streaming path.
"""

import json
import os

import numpy as np
import jax
import pytest

from nfs_tpu.core.config import StyleConfig, replace
from nfs_tpu.io.stream import (
    finalize_sequence_dir,
    iter_sequence_blocks,
    load_sequence_cache,
    sequence_cache_complete,
)
from nfs_tpu.styler.grid import GridStyler


def _write_chunks(d, T, shape, chunk):
    rng = np.random.default_rng(0)
    ds = rng.random((T,) + shape).astype(np.float32)
    vs = rng.standard_normal((T,) + shape + (3,)).astype(np.float32)
    os.makedirs(d, exist_ok=True)
    for t0 in range(0, T, chunk):
        np.savez(os.path.join(d, f"chunk_{t0:05d}.npz"),
                 d=ds[t0:t0 + chunk], v=vs[t0:t0 + chunk])
    finalize_sequence_dir(d, T, chunk)
    return ds, vs


class TestStreamIO:
    def test_roundtrip_and_completeness(self, tmp_path):
        d = str(tmp_path / "seq")
        assert not sequence_cache_complete(d)
        ds, vs = _write_chunks(d, T=11, shape=(6, 4, 6), chunk=4)
        assert sequence_cache_complete(d)
        gd, gv = load_sequence_cache(d)
        assert np.array_equal(gd, ds) and np.array_equal(gv, vs)

    @pytest.mark.parametrize("halo", [1, 2])
    def test_block_contexts_match_clamped_windows(self, tmp_path, halo):
        d = str(tmp_path / "seq")
        T, chunk = 11, 4
        ds, vs = _write_chunks(d, T=T, shape=(6, 4, 6), chunk=chunk)
        P = max(halo, 1)
        seen = 0
        for t0, db, ctx in iter_sequence_blocks(d, halo):
            B = db.shape[0]
            assert np.array_equal(db, ds[t0:t0 + B])
            assert ctx.shape[0] == B + 2 * P
            # ctx[k] must equal vs[clip(t0 - P + k, 0, T-1)]
            for k in range(B + 2 * P):
                g = min(max(t0 - P + k, 0), T - 1)
                assert np.array_equal(ctx[k], vs[g]), (t0, k, g)
            seen += B
        assert seen == T

    @pytest.mark.parametrize("halo,chunk", [(3, 2), (5, 2), (4, 1)])
    def test_deep_halo_spans_multiple_chunks(self, tmp_path, halo, chunk):
        """halo > chunk size: the halo must contain the TRUE frames from
        chunks further over, not nearest-frame replicas (ADVICE r2)."""
        d = str(tmp_path / "seq")
        T = 11
        ds, vs = _write_chunks(d, T=T, shape=(4, 4), chunk=chunk)
        P = max(halo, 1)
        seen = 0
        for t0, db, ctx in iter_sequence_blocks(d, halo):
            B = db.shape[0]
            assert ctx.shape[0] == B + 2 * P
            for k in range(B + 2 * P):
                g = min(max(t0 - P + k, 0), T - 1)
                assert np.array_equal(ctx[k], vs[g]), (t0, k, g)
            seen += B
        assert seen == T

    def test_n_frames_truncation(self, tmp_path):
        d = str(tmp_path / "seq")
        ds, vs = _write_chunks(d, T=11, shape=(6, 4, 6), chunk=4)
        got = sum(b.shape[0]
                  for _, b, _ in iter_sequence_blocks(d, 1, n_frames=6))
        assert got == 6


class TestBlockStreamedStyler:
    def test_agrees_with_streaming_path(self, tmp_path):
        cfg = replace(StyleConfig(), **{
            "render.render_size": (48, 48), "render.n_views": 2,
            "optim.octave_n": 2, "optim.iters": 3, "optim.window": 1})
        style = np.random.default_rng(1).random((48, 48, 3)).astype(
            np.float32)
        T, shape, chunk = 7, (16, 12, 16), 3
        g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape],
                        indexing="ij")
        d0 = np.exp(-4 * sum(x ** 2 for x in g)).astype(np.float32)
        ds = np.stack([d0 * (1 + 0.1 * t) for t in range(T)])
        vs = np.full((T,) + shape + (3,), 0.25, np.float32)

        cdir = str(tmp_path / "seq")
        os.makedirs(cdir)
        for t0 in range(0, T, chunk):
            np.savez(os.path.join(cdir, f"chunk_{t0:05d}.npz"),
                     d=ds[t0:t0 + chunk], v=vs[t0:t0 + chunk])
        finalize_sequence_dir(cdir, T, chunk)

        ref = [np.asarray(x) for _, x, _ in
               GridStyler(cfg, style_image=style).stylize_sequence(ds, vs)]

        st = GridStyler(cfg, style_image=style)
        out = list(st.stylize_sequence_blocks(
            iter_sequence_blocks(cdir, cfg.optim.window), fused=2))
        assert [t for t, _, _ in out] == list(range(T))
        # carry param surfaces at each block end
        ends = [i for i, (_, _, p) in enumerate(out) if p is not None]
        assert ends == [2, 5, 6]
        for t, d_star, _ in out:
            r, b = ref[t], np.asarray(d_star)
            scale = np.abs(r - ds[t]).mean() + 1e-9
            assert np.abs(r - b).mean() < 0.5 * scale, t
