"""Tests for observability utils + debug modes (SURVEY.md §5: metrics as
first-class outputs; jax_debug_nans as the CI-level sanitizer)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfs_tpu.utils import MetricsLogger, IterationTimer, timed, trace


class TestMetrics:
    def test_log_and_read(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        m = MetricsLogger(path, tag="t1")
        m.log(frame=0, loss=0.5)
        m.log(frame=1, loss=0.25, iters_per_sec=80.0)
        recs = m.read()
        assert len(recs) == 2
        assert recs[0]["tag"] == "t1"
        assert recs[1]["iters_per_sec"] == 80.0
        assert all("t" in r for r in recs)

    def test_read_missing(self, tmp_path):
        m = MetricsLogger(str(tmp_path / "none.jsonl"))
        assert m.read() == []


class TestProfiling:
    def test_iteration_timer(self):
        t = IterationTimer()
        for _ in range(3):
            with t:
                jnp.sum(jnp.ones((64, 64))).block_until_ready()
        assert len(t.times_ms) == 3
        assert t.mean_ms > 0.0
        assert t.last_ms > 0.0

    def test_timed(self):
        f = jax.jit(lambda x: x * 2 + 1)
        x = jnp.ones((128, 128))
        ms, out = timed(f, x, n=3)
        assert ms >= 0.0
        np.testing.assert_allclose(np.asarray(out), 3.0)

    def test_trace_noop_safe(self, tmp_path):
        # must not raise even if the backend can't profile
        with trace(str(tmp_path / "trace")):
            jnp.sum(jnp.ones(8)).block_until_ready()


class TestDebugNans:
    def test_styler_step_clean_under_debug_nans(self):
        """SURVEY.md §5: jax_debug_nans mode as the numerical sanitizer —
        one styler loss+grad step must be NaN-free under it."""
        from nfs_tpu.core.config import StyleConfig, replace
        from nfs_tpu.styler import GridStyler

        cfg = replace(StyleConfig(), **{
            "render.render_size": (64, 64),
            "loss.style_layers": ("relu1_1",),
            "loss.style_layer_weights": (1.0,),
            "optim.octave_n": 1, "optim.iters": 2,
        })
        style = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3)))
        styler = GridStyler(cfg, style_image=style)
        d = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (24, 16)))
        jax.config.update("jax_debug_nans", True)
        try:
            d_star, _, info = styler.stylize_frame(d)
            assert np.isfinite(np.asarray(d_star)).all()
        finally:
            jax.config.update("jax_debug_nans", False)
