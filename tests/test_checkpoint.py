"""Checkpoint/resume tests (SURVEY.md §5: {opt-field, Adam state, octave,
key} every N iterations; crash-resume; sequence manifest)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from nfs_tpu.io.checkpoint import (
    SequenceManifest, load_checkpoint, save_checkpoint,
)
from nfs_tpu.core.config import StyleConfig, replace
from nfs_tpu.styler import GridStyler


class TestCheckpointIO:
    def test_roundtrip_nested_tree(self, tmp_path):
        tree = {
            "param": jnp.arange(12.0).reshape(3, 4),
            "opt": optax.adam(0.1).init(jnp.zeros((3, 4))),
        }
        path = str(tmp_path / "ck.npz")
        save_checkpoint(path, tree, meta={"octave": 2, "iters_done": 7})
        like = {
            "param": jnp.zeros((3, 4)),
            "opt": optax.adam(0.1).init(jnp.zeros((3, 4))),
        }
        out, meta = load_checkpoint(path, like)
        np.testing.assert_array_equal(np.asarray(out["param"]),
                                      np.asarray(tree["param"]))
        assert meta == {"octave": 2, "iters_done": 7}
        # adam state structure preserved
        assert jax.tree_util.tree_structure(out["opt"]) == \
            jax.tree_util.tree_structure(like["opt"])

    def test_missing_leaf_raises(self, tmp_path):
        path = str(tmp_path / "ck.npz")
        save_checkpoint(path, {"a": jnp.zeros(3)})
        with pytest.raises(KeyError):
            load_checkpoint(path, {"a": jnp.zeros(3), "b": jnp.zeros(2)})

    def test_atomic_overwrite(self, tmp_path):
        path = str(tmp_path / "ck.npz")
        save_checkpoint(path, {"a": jnp.zeros(3)})
        save_checkpoint(path, {"a": jnp.ones(3)})
        out, _ = load_checkpoint(path, {"a": jnp.zeros(3)})
        np.testing.assert_array_equal(np.asarray(out["a"]), 1.0)


class TestManifest:
    def test_mark_and_resume(self, tmp_path):
        mpath = str(tmp_path / "manifest.json")
        out = str(tmp_path / "d_0003.npz")
        m = SequenceManifest(mpath)
        assert not m.done(3)
        np.savez(out, d=np.zeros(3))
        m.mark(3, out)
        # reload from disk
        m2 = SequenceManifest(mpath)
        assert m2.done(3)
        assert not m2.done(4)

    def test_done_requires_file(self, tmp_path):
        m = SequenceManifest(str(tmp_path / "m.json"))
        m.mark(1, str(tmp_path / "never_written.npz"))
        assert not m.done(1)


class TestStylerResume:
    def _cfg(self):
        return replace(StyleConfig(), **{
            "render.render_size": (64, 64),
            "loss.style_layers": ("relu1_1", "relu2_1"),
            "loss.style_layer_weights": (1.0, 1.0),
            "optim.octave_n": 2,
            "optim.octave_scale": 2.0,
            "optim.iters": 6,
            "optim.log_every": 2,
        })

    def test_crash_resume_completes(self, tmp_path):
        style = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3)))
        styler = GridStyler(self._cfg(), style_image=style)
        d = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(1), (32, 24)))
        ck = str(tmp_path / "frame.ckpt.npz")

        class Crash(Exception):
            pass

        calls = {"n": 0}

        def crashing_callback(done, loss, octave):
            calls["n"] += 1
            if calls["n"] == 4:  # mid-octave-1 (after checkpointing)
                raise Crash()

        with pytest.raises(Crash):
            styler.stylize_frame(d, callback=crashing_callback,
                                 checkpoint_path=ck)
        assert os.path.exists(ck)  # crash left a checkpoint behind

        # resume: observe which octaves/steps run
        seen = []

        def spy(done, loss, octave):
            seen.append((octave, done))

        d_star, param, info = styler.stylize_frame(
            d, callback=spy, checkpoint_path=ck)
        assert not os.path.exists(ck)  # cleaned up on success
        assert d_star.shape == d.shape
        # first run did octave0 (3 chunks) + 1 chunk of octave1; the resume
        # must NOT redo octave 0
        assert all(o >= 1 for o, _ in seen)
        # and must finish octave 1 from iteration 2 on
        assert (1, 6) in seen
        assert (1, 2) not in seen

    def test_resume_refuses_changed_preconditions(self, tmp_path):
        """Bit-exact resume requires unchanged log_every/iters/octave
        ladder; a mismatch must be a loud error, not silent divergence
        (VERDICT r2 weak #6)."""
        style = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3)))
        styler = GridStyler(self._cfg(), style_image=style)
        d = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(1), (32, 24)))
        ck = str(tmp_path / "frame.ckpt.npz")

        class Crash(Exception):
            pass

        def crashing_callback(done, loss, octave):
            if done >= 4:
                raise Crash()

        with pytest.raises(Crash):
            styler.stylize_frame(d, callback=crashing_callback,
                                 checkpoint_path=ck)
        assert os.path.exists(ck)

        for key, val in [("optim.log_every", 3), ("optim.iters", 9),
                         ("optim.octave_n", 3)]:
            changed = GridStyler(replace(self._cfg(), **{key: val}),
                                 style_image=style)
            with pytest.raises(ValueError, match="bit-match"):
                changed.stylize_frame(d, checkpoint_path=ck)
        # unchanged config still resumes fine
        d_star, _, _ = styler.stylize_frame(d, checkpoint_path=ck)
        assert d_star.shape == d.shape

    def test_checkpoint_unused_when_absent(self, tmp_path):
        style = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3)))
        styler = GridStyler(self._cfg(), style_image=style)
        d = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(1), (32, 24)))
        ck = str(tmp_path / "none.ckpt.npz")
        d_star, _, _ = styler.stylize_frame(d, checkpoint_path=ck)
        assert d_star.shape == d.shape
        assert not os.path.exists(ck)
