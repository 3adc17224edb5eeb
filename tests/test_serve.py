"""Stylization service tests (nfs_tpu/cli/serve.py): spool protocol,
styler caching across jobs, error isolation."""

import json
import os

import numpy as np
import pytest

from nfs_tpu.cli.serve import StylizeWorker, serve, submit_job


def _make_data(data_dir, T=2, shape=(16, 12)):
    os.makedirs(data_dir, exist_ok=True)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    d0 = np.exp(-4 * sum(x ** 2 for x in g)).astype(np.float32)
    for t in range(T):
        np.savez(os.path.join(data_dir, f"d_{t:04d}.npz"),
                 d=d0 * (1 + 0.1 * t))


def _style_png(path):
    from nfs_tpu.io.image import save_image
    rng = np.random.default_rng(0)
    save_image(path, rng.random((32, 32, 3)).astype(np.float32))


def _job(data_dir, out_dir, style, frames=(0,)):
    return {
        "mode": "grid",
        "data_dir": data_dir,
        "out_dir": out_dir,
        "frames": list(frames),
        "style_target": style,
        "config": {
            "render.render_size": (32, 32),
            "render.n_views": 2,
            "optim.octave_n": 1,
            "optim.iters": 2,
        },
    }


class TestServe:
    def test_jobs_run_and_styler_cached(self, tmp_path):
        data = str(tmp_path / "data")
        spool = str(tmp_path / "spool")
        style = str(tmp_path / "style.png")
        _make_data(data)
        _style_png(style)

        submit_job(spool, _job(data, str(tmp_path / "out1"), style,
                               frames=(0,)), name="a")
        submit_job(spool, _job(data, str(tmp_path / "out2"), style,
                               frames=(1,)), name="b")
        stats = serve(spool, poll_s=0.01, max_jobs=2)
        assert stats["jobs"] == 2
        assert stats["frames"] == 2
        # second job reused the first job's compiled styler
        assert stats["styler_cache_hits"] == 1
        for name, out in [("a", "out1"), ("b", "out2")]:
            with open(os.path.join(spool, "done", f"{name}.json")) as f:
                res = json.load(f)
            assert res["status"] == "ok", res
            t = res["job"]["frames"][0]
            path = os.path.join(str(tmp_path / out), f"d_{t:04d}.npz")
            assert os.path.exists(path)
            with np.load(path) as z:
                assert np.isfinite(z["d"]).all()
        # spool drained
        assert os.listdir(os.path.join(spool, "inbox")) == []
        assert os.listdir(os.path.join(spool, "work")) == []

    def test_bad_job_isolated(self, tmp_path):
        data = str(tmp_path / "data")
        spool = str(tmp_path / "spool")
        style = str(tmp_path / "style.png")
        _make_data(data)
        _style_png(style)
        submit_job(spool, _job("/nonexistent", str(tmp_path / "o"), style),
                   name="bad")
        submit_job(spool, _job(data, str(tmp_path / "o"), style),
                   name="good")
        # max_jobs counts PROCESSED jobs (errors included) so a stream of
        # failing jobs can't spin the worker forever (r2 regression: the
        # worker only counted successes and polled indefinitely)
        stats = serve(spool, poll_s=0.01, max_jobs=2)
        with open(os.path.join(spool, "done", "bad.json")) as f:
            assert json.load(f)["status"] == "error"
        with open(os.path.join(spool, "done", "good.json")) as f:
            assert json.load(f)["status"] == "ok"
        assert stats["jobs"] == 1
        assert stats["errors"] == 1

    def test_failing_jobs_still_terminate(self, tmp_path):
        # two bad jobs, max_jobs=2: must return (not hang) with 2 errors
        spool = str(tmp_path / "spool")
        style = str(tmp_path / "style.png")
        _style_png(style)
        for name in ("x", "y"):
            submit_job(spool, _job("/nonexistent", str(tmp_path / "o"),
                                   style), name=name)
        stats = serve(spool, poll_s=0.01, max_jobs=2)
        assert stats["jobs"] == 0
        assert stats["errors"] == 2

    def test_transfer_fn_job(self, tmp_path):
        # colored-smoke job: the transfer_fn config flows through the
        # spool protocol into the styler's colored render path
        data = str(tmp_path / "data")
        spool = str(tmp_path / "spool")
        style = str(tmp_path / "style.png")
        _make_data(data)
        _style_png(style)
        job = _job(data, str(tmp_path / "outc"), style, frames=(0,))
        job["config"]["render.transfer_fn"] = "fire"
        job["config"]["render.tf_max_density"] = 1.5
        submit_job(spool, job, name="color")
        stats = serve(spool, poll_s=0.01, max_jobs=1)
        assert stats["jobs"] == 1
        with open(os.path.join(spool, "done", "color.json")) as f:
            assert json.load(f)["status"] == "ok"
        path = os.path.join(str(tmp_path / "outc"), "d_0000.npz")
        with np.load(path) as z:
            assert np.isfinite(z["d"]).all()

    def test_parallel_grid_job(self, tmp_path):
        # "parallel": true shards the job over the device mesh (8
        # virtual CPU devices under conftest); 3D data exercises the
        # real multi-view engine path
        data = str(tmp_path / "data")
        spool = str(tmp_path / "spool")
        style = str(tmp_path / "style.png")
        os.makedirs(data)
        shape = (12, 8, 12)
        g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape],
                        indexing="ij")
        d0 = np.exp(-4 * sum(x ** 2 for x in g)).astype(np.float32)
        for t in range(2):
            np.savez(os.path.join(data, f"d_{t:04d}.npz"),
                     d=d0 * (1 + 0.1 * t))
        _style_png(style)
        job = _job(data, str(tmp_path / "outp"), style, frames=(0, 1))
        job["parallel"] = True
        job["config"]["render.n_views"] = 2
        submit_job(spool, job, name="par")
        stats = serve(spool, poll_s=0.01, max_jobs=1)
        assert stats["jobs"] == 1, stats
        with open(os.path.join(spool, "done", "par.json")) as f:
            res = json.load(f)
        assert res["status"] == "ok", res
        for t in (0, 1):
            path = os.path.join(str(tmp_path / "outp"), f"d_{t:04d}.npz")
            with np.load(path) as z:
                d = z["d"]
                assert d.shape == shape
                assert np.isfinite(d).all()
        # heartbeat file written and reports final stats
        hb = [f for f in os.listdir(spool) if f.startswith("worker_")]
        assert hb, os.listdir(spool)
        with open(os.path.join(spool, hb[0])) as f:
            beat = json.load(f)
        assert beat["status"] == "stopped"
        assert beat["stats"]["jobs"] == 1

    def test_json_list_config_values_hashable(self, tmp_path):
        # JSON has no tuples: list-valued overrides (render_size, layer
        # lists) must be normalized to tuples so the frozen config stays
        # hashable for the styler cache (r2 regression: TypeError)
        from nfs_tpu.cli.serve import _config_from_job
        job = _job("/d", "/o", None)
        job["config"] = {
            "render.render_size": [32, 32],
            "loss.style_layers": ["relu1_1", "relu2_1"],
            "loss.style_layer_weights": [1.0, 0.5],
            "optim.iters": 2,
        }
        cfg = _config_from_job(job)
        assert cfg.render.render_size == (32, 32)
        assert cfg.loss.style_layers == ("relu1_1", "relu2_1")
        hash(cfg)  # must not raise

    def test_second_job_on_same_sequence_skips_reupload(
            self, tmp_path, monkeypatch):
        # device-resident frame streaming BETWEEN jobs (ROADMAP #7 /
        # VERDICT r4 next #8): two queued jobs over the same frame files
        # must upload the sequence ONCE — on a remote TPU each upload
        # costs ~0.5-1 s fixed tunnel latency, so a style sweep over one
        # sim would otherwise re-pay it per job
        import nfs_tpu.io.npz as npz_mod
        data = str(tmp_path / "data")
        spool = str(tmp_path / "spool")
        style = str(tmp_path / "style.png")
        _make_data(data, T=2)
        _style_png(style)
        loads = {"n": 0}
        orig = npz_mod.FrameStore.load_density

        def counting(self, t):
            loads["n"] += 1
            return orig(self, t)

        monkeypatch.setattr(npz_mod.FrameStore, "load_density", counting)
        # two jobs, same sequence, different style iters -> different
        # styler, SAME device-resident input
        j1 = _job(data, str(tmp_path / "o1"), style, frames=(0, 1))
        j2 = _job(data, str(tmp_path / "o2"), style, frames=(0, 1))
        j2["config"]["optim.iters"] = 3
        submit_job(spool, j1, name="a")
        submit_job(spool, j2, name="b")
        stats = serve(spool, poll_s=0.01, max_jobs=2)
        assert stats["jobs"] == 2
        assert loads["n"] == 2  # frames read from disk once (2 frames)
        assert stats["frame_cache_hits"] == 1
        assert stats["frame_cache_misses"] == 1
        assert stats["upload_s_saved_est"] > 0
        for name, out in [("a", "o1"), ("b", "o2")]:
            with open(os.path.join(spool, "done", f"{name}.json")) as f:
                assert json.load(f)["status"] == "ok"

    def test_frame_cache_invalidates_on_file_change(self, tmp_path):
        # an overwritten frame file must re-upload (cache keys on
        # path+mtime+size, not path alone)
        data = str(tmp_path / "data")
        style = str(tmp_path / "style.png")
        _make_data(data, T=1)
        _style_png(style)
        worker = StylizeWorker()
        job = _job(data, str(tmp_path / "o"), style, frames=(0,))
        worker.run_job(job)
        # rewrite frame 0 with different content + bump mtime
        p = os.path.join(data, "d_0000.npz")
        np.savez(p, d=np.full((16, 12), 0.5, np.float32))
        os.utime(p, (os.path.getmtime(p) + 5, os.path.getmtime(p) + 5))
        worker.run_job(job)
        assert worker.stats["frame_cache_hits"] == 0
        assert worker.stats["frame_cache_misses"] == 2

    def test_frame_cache_lru_eviction(self, tmp_path):
        # byte budget respected: inserting past the budget evicts the
        # least-recently-used sequence
        data = str(tmp_path / "data")
        style = str(tmp_path / "style.png")
        _make_data(data, T=2)
        _style_png(style)
        worker = StylizeWorker()
        worker.cache_bytes = 16 * 12 * 4 + 8  # one 16x12 f32 frame + eps
        j0 = _job(data, str(tmp_path / "o0"), style, frames=(0,))
        j1 = _job(data, str(tmp_path / "o1"), style, frames=(1,))
        worker.run_job(j0)
        worker.run_job(j1)  # evicts frame 0's entry
        assert len(worker._frame_cache) == 1
        worker.run_job(j0)  # miss again
        assert worker.stats["frame_cache_misses"] == 3
        assert worker.stats["frame_cache_hits"] == 0
        assert worker._frame_cache_bytes <= worker.cache_bytes

    def test_stop_marker(self, tmp_path):
        spool = str(tmp_path / "spool")
        os.makedirs(spool, exist_ok=True)
        open(os.path.join(spool, "stop"), "w").close()
        stats = serve(spool, poll_s=0.01)
        assert stats["jobs"] == 0
