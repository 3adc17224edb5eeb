"""CLI-level kill-and-resume tests (VERDICT r1 next-round #7): an
interrupted `nfs_tpu.cli.stylize` run must resume and produce BIT-
IDENTICAL outputs to an uninterrupted run — frame-granular (manifest +
warm-param resume) and in-frame (mid-octave checkpoint resume after a
SIGKILL).

Runs the CLI in subprocesses (own CPU backend); tiny 2D configs.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_data(data_dir, T=3, shape=(24, 16)):
    os.makedirs(data_dir, exist_ok=True)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    d0 = np.exp(-4 * sum(x ** 2 for x in g)).astype(np.float32)
    for t in range(T):
        np.savez(os.path.join(data_dir, f"d_{t:04d}.npz"),
                 d=(d0 * (1 + 0.1 * t)).astype(np.float32))
        v = np.zeros(shape + (2,), np.float32)
        v[..., 1] = 0.4
        np.savez(os.path.join(data_dir, f"v_{t:04d}.npz"), v=v)


def _cli_args(data_dir, log_dir, tag, num_frames, extra=()):
    return [sys.executable, "-m", "nfs_tpu.cli.stylize",
            "--tag", tag, "--data_dir", data_dir, "--log_dir", log_dir,
            "--num_frames", str(num_frames), "--window", "1",
            "--octave_n", "2", "--iter", "4", "--n_views", "2",
            "--render_size", "48", "48",
            "--style_layer", "relu1_1,relu2_1", "--seed", "5",
            *extra]


def _env():
    env = dict(os.environ)
    # NFS_TPU_PLATFORM is honored by the CLI via jax.config BEFORE any
    # backend probe — a plain JAX_PLATFORMS=cpu env var is NOT enough in
    # environments whose site hook force-selects a remote TPU platform
    # (this test once hammered + wedged the real TPU through exactly
    # that: the killed subprocess was a live TPU client)
    env["NFS_TPU_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    # drop conftest's 8-virtual-device XLA_FLAGS: the CLI subprocesses
    # need one CPU device (8 fake devices split the thread pool and make
    # each run ~5x slower, tripping the subprocess timeout)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run(args, **kw):
    return subprocess.run(args, cwd=REPO, env=_env(), capture_output=True,
                          text=True, timeout=420, **kw)


def _load(log_dir, tag, t):
    with np.load(os.path.join(log_dir, tag, f"d_{t:04d}.npz")) as z:
        return np.asarray(z["d"])


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_resume")
    data = str(root / "data")
    _make_data(data)
    # reference: one uninterrupted 3-frame run
    r = _run(_cli_args(data, str(root / "log"), "ref", 3))
    assert r.returncode == 0, r.stderr[-2000:]
    return root, data


class TestFrameGranularResume:
    def test_split_run_bit_matches_uninterrupted(self, workspace):
        root, data = workspace
        log = str(root / "log")
        # "crash" after frame 1: emulate by running 2 frames, then
        # re-invoking for all 3 — the manifest skips the done prefix and
        # the warm-param chain + absolute-indexed PRNG keys continue
        r1 = _run(_cli_args(data, log, "split", 2))
        assert r1.returncode == 0, r1.stderr[-2000:]
        r2 = _run(_cli_args(data, log, "split", 3))
        assert r2.returncode == 0, r2.stderr[-2000:]
        for t in range(3):
            ref = _load(log, "ref", t)
            got = _load(log, "split", t)
            assert np.array_equal(ref, got), (
                f"frame {t}: resumed run diverged "
                f"(max|d|={np.abs(ref - got).max():.2e})")


class TestInFrameResume:
    def test_sigkill_mid_frame_resumes_bit_exact(self, workspace):
        root, data = workspace
        log = str(root / "log")
        tag = "killed"
        args = _cli_args(data, log, tag, 3, extra=("--checkpoint_in_frame",))
        ckpt = os.path.join(log, tag, "inframe_ckpt.npz")

        proc = subprocess.Popen(args, cwd=REPO, env=_env(),
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        try:
            # kill as soon as the first in-frame checkpoint exists
            deadline = time.time() + 360
            while time.time() < deadline:
                if os.path.exists(ckpt):
                    break
                if proc.poll() is not None:
                    pytest.fail("CLI finished before a checkpoint "
                                "appeared — config too small for the test")
                time.sleep(0.2)
            else:
                pytest.fail("no in-frame checkpoint appeared")
            time.sleep(0.3)  # land inside the frame, mid-octave
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=30)
        finally:
            if proc.poll() is None:
                proc.kill()

        assert os.path.exists(ckpt), "checkpoint vanished with the kill"
        r = _run(args)
        assert r.returncode == 0, r.stderr[-2000:]
        assert not os.path.exists(ckpt), "checkpoint not cleaned up"
        for t in range(3):
            ref = _load(log, "ref", t)
            got = _load(log, tag, t)
            assert np.array_equal(ref, got), (
                f"frame {t}: killed+resumed run diverged "
                f"(max|d|={np.abs(ref - got).max():.2e})")
