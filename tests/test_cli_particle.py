"""Particle-mode CLI end-to-end tests (subprocess, own CPU backend):
sequential keyframe flow and the --parallel keyframe-DP engine."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_particles(data_dir, T=3, n=250, shape=(20, 20)):
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    x0 = rng.random((n, 2)) * (np.asarray(shape) - 4.0) + 2.0
    drift = rng.normal(size=(n, 2)) * 0.2
    for t in range(T):
        np.savez(os.path.join(data_dir, f"p_{t:04d}.npz"),
                 x=(x0 + t * drift).astype(np.float32),
                 dens=np.ones((n,), np.float32))


def _style_png(path):
    from nfs_tpu.io.image import save_image
    rng = np.random.default_rng(1)
    save_image(path, rng.random((32, 32, 3)).astype(np.float32))


def _env(n_devices=1):
    env = dict(os.environ)
    env["NFS_TPU_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    if n_devices > 1:
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_devices}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _args(data, log, tag, extra=()):
    return [sys.executable, "-m", "nfs_tpu.cli.stylize",
            "--tag", tag, "--data_dir", data, "--log_dir", log,
            "--mode", "particle", "--num_frames", "3",
            "--keyframe_stride", "2", "--grid_shape", "20", "20",
            "--octave_n", "1", "--iter", "2", "--render_size", "32", "32",
            "--style_layer", "relu1_1", "--seed", "3",
            "--style_target", os.path.join(data, "style.png"), *extra]


@pytest.fixture(scope="module")
def pdata(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_particle")
    data = str(root / "data")
    _make_particles(data)
    _style_png(os.path.join(data, "style.png"))
    return root, data


def _check_outputs(log, tag):
    for t in range(3):
        path = os.path.join(log, tag, f"p_{t:04d}.npz")
        assert os.path.exists(path), f"missing {path}"
        with np.load(path) as z:
            assert np.isfinite(z["x"]).all()
            assert np.isfinite(z["dens"]).all()


def test_cli_particle_sequential(pdata):
    root, data = pdata
    log = str(root / "log_seq")
    r = subprocess.run(_args(data, log, "seq"), cwd=REPO, env=_env(),
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    _check_outputs(log, "seq")


def test_cli_particle_parallel(pdata):
    root, data = pdata
    log = str(root / "log_par")
    r = subprocess.run(_args(data, log, "par", extra=("--parallel",)),
                       cwd=REPO, env=_env(n_devices=2),
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    _check_outputs(log, "par")
