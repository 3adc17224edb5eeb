"""Test harness config: force an 8-device virtual CPU backend so
sharding/collective tests run without real TPU hardware (SURVEY.md §4
"multi-device without a cluster").

Gotcha (this container): /root/.axon_site/sitecustomize.py imports jax and
registers the axon TPU PJRT plugin at interpreter startup with
JAX_PLATFORMS=axon already in the env — so setting env vars here is too
late for the import but NOT too late for backend selection: backends
initialize lazily at first use, so jax.config.update + XLA_FLAGS still
take effect as long as no jax computation ran yet.
"""

import os

# Must be set before the CPU backend is *initialized* (lazy), even though
# jax is already imported by sitecustomize.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) >= 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()} — backend was "
    "initialized before conftest could override it")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _hang_guard():
    """Per-test wall-clock guard: no single test may wedge the suite
    (pytest-timeout isn't installed; a round-2 serve bug once hung
    `pytest tests/` for >40 min). 1800 s is far above any legitimate
    test even on a contended 1-core host."""
    import signal

    def _alarm(signum, frame):
        raise TimeoutError("test exceeded the 1800 s suite hang guard")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(1800)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
