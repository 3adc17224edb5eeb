"""bench/stages.py stage-breakdown self-consistency (VERDICT r3 weak #2:
BENCH_r03 shipped negative per-stage milliseconds). The breakdown must be
non-negative and monotone — render <= loss_fwd <= loss_grad <= full_step —
with derived sub-stages non-negative by construction."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "bench"))

from stages import scanned_marginal_ms, stage_breakdown  # noqa: E402

from nfs_tpu.core.config import StyleConfig, replace  # noqa: E402


@pytest.fixture(scope="module")
def tiny_styler():
    import jax
    from nfs_tpu.styler.grid import GridStyler

    cfg = replace(StyleConfig(), **{
        "render.render_size": (32, 32),
        "render.n_views": 2,
        "render.view_pool": 4,
        "render.transmit": 0.01,
        "loss.style_layers": ("relu1_1",),
        "loss.style_layer_weights": (1.0,),
        "optim.octave_n": 1,
        "optim.iters": 2,
    })
    style = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                          (32, 32, 3)))
    return GridStyler(cfg, style_image=style)


def test_stage_breakdown_monotone_nonnegative(tiny_styler):
    shape = (12, 8, 12)
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    d = np.exp(-4 * sum(x ** 2 for x in g)).astype(np.float32)
    out = stage_breakdown(tiny_styler, d, n=2)
    order = ("render_ms", "loss_fwd_ms", "loss_grad_ms", "full_step_ms")
    vals = [out[k] for k in order]
    assert all(v >= 0.0 for v in vals), out
    assert vals == sorted(vals), out           # monotone after clamping
    for k in ("vgg_fwd_ms", "backward_ms", "adam_apply_ms"):
        assert out[k] >= 0.0, out
    assert isinstance(out["consistent"], bool)
    if not out["consistent"]:
        # clamped stages are surfaced, raw values preserved for debugging
        assert out["monotonic_clamped"]
        assert set(out["raw_ms"]) == set(order)


def test_scanned_marginal_nonnegative():
    import jax
    import jax.numpy as jnp

    x0 = jnp.ones((64, 64), jnp.float32)
    fn = jax.jit(lambda x: x @ x.T)
    ms = scanned_marginal_ms(fn, x0, n=3, repeats=2)
    assert ms >= 0.0
