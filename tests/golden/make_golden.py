"""Golden-output generator (committed seeds, CPU backend — the test
conftest forces CPU, so goldens are platform-stable for the suite).

    python tests/golden/make_golden.py

Regenerating goldens is a CONSCIOUS act: do it only when an intentional
pipeline change shifts results, and eyeball docs/demo renders first.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def _setup():
    import jax
    jax.config.update("jax_platforms", "cpu")


def _deps():
    import jax
    from nfs_tpu.core.config import StyleConfig, replace
    from nfs_tpu.styler.grid import GridStyler
    return jax, StyleConfig, replace, GridStyler


def _blob(shape):
    g = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    return np.exp(-4 * sum(x ** 2 for x in g)).astype(np.float32)


def golden_2d():
    jax, StyleConfig, replace, GridStyler = _deps()
    cfg = replace(StyleConfig(), **{
        "render.render_size": (64, 64), "render.n_views": 2,
        "optim.octave_n": 2, "optim.iters": 8, "optim.lr": 0.02})
    style = np.asarray(jax.random.uniform(jax.random.PRNGKey(7),
                                          (64, 64, 3)), np.float32)
    styler = GridStyler(cfg, style_image=style)
    d_star, _, _ = styler.stylize_frame(_blob((32, 24)),
                                        key=jax.random.PRNGKey(3))
    return np.asarray(d_star)


def golden_3d():
    jax, StyleConfig, replace, GridStyler = _deps()
    cfg = replace(StyleConfig(), **{
        "render.render_size": (64, 64), "render.n_views": 2,
        "render.transmit": 0.05, "optim.octave_n": 2, "optim.iters": 6,
        "optim.lr": 0.02})
    style = np.asarray(jax.random.uniform(jax.random.PRNGKey(7),
                                          (64, 64, 3)), np.float32)
    styler = GridStyler(cfg, style_image=style)
    d_star, _, _ = styler.stylize_frame(_blob((20, 16, 20)),
                                        key=jax.random.PRNGKey(3))
    return np.asarray(d_star)


if __name__ == "__main__":
    _setup()
    here = os.path.dirname(os.path.abspath(__file__))
    for name, fn in [("golden_2d", golden_2d), ("golden_3d", golden_3d)]:
        arr = fn()
        np.savez_compressed(os.path.join(here, f"{name}.npz"), arr=arr)
        print(f"{name}: shape={arr.shape} mean={arr.mean():.6f} "
              f"std={arr.std():.6f}")
