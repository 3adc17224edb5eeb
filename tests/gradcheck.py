"""Finite-difference gradient checking (jax.test_util.check_grads was
removed from public jax in 0.9)."""

import jax
import jax.numpy as jnp
import numpy as np


def check_grad(fn, x, eps=1e-3, atol=1e-2, rtol=1e-2, n_probe=16, seed=0):
    """Compare reverse-mode grad of scalar fn against central differences
    along `n_probe` random coordinates of x."""
    g = jax.grad(fn)(x)
    g = np.asarray(g, dtype=np.float64)
    x_np = np.asarray(x, dtype=np.float64)
    rng = np.random.default_rng(seed)
    flat_idx = rng.choice(x_np.size, size=min(n_probe, x_np.size),
                          replace=False)
    for fi in flat_idx:
        idx = np.unravel_index(fi, x_np.shape)
        xp = x_np.copy(); xp[idx] += eps
        xm = x_np.copy(); xm[idx] -= eps
        fd = (float(fn(jnp.asarray(xp, dtype=jnp.float32)))
              - float(fn(jnp.asarray(xm, dtype=jnp.float32)))) / (2 * eps)
        got = g[idx]
        err = abs(got - fd)
        assert err <= atol + rtol * abs(fd), (
            f"grad mismatch at {idx}: analytic={got:.6f} fd={fd:.6f} "
            f"err={err:.2e}")
