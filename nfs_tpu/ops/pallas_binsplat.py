"""Pallas TPU kernels for the binned dense splat (LNST hot path).

The XLA formulation (``ops/binsplat.splat_binned``) is already
gather/scatter-free, but each of its 27 (3D) taps is a separate
HBM-traffic elementwise op over the (K, cells) bin arrays. Measured on
v5e (200k particles -> 96x64x96, K=6): 72 ms standalone fwd+bwd for the
XLA window vs 5.5-5.9 ms for these kernels (~13x); when XLA fuses the
window into a larger loss program its cost drops to ~7.7 ms, so the
in-styler win is smaller but still real. These kernels hold a z-slab of
the bin arrays in VMEM and evaluate ALL taps on-chip: one HBM read per
element of (attr, frac_z/y/x) and one write of the output grid /
gradient arrays. Both kernels iterate bins via the inner grid dim
(scoped VMEM stays K-independent — full-K variants OOM'd the 16 MB
stack at the styler's coarse-octave K).

Layout (matches ops/binsplat.py): bin arrays are (K, Z, Y, X) with
Z,Y,X = padded_shape(shape) (PAD=2 per side), x minor. Kernels follow the
repo's Mosaic rules (see ops/pallas_advect.py + CLAUDE.md): fori over the
K/z-tap axes (full unrolls OOM scoped VMEM), dynamic slices only in the
untiled major dims, integer iota, and weight derivatives matching JAX's
subgradient conventions exactly (abs'(0) = +1, `where` selects a branch).

Forward:  out[q] = sum_k sum_{off in {0,1,2}^3} prod_d w1d(off_d -
          frac_d[k, q - off]) * a[k, q - off]
Backward: da[k,b]  = sum_off W_off[k,b] * g[b + off]
          dfrac_d[k,b] = -a[k,b] * sum_off (dW/du)_d * (other weights)
                         * g[b + off]

Semantics match ``splat_binned`` bit-for-fp-rounding; tests compare both
values and grads in interpret mode (CPU) and the verify drive re-checks
on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nfs_tpu.ops.binsplat import PAD, padded_shape


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _w1d(u):
    au = jnp.abs(u)
    return jnp.where(au < 0.5, 0.75 - au * au,
                     jnp.where(au < 1.5, 0.5 * (1.5 - au) ** 2, 0.0))


def _dw1d(u):
    """d w1d / du with JAX's subgradient conventions: `where` gradients
    select by the same predicate (no averaging at 0.5/1.5 — the branch
    taken is the one the forward `where` takes) and abs'(0) = +1."""
    sgn = jnp.where(u >= 0.0, 1.0, -1.0)
    au = jnp.abs(u)
    return jnp.where(au < 0.5, -2.0 * u,
                     jnp.where(au < 1.5, -(1.5 - au) * sgn, 0.0))


# --------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------- #


def _fwd_kernel(a_ref, fz_ref, fy_ref, fx_ref, out_ref,
                a_s, fz_s, fy_s, fx_s, sems, *, tz: int):
    """One (z-slab, bin) step of out: slabs hold rows [z0, z0 + tz + 2)
    of bin k of the FRONT-padded (by 2) arrays; out row z sums bins
    z + (2 - oz).

    Grid = (z-slabs, K): scratch holds a single bin's slab, so scoped
    VMEM no longer scales with K (the full-K variant OOM'd the 16 MB
    stack at K=8 even at tz=1). k is the INNER grid dim and the out
    block index ignores k, so Mosaic keeps the out block resident in
    VMEM across k and writes it back once per z-slab; contributions
    accumulate in place (init at k == 0)."""
    i = pl.program_id(0)
    k = pl.program_id(1)
    cps = []
    for ref, s, j in ((a_ref, a_s, 0), (fz_ref, fz_s, 1),
                      (fy_ref, fy_s, 2), (fx_ref, fx_s, 3)):
        cp = pltpu.make_async_copy(
            ref.at[k, pl.ds(i * tz, tz + 2)], s, sems.at[j])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    _, h, w = out_ref.shape

    def body(oz, acc):
        zsl = pl.ds(2 - oz, tz)
        a_z = a_s[zsl, :, :]
        wz = _w1d(oz.astype(jnp.float32) - fz_s[zsl, :, :])
        fy_z = fy_s[zsl, :, :]
        fx_z = fx_s[zsl, :, :]
        wys = [_w1d(jnp.float32(oy) - fy_z) for oy in range(3)]
        wxs = [_w1d(jnp.float32(ox) - fx_z) for ox in range(3)]
        za = wz * a_z
        for oy in range(3):
            for ox in range(3):
                ys = slice(2 - oy, 2 - oy + h)
                xs = slice(2 - ox, 2 - ox + w)
                acc = acc + (za[:, ys, xs] * wys[oy][:, ys, xs]
                             * wxs[ox][:, ys, xs])
        return acc

    contrib = jax.lax.fori_loop(
        0, 3, body, jnp.zeros(out_ref.shape, jnp.float32))

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jnp.zeros(out_ref.shape, jnp.float32)

    out_ref[:] += contrib


def _fwd_pallas(a, fz, fy, fx, *, K: int, tz: int, interpret: bool):
    """a/f*: (K, Z, Y, X) bin arrays (padded grid). Returns (Z, Y, X)."""
    _, Z, Y, X = a.shape
    Zo = _round_up(Z, tz)
    Yo = _round_up(Y, 8)
    Xo = _round_up(X, 128)
    Ys = _round_up(Yo + 2, 8)
    Xs = _round_up(Xo + 2, 128)

    def prep(x, fill):
        # front-pad spatial dims by 2 (bin q-off -> padded q + 2 - off),
        # end-pad to the tile grid (+ tz slack for the last slab's halo)
        return jnp.pad(x, [(0, 0), (2, Zo + 2 - Z), (2, Ys - Y - 2),
                           (2, Xs - X - 2)], constant_values=fill)

    ap = prep(a.astype(jnp.float32), 0.0)
    # frac fill 10: w1d(off - 10) == 0 for any tap
    fzp, fyp, fxp = (prep(f.astype(jnp.float32), 10.0)
                     for f in (fz, fy, fx))

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tz=tz),
        grid=(Zo // tz, K),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec((tz, Yo, Xo), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Zo, Yo, Xo), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tz + 2, Ys, Xs), jnp.float32)] * 4
        + [pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(ap, fzp, fyp, fxp)
    return out[:Z, :Y, :X]


# --------------------------------------------------------------------- #
# backward
# --------------------------------------------------------------------- #


def _bwd_kernel(a_ref, fz_ref, fy_ref, fx_ref, g_ref,
                da_ref, dfz_ref, dfy_ref, dfx_ref,
                g_s, sem, *, tz: int):
    """Gradients at bin location b: weights/attr read unshifted, the
    output cotangent g read at b + off (g END-padded by 2; its slab is
    rows [z0, z0 + tz + 2)).

    Grid = (z-slabs, K): per-K bin blocks keep scoped VMEM small (the
    full-K variant OOM'd the 16 MB scoped-vmem stack on v5e at K=6 —
    blocks double-buffer). k is the INNER grid dim, so the g slab is
    DMA'd once per z-slab (k == 0) and persists for k = 1..K-1."""
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _copy_g():
        cp = pltpu.make_async_copy(
            g_ref.at[pl.ds(i * tz, tz + 2)], g_s, sem)
        cp.start()
        cp.wait()

    _, _, h, w = da_ref.shape
    a_k = a_ref[0]
    fz = fz_ref[0]
    fy = fy_ref[0]
    fx = fx_ref[0]
    wz = [_w1d(jnp.float32(o) - fz) for o in range(3)]
    dz = [-_dw1d(jnp.float32(o) - fz) for o in range(3)]
    wy = [_w1d(jnp.float32(o) - fy) for o in range(3)]
    dy = [-_dw1d(jnp.float32(o) - fy) for o in range(3)]
    wx = [_w1d(jnp.float32(o) - fx) for o in range(3)]
    dx = [-_dw1d(jnp.float32(o) - fx) for o in range(3)]
    zero = jnp.zeros((tz, h, w), jnp.float32)
    da, az, ay, ax = zero, zero, zero, zero
    for oz in range(3):
        for oy in range(3):
            for ox in range(3):
                gsub = g_s[pl.ds(oz, tz), oy:oy + h, ox:ox + w]
                da = da + wz[oz] * wy[oy] * wx[ox] * gsub
                az = az + dz[oz] * wy[oy] * wx[ox] * gsub
                ay = ay + wz[oz] * dy[oy] * wx[ox] * gsub
                ax = ax + wz[oz] * wy[oy] * dx[ox] * gsub
    da_ref[0] = da
    dfz_ref[0] = az * a_k
    dfy_ref[0] = ay * a_k
    dfx_ref[0] = ax * a_k


def _bwd_pallas(a, fz, fy, fx, g, *, K: int, tz: int, interpret: bool):
    _, Z, Y, X = a.shape
    Zo = _round_up(Z, tz)
    Yb = _round_up(Y, 8)
    Xb = _round_up(X, 128)
    Ysg = _round_up(Yb + 2, 8)
    Xsg = _round_up(Xb + 2, 128)

    def prep_bin(x, fill):
        return jnp.pad(x, [(0, 0), (0, Zo - Z), (0, Yb - Y), (0, Xb - X)],
                       constant_values=fill)

    ap = prep_bin(a.astype(jnp.float32), 0.0)
    fzp, fyp, fxp = (prep_bin(f.astype(jnp.float32), 10.0)
                     for f in (fz, fy, fx))
    # g END-padded by 2 (bin b reads g[b + off]) + slab slack
    gp = jnp.pad(g.astype(jnp.float32),
                 [(0, Zo + 2 - Z), (0, Ysg - Y), (0, Xsg - X)])

    bin_block = pl.BlockSpec((1, tz, Yb, Xb), lambda i, k: (k, i, 0, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, tz=tz),
        grid=(Zo // tz, K),
        in_specs=[bin_block] * 4 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(bin_block,) * 4,
        out_shape=tuple(jax.ShapeDtypeStruct((K, Zo, Yb, Xb), jnp.float32)
                        for _ in range(4)),
        scratch_shapes=[pltpu.VMEM((tz + 2, Ysg, Xsg), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(ap, fzp, fyp, fxp, gp)
    return tuple(o[:, :Z, :Y, :X] for o in outs)


# --------------------------------------------------------------------- #
# differentiable window op + splat_binned-compatible wrapper
# --------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _window_pallas(a, fz, fy, fx, K, tz, interpret):
    return _fwd_pallas(a, fz, fy, fx, K=K, tz=tz, interpret=interpret)


def _window_fwd(a, fz, fy, fx, K, tz, interpret):
    out = _fwd_pallas(a, fz, fy, fx, K=K, tz=tz, interpret=interpret)
    return out, (a, fz, fy, fx)


def _window_bwd(K, tz, interpret, res, g):
    a, fz, fy, fx = res
    return _bwd_pallas(a, fz, fy, fx, g, K=K, tz=tz, interpret=interpret)


_window_pallas.defvjp(_window_fwd, _window_bwd)


def _pick_tz(Y: int, X: int, budget_mb: float = 8.0) -> int:
    """Largest slab depth keeping scoped VMEM under `budget_mb` for both
    kernels (per-bin grids, so K does not enter): forward = 4 halo'd
    (tz+2, Ys, Xs) f32 scratch slabs + the double-buffered out block;
    backward = one g slab + 8 double-buffered (1, tz, Yb, Xb) blocks."""
    Ys = _round_up(Y + 4, 8)
    Xs = _round_up(X + 4, 128)
    Yb = _round_up(Y, 8)
    Xb = _round_up(X, 128)
    for tz in (8, 4, 2, 1):
        fwd = (4 * (tz + 2) * Ys * Xs + 2 * tz * Yb * Xb) * 4
        bwd = ((tz + 2) * Ys * Xs + 8 * 2 * tz * Yb * Xb) * 4
        if max(fwd, bwd) <= budget_mb * 1e6:
            return tz
    return 1


@functools.partial(jax.jit, static_argnames=("shape", "K", "interpret"))
def splat_binned_pallas(p_b: jax.Array, attr_b: jax.Array,
                        valid: jax.Array, shape, K: int,
                        interpret: bool | None = None) -> jax.Array:
    """Drop-in for ``ops.binsplat.splat_binned`` (3D, single-channel
    attr) with the fused Pallas window kernels. Differentiable in p_b and
    attr_b (custom VJP kernels); masking/frac/crop chains stay in XLA so
    parked/invalid slots get exact zero gradients.
    """
    ndim = len(shape)
    assert ndim == 3 and attr_b.ndim == 1, (
        "pallas splat supports 3D single-channel attrs; use "
        "splat_binned for 2D/color")
    if interpret is None:
        interpret = _interpret_default()
    pshape = padded_shape(shape)
    n_cells = int(np.prod(pshape))
    n_slots = n_cells * K

    a = jnp.where(valid, attr_b[:n_slots], 0.0).reshape((K,) + pshape)
    fracs = []
    for d in range(ndim):
        coord = jnp.arange(pshape[d], dtype=jnp.float32).reshape(
            tuple(pshape[d] if i == d else 1 for i in range(ndim)))
        fracs.append(p_b[d, :n_slots].reshape((K,) + pshape)
                     + jnp.float32(PAD) - coord)

    tz = _pick_tz(pshape[1], pshape[2])
    out = _window_pallas(a, fracs[0], fracs[1], fracs[2], K, tz, interpret)
    return out[PAD:PAD + shape[0], PAD:PAD + shape[1],
               PAD:PAD + shape[2]]
