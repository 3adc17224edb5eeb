"""Pallas TPU kernels for the binned dense splat (LNST hot path).

The XLA formulation (``ops/binsplat.splat_binned``) is already
gather/scatter-free, but each of its 27 (3D) taps is a separate
HBM-traffic elementwise op over the (K, cells) bin arrays. These kernels
hold a z-slab of the bin arrays in VMEM and evaluate ALL taps on-chip.

Round-4 redesign (measured on v5e, 200k particles -> 96x64x96, K=8):
the first version took PRE-COMPUTED frac arrays, front-padded by 2 and
tile-rounded in XLA — at X=100 the lane dim rounded 102 -> 256, so every
operand carried 2.56x its real bytes, and the XLA side materialized
three (K, cells) frac arrays plus four pad ops per call (~1.3 ms/iter of
pure feed overhead in the styler's finest octave). Now:

  * operands are the RAW position components (and masked attr), reshaped
    (K, Zp, Yb, Xb) with the front shift of 2 baked into one XLA pad and
    the lane dim rounded from X+2 (100 -> 128, not 256);
  * fracs are computed IN-KERNEL from positions + integer iota
    (frac_d = p_d + PAD - bin_d), so no frac arrays ever hit HBM;
  * the forward DMAs aligned (tz+2, Yb, Xb) blocks into the top-left of
    a wider scratch whose edges are neutral-initialized once at the
    first grid step (Mosaic requires 128-aligned lane extents on VMEM
    DMA destinations — an unaligned subview copy does NOT compile);
  * the backward consumes the SAME shifted operands (saved as residuals,
    ~2.2x smaller than the old padded residuals) through plain tile-
    aligned BlockSpecs and emits gradients in the shifted layout, sliced
    back outside; its g slab is front-padded by 2 so every tap slice
    stays non-negative;
  * weight tables are hoisted: one w1d eval per (offset, element)
    instead of re-evaluating wy/wx inside the z-tap loop (21 -> 9 evals
    per element);
  * every pallas_call is wrapped in ``jax.custom_batching
    .sequential_vmap`` (lax.map over a batch dim) — plain
    vmap-of-pallas_call with ANY-memory-space operands fails Mosaic
    compilation on real TPUs even though interpret mode accepts it (the
    same failure class ops/pallas_advect.py hit), and the keyframe-DP
    engine (parallel/particles.py) vmaps this splat over keyframes.

Both kernels iterate bins via the inner grid dim (scoped VMEM stays
K-independent). Mosaic rules obeyed (see ops/pallas_advect.py +
CLAUDE.md): fori/unrolled taps over the major axis only, dynamic slices
only in the untiled major dims, integer iota, weight derivatives
matching JAX's subgradient conventions exactly (abs'(0) = +1, `where`
selects a branch).

Forward:  out[q] = sum_k sum_{off in {0,1,2}^3} prod_d w1d(off_d -
          frac_d[k, q - off]) * a[k, q - off]
Backward: da[k,b]  = sum_off W_off[k,b] * g[b + off]
          dp_d[k,b] = -a[k,b] * sum_off (dW/du)_d * (other weights)
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
from jax import custom_batching
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
# shifted operand layout
# --------------------------------------------------------------------- #
#
# Tight bin arrays (K, Z, Y, X) are padded ONCE into the shared layout
# (K, Zp, Yb, Xb): front shift 2 on z/y/x baked in, ends tile-rounded.
# Operand index (r, y', x') holds bin (r - 2, y' - 2, x' - 2); fills are
# neutral (attr 0, positions 1e4 -> w1d == 0 at every tap).


def _shifted_dims(Z: int, Y: int, X: int, tz: int):
    Zo = _round_up(Z, tz)
    Zp = _round_up(Zo + 4, tz)
    Yb = _round_up(Y + 2, 8)
    Xb = _round_up(X + 2, 128)
    return Zo, Zp, Yb, Xb


def _prep_shifted(x, fill, Zp: int, Yb: int, Xb: int):
    _, Z, Y, X = x.shape
    return jnp.pad(x.astype(jnp.float32),
                   [(0, 0), (2, Zp - Z - 2), (2, Yb - Y - 2),
                    (2, Xb - X - 2)], constant_values=fill)


# --------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------- #


def _fwd_kernel(a_ref, pz_ref, py_ref, px_ref, out_ref,
                a_s, pz_s, py_s, px_s, sems, *, tz: int,
                nb_y: int, nb_x: int):
    """One (z-slab, bin) step of out. Operand rows [i*tz, i*tz + tz + 2)
    of the shifted layout are DMA'd into the top-left (nb_y, nb_x) of
    the scratch (fully tile-aligned copy); the scratch's right/bottom
    edges are neutral-initialized at the first grid step and never
    overwritten (tap slices read up to +2 past the block).

    Grid = (z-slabs, K): scratch holds a single bin's slab, so scoped
    VMEM does not scale with K. k is the INNER grid dim and the out
    block index ignores k, so Mosaic keeps the out block resident in
    VMEM across k and writes it back once per z-slab; contributions
    accumulate in place (init at k == 0)."""
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when((i == 0) & (k == 0))
    def _init_edges():
        a_s[:] = jnp.zeros(a_s.shape, jnp.float32)
        big = jnp.full(pz_s.shape, 1e4, jnp.float32)
        pz_s[:] = big
        py_s[:] = big
        px_s[:] = big

    cps = []
    for ref, s, j in ((a_ref, a_s, 0), (pz_ref, pz_s, 1),
                      (py_ref, py_s, 2), (px_ref, px_s, 3)):
        cp = pltpu.make_async_copy(
            ref.at[k, pl.ds(i * tz, tz + 2), :, :],
            s.at[:, 0:nb_y, 0:nb_x], sems.at[j])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    _, h, w = out_ref.shape
    st, sy, sx = pz_s.shape

    # scratch (r, y', x') holds bin (i*tz + r - 2, y' - 2, x' - 2);
    # frac_d = p_d + PAD - bin_d. Fill 1e4 stays far away (w1d == 0).
    yy = jax.lax.broadcasted_iota(jnp.int32, (st, sy, sx), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (st, sy, sx), 2)
    fy = py_s[:] + jnp.float32(PAD + 2) - yy.astype(jnp.float32)
    fx = px_s[:] + jnp.float32(PAD + 2) - xx.astype(jnp.float32)

    # hoisted weight tables: one eval per (offset, element); the z-tap
    # loop below only slices them (the first kernel version re-evaluated
    # wy/wx inside the oz loop: 21 evals/element instead of 9)
    wy_t = [_w1d(jnp.float32(o) - fy) for o in range(3)]
    wx_t = [_w1d(jnp.float32(o) - fx) for o in range(3)]

    rr = jax.lax.broadcasted_iota(jnp.int32, (st, sy, sx), 0)
    fz = (pz_s[:] + jnp.float32(PAD + 2)
          - (rr + i * tz).astype(jnp.float32))

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for oz in range(3):
        zsl = slice(2 - oz, 2 - oz + tz)
        za = _w1d(jnp.float32(oz) - fz[zsl]) * a_s[zsl]
        for oy in range(3):
            ys = slice(2 - oy, 2 - oy + h)
            wzy = za[:, ys, :] * wy_t[oy][zsl, ys, :]
            for ox in range(3):
                xs = slice(2 - ox, 2 - ox + w)
                acc = acc + wzy[:, :, xs] * wx_t[ox][zsl, ys, xs]
        del za

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jnp.zeros(out_ref.shape, jnp.float32)

    out_ref[:] += acc


@functools.lru_cache(maxsize=None)
def _fwd_call(K: int, tz: int, Zo: int, Yo: int, Xo: int,
              Yb: int, Xb: int, Ys: int, Xs: int, interpret: bool):
    """Cached, vmappable forward pallas_call (sequential_vmap: lax.map
    over any batch dim — Mosaic rejects plain vmap of ANY-operand
    pallas_calls on hardware, and serializing keyframes costs nothing:
    each slab kernel already saturates the chip)."""

    def call(ap, pzp, pyp, pxp):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, tz=tz, nb_y=Yb, nb_x=Xb),
            grid=(Zo // tz, K),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
            out_specs=pl.BlockSpec((tz, Yo, Xo), lambda i, k: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Zo, Yo, Xo), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tz + 2, Ys, Xs), jnp.float32)] * 4
            + [pltpu.SemaphoreType.DMA((4,))],
            interpret=interpret,
        )(ap, pzp, pyp, pxp)

    return custom_batching.sequential_vmap(call)


def _fwd_pallas(a, pz, py, px, *, K: int, tz: int, interpret: bool):
    """a/p*: (K, Z, Y, X) TIGHT bin arrays (masked attr, raw positions
    in padded-grid coords). Returns (Z, Y, X)."""
    _, Z, Y, X = a.shape
    Zo, Zp, Yb, Xb = _shifted_dims(Z, Y, X, tz)
    Yo = _round_up(Y, 8)
    Xo = _round_up(X, 128)
    # scratch: operand block + room for tap slices reading up to +2
    Ys = _round_up(max(Yb, Yo + 2) + 2, 8)
    Xs = _round_up(max(Xb, Xo + 2) + 2, 128)

    ap = _prep_shifted(a, 0.0, Zp, Yb, Xb)
    pzp, pyp, pxp = (_prep_shifted(p, 1e4, Zp, Yb, Xb)
                     for p in (pz, py, px))
    out = _fwd_call(K, tz, Zo, Yo, Xo, Yb, Xb, Ys, Xs, interpret)(
        ap, pzp, pyp, pxp)
    return out[:Z, :Y, :X], (ap, pzp, pyp, pxp)


# --------------------------------------------------------------------- #
# backward
# --------------------------------------------------------------------- #


def _bwd_kernel(a_ref, pz_ref, py_ref, px_ref, g_ref,
                da_ref, dpz_ref, dpy_ref, dpx_ref,
                g_s, sem, *, tb: int):
    """Gradients at bin locations, in the SHIFTED layout: block row rb of
    slab i holds bin z = i*tb + rb - 2 (same shift on y/x), so blocks of
    the forward's residual operands feed straight in. The output
    cotangent g is front-padded by 2 on every dim, so the tap read
    g[bin + off] becomes the non-negative slice g_s[rb + oz, y' + oy,
    x' + ox].

    Grid = (z-slabs, K): per-K bin blocks keep scoped VMEM small. k is
    the INNER grid dim, so the g slab is DMA'd once per z-slab (k == 0)
    and persists for k = 1..K-1."""
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _copy_g():
        cp = pltpu.make_async_copy(
            g_ref.at[pl.ds(i * tb, tb + 2)], g_s, sem)
        cp.start()
        cp.wait()

    _, _, h, w = da_ref.shape
    a_k = a_ref[0]

    # fracs from raw positions: block (rb, y', x') is bin
    # (i*tb + rb - 2, y' - 2, x' - 2); frac_d = p_d + PAD - bin_d
    rr = jax.lax.broadcasted_iota(jnp.int32, (tb, h, w), 0)
    yy = jax.lax.broadcasted_iota(jnp.int32, (tb, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (tb, h, w), 2)
    fz = (pz_ref[0] + jnp.float32(PAD + 2)
          - (rr + i * tb).astype(jnp.float32))
    fy = py_ref[0] + jnp.float32(PAD + 2) - yy.astype(jnp.float32)
    fx = px_ref[0] + jnp.float32(PAD + 2) - xx.astype(jnp.float32)

    wz = [_w1d(jnp.float32(o) - fz) for o in range(3)]
    dz = [-_dw1d(jnp.float32(o) - fz) for o in range(3)]
    wy = [_w1d(jnp.float32(o) - fy) for o in range(3)]
    dy = [-_dw1d(jnp.float32(o) - fy) for o in range(3)]
    wx = [_w1d(jnp.float32(o) - fx) for o in range(3)]
    dx = [-_dw1d(jnp.float32(o) - fx) for o in range(3)]
    zero = jnp.zeros((tb, h, w), jnp.float32)
    da, az, ay, ax = zero, zero, zero, zero
    for oz in range(3):
        for oy in range(3):
            for ox in range(3):
                gsub = g_s[pl.ds(oz, tb), oy:oy + h, ox:ox + w]
                da = da + wz[oz] * wy[oy] * wx[ox] * gsub
                az = az + dz[oz] * wy[oy] * wx[ox] * gsub
                ay = ay + wz[oz] * dy[oy] * wx[ox] * gsub
                ax = ax + wz[oz] * wy[oy] * dx[ox] * gsub
    da_ref[0] = da
    dpz_ref[0] = az * a_k
    dpy_ref[0] = ay * a_k
    dpx_ref[0] = ax * a_k


@functools.lru_cache(maxsize=None)
def _bwd_call(K: int, tb: int, Zp: int, Yb: int, Xb: int,
              Ysg: int, Xsg: int, interpret: bool):
    """Cached, vmappable backward pallas_call (see _fwd_call)."""
    bin_block = pl.BlockSpec((1, tb, Yb, Xb), lambda i, k: (k, i, 0, 0),
                             memory_space=pltpu.VMEM)

    def call(ap, pzp, pyp, pxp, gp):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, tb=tb),
            grid=(Zp // tb, K),
            in_specs=[bin_block] * 4 + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(bin_block,) * 4,
            out_shape=tuple(
                jax.ShapeDtypeStruct((K, Zp, Yb, Xb), jnp.float32)
                for _ in range(4)),
            scratch_shapes=[pltpu.VMEM((tb + 2, Ysg, Xsg), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            interpret=interpret,
        )(ap, pzp, pyp, pxp, gp)

    return custom_batching.sequential_vmap(call)


def _bwd_pallas(res, g, *, shape_tight, K: int, tb: int, interpret: bool):
    """res: the forward's shifted operands (K, Zp, Yb, Xb). g: cotangent
    on the tight (Z, Y, X) grid. Returns TIGHT (K, Z, Y, X) gradients
    for (attr, p_z, p_y, p_x)."""
    ap, pzp, pyp, pxp = res
    Z, Y, X = shape_tight
    _, Zp, Yb, Xb = ap.shape
    Ysg = _round_up(Yb + 4, 8)
    Xsg = _round_up(Xb + 4, 128)
    # g front-padded by 2 on every dim (tap reads g[bin + off] become
    # non-negative slices); zero fill == zero cotangent outside the grid
    gp = jnp.pad(g.astype(jnp.float32),
                 [(2, Zp + 2 - Z - 2), (2, Ysg - Y - 2),
                  (2, Xsg - X - 2)])
    outs = _bwd_call(K, tb, Zp, Yb, Xb, Ysg, Xsg, interpret)(
        ap, pzp, pyp, pxp, gp)
    return tuple(o[:, 2:2 + Z, 2:2 + Y, 2:2 + X] for o in outs)


# --------------------------------------------------------------------- #
# differentiable window op + splat_binned-compatible wrapper
# --------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _window_pallas(a, pz, py, px, K, tz, interpret):
    out, _ = _fwd_pallas(a, pz, py, px, K=K, tz=tz, interpret=interpret)
    return out


def _window_fwd(a, pz, py, px, K, tz, interpret):
    out, res = _fwd_pallas(a, pz, py, px, K=K, tz=tz, interpret=interpret)
    return out, (res, a.shape)


def _window_bwd(K, tz, interpret, res_shape, g):
    res, ashape = res_shape
    return _bwd_pallas(res, g, shape_tight=ashape[1:], K=K, tb=tz,
                       interpret=interpret)


_window_pallas.defvjp(_window_fwd, _window_bwd)


def _pick_tz(Y: int, X: int, budget_mb: float = 8.0) -> int:
    """Largest slab depth keeping scoped VMEM under `budget_mb` for both
    kernels (per-bin grids, so K does not enter). Forward: 4 halo'd
    (tz+2, Ys, Xs) scratch slabs + ~7 live table/temp values of the same
    footprint + the double-buffered out block. Backward: one g slab + 8
    double-buffered (1, tb, Yb, Xb) blocks + ~20 live weight/deriv
    tables over the block."""
    Yb = _round_up(Y + 2, 8)
    Xb = _round_up(X + 2, 128)
    Yo = _round_up(Y, 8)
    Xo = _round_up(X, 128)
    Ys = _round_up(max(Yb, Yo + 2) + 2, 8)
    Xs = _round_up(max(Xb, Xo + 2) + 2, 128)
    for tz in (8, 4, 2, 1):
        fwd = (11 * (tz + 2) * Ys * Xs + 2 * tz * Yo * Xo) * 4
        bwd = ((tz + 2) * Ys * Xs + 28 * tz * Yb * Xb) * 4
        if max(fwd, bwd) <= budget_mb * 1e6:
            return tz
    return 1


# --------------------------------------------------------------------- #
# shifted-resident entry (chunk state lives in the kernel's layout)
# --------------------------------------------------------------------- #


def shifted_layout(shape) -> tuple:
    """((Zp, Yb, Xb), tz) of the shifted operand layout for unpadded
    `shape` — the layout the chunk-resident styler state lives in (see
    styler/particle.py `_binned_chunk_core` layout='shifted')."""
    Z, Y, X = padded_shape(shape)
    tz = _pick_tz(Y, X)
    _, Zp, Yb, Xb = _shifted_dims(Z, Y, X, tz)
    return (Zp, Yb, Xb), tz


def prep_shifted(x4: jax.Array, fill: float, dims) -> jax.Array:
    """(K, Z, Y, X) tight bin array -> the shifted (K, Zp, Yb, Xb)
    operand layout (front shift 2 baked in, ends tile-rounded)."""
    Zp, Yb, Xb = dims
    return _prep_shifted(x4, fill, Zp, Yb, Xb)


def _ws_impl(a, pz, py, px, grid_shape, K, interpret):
    Z, Y, X = padded_shape(grid_shape)
    tz = _pick_tz(Y, X)
    Zo, Zp, Yb, Xb = _shifted_dims(Z, Y, X, tz)
    Yo = _round_up(Y, 8)
    Xo = _round_up(X, 128)
    Ys = _round_up(max(Yb, Yo + 2) + 2, 8)
    Xs = _round_up(max(Xb, Xo + 2) + 2, 128)
    assert a.shape[-3:] == (Zp, Yb, Xb), (a.shape, (Zp, Yb, Xb))
    out = _fwd_call(K, tz, Zo, Yo, Xo, Yb, Xb, Ys, Xs, interpret)(
        a, pz, py, px)
    gz, gy, gx = grid_shape
    return out[PAD:PAD + gz, PAD:PAD + gy, PAD:PAD + gx]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def window_shifted(a, pz, py, px, grid_shape, K: int, interpret: bool):
    """Dense-window splat over ALREADY-shifted (K, Zp, Yb, Xb) operands,
    returning the (*grid_shape,) grid directly (PAD ring cropped).

    The VJP consumes the operands as residuals and emits gradients IN
    the shifted layout, so a chunk whose params live shifted-resident
    pays zero per-step pad/slice/reshape around the kernel boundary
    (measured ~3 ms/iter of XLA plumbing at the BENCH_FULL particles_3d
    config — docs/LNST_TRACE.json). Empty slots must carry attr 0 and
    the position fill must be far outside the grid (w1d == 0) so their
    values AND gradients are exactly zero."""
    return _ws_impl(a, pz, py, px, grid_shape, K, interpret)


def _ws_fwd(a, pz, py, px, grid_shape, K, interpret):
    return (_ws_impl(a, pz, py, px, grid_shape, K, interpret),
            (a, pz, py, px))


def _ws_bwd(grid_shape, K, interpret, res, g):
    a, pz, py, px = res
    Z, Y, X = padded_shape(grid_shape)
    tz = _pick_tz(Y, X)
    _, Zp, Yb, Xb = a.shape
    Ysg = _round_up(Yb + 4, 8)
    Xsg = _round_up(Xb + 4, 128)
    gz, gy, gx = grid_shape
    # front pad 2 (shifted layout) + PAD (the fwd crop: cotangent is
    # zero on the PAD ring of the padded domain)
    gp = jnp.pad(g.astype(jnp.float32),
                 [(2 + PAD, Zp + 2 - (2 + PAD) - gz),
                  (2 + PAD, Ysg - (2 + PAD) - gy),
                  (2 + PAD, Xsg - (2 + PAD) - gx)])
    return _bwd_call(K, tz, Zp, Yb, Xb, Ysg, Xsg, interpret)(
        a, pz, py, px, gp)


window_shifted.defvjp(_ws_fwd, _ws_bwd)


@functools.partial(jax.jit, static_argnames=("shape", "K", "interpret"))
def splat_binned_pallas(p_b: jax.Array, attr_b: jax.Array,
                        valid: jax.Array, shape, K: int,
                        interpret: bool | None = None) -> jax.Array:
    """Drop-in for ``ops.binsplat.splat_binned`` (3D, single-channel
    attr) with the fused Pallas window kernels. Differentiable in p_b and
    attr_b (custom VJP kernels); masking/reshape/crop chains stay in XLA
    so parked/invalid slots get exact zero gradients.
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

    a4 = jnp.where(valid, attr_b[:n_slots], 0.0).reshape((K,) + pshape)
    p4 = [p_b[d, :n_slots].reshape((K,) + pshape) for d in range(ndim)]

    tz = _pick_tz(pshape[1], pshape[2])
    out = _window_pallas(a4, p4[0], p4[1], p4[2], K, tz, interpret)
    return out[PAD:PAD + shape[0], PAD:PAD + shape[1],
               PAD:PAD + shape[2]]
