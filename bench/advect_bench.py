"""Advect full-grad-chain micro-bench: XLA window vs Pallas slab kernels
(split two-kernel backward vs fused single-dispatch backward — ROADMAP #6
/ VERDICT r4 next #7).

Times ONE jitted lax.fori_loop of `iters` gradient-descent steps on
sum(advect(f, v)^2) w.r.t. BOTH field and velocity — the full
fwd+bwd_field+bwd_vel chain per step, chained data-dependently so the
axon relay's per-dispatch latency cannot fake the number (CLAUDE.md:
block_until_ready is not a real sync here; the loop ends in a host read).

    python bench/advect_bench.py [--impl xla|pallas|pallas_fused]
                                 [--shape 112 64 112] [--iters 50]
                                 [--check] [--out FILE]

`pallas` is the production default (split two-kernel backward — the
measured winner, see docs/ROOFLINE.md "Fused advect backward");
`pallas_fused` flips pallas_advect.FUSED_BWD for the A/B.

--check also asserts grad parity of the chosen impl vs XLA on device.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", choices=["xla", "pallas", "pallas_fused"],
                   default="pallas")
    p.add_argument("--shape", type=int, nargs=3, default=[112, 64, 112])
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--max_disp", type=float, default=2.0)
    p.add_argument("--tz", type=int, default=2)
    p.add_argument("--check", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from nfs_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from nfs_tpu.ops import pallas_advect as pa
    from nfs_tpu.ops.advect import advect

    if args.impl == "pallas_fused":
        pa.FUSED_BWD = True

    shape = tuple(args.shape)
    rng = np.random.default_rng(0)
    f0 = jnp.asarray(rng.random(shape), jnp.float32)
    v0 = jnp.asarray(0.8 * rng.standard_normal(shape + (3,)),
                     jnp.float32)

    if args.impl == "xla":
        def adv(f, v):
            return advect(f, v, mode="clamp", max_disp=args.max_disp,
                          impl="xla")
    else:
        def adv(f, v):
            return pa.advect_pallas(f, v, 1.0, args.max_disp, args.tz)

    def loss(f, v):
        return jnp.sum(adv(f, v) ** 2)

    grad = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def chain(f, v):
        def body(_, fv):
            f, v = fv
            gf, gv = grad(f, v)
            return (f - 1e-4 * gf, v - 1e-4 * gv)
        return jax.lax.fori_loop(0, args.iters, body, (f, v))

    if args.check:
        gf, gv = grad(f0, v0)
        gfx, gvx = jax.grad(
            lambda f, v: jnp.sum(advect(
                f, v, mode="clamp", max_disp=args.max_disp,
                impl="xla") ** 2), argnums=(0, 1))(f0, v0)
        err_f = float(jnp.abs(gf - gfx).max())
        err_v = float(jnp.abs(gv - gvx).max())
        print(json.dumps({"check": {"impl": args.impl,
                                    "grad_field_maxerr": err_f,
                                    "grad_vel_maxerr": err_v}}),
              flush=True)
        assert err_f < 1e-3 and err_v < 1e-3, "grad parity FAILED"

    # compile + warm
    fw, vw = chain(f0, v0)
    np.asarray(fw)

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        f1, v1 = chain(f0, v0)
        np.asarray(f1)  # host read = the only honest sync on axon
        best = min(best, time.time() - t0)

    res = {
        "metric": "advect_full_grad_chain",
        "impl": args.impl,
        "shape": list(shape),
        "iters": args.iters,
        "ms_per_iter": round(1e3 * best / args.iters, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(res), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
