"""Shipped fused_deform_conv on real TPU at R101 block shapes, band sweep."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.dcn import modulated_deform_conv
from transcar_tpu.ops.pallas_dcn import fused_deform_conv

ITERS = 30


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out[..., 0].astype(jnp.float32)))
    return time.perf_counter() - t0, s


def bench(name, make_fn, *args):
    fn = jax.jit(make_fn)
    try:
        timed(fn, *args)
        dt, s = timed(fn, *args)
        print(f"{name}: {dt / ITERS * 1e3:.2f} ms/block (sum {s:.1f})",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    for tag, (n, h, w, c) in [("s3", (6, 58, 100, 256)),
                              ("s4", (6, 29, 50, 512))]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.bfloat16)
        om = jnp.asarray(rng.normal(size=(n, h, w, 27)) * 1.5, jnp.bfloat16)
        wt = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)

        def loop_exact(x, om):
            def body(i, carry):
                acc, xx = carry
                out = jax.vmap(lambda a, b: modulated_deform_conv(
                    a, b, wt, bias))(xx, om)
                return acc + jnp.sum(out[..., 0].astype(jnp.float32)), \
                    xx + 1e-6
            acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))
            return acc[None]

        bench(f"{tag} exact", loop_exact, x, om)
        for band in (12, 14, 16, 20):
            def loop_fused(x, om, band=band):
                def body(i, carry):
                    acc, xx = carry
                    out = fused_deform_conv(xx, om, wt, bias,
                                            band_rows=band)
                    return acc + jnp.sum(
                        out[..., 0].astype(jnp.float32)), xx + 1e-6
                acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                           (jnp.zeros(()), x))
                return acc[None]
            bench(f"{tag} fused-B{band}", loop_fused, x, om)


if __name__ == "__main__":
    main()
