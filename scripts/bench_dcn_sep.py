"""Separable DCN kernel vs exact XLA gather on real TPU, R101 block shapes."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.dcn import modulated_deform_conv
from transcar_tpu.ops.pallas_dcn import modulated_deform_conv_sep

ITERS = 30


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out[..., 0].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return dt, s


def bench(name, make_fn, x, om, weight, bias):
    fn = jax.jit(make_fn)
    timed(fn, x, om, weight, bias)  # compile + warm
    dt, s = timed(fn, x, om, weight, bias)
    print(f"{name}: {dt / ITERS * 1e3:.2f} ms/block  (sum {s:.1f})",
          flush=True)
    return dt / ITERS * 1e3


def loop_exact(x, om, weight, bias):
    def body(i, carry):
        acc, xx = carry
        out = jax.vmap(lambda a, b: modulated_deform_conv(
            a, b, weight, bias))(xx, om)
        return acc + jnp.sum(out[..., 0].astype(jnp.float32)), xx + 1e-6
    acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))
    return acc[None]


def make_loop_sep(rows):
    def loop_sep(x, om, weight, bias):
        def body(i, carry):
            acc, xx = carry
            out = modulated_deform_conv_sep(xx, om, weight, bias,
                                            band_rows=rows)
            return acc + jnp.sum(out[..., 0].astype(jnp.float32)), xx + 1e-6
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))
        return acc[None]
    return loop_sep


def main():
    print("devices:", jax.devices(), flush=True)
    for tag, (n, h, w, c) in [("stage3", (6, 58, 100, 256)),
                              ("stage4", (6, 29, 50, 512))]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.bfloat16)
        om = jnp.asarray(rng.normal(size=(n, h, w, 27)) * 1.5, jnp.bfloat16)
        weight = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05,
                             jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)
        print(f"--- {tag} {n}x{h}x{w}x{c} ({ITERS} iters in-jit)",
              flush=True)
        bench(f"{tag} exact-xla", loop_exact, x, om, weight, bias)
        for rows in (24, 32):
            bench(f"{tag} sep B={rows}", make_loop_sep(rows),
                  x, om, weight, bias)


if __name__ == "__main__":
    main()
