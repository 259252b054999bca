"""DCN formulation shoot-out on real TPU: exact XLA gather vs banded
one-hot-matmul Pallas kernel, at R101 stage-3 and stage-4 block shapes.

In-jit fori_loop protocol (per docs/PERF_NOTES.md): per-iteration input
variation defeats CSE; host scalar pull is the sync point.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.dcn import modulated_deform_conv
from transcar_tpu.ops.pallas_dcn import modulated_deform_conv_fast

ITERS = 30


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out[..., 0].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return dt, s


def bench(name, make_fn, x, om, weight, bias):
    fn = jax.jit(make_fn)
    # compile + warm
    timed(fn, x, om, weight, bias)
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


def make_loop_banded(radius):
    def loop_banded(x, om, weight, bias):
        def body(i, carry):
            acc, xx = carry
            out = modulated_deform_conv_fast(xx, om, weight, bias,
                                             band_radius=radius)
            return acc + jnp.sum(out[..., 0].astype(jnp.float32)), xx + 1e-6
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))
        return acc[None]
    return loop_banded


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
        for r in (8, 4, 2):
            bench(f"{tag} banded R={r}", make_loop_banded(r),
                  x, om, weight, bias)


if __name__ == "__main__":
    main()
