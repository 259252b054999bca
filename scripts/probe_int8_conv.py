"""Probe: does XLA lower int8 convs to the v5e MXU int8 path?

v5e peak is 394 TOPS int8 vs 197 TFLOPS bf16.  If an int8x int8 -> int32
conv runs ~2x the bf16 conv at VoVNet stage shapes, an opt-in
dynamically-quantized backbone path is worth building; if it ties or
loses (XLA upcasts / picks a non-MXU lowering), the door is closed and
we record that.

In-jit fori loop protocol (CLAUDE.md: single-op dispatch floor ~3-4 ms
through the relay); inputs varied per iteration to defeat CSE.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

ITERS = 30


def bench(fn, *args, iters=ITERS):
    @jax.jit
    def loop(args):
        def body(i, acc):
            # vary the first input per iteration so CSE can't collapse
            x = args[0] + i.astype(args[0].dtype)
            out = fn(x, *args[1:])
            return acc + out.astype(jnp.float32).sum()
        return lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(loop(args))                 # compile + warm
    t0 = time.perf_counter()
    float(loop(args))
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w, out_dtype):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    # VoVNet stage3 chain-conv shape (6 cams folded into N)
    for (n, h, w_, ci, co) in [(6, 116, 200, 160, 160),
                               (6, 58, 100, 192, 192),
                               (6, 58, 100, 256, 256)]:
        x = rng.normal(size=(n, h, w_, ci))
        k = rng.normal(size=(3, 3, ci, co))
        xb = jnp.asarray(x, jnp.bfloat16)
        kb = jnp.asarray(k, jnp.bfloat16)
        xi = jnp.asarray(np.clip(np.rint(x * 16), -127, 127), jnp.int8)
        ki = jnp.asarray(np.clip(np.rint(k * 16), -127, 127), jnp.int8)

        tb = bench(lambda a, b: conv(a, b, jnp.float32), xb, kb)
        ti = bench(lambda a, b: conv(a, b, jnp.int32), xi, ki)
        gflop = 2 * n * h * w_ * ci * co * 9 / 1e9
        print(f"[{n}x{h}x{w_}x{ci}->{co}] bf16 {tb:.3f} ms "
              f"({gflop / tb:.0f} GFLOP/ms-eq)  int8 {ti:.3f} ms  "
              f"ratio bf16/int8 = {tb / ti:.2f}", flush=True)

        # dynamic-quant overhead: max-abs scale + quantize on the fly
        def dynq(a, b):
            s = jnp.max(jnp.abs(a)) / 127.0
            q = jnp.clip(jnp.rint(a / s), -127, 127).astype(jnp.int8)
            y = conv(q, b, jnp.int32)
            return y.astype(jnp.float32) * s
        td = bench(dynq, xb.astype(jnp.float32), ki)
        print(f"    dynamic-quant int8 (incl. quantize): {td:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
