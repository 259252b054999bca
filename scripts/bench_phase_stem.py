"""A/B phase-form stems vs plain XLA stems at full scale on v5e.
Nop floor ~2.5-3 ms/iter at these sizes."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.models.common import ConvBN, bn_affine
from transcar_tpu.ops.phase_stem import (resnet_phase_stem,
                                         vovnet_phase_stem,
                                         _conv, _scatter_stem1)

ITERS = 10


def timed(make_fn, *args):
    fn = jax.jit(make_fn)
    t0 = time.perf_counter()
    float(fn(*args)[0])
    cdt = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args)[0])
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best, cdt


def loopify(body):
    def fn(x, *ws):
        def step(i, carry):
            acc, xx = carry
            out = body(xx, *ws)
            return acc + jnp.sum(out.astype(jnp.float32)), xx + 1e-3
        acc, _ = jax.lax.fori_loop(0, ITERS, step, (jnp.zeros(()), x))
        return acc[None]
    return fn


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 928, 1600, 3)), jnp.float32)

    # --- VoVNet stem ---
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 64)) * 0.2, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.2, jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(size=(3, 3, 64, 128)) * 0.2, jnp.bfloat16)
    aff = lambda c: (jnp.ones((c,), jnp.float32),
                     jnp.zeros((c,), jnp.float32))

    def plain(xx, w1, w2, w3):
        y = jnp.maximum(_conv(xx.astype(jnp.bfloat16), w1, 2,
                              [(1, 1)] * 2), 0.0)
        y = jnp.maximum(_conv(y, w2, 1, [(1, 1)] * 2), 0.0)
        return jnp.maximum(_conv(y, w3, 2, [(1, 1)] * 2), 0.0)

    ms, cdt = timed(loopify(plain), x, w1, w2, w3)
    print(f"vovnet stem plain: {ms:.2f} ms (compile {cdt:.0f}s)",
          flush=True)

    def phase(xx, w1, w2, w3):
        return vovnet_phase_stem(xx, w1, aff(64), w2, aff(64),
                                 w3, aff(128))

    ms, cdt = timed(loopify(phase), x, w1, w2, w3)
    print(f"vovnet stem phase: {ms:.2f} ms (compile {cdt:.0f}s)",
          flush=True)

    # phase stem1 alone (the C=3 conv may still ride XLA's slow path)
    def ph1(xx, w1):
        return _conv(xx.astype(jnp.bfloat16), _scatter_stem1(w1), 4,
                     [(1, 0), (1, 0)])

    ms, cdt = timed(loopify(ph1), x, w1)
    print(f"phase stem1 alone: {ms:.2f} ms (compile {cdt:.0f}s)",
          flush=True)

    # --- R101 stem ---
    wk = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.2, jnp.bfloat16)

    def plain_r(xx, wk):
        y = jnp.maximum(_conv(xx.astype(jnp.bfloat16), wk, 2,
                              [(3, 3)] * 2), 0.0)
        return nn.max_pool(y, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])

    ms, cdt = timed(loopify(plain_r), x, wk)
    print(f"r101 stem+pool plain: {ms:.2f} ms (compile {cdt:.0f}s)",
          flush=True)

    def phase_r(xx, wk):
        return resnet_phase_stem(xx, wk, aff(64))

    ms, cdt = timed(loopify(phase_r), x, wk)
    print(f"r101 stem+pool phase: {ms:.2f} ms (compile {cdt:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
