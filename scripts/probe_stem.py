"""Stem conv breakdown for VoVNet (3x3 s2 -> 3x3 -> 3x3 s2) and the R101
stem (7x7/64 s2), at 6x928x1600.  Which conv eats the ~10 ms?

Nop floor at these sizes is ~2.5-2.9 ms/iter (probe_vovnet_ops2.py) —
subtract it when reading.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.models.common import ConvBN

ITERS = 10


def timed_loop(apply_fn, params, x):
    def loop(params, x):
        def body(i, carry):
            acc, xx = carry
            out = apply_fn(params, xx)
            return acc + jnp.sum(out.astype(jnp.float32)), xx + 1e-3
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))
        return acc[None]

    fn = jax.jit(loop)
    t0 = time.perf_counter()
    float(fn(params, x)[0])
    cdt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(params, x)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3, cdt


class One(nn.Module):
    feat: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x):
        return ConvBN(self.feat, kernel=self.kernel, stride=self.stride,
                      padding=self.kernel // 2, dtype=jnp.bfloat16,
                      name="c")(x.astype(jnp.bfloat16))


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    cases = [
        ("stem1 3x3/64 s2 @928x1600x3", One(64, 3, 2),
         (6, 928, 1600, 3), jnp.float32),
        ("stem1 bf16-in", One(64, 3, 2), (6, 928, 1600, 3), jnp.bfloat16),
        ("stem2 3x3/64 @464x800x64", One(64, 3, 1),
         (6, 464, 800, 64), jnp.bfloat16),
        ("stem3 3x3/128 s2 @464x800x64", One(128, 3, 2),
         (6, 464, 800, 64), jnp.bfloat16),
        ("r101 stem 7x7/64 s2 @928x1600x3", One(64, 7, 2),
         (6, 928, 1600, 3), jnp.float32),
        ("stem2 wide 3x3/128 @464x800x128", One(128, 3, 1),
         (6, 464, 800, 128), jnp.bfloat16),
    ]
    for tag, mod, shape, dt in cases:
        x = jnp.asarray(rng.normal(size=shape), dt)
        p = mod.init(key, x)
        try:
            ms, cdt = timed_loop(lambda p, x, m=mod: m.apply(p, x), p, x)
            print(f"{tag}: {ms:.2f} ms (compile {cdt:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
