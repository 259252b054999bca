"""R101 layer1 cost probe: 3 bottlenecks @232x400, planes 64 (C=64 is
the MXU half-lane case).  Decides whether a column-phase reformulation
is worth building.  Nop floor ~2.5-3 ms/iter."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.models.resnet import Bottleneck

ITERS = 10


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    cases = [
        ("layer1 b0 (ds)", Bottleneck(planes=64, stride=1,
                                      downsample=True),
         (6, 232, 400, 64)),
        ("layer1 b1", Bottleneck(planes=64), (6, 232, 400, 256)),
        ("layer2 b1 @116x200 p128", Bottleneck(planes=128),
         (6, 116, 200, 512)),
    ]
    for tag, mod, shape in cases:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        p = mod.init(key, x)

        def loop(p, x, m=mod):
            def body(i, carry):
                acc, xx = carry
                out = m.apply(p, xx)
                return acc + jnp.sum(out[..., 0].astype(jnp.float32)), \
                    xx + 1e-3
            acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                       (jnp.zeros(()), x))
            return acc[None]

        fn = jax.jit(loop)
        t0 = time.perf_counter()
        float(fn(p, x)[0])
        cdt = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(p, x)[0])
            best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
        print(f"{tag}: {best:.2f} ms (compile {cdt:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
