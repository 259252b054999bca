"""Full-backbone A/B of per-stage OSA impl mixes (per-block numbers are
too noisy; the whole-backbone run is the ground truth)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.models.vovnet import VoVNet

ITERS = 10

MIXES = [
    ("all-xla", ("xla",) * 4),
    ("all-tail", ("pallas",) * 4),
    ("s2fused rest-tail", ("fused", "pallas", "pallas", "pallas")),
    ("s2+s3 fused", ("fused", "fused", "pallas", "pallas")),
    ("s3-xla mix", ("fused", "xla", "pallas", "pallas")),
    ("all-fused", ("fused", "fused", "fused", "fused")),
]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 928, 1600, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    p = VoVNet(stage_impls=("xla",) * 4).init(key, x)

    for tag, impls in MIXES:
        bb = VoVNet(stage_impls=impls)

        def loop(p, x, m=bb):
            def body(i, carry):
                acc, xx = carry
                out = m.apply(p, xx)[-1]
                return acc + jnp.sum(out.astype(jnp.float32)), xx + 1e-3
            acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                       (jnp.zeros(()), x))
            return acc[None]

        fn = jax.jit(loop)
        try:
            t0 = time.perf_counter()
            s = float(fn(p, x)[0])
            cdt = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(p, x)[0])
                best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
            print(f"{tag}: {best:.1f} ms (compile {cdt:.0f}s, "
                  f"sum {s:.1f})", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[:180]}", flush=True)


if __name__ == "__main__":
    main()
