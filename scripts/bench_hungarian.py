"""On-device Hungarian timing: early-termination solver (round 3) at
realistic vs worst-case num_gt.  Protocol: one train sample's 3 fusion
layers = vmapped 3 x [900 queries x 128 gt slots] solves, in-jit fori loop
(docs/PERF_NOTES.md: single-op dispatch floor is ~3-4 ms through axon)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.hungarian import hungarian_match

ITERS = 20


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cost = jnp.asarray(rng.normal(size=(3, 900, 128)) * 5, jnp.float32)

    for tag, n in [("num_gt=8 (sparse scene)", 8),
                   ("num_gt=32 (typical nuScenes)", 32),
                   ("num_gt=128 (worst case = old fori bound)", 128)]:
        ngt = jnp.full((3,), n, jnp.int32)

        def loop(cost, ngt):
            def body(i, carry):
                acc, cc = carry
                matched, valid = jax.vmap(hungarian_match)(cc, ngt)
                return acc + jnp.sum(jnp.where(valid, matched, 0)), \
                    cc + 1e-4
            acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                       (jnp.zeros((), jnp.int32), cost))
            return acc[None]

        fn = jax.jit(loop)
        t0 = time.perf_counter()
        s = int(fn(cost, ngt)[0])
        compile_dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = int(fn(cost, ngt)[0])
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt / ITERS * 1e3:.2f} ms per 3-layer solve "
              f"(compile {compile_dt:.0f}s, checksum {s})", flush=True)


if __name__ == "__main__":
    main()
