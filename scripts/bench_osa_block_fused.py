"""A/B the whole-block fused OSA kernel (chunked) vs the XLA path and
the tail-only kernel, all VoVNet stage shapes on v5e.  Nop floor is
~2.5 ms/iter at these sizes."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.models.vovnet import OSABlock
from transcar_tpu.ops.pallas_osa_block import osa_block_fused

ITERS = 10


def timed(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args)[0])
    cdt = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args)[0])
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best, cdt


CASES = [  # tag, c0, ch, cr, shape, rows_per_chunk
    ("stage2 blk0", 128, 128, 256, (6, 232, 400, 128), 29),
    ("stage3 blk0", 256, 160, 512, (6, 116, 200, 256), 29),
    ("stage3 blk+id", 512, 160, 512, (6, 116, 200, 512), 29),
    ("stage4 blk0", 512, 192, 768, (6, 58, 100, 512), None),
    ("stage4 blk+id", 768, 192, 768, (6, 58, 100, 768), 29),
    ("stage5 blk0", 768, 224, 1024, (6, 29, 50, 768), None),
    ("stage5 blk+id", 1024, 224, 1024, (6, 29, 50, 1024), None),
]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for tag, c0, ch, cr, shape, rpc in CASES:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        conv_ws, conv_affs = [], []
        cin = c0
        for _ in range(5):
            conv_ws.append(jnp.asarray(
                rng.normal(size=(3, 3, cin, ch)) * 0.05, jnp.bfloat16))
            conv_affs.append(
                (jnp.asarray(rng.uniform(0.5, 1.5, ch), jnp.float32),
                 jnp.asarray(rng.normal(size=ch) * 0.1, jnp.float32)))
            cin = ch
        red_ws = [jnp.asarray(rng.normal(size=(c, cr)) * 0.05,
                              jnp.bfloat16) for c in [c0] + [ch] * 5]
        raff = (jnp.asarray(rng.uniform(0.5, 1.5, cr), jnp.float32),
                jnp.asarray(rng.normal(size=cr) * 0.1, jnp.float32))

        def loop_fused(x):
            def body(i, carry):
                acc, xx = carry
                out, sums = osa_block_fused(xx, conv_ws, conv_affs,
                                            red_ws, raff,
                                            rows_per_chunk=rpc)
                return acc + jnp.sum(sums[:, 0]).astype(jnp.float32), \
                    xx + 1e-3
            acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                       (jnp.zeros(()), x))
            return acc[None]

        try:
            ms, cdt = timed(jax.jit(loop_fused), x)
            print(f"{tag} [fused r={rpc}]: {ms:.2f} ms "
                  f"(compile {cdt:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tag} [fused r={rpc}]: FAILED {str(e)[:180]}",
                  flush=True)

        ident = c0 == cr
        for impl in ("xla", "pallas"):
            mod = OSABlock(ch, cr, 5, identity=ident, reduce_impl=impl)
            p = mod.init(jax.random.PRNGKey(0), x)

            def loop_mod(p, x, m=mod):
                def body(i, carry):
                    acc, xx = carry
                    out = m.apply(p, xx)
                    return acc + jnp.sum(
                        out[..., 0].astype(jnp.float32)), xx + 1e-3
                acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                           (jnp.zeros(()), x))
                return acc[None]

            try:
                ms, cdt = timed(jax.jit(loop_mod), p, x)
                print(f"{tag} [{impl}]: {ms:.2f} ms (compile {cdt:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"{tag} [{impl}]: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
