"""Does the fused-DCN per-row cost scale with the dot's K dimension?

onedot variant, rows=1, band in {6, 8, 14, 20}: K = band * W'.  If
ms/block tracks K, the kernel is dot/assembly-bound and a column-window
(|dx| banding) pays ~2.4x; if flat, the floor is elsewhere and the
formulation campaign stops here.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.pallas_dcn import fused_deform_conv

ITERS = 30


def main():
    print("devices:", jax.devices(), flush=True)
    for tag, (n, h, w, c) in [("s3", (6, 58, 100, 256)),
                              ("s4", (6, 29, 50, 512))]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.bfloat16)
        om = jnp.asarray(rng.normal(size=(n, h, w, 27)) * 0.5, jnp.bfloat16)
        wt = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)

        for band in (14, 8, 20):    # band 6 wedged the remote compiler
            def loop(x, om, band=band):
                def body(i, carry):
                    acc, xx = carry
                    out = fused_deform_conv(xx, om, wt, bias,
                                            band_rows=band,
                                            variant="onedot")
                    return acc + jnp.sum(
                        out[..., 0].astype(jnp.float32)), xx + 1e-6
                acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                           (jnp.zeros(()), x))
                return acc[None]

            fn = jax.jit(loop)
            t0 = time.perf_counter()
            float(jnp.sum(fn(x, om)))
            ct = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                s = float(jnp.sum(fn(x, om)))
                best = min(best, time.perf_counter() - t0)
            print(f"{tag} onedot B{band} (K={band * (-(-w // 8) * 8)}): "
                  f"{best / ITERS * 1e3:.2f} ms/block best-of-3 "
                  f"(compile {ct:.0f}s, sum {s:.1f})", flush=True)


if __name__ == "__main__":
    main()
