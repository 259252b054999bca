"""Tile-size sweep for the fused OSA tail kernel: amortize the per-grid-
step overhead (first A/B at T=2048 was a wash — scripts/bench_osa_pallas
results in docs/PERF_NOTES.md)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.pallas_osa import osa_reduce

ITERS = 20

CASES = [  # tag, piece channels, cout, spatial rows
    ("stage2", [128] * 6, 256, 6 * 232 * 400),
    ("stage3", [256] + [160] * 5, 512, 6 * 116 * 200),
    ("stage4", [768] + [192] * 5, 768, 6 * 58 * 100),
]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for tag, cs, cout, p_rows in CASES:
        pieces = [jnp.asarray(rng.normal(size=(p_rows, c)), jnp.bfloat16)
                  for c in cs]
        ws = [jnp.asarray(rng.normal(size=(c, cout)) * 0.05, jnp.bfloat16)
              for c in cs]
        scale = jnp.ones((cout,), jnp.float32)
        bias = jnp.zeros((cout,), jnp.float32)
        ideal = (sum(cs) * p_rows * 2 + cout * p_rows * 2) / 819e9 * 1e3
        for t in (2048, 4096, 8192, 16384):
            vmem = t * (sum(cs) * 2 * 2 + cout * 4 + cout * 2 * 2)
            if vmem > 100e6:
                continue

            def loop(p0, rest):
                def body(i, carry):
                    acc, x0 = carry
                    out = osa_reduce([x0] + rest, ws, scale, bias,
                                     rows_per_step=t)
                    return acc + jnp.sum(out[:, 0].astype(jnp.float32)), \
                        x0 + 1e-3
                acc, _ = jax.lax.fori_loop(
                    0, ITERS, body, (jnp.zeros(()), p0))
                return acc[None]

            fn = jax.jit(loop)
            try:
                float(fn(pieces[0], pieces[1:])[0])
                t0 = time.perf_counter()
                float(fn(pieces[0], pieces[1:])[0])
                ms = (time.perf_counter() - t0) / ITERS * 1e3
                print(f"{tag} T={t}: {ms:.2f} ms (BW ideal {ideal:.2f}, "
                      f"vmem {vmem / 1e6:.0f} MB)", flush=True)
            except Exception as e:
                print(f"{tag} T={t}: FAILED {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
