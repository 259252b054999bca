"""DCN grid-coarsening sweep: rows_per_step x band_rows, R101 block shapes.

Round-2 phase ablation found the fused kernel bound by a ~10 us
per-grid-step floor (docs/PERF_NOTES.md); rows_per_step>1 amortizes that
floor over multiple output rows.  Round-3 per-row pipeline: each row in a
chunk keeps its own band slice/dot, so exactness |dy| <= (band-4)/2 is
rows-independent (the round-2 shared-band m-expansion traded margin and
blew up xr VMEM - measured negative, PERF_NOTES).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.pallas_dcn import fused_deform_conv

ITERS = 30

SWEEP = [  # (variant, rows, band); exact margin = (band-4)/2 px, any rows
    ("banded", 1, 14),   # shipped default
    ("onedot", 1, 14),   # y-weights folded into the one-hot: no xr
    ("onedot", 2, 14),
    ("onedot", 4, 14),
    ("onedot", 8, 14),
    ("onedot", 4, 16),
]


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out))
    return time.perf_counter() - t0, s


def main():
    print("devices:", jax.devices(), flush=True)
    for tag, (n, h, w, c) in [("s3", (6, 58, 100, 256)),
                              ("s4", (6, 29, 50, 512))]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.bfloat16)
        om = jnp.asarray(rng.normal(size=(n, h, w, 27)) * 1.5, jnp.bfloat16)
        wt = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)

        for variant, rows, band in SWEEP:
            def loop_fused(x, om, variant=variant, rows=rows, band=band):
                def body(i, carry):
                    acc, xx = carry
                    out = fused_deform_conv(xx, om, wt, bias,
                                            band_rows=band,
                                            rows_per_step=rows,
                                            variant=variant)
                    return acc + jnp.sum(
                        out[..., 0].astype(jnp.float32)), xx + 1e-6
                acc, _ = jax.lax.fori_loop(0, ITERS, body,
                                           (jnp.zeros(()), x))
                return acc[None]

            fn = jax.jit(loop_fused)
            try:
                timed(fn, x, om)            # compile
                dt, s = timed(fn, x, om)
                margin = (band - 4) / 2
                print(f"{tag} {variant}-rows{rows}-B{band} "
                      f"(|dy|<={margin:.1f}px): "
                      f"{dt / ITERS * 1e3:.2f} ms/block (sum {s:.1f})",
                      flush=True)
            except Exception as e:
                print(f"{tag} {variant}-rows{rows}-B{band}: "
                      f"FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
