"""DCN backward kernel on real TPU: band 14 vs band 24 at the flagship
stage-3/4 shapes.  Confirms the full-training auto-widened band (24)
compiles (the materialized [9W, B.C] design blew scoped VMEM and never
compiled) and times fwd+bwd via jax.grad.  In-jit loop protocol
(docs/PERF_NOTES.md): single-op dispatch floor is ~3-4 ms through the
axon relay, so the op runs under lax.fori_loop inside one jit.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.pallas_dcn import fused_deform_conv_ad

ITERS = 10


def bench(tag, n, h, w, cin, cout, band):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)), jnp.bfloat16)
    om = jnp.asarray(rng.standard_normal((n, h, w, 27)) * 0.5, jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                     jnp.bfloat16)

    def loss(x, om, wt):
        out = fused_deform_conv_ad(x, om, wt, band_rows=band)
        return jnp.sum(out.astype(jnp.float32))

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def loop(x, om, wt):
        def body(i, carry):
            x_, om_, wt_ = carry
            gx, gom, gwt = grad(x_, om_, wt_)
            # feed grads back in (bf16-cast) so iterations can't CSE
            return (x_ + 1e-6 * gx.astype(x_.dtype),
                    om_ + 1e-6 * gom,
                    wt_ + 1e-6 * gwt.astype(wt_.dtype))
        return jax.lax.fori_loop(0, ITERS, body, (x, om, wt))

    t0 = time.perf_counter()
    out = loop(x, om, wt)
    float(jnp.sum(out[1]))                       # hard sync through relay
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = loop(x, om, wt)
    float(jnp.sum(out[1]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag}: {dt * 1e3:.2f} ms/iter fwd+bwd "
          f"(compile {t_compile:.0f} s)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    # flagship 928x1600: stage3 = 58x100 c256->256 (x6 cams),
    # stage4 = 29x50 c512->512
    for band in (14, 24):
        bench(f"stage3 6x58x100 c256 band {band}", 6, 58, 100, 256, 256,
              band)
        bench(f"stage4 6x29x50  c512 band {band}", 6, 29, 50, 512, 512,
              band)


if __name__ == "__main__":
    main()
