"""Probe round 3: transposed-A construction.

Aᵀ[b·W + j, p] built per band row at static SUBLANE offsets (no reshapes,
no lane-offset stores), contracted as dot_general(Aᵀ, xband) with lhs
contracting dim 0.  Offsets arrive pre-flattened p-major [N, H, 900].
Variants: full / fill-only / R∈{8,4,2}.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 30
N, H, W, C = 6, 58, 100, 256


def _kernel(x_ref, dy_ref, dx_ref, mk_ref, o_ref, at_ref, *, band, mode):
    r = pl.program_id(1)
    s = jnp.clip(r - (band - 1) // 2, 0, H - band)

    dy = dy_ref[0, 0]                                 # [1, 900] f32
    dx = dx_ref[0, 0]
    mk = jax.nn.sigmoid(mk_ref[0, 0])

    pp = jax.lax.broadcasted_iota(jnp.int32, (1, W * 9), 1)
    ky = (pp % 9) // 3 - 1
    kx = (pp % 9) % 3 - 1
    qq = pp // 9
    py = r.astype(jnp.float32) + ky.astype(jnp.float32) + dy
    px = qq.astype(jnp.float32) + kx.astype(jnp.float32) + dx
    y0f = jnp.floor(py)
    x0f = jnp.floor(px)
    fy = py - y0f                                     # [1, 900]
    fx = px - x0f
    y0r = y0f.astype(jnp.int32) - s
    x0 = x0f.astype(jnp.int32)

    jj = jax.lax.broadcasted_iota(jnp.int32, (W, W * 9), 0)
    wx = (jnp.where(jj == x0, 1.0 - fx, 0.0)
          + jnp.where(jj == x0 + 1, fx, 0.0)) * mk    # [W, 900]

    for b in range(band):
        wy = (jnp.where(y0r == b, 1.0 - fy, 0.0)
              + jnp.where(y0r == b - 1, fy, 0.0))     # [1, 900]
        at_ref[b * W:(b + 1) * W, :] = (wx * wy).astype(at_ref.dtype)

    if mode == "fill_only":
        o_ref[0, 0] = jnp.broadcast_to(
            at_ref[:1, :].reshape(W * 9, 1), (W * 9, C)).astype(o_ref.dtype)
        return
    xband = x_ref[0, pl.ds(s, band)].reshape(band * W, C)
    o_ref[0, 0] = jax.lax.dot_general(
        at_ref[:], xband,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def make(band, mode):
    def fn(x, dy, dx, mk):
        return pl.pallas_call(
            functools.partial(_kernel, band=band, mode=mode),
            grid=(N, H),
            in_specs=[
                pl.BlockSpec((1, H, W, C), lambda ni, r: (ni, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, W * 9),
                             lambda ni, r: (ni, r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, W * 9),
                             lambda ni, r: (ni, r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, W * 9),
                             lambda ni, r: (ni, r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 9 * W, C),
                                   lambda ni, r: (ni, r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, H, 9 * W, C), x.dtype),
            scratch_shapes=[pltpu.VMEM((band * W, 9 * W), x.dtype)],
        )(x, dy, dx, mk)

    @jax.jit
    def loop(x, dy, dx, mk):
        def body(i, carry):
            acc, xx = carry
            out = fn(xx, dy, dx, mk)
            return acc + jnp.sum(out[..., 0].astype(jnp.float32)), xx + 1e-6
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))
        return acc[None]

    return loop


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, H, W, C)), jnp.bfloat16)
    om = rng.normal(size=(N, H, W, 27)).astype(np.float32) * 1.5
    # p-major (q·9+k) flattened offsets
    dy = jnp.asarray(om[..., 0:18:2].reshape(N, H, 1, W * 9))
    dx = jnp.asarray(om[..., 1:18:2].reshape(N, H, 1, W * 9))
    mk = jnp.asarray(om[..., 18:27].reshape(N, H, 1, W * 9))

    for band, mode in ((21, "fill_only"), (21, "full"), (13, "full"),
                       (9, "full")):
        try:
            fn = make(band, mode)
            t0 = time.perf_counter()
            float(jnp.sum(fn(x, dy, dx, mk)))
            ct = time.perf_counter() - t0
            t0 = time.perf_counter()
            sm = float(jnp.sum(fn(x, dy, dx, mk)))
            dt = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"band={band} {mode}: {dt:.2f} ms/block "
                  f"(compile {ct:.0f}s, sum {sm:.1f})", flush=True)
        except Exception as e:
            print(f"band={band} {mode}: FAILED {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
