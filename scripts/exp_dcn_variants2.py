"""Round 2 of DCN kernel ablations on real TPU.

  sep-bf16fix   : separable, dot acc fp32 then cast xr to bf16
  sep-rows2     : + 2 rows per grid step
  banded2-B24/32: direct 2D-assembled one-hot A [rows·9W, B·W] — no fat
                  intermediate, K=B·W gives high MXU utilization; x kept
                  resident as [H'·W, C] with 8-aligned dynamic sublane
                  slice of the band.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 30


# --------------------------- separable (bf16 xr) --------------------------

def _sep_kernel(x_ref, omp_ref, o_ref, *, hp, w, cin, band, rows):
    r0 = pl.program_id(1) * rows
    t = jnp.clip((r0 + (rows - 1) // 2 - band // 2 + 7) // 8, 0,
                 (hp - band) // 8)
    s8 = t * 8
    m = rows * w * 9

    omp = omp_ref[0, 0].astype(jnp.float32)
    dy, dx = omp[:, 0:1], omp[:, 1:2]
    mk = jax.nn.sigmoid(omp[:, 2:3])

    pp = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    rr = pp // (w * 9)
    kk = pp % 9
    qq = (pp // 9) % w
    py = (r0 + rr).astype(jnp.float32) + (kk // 3 - 1).astype(jnp.float32) \
        + dy
    px = qq.astype(jnp.float32) + (kk % 3 - 1).astype(jnp.float32) + dx
    y0f, x0f = jnp.floor(py), jnp.floor(px)
    fy, fx = py - y0f, px - x0f
    y0r = y0f.astype(jnp.int32) - s8
    x0 = x0f.astype(jnp.int32)

    jj = jax.lax.broadcasted_iota(jnp.int32, (m, w), 1)
    wx = (jnp.where(jj == x0, 1.0 - fx, 0.0)
          + jnp.where(jj == x0 + 1, fx, 0.0)) * mk
    bb = jax.lax.broadcasted_iota(jnp.int32, (m, band), 1)
    wy = (jnp.where(bb == y0r, 1.0 - fy, 0.0)
          + jnp.where(bb == y0r + 1, fy, 0.0)).astype(jnp.bfloat16)

    xband = x_ref[0, :, pl.ds(pl.multiple_of(s8 * cin, 8 * cin),
                              band * cin)]
    xr = jax.lax.dot_general(
        wx.astype(x_ref.dtype), xband,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    acc = jnp.zeros((m, cin), jnp.float32)
    for b in range(band):
        acc = acc + (wy[:, b:b + 1] * xr[:, b * cin:(b + 1) * cin]).astype(
            jnp.float32)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("band", "rows"))
def sep_sample(x, offset_mask, band=24, rows=1):
    n, h, w, cin = x.shape
    hp = max(-(-h // 8) * 8, band)
    hr = -(-h // rows) * rows
    xt = jnp.transpose(x, (0, 2, 1, 3))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    xt = xt.reshape(n, w, hp * cin)
    om = offset_mask.astype(jnp.float32)
    omp = jnp.stack([om[..., 0:18:2], om[..., 1:18:2], om[..., 18:27],
                     jnp.zeros_like(om[..., 18:27])], axis=-1)
    omp = omp.reshape(n, h, w * 9, 4)
    omp = jnp.pad(omp, ((0, 0), (0, hr - h), (0, 0), (0, 0)))
    omp = omp.reshape(n, hr // rows, rows * w * 9, 4)
    out = pl.pallas_call(
        functools.partial(_sep_kernel, hp=hp, w=w, cin=cin, band=band,
                          rows=rows),
        grid=(n, hr // rows),
        in_specs=[
            pl.BlockSpec((1, w, hp * cin), lambda ni, r: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows * 9 * w, 4),
                         lambda ni, r: (ni, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows * 9 * w, cin),
                               lambda ni, r: (ni, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hr // rows, rows * 9 * w, cin),
                                       x.dtype),
    )(xt, omp)
    return out.reshape(n, hr, w, 9 * cin)[:, :h]


# ------------------------------- banded2 ----------------------------------

def _b2_kernel(x_ref, omp_ref, o_ref, *, hp, w, cin, band, rows):
    r0 = pl.program_id(1) * rows
    t = jnp.clip((r0 + (rows - 1) // 2 - band // 2 + 7) // 8, 0,
                 (hp - band) // 8)
    s8 = t * 8
    m = rows * w * 9

    omp = omp_ref[0, 0].astype(jnp.float32)
    dy, dx = omp[:, 0:1], omp[:, 1:2]
    mk = jax.nn.sigmoid(omp[:, 2:3])

    pp = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    rr = pp // (w * 9)
    kk = pp % 9
    qq = (pp // 9) % w
    py = (r0 + rr).astype(jnp.float32) + (kk // 3 - 1).astype(jnp.float32) \
        + dy
    px = qq.astype(jnp.float32) + (kk % 3 - 1).astype(jnp.float32) + dx
    y0f, x0f = jnp.floor(py), jnp.floor(px)
    fy, fx = py - y0f, px - x0f
    y0r = y0f.astype(jnp.int32) - s8
    x0 = x0f.astype(jnp.int32)

    # per-tap corner weights with border masks folded in ([m, 1] columns)
    xv0 = ((x0 >= 0) & (x0 < w)).astype(jnp.float32)
    xv1 = ((x0 + 1 >= 0) & (x0 + 1 < w)).astype(jnp.float32)
    yv0 = ((y0r >= 0) & (y0r < band)).astype(jnp.float32)
    yv1 = ((y0r + 1 >= 0) & (y0r + 1 < band)).astype(jnp.float32)
    w00 = (1 - fy) * (1 - fx) * mk * yv0 * xv0
    w01 = (1 - fy) * fx * mk * yv0 * xv1
    w10 = fy * (1 - fx) * mk * yv1 * xv0
    w11 = fy * fx * mk * yv1 * xv1
    m0 = y0r * w + x0                                # flat band index

    mm = jax.lax.broadcasted_iota(jnp.int32, (m, band * w), 1)
    d = mm - m0
    a = (jnp.where(d == 0, w00, 0.0) + jnp.where(d == 1, w01, 0.0)
         + jnp.where(d == w, w10, 0.0) + jnp.where(d == w + 1, w11, 0.0))

    xband = x_ref[0, pl.ds(pl.multiple_of(s8 * w, 8 * w), band * w), :]
    o_ref[0, 0] = jax.lax.dot_general(
        a.astype(x_ref.dtype), xband,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("band", "rows"))
def b2_sample(x, offset_mask, band=24, rows=1):
    n, h, w, cin = x.shape
    hp = max(-(-h // 8) * 8, band)
    hr = -(-h // rows) * rows
    x2 = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    x2 = x2.reshape(n, hp * w, cin)
    om = offset_mask.astype(jnp.float32)
    omp = jnp.stack([om[..., 0:18:2], om[..., 1:18:2], om[..., 18:27],
                     jnp.zeros_like(om[..., 18:27])], axis=-1)
    omp = omp.reshape(n, h, w * 9, 4)
    omp = jnp.pad(omp, ((0, 0), (0, hr - h), (0, 0), (0, 0)))
    omp = omp.reshape(n, hr // rows, rows * w * 9, 4)
    out = pl.pallas_call(
        functools.partial(_b2_kernel, hp=hp, w=w, cin=cin, band=band,
                          rows=rows),
        grid=(n, hr // rows),
        in_specs=[
            pl.BlockSpec((1, hp * w, cin), lambda ni, r: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows * 9 * w, 4),
                         lambda ni, r: (ni, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows * 9 * w, cin),
                               lambda ni, r: (ni, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hr // rows, rows * 9 * w, cin),
                                       x.dtype),
    )(x2, omp)
    return out.reshape(n, hr, w, 9 * cin)[:, :h]


# --------------------------------- bench ----------------------------------

def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out[..., 0].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return dt, s


def bench(name, sampler, x, om, **kw):
    def loop(x, om):
        def body(i, carry):
            acc, xx = carry
            out = sampler(xx, om, **kw)
            return acc + jnp.sum(out[..., 0].astype(jnp.float32)), xx + 1e-6
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), x))
        return acc[None]
    fn = jax.jit(loop)
    try:
        timed(fn, x, om)
        dt, s = timed(fn, x, om)
        print(f"{name}: {dt / ITERS * 1e3:.2f} ms/block (sum {s:.1f})",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:250]}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    for tag, (n, h, w, c) in [("s3", (6, 58, 100, 256)),
                              ("s4", (6, 29, 50, 512))]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.bfloat16)
        om = jnp.asarray(rng.normal(size=(n, h, w, 27)) * 1.5, jnp.bfloat16)
        print(f"--- {tag} {n}x{h}x{w}x{c}", flush=True)
        bench(f"{tag} sep-bf16    ", sep_sample, x, om)
        bench(f"{tag} sep-bf16-r2 ", sep_sample, x, om, rows=2)
        bench(f"{tag} banded2-B24 ", b2_sample, x, om)
        bench(f"{tag} banded2-B32 ", b2_sample, x, om, band=32)
        bench(f"{tag} banded2-r2  ", b2_sample, x, om, rows=2)


if __name__ == "__main__":
    main()
