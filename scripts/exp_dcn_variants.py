"""Ablation probes for the separable DCN kernel on real TPU.

Variants (stage3 shapes, 6x58x100x256):
  sep-base      : shipped kernel (fp32 xr, 1 row/step)
  sep-bf16      : xr accumulated in bf16 (halves the fat intermediate)
  sep-rows2/4   : 2/4 output rows per grid step (amortize step overhead)
  abl-dot-only  : skip the y-reduction (upper bound of dot+assembly cost)
  abl-no-dot    : skip the MXU dot (assembly+reduce cost alone)
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 30


def _kernel(x_ref, omp_ref, o_ref, *, hp, w, cin, band, rows, xr_dtype,
            skip_reduce, skip_dot):
    r0 = pl.program_id(1) * rows
    t = jnp.clip((r0 + (rows - 1) // 2 - band // 2 + 7) // 8, 0,
                 (hp - band) // 8)
    s8 = t * 8

    omp = omp_ref[0, 0].astype(jnp.float32)          # [rows·9W, 4]
    dy, dx = omp[:, 0:1], omp[:, 1:2]
    mk = jax.nn.sigmoid(omp[:, 2:3])

    m = rows * w * 9
    pp = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    rr = pp // (w * 9)                               # row within the step
    kk = pp % 9
    qq = (pp // 9) % w
    ky = (kk // 3 - 1).astype(jnp.float32)
    kx = (kk % 3 - 1).astype(jnp.float32)

    py = (r0 + rr).astype(jnp.float32) + ky + dy
    px = qq.astype(jnp.float32) + kx + dx
    y0f = jnp.floor(py)
    x0f = jnp.floor(px)
    fy = py - y0f
    fx = px - x0f
    y0r = y0f.astype(jnp.int32) - s8
    x0 = x0f.astype(jnp.int32)

    jj = jax.lax.broadcasted_iota(jnp.int32, (m, w), 1)
    wx = (jnp.where(jj == x0, 1.0 - fx, 0.0)
          + jnp.where(jj == x0 + 1, fx, 0.0)) * mk

    bb = jax.lax.broadcasted_iota(jnp.int32, (m, band), 1)
    wy = (jnp.where(bb == y0r, 1.0 - fy, 0.0)
          + jnp.where(bb == y0r + 1, fy, 0.0))

    xband = x_ref[0, :, pl.ds(pl.multiple_of(s8 * cin, 8 * cin),
                              band * cin)]
    if skip_dot:
        acc = jnp.zeros((m, cin), jnp.float32)
        for b in range(band):
            acc = acc + wy[:, b:b + 1] * wx[:, 0:1]  # fake
        o_ref[0, 0] = (acc + jnp.sum(xband[0])).astype(o_ref.dtype)
        return
    xr = jax.lax.dot_general(
        wx.astype(x_ref.dtype), xband,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=xr_dtype)
    if skip_reduce:
        o_ref[0, 0] = (xr[:, :cin] * wy[:, 0:1]).astype(o_ref.dtype)
        return
    acc = jnp.zeros((m, cin), jnp.float32)
    for b in range(band):
        acc = acc + wy[:, b:b + 1] * xr[:, b * cin:(b + 1) * cin].astype(
            jnp.float32)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("band", "rows", "xr_bf16",
                                             "skip_reduce", "skip_dot"))
def sample(x, offset_mask, band=24, rows=1, xr_bf16=False,
           skip_reduce=False, skip_dot=False):
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
        functools.partial(
            _kernel, hp=hp, w=w, cin=cin, band=band, rows=rows,
            xr_dtype=jnp.bfloat16 if xr_bf16 else jnp.float32,
            skip_reduce=skip_reduce, skip_dot=skip_dot),
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


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out[..., 0].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return dt, s


def bench(name, x, om, **kw):
    def loop(x, om):
        def body(i, carry):
            acc, xx = carry
            out = sample(xx, om, **kw)
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
        print(f"{name}: FAILED {str(e)[:300]}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    n, h, w, c = 6, 58, 100, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.bfloat16)
    om = jnp.asarray(rng.normal(size=(n, h, w, 27)) * 1.5, jnp.bfloat16)
    bench("sep-base     ", x, om)
    bench("sep-bf16     ", x, om, xr_bf16=True)
    bench("sep-rows2    ", x, om, rows=2, xr_bf16=True)
    bench("sep-rows4-b32", x, om, rows=4, band=32, xr_bf16=True)
    bench("abl-dot-only ", x, om, skip_reduce=True)
    bench("abl-no-dot   ", x, om, skip_dot=True)


if __name__ == "__main__":
    main()
