"""Round 4: kill the per-row grid-step overhead (~13 µs/step measured).

  nop-copy   : minimal per-row kernel (write zeros) — overhead floor probe
  fori-B12/16: grid=(n,) — ONE step per image, fori_loop over rows inside
               the kernel; out block [h, 9W, C] resident in VMEM
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 30


# ------------------------------ overhead probe -----------------------------

def _nop_kernel(x_ref, omp_ref, o_ref, **_):
    o_ref[0, 0] = (x_ref[0, :1, :256] * 0).reshape(1, 256) + jnp.float32(
        pl.program_id(1)).astype(o_ref.dtype)


@jax.jit
def nop(x, omp):
    n, h, w, cin = x.shape
    xt = x.reshape(n, h * w, cin)
    return pl.pallas_call(
        _nop_kernel,
        grid=(n, h),
        in_specs=[
            pl.BlockSpec((1, w, cin), lambda ni, r: (ni, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9 * w, 4), lambda ni, r: (ni, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, cin), lambda ni, r: (ni, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, cin), x.dtype),
    )(xt, omp)


# ------------------------- fori-over-rows kernel ---------------------------

def _fori_kernel(x_ref, omp_ref, o_ref, *, hp, h, w, cin, band):
    m = w * 9

    def row(r, _):
        s = jnp.clip(r - (band - 4) // 2 - 1, 0, hp - band)
        omp = omp_ref[0, r].astype(jnp.float32)
        dy, dx = omp[:, 0:1], omp[:, 1:2]
        mk = jax.nn.sigmoid(omp[:, 2:3])

        pp = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        kk = pp % 9
        qq = pp // 9
        py = r.astype(jnp.float32) + (kk // 3 - 1).astype(jnp.float32) + dy
        px = qq.astype(jnp.float32) + (kk % 3 - 1).astype(jnp.float32) + dx
        y0f, x0f = jnp.floor(py), jnp.floor(px)
        fy, fx = py - y0f, px - x0f
        y0r = y0f.astype(jnp.int32) - s
        x0 = x0f.astype(jnp.int32)

        jj = jax.lax.broadcasted_iota(jnp.int32, (m, w), 1)
        wx = (jnp.where(jj == x0, 1.0 - fx, 0.0)
              + jnp.where(jj == x0 + 1, fx, 0.0)) * mk
        bb = jax.lax.broadcasted_iota(jnp.int32, (m, band), 1)
        wy = (jnp.where(bb == y0r, 1.0 - fy, 0.0)
              + jnp.where(bb == y0r + 1, fy, 0.0))

        xband = x_ref[0, :, pl.ds(pl.multiple_of(s * cin, cin),
                                  band * cin)]
        xr = jax.lax.dot_general(
            wx.astype(x_ref.dtype), xband,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = jnp.zeros((m, cin), jnp.float32)
        for b in range(band):
            acc = acc + wy[:, b:b + 1] * xr[:, b * cin:(b + 1) * cin]
        o_ref[0, r] = acc.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h, row, 0)


@functools.partial(jax.jit, static_argnames=("band",))
def fori_sample(x, offset_mask, band=16):
    n, h, w, cin = x.shape
    hp = max(h, band)
    xt = jnp.transpose(x, (0, 2, 1, 3))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    xt = xt.reshape(n, w, hp * cin)
    om = offset_mask.astype(jnp.float32)
    omp = jnp.stack([om[..., 0:18:2], om[..., 1:18:2], om[..., 18:27],
                     jnp.zeros_like(om[..., 18:27])], axis=-1)
    omp = omp.reshape(n, h, w * 9, 4)
    out = pl.pallas_call(
        functools.partial(_fori_kernel, hp=hp, h=h, w=w, cin=cin,
                          band=band),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, w, hp * cin), lambda ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 9 * w, 4), lambda ni: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, 9 * w, cin), lambda ni: (ni, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, 9 * w, cin), x.dtype),
    )(xt, omp)
    return out.reshape(n, h, w, 9 * cin)


# --------------------------------- bench -----------------------------------

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
        omp = jnp.zeros((n, h, w * 9, 4), jnp.float32)
        print(f"--- {tag} {n}x{h}x{w}x{c}", flush=True)
        bench(f"{tag} nop-copy", lambda a, b: nop(a, omp), x, om)
        for b in (12, 16):
            bench(f"{tag} fori-B{b}", fori_sample, x, om, band=b)


if __name__ == "__main__":
    main()
