"""Probe round 2: split the 12 ms A-assembly cost.

  store_const — 21 stores of a precomputed [900,100] tile (store cost only)
  fill3d      — build in 3D scratch [W, 9, B·W] (no per-b reshape),
                single reshape [W,9,BW]→[900,BW] at the dot
  fill3d_only — fill3d without the dot/reshape (isolate 3D-store cost)
  mult_only   — per-b wx·wy multiplies, result consumed via sum (no
                stores, no reshape): pure VPU construction cost
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
R = 8
BAND = 2 * R + 5


def _prep(dy_ref, dx_ref, mk_ref, r, s):
    dy = dy_ref[0, 0, :, :9].astype(jnp.float32)
    dx = dx_ref[0, 0, :, :9].astype(jnp.float32)
    mk = jax.nn.sigmoid(mk_ref[0, 0, :, :9].astype(jnp.float32))
    ky = (jax.lax.broadcasted_iota(jnp.int32, (W, 9), 1) // 3 - 1)
    kx = (jax.lax.broadcasted_iota(jnp.int32, (W, 9), 1) % 3 - 1)
    qq = jax.lax.broadcasted_iota(jnp.int32, (W, 9), 0)
    py = r.astype(jnp.float32) + ky.astype(jnp.float32) + dy
    px = qq.astype(jnp.float32) + kx.astype(jnp.float32) + dx
    y0f = jnp.floor(py)
    x0f = jnp.floor(px)
    fy = py - y0f
    fx = px - x0f
    y0r = y0f.astype(jnp.int32) - s
    x0 = x0f.astype(jnp.int32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (W, 9, W), 2)
    wx = (jnp.where(jj == x0[:, :, None], 1.0 - fx[:, :, None], 0.0)
          + jnp.where(jj == x0[:, :, None] + 1, fx[:, :, None], 0.0))
    return wx * mk[:, :, None], y0r, fy


def _kernel(x_ref, dy_ref, dx_ref, mk_ref, o_ref, a_ref, a3_ref, *, mode):
    r = pl.program_id(1)
    s = jnp.clip(r - (BAND - 1) // 2, 0, H - BAND)

    if mode == "store_const":
        tile = (dy_ref[0, 0, :, :1] * jnp.ones((W, W * 9), jnp.float32)
                ).T.astype(a_ref.dtype)[:, :W]
        for b in range(BAND):
            a_ref[:, b * W:(b + 1) * W] = tile
        xband = x_ref[0, pl.ds(s, BAND)].reshape(BAND * W, C)
        o_ref[0, 0] = jax.lax.dot_general(
            a_ref[:], xband, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return

    wx, y0r, fy = _prep(dy_ref, dx_ref, mk_ref, r, s)

    if mode == "mult_only":
        acc = jnp.zeros((W, 9), jnp.float32)
        for b in range(BAND):
            wy = (jnp.where(y0r == b, 1.0 - fy, 0.0)
                  + jnp.where(y0r == b - 1, fy, 0.0))
            acc = acc + jnp.sum(wx * wy[:, :, None], axis=2)
        o_ref[0, 0] = jnp.broadcast_to(
            acc.reshape(W * 9, 1), (W * 9, C)).astype(o_ref.dtype)
        return

    for b in range(BAND):
        wy = (jnp.where(y0r == b, 1.0 - fy, 0.0)
              + jnp.where(y0r == b - 1, fy, 0.0))
        a3_ref[:, :, b * W:(b + 1) * W] = (
            wx * wy[:, :, None]).astype(a3_ref.dtype)
    if mode == "fill3d_only":
        o_ref[0, 0] = jnp.broadcast_to(
            a3_ref[:, :, :1].reshape(W * 9, 1), (W * 9, C)
        ).astype(o_ref.dtype)
        return
    a = a3_ref[:].reshape(W * 9, BAND * W)
    xband = x_ref[0, pl.ds(s, BAND)].reshape(BAND * W, C)
    o_ref[0, 0] = jax.lax.dot_general(
        a, xband, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def make(mode):
    def fn(x, dy, dx, mk):
        return pl.pallas_call(
            functools.partial(_kernel, mode=mode),
            grid=(N, H),
            in_specs=[
                pl.BlockSpec((1, H, W, C), lambda ni, r: (ni, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W, 16), lambda ni, r: (ni, r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W, 16), lambda ni, r: (ni, r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W, 16), lambda ni, r: (ni, r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 9 * W, C),
                                   lambda ni, r: (ni, r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, H, 9 * W, C), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((9 * W, BAND * W), x.dtype),
                pltpu.VMEM((W, 9, BAND * W), x.dtype),
            ],
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
    pad9 = ((0, 0), (0, 0), (0, 0), (0, 7))
    dy = jnp.asarray(np.pad(om[..., 0:18:2], pad9))
    dx = jnp.asarray(np.pad(om[..., 1:18:2], pad9))
    mk = jnp.asarray(np.pad(om[..., 18:27], pad9))

    for mode in ("mult_only", "fill3d_only", "fill3d", "store_const"):
        try:
            fn = make(mode)
            t0 = time.perf_counter()
            float(jnp.sum(fn(x, dy, dx, mk)))
            compile_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            s = float(jnp.sum(fn(x, dy, dx, mk)))
            dt = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"{mode}: {dt:.2f} ms/block (compile {compile_t:.0f}s, "
                  f"sum {s:.1f})", flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
