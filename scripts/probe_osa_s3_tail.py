"""Stage-3 OSA tail attack probe (v5e, in-jit loop).

The fused tail kernel (ops/pallas_osa.py) wins at stage2/4/5 but
REGRESSED ~+0.5 ms/block at stage3 (ch 160) and was left on XLA
(docs/PERF_NOTES.md mix table).  Hypothesis: per-piece dots pay
ceil(C_i/128) K-passes each — at C_i=160 that is 2 passes (2nd 25%
full) x 5 pieces + ceil(C0/128) for x0 = 14 passes vs XLA's
ceil(1056/128) = 9 on the materialized concat; the kernel trades HBM
concat traffic for 55% more MXU passes and loses.

Variant here: in-kernel concat into a VMEM scratch at STATIC lane
offsets (160-aligned, NOT 128-aligned — the thing to measure), then ONE
dot [t, Ktot] x [Ktot, Cout] with the same K-pass count as XLA but no
HBM concat.  Measures, at s3 block shapes (6 cams, 116x200):

  a) chained 3x3 160-ch convs (marginal cost per conv),
  b) XLA tail: concat -> 1x1 -> affine -> ReLU -> eSE sums,
  c) shipped osa_reduce kernel,
  d) onedot scratch-concat kernel (local to this probe).

Run AFTER any other TPU job finishes (one TPU process at a time).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transcar_tpu.ops.pallas_osa import osa_reduce

ITERS = 20
N, H, W = 6, 116, 200
CH, COUT = 160, 512


def _onedot_kernel(*refs, n_pieces, offs, relu, hw, t):
    piece_refs = refs[:n_pieces]
    w_ref = refs[n_pieces]
    sb_ref = refs[n_pieces + 1]
    o_ref = refs[n_pieces + 2]
    sums_ref = refs[n_pieces + 3]
    scratch = refs[n_pieces + 4]

    ci = pl.program_id(1)
    for i in range(n_pieces):
        ci_w = piece_refs[i].shape[-1]
        scratch[:, offs[i]:offs[i] + ci_w] = piece_refs[i][0]
    acc = jax.lax.dot_general(
        scratch[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc * sb_ref[0:1, :] + sb_ref[1:2, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype)

    @pl.when(ci == 0)
    def _init():
        sums_ref[...] = jnp.zeros(sums_ref.shape, sums_ref.dtype)

    rows = ci * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    masked = jnp.where(rows < hw, acc, 0.0)
    sums_ref[0, 0:1, :] += jnp.sum(masked, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("relu", "t"))
def osa_reduce_onedot(pieces, wcat, scale, bias, relu=True, t=2048):
    n, h, w, _ = pieces[0].shape
    hw = h * w
    cout = wcat.shape[-1]
    dtype = pieces[0].dtype
    flat = [p.reshape(n, hw, p.shape[-1]) for p in pieces]
    offs, o = [], 0
    for p in flat:
        offs.append(o)
        o += p.shape[-1]
    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])
    grid = (n, pl.cdiv(hw, t))
    in_specs = (
        [pl.BlockSpec((1, t, p.shape[-1]), lambda ni, ci: (ni, ci, 0),
                      memory_space=pltpu.VMEM) for p in flat]
        + [pl.BlockSpec(wcat.shape, lambda ni, ci: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((2, cout), lambda ni, ci: (0, 0),
                        memory_space=pltpu.VMEM)])
    out, sums = pl.pallas_call(
        functools.partial(_onedot_kernel, n_pieces=len(flat),
                          offs=tuple(offs), relu=relu, hw=hw, t=t),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, t, cout), lambda ni, ci: (ni, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cout), lambda ni, ci: (ni, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n, hw, cout), dtype),
                   jax.ShapeDtypeStruct((n, 8, cout), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((t, o), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(*(list(f.astype(dtype) for f in flat) + [wcat.astype(dtype), sb]))
    return out.reshape(n, h, w, cout), sums[:, 0, :]


def bench(fn, *args, tag=""):
    """In-jit fori_loop timing; perturb an input each iter to defeat CSE."""
    def loop(*a):
        def body(i, carry):
            acc, a0 = carry
            out = fn(a0, *a[1:])
            lead = out[0] if isinstance(out, (tuple, list)) else out
            return acc + jnp.sum(lead.astype(jnp.float32)), a0 + 1e-3
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.zeros(()), a[0]))
        return acc[None]

    jl = jax.jit(loop)
    try:
        t0 = time.perf_counter()
        s = float(jl(*args)[0])
        cdt = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jl(*args)[0])
            best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
        print(f"{tag}: {best:.2f} ms (compile {cdt:.0f}s, sum {s:.1f})",
              flush=True)
        return best
    except Exception as e:
        print(f"{tag}: FAILED {str(e)[:200]}", flush=True)
        return None


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for c0 in (512, 256):
        pieces = [jnp.asarray(rng.normal(size=(N, H, W, c)), jnp.bfloat16)
                  for c in [c0] + [CH] * 5]
        ktot = c0 + 5 * CH
        ws = [jnp.asarray(rng.normal(size=(p.shape[-1], COUT)) * 0.02,
                          jnp.bfloat16) for p in pieces]
        wcat = jnp.concatenate([w.astype(jnp.float32) for w in ws],
                               0).astype(jnp.bfloat16)
        scale = jnp.asarray(rng.normal(size=(COUT,)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(COUT,)), jnp.float32)
        fc_w = jnp.asarray(rng.normal(size=(COUT, COUT)) * 0.02,
                           jnp.bfloat16)

        print(f"--- C0={c0} Ktot={ktot} ---", flush=True)

        def xla_tail(p0, *rest):
            cat = jnp.concatenate((p0,) + rest, -1)
            y = jnp.einsum("nhwk,kc->nhwc", cat, wcat,
                           preferred_element_type=jnp.float32)
            y = jnp.maximum(y * scale + bias, 0.0).astype(jnp.bfloat16)
            mean = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
            gate = jax.nn.hard_sigmoid(mean @ fc_w.astype(jnp.float32))
            return y * gate[:, None, None, :].astype(y.dtype)

        def kern_tail(p0, *rest):
            y, sums = osa_reduce(list((p0,) + rest), ws, scale, bias)
            mean = sums / (H * W)
            gate = jax.nn.hard_sigmoid(mean @ fc_w.astype(jnp.float32))
            return y * gate[:, None, None, :].astype(y.dtype)

        def onedot_tail(p0, *rest):
            y, sums = osa_reduce_onedot(list((p0,) + rest), wcat, scale,
                                        bias)
            mean = sums / (H * W)
            gate = jax.nn.hard_sigmoid(mean @ fc_w.astype(jnp.float32))
            return y * gate[:, None, None, :].astype(y.dtype)

        # numeric sanity: onedot == shipped kernel (same math)
        try:
            a = np.asarray(kern_tail(*pieces), np.float32)
            b = np.asarray(onedot_tail(*pieces), np.float32)
            err = np.max(np.abs(a - b))
            print(f"onedot vs kernel max|d|: {err:.4f}", flush=True)
        except Exception as e:
            print(f"onedot sanity FAILED {str(e)[:200]}", flush=True)

        bench(xla_tail, *pieces, tag="xla tail")
        bench(kern_tail, *pieces, tag="shipped kernel tail")
        bench(onedot_tail, *pieces, tag="onedot kernel tail")

    # chained conv marginal at s3 shapes: 3 vs 6 chained 3x3 convs
    x = jnp.asarray(rng.normal(size=(N, H, W, CH)), jnp.bfloat16)
    wc = jnp.asarray(rng.normal(size=(3, 3, CH, CH)) * 0.02, jnp.bfloat16)

    def chain(n_convs):
        def f(x):
            y = x
            for _ in range(n_convs):
                y = jax.lax.conv_general_dilated(
                    y, wc, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = jnp.maximum(y, 0.0)
            return y
        return f

    t3 = bench(chain(3), x, tag="3x chained conv160")
    t6 = bench(chain(6), x, tag="6x chained conv160")
    if t3 and t6:
        print(f"marginal conv160 @116x200x6: {(t6 - t3) / 3:.2f} ms "
              f"(ideal bf16 ~0.33)", flush=True)


if __name__ == "__main__":
    main()
