"""Fused OSA concat-reduce as a Pallas TPU kernel (inference path).

The VoVNet OSA block ends in ``concat([x0..x5]) -> 1x1 conv -> FrozenBN
-> ReLU -> eSE`` (reference _OSA_module.forward, vovnet.py:195-225).
XLA materializes the concatenated [N, H, W, sum(C_i)] tensor in HBM
(855 MB bf16 at stage-2 shapes x 6 cams) and the eSE global-average-pool
re-reads the full output.

This kernel never builds the concat: a 1x1 conv over a concat is
algebraically ``sum_i piece_i @ W_i`` (W split along its input axis), so
each grid step streams one row-tile of every piece through the MXU,
accumulates in fp32, applies the folded FrozenBN affine + ReLU, and
writes the [T, Cout] output tile — HBM traffic is one read of each piece
and one write of the output.  It also emits per-image channel sums of
the output (``with_sums``), so the eSE gate needs NO extra pass over the
feature map: mean = sums / (H*W), gate = hsigmoid(fc(mean)), and the
gating multiply fuses into the surrounding XLA elementwise ops.

Semantics oracle: models/common.py ConvBN(kernel=1) on the concat
(tests/test_pallas_osa.py).  Inference-only by design: training keeps
the autodiff-able XLA path (VoVNet is frozen in the TransCAR recipe,
tools/train.py:238-252).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, n_pieces, relu, hw, t):
    piece_refs = refs[:n_pieces]
    w_refs = refs[n_pieces:2 * n_pieces]
    sb_ref = refs[2 * n_pieces]
    o_ref = refs[2 * n_pieces + 1]
    sums_ref = refs[2 * n_pieces + 2]

    ci = pl.program_id(1)
    cout = o_ref.shape[-1]
    acc = jnp.zeros((t, cout), jnp.float32)
    for i in range(n_pieces):
        acc = acc + jax.lax.dot_general(
            piece_refs[i][0], w_refs[i][...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = acc * sb_ref[0:1, :] + sb_ref[1:2, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype)

    # per-image channel sums for the eSE global-average-pool; rows past
    # HW (the padded tail tile) are masked out
    @pl.when(ci == 0)
    def _init():
        sums_ref[...] = jnp.zeros(sums_ref.shape, sums_ref.dtype)

    rows = ci * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    masked = jnp.where(rows < hw, acc, 0.0)
    sums_ref[0, 0:1, :] += jnp.sum(masked, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("relu", "rows_per_step",
                                             "interpret"))
def osa_reduce(pieces, weights, scale, bias, relu: bool = True,
               rows_per_step: int = 2048,
               interpret: bool = False):
    """``relu((concat(pieces, -1) @ concat(weights, 0)) * scale + bias)``
    without materializing the concat, plus per-image channel sums of the
    result.

    Args:
      pieces: list of [N, H, W, C_i] arrays, same leading shape.
      weights: list of [C_i, Cout] matrices (the 1x1 conv kernel split
        along its input-channel axis).
      scale/bias: [Cout] folded FrozenBN affine (scale=1, bias=0 for a
        bare conv).
      relu: apply ReLU after the affine.
    Returns:
      ([N, H, W, Cout] output in the pieces' dtype,
       [N, Cout] fp32 per-image channel sums of the output).
    """
    n, h, w, _ = pieces[0].shape
    hw = h * w
    cout = weights[0].shape[-1]
    dtype = pieces[0].dtype
    flat = [p.reshape(n, hw, p.shape[-1]) for p in pieces]
    t = min(rows_per_step, max(8, hw))
    n_pieces = len(flat)

    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])

    grid = (n, pl.cdiv(hw, t))
    in_specs = (
        [pl.BlockSpec((1, t, p.shape[-1]), lambda ni, ci: (ni, ci, 0),
                      memory_space=pltpu.VMEM) for p in flat]
        + [pl.BlockSpec(w_.shape, lambda ni, ci: (0, 0),
                        memory_space=pltpu.VMEM) for w_ in weights]
        + [pl.BlockSpec((2, cout), lambda ni, ci: (0, 0),
                        memory_space=pltpu.VMEM)]
    )
    out, sums = pl.pallas_call(
        functools.partial(_kernel, n_pieces=n_pieces, relu=relu, hw=hw,
                          t=t),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, t, cout), lambda ni, ci: (ni, ci, 0),
                         memory_space=pltpu.VMEM),
            # revisited across ci — accumulates the per-image sums
            pl.BlockSpec((1, 8, cout), lambda ni, ci: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hw, cout), dtype),
            jax.ShapeDtypeStruct((n, 8, cout), jnp.float32),
        ],
        # stage-4 identity blocks peak ~27 MB at the default tile; leave
        # headroom for the surrounding XLA program (the DCN kernel's
        # 100 MB limit faulted the chip at bs2 — docs/PERF_NOTES.md)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(*(list(f.astype(dtype) for f in flat)
        + [w_.astype(dtype) for w_ in weights] + [sb]))
    return out.reshape(n, h, w, cout), sums[:, 0, :]
