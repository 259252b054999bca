"""Fused masked multi-head attention as a Pallas TPU kernel (N3).

The radar-fusion cross attention is 900 queries × 1500 tokens × 8 heads of
32 dims with a per-(query, token) boolean mask (detr3d_head.py:549-579).
The XLA path (ops/attention.py) materializes [B, H, Q, T] logit and prob
tensors in HBM; this kernel keeps the whole K/V block and the mask tile in
VMEM and writes only the [Q, hd] outputs — one HBM pass over K/V per
(batch·head, q-tile) instead of four.

Sequences are small enough that full-row softmax fits VMEM, so no online
(flash) accumulation is needed: logits tile [128, T] fp32 ≈ 0.8 MB.

Numerics match ops/attention.multihead_attention (safe masked softmax:
fully-masked rows produce finite garbage that callers gate away).
Used on the inference path; training uses the XLA formulation (autodiff).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float(jnp.finfo(jnp.float32).min) / 2
Q_TILE = 128


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0]                       # [Qt, hd]
    k = k_ref[0]                       # [T, hd]
    v = v_ref[0]                       # [T, hd]
    mask = mask_ref[0]                 # [Qt, T] bool (True = visible)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) * scale
    logits = jnp.where(mask, logits, _NEG)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    o_ref[0] = o / s


def _pad_to(x, size, axis, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def masked_mha_pallas(q, k, v, params, num_heads: int, keep_mask,
                      interpret: bool = False):
    """Drop-in for ops.attention.multihead_attention with a keep-mask.

    Args:
      q: [B, Q, E]; k, v: [B, T, E]; keep_mask: [B, Q, T] bool
        (True = token visible).
    Returns:
      [B, Q, E].
    """
    b, nq, e = q.shape
    t = k.shape[1]
    hd = e // num_heads

    qh = (q @ params["wq"] + params["bq"]).astype(jnp.float32)
    kh = (k @ params["wk"] + params["bk"]).astype(jnp.float32)
    vh = (v @ params["wv"] + params["bv"]).astype(jnp.float32)

    def split(x, l):
        return x.reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3).reshape(
            b * num_heads, l, hd)

    qh, kh, vh = split(qh, nq), split(kh, t), split(vh, t)

    nq_pad = pl.cdiv(nq, Q_TILE) * Q_TILE
    t_pad = pl.cdiv(t, 128) * 128
    qh = _pad_to(qh, nq_pad, 1)
    kh = _pad_to(kh, t_pad, 1)
    vh = _pad_to(vh, t_pad, 1)
    mask = _pad_to(_pad_to(keep_mask, nq_pad, 1), t_pad, 2, value=False)

    grid = (b * num_heads, nq_pad // Q_TILE)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / (hd ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Q_TILE, hd), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, hd), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_TILE, t_pad),
                         lambda bh, qi: (bh // num_heads, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q_TILE, hd), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * num_heads, nq_pad, hd),
                                       jnp.float32),
        interpret=interpret,
    )(qh, kh, vh, mask)

    out = out[:, :nq].reshape(b, num_heads, nq, hd)
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, e).astype(q.dtype)
    return out @ params["wo"] + params["bo"]
