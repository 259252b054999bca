"""Multi-head attention with additive boolean masking (N3 of SURVEY.md §2.4).

The reference uses ``nn.MultiheadAttention`` (cuDNN) for decoder self-attn
and the three radar-fusion cross-attn layers (detr3d_head.py:129,144,159,578).
Fully-masked query rows would produce NaNs there, so the reference gathers
the visible rows, attends, and scatters back (detr3d_head.py:573-581).

Here we instead run a *safe* masked softmax over the full static shape and
let callers gate the update with "row has ≥1 visible token" — numerically
identical (see tests/test_attention.py) and shape-static, which is what the
TPU wants.  Sequences are tiny (900×900 self-attn, 900×1500 cross-attn), so
a plain XLA formulation keeps everything in VMEM after fusion; a Pallas
flash kernel can slot behind the same signature for larger configs.

Weight convention: kernels are ``[in, out]`` (y = x @ W + b), i.e. the
transpose of torch's ``nn.Linear.weight``; the checkpoint converter handles
the transpose and the in_proj split.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min) / 2


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    params: dict,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Torch-semantics multi-head attention.

    Args:
      q: [B, Lq, E]; k, v: [B, Lk, E].
      params: dict with wq/wk/wv/wo kernels [E, E] and bq/bk/bv/bo biases [E].
      mask: optional bool [B, Lq, Lk] or [Lq, Lk]; True = POSITION IS MASKED
        (torch ``attn_mask`` bool convention).
      dropout_rate: attention-prob dropout (torch MHA applies it to the
        softmax probabilities).
    Returns:
      [B, Lq, E] attention output (out-projected).  Fully-masked rows return
      finite values (uniform attention over the masked logits); callers gate.
    """
    e = q.shape[-1]
    hd = e // num_heads
    qh = (q @ params["wq"] + params["bq"])
    kh = (k @ params["wk"] + params["bk"])
    vh = (v @ params["wv"] + params["bv"])

    def split(x):
        b, l, _ = x.shape
        return x.reshape(b, l, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(qh), split(kh), split(vh)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
        jnp.asarray(hd, dtype=qh.dtype))
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None]
        logits = jnp.where(mask[:, None, :, :], _NEG_INF, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    b, _, lq, _ = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, e)
    return out @ params["wo"] + params["bo"]


def masked_cross_attention(
    query: jnp.ndarray,
    tokens: jnp.ndarray,
    params: dict,
    num_heads: int,
    keep_mask: jnp.ndarray,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
):
    """Radar-fusion cross attention with an "any token visible" update gate.

    Replaces the reference's row gather/scatter around ``rf_multihead_attn``
    (detr3d_head.py:573-581): queries with no visible radar token keep their
    value; others receive the attention output.

    Args:
      query: [B, Q, E]; tokens: [B, T, E].
      keep_mask: bool [B, Q, T], True = token VISIBLE to query (note this is
        the inverse of the torch attn_mask convention).
    Returns:
      (attn_out, row_gate): attn_out [B, Q, E] zeroed on gated-off rows,
      row_gate [B, Q, 1] float 0/1.
    """
    attn = multihead_attention(
        query, tokens, tokens, params, num_heads,
        mask=~keep_mask, dropout_rate=dropout_rate,
        deterministic=deterministic, rng=rng)
    row_gate = jnp.any(keep_mask, axis=-1, keepdims=True).astype(query.dtype)
    return attn * row_gate, row_gate
