"""Bilinear point sampling from feature maps (the grid_sample replacement).

This is N1 of SURVEY.md §2.4 — the hot inner op of DETR3D.  The reference
calls ATen's CUDA ``F.grid_sample`` with its defaults, i.e. bilinear,
``padding_mode='zeros'``, ``align_corners=False``
(detr3d_transformer.py:417, detr3d_head.py:1058).  We reproduce those exact
semantics as a gather formulation that XLA lowers to row-gathers on an
``[H*W, C]`` layout (rows are the gathered axis; C stays minor and
contiguous, which is the TPU-friendly orientation).

``align_corners=False`` mapping: grid coord g ∈ [-1, 1] → pixel coordinate
``(g + 1) / 2 * S - 0.5``; out-of-range taps contribute zeros.

Autodiff works through the gathers, so the same code serves train and eval.
A fused Pallas variant can slot in behind the same signature later; this
formulation is already one fused XLA computation (no host round trips).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample_nhwc(feat: jnp.ndarray, uv01: jnp.ndarray) -> jnp.ndarray:
    """Sample points from one feature map with zero padding.

    Args:
      feat: [H, W, C] feature map.
      uv01: [P, 2] sample locations with (x, y) normalized to [0, 1] over the
        feature map extent (``uv01 = (grid + 1) / 2`` of torch grid coords).
    Returns:
      [P, C] bilinearly interpolated features; zero where all taps fall
      outside (grid_sample ``padding_mode='zeros'``).
    """
    h, w, c = feat.shape
    x = uv01[:, 0] * w - 0.5
    y = uv01[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(feat.dtype)
    ty = (y - y0).astype(feat.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = feat.reshape(h * w, c)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(flat, idx, axis=0)           # [P, C] row gather
        return vals * valid[:, None].astype(feat.dtype)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    w00 = ((1 - ty) * (1 - tx))[:, None]
    w01 = ((1 - ty) * tx)[:, None]
    w10 = (ty * (1 - tx))[:, None]
    w11 = (ty * tx)[:, None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def sample_multiview_multilevel(mlvl_feats, uv01: jnp.ndarray) -> jnp.ndarray:
    """Sample every query point in every camera at every FPN level.

    Parity: the grid_sample loop of feature_sampling
    (detr3d_transformer.py:412-421) — the *same* normalized image coordinate
    is reused across levels (normalization is by the padded input image
    size, not per-level size).

    Args:
      mlvl_feats: list of L arrays [B, N, H_l, W_l, C].
      uv01: [B, N, Q, 2] normalized (x, y) image coordinates in [0, 1].
    Returns:
      [B, Q, N, L, C] sampled features (zero where off-image).
    """
    b, n, q, _ = uv01.shape
    uv_flat = uv01.reshape(b * n, q, 2)
    per_level = []
    for feat in mlvl_feats:
        fb, fn, h, w, c = feat.shape
        feat_flat = feat.reshape(fb * fn, h, w, c)
        sampled = jax.vmap(bilinear_sample_nhwc)(feat_flat, uv_flat)
        per_level.append(sampled.reshape(b, n, q, c))
    stacked = jnp.stack(per_level, axis=-2)          # [B, N, Q, L, C]
    # decoder math always runs fp32: when the feature maps are STORED in
    # bf16 (BackboneConfig.head_input_dtype — an HBM-bandwidth lever, the
    # maps are the model's dominant byte streams) only the gather reads
    # are half-width; the [B,Q,N,L,C] sample is tiny
    return stacked.transpose(0, 2, 1, 3, 4).astype(jnp.float32)
