"""Modulated deformable convolution v2 (N2 of SURVEY.md §2.4).

The reference's ResNet-101 uses mmcv's DCNv2 CUDA extension in stages 3-4
(config detr3d_res101_gridmask.py:41-42).  Semantics reproduced here:

  * a regular conv (``conv_offset``) predicts 27 channels per output pixel:
    channels 0..17 are per-tap offsets with ch ``2k`` = Δy_k and ch ``2k+1``
    = Δx_k for tap k (mmcv's im2col layout after its chunk/cat shuffle — the
    channels pass through unchanged), channels 18..26 are the modulation
    mask, sigmoid-ed.
  * each output pixel bilinearly samples the input at
    ``(i·stride - pad + r·dil + Δy, j·stride - pad + c·dil + Δx)`` with zero
    padding outside (identical tap-wise zeroing to grid_sample 'zeros').
  * sampled taps × sigmoid(mask), then a 9·Cin → Cout contraction (one MXU
    matmul — the im2col matmul the CUDA kernel does, minus the im2col).

Coordinate math runs in float32 even when features are bfloat16: offsets are
sub-pixel and bf16 mantissa would visibly quantize them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def modulated_deform_conv(
    x: jnp.ndarray,
    offset_mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Single-image modulated deformable conv (vmap over batch).

    Args:
      x: [H, W, Cin] input feature map (NHWC slice).
      offset_mask: [Ho, Wo, 3·kh·kw] raw conv_offset output (pre-sigmoid
        mask), at output resolution.
      weight: [kh, kw, Cin, Cout].
      bias: optional [Cout].
    Returns:
      [Ho, Wo, Cout].
    """
    h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho, wo, _ = offset_mask.shape
    ntap = kh * kw

    om = offset_mask.astype(jnp.float32)
    offsets = om[..., : 2 * ntap].reshape(ho, wo, ntap, 2)   # (Δy, Δx) per tap
    mask = jax.nn.sigmoid(om[..., 2 * ntap:])                # [Ho, Wo, ntap]

    oy = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - padding
    ty = jnp.arange(kh, dtype=jnp.float32) * dilation
    tx = jnp.arange(kw, dtype=jnp.float32) * dilation
    tap_y = jnp.repeat(ty, kw)                               # [ntap]
    tap_x = jnp.tile(tx, kh)                                 # [ntap]
    py = oy[:, None, None] + tap_y[None, None, :] + offsets[..., 0]
    px = ox[None, :, None] + tap_x[None, None, :] + offsets[..., 1]

    # One 2×2×C window gather per sample point (4× fewer gathers than
    # tap-wise row gathers — measured ~1.5× faster on v5e).  Clamped window
    # starts + per-element weight matching preserve exact zero-padding
    # semantics at the borders.
    p = ho * wo * ntap
    y0 = jnp.floor(py).astype(jnp.int32).reshape(p)
    x0 = jnp.floor(px).astype(jnp.int32).reshape(p)
    ty_f = (py.reshape(p) - y0).astype(x.dtype)
    tx_f = (px.reshape(p) - x0).astype(x.dtype)
    y0c = jnp.clip(y0, 0, h - 2)
    x0c = jnp.clip(x0, 0, w - 2)
    starts = jnp.stack([y0c, x0c], axis=1)                   # [P, 2]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    win = jax.lax.gather(x, starts, dn, slice_sizes=(2, 2, cin),
                         mode=jax.lax.GatherScatterMode.CLIP)  # [P,2,2,C]

    def axis_w(c0, c_orig, frac, size2):
        # weight of window element i: row c0+i matches tap c_orig → 1-frac,
        # matches c_orig+1 → frac, else 0 (out-of-image taps vanish)
        rows = c0[:, None] + jnp.arange(size2)[None, :]
        return jnp.where(rows == c_orig[:, None], 1.0 - frac[:, None],
                         jnp.where(rows == c_orig[:, None] + 1,
                                   frac[:, None], 0.0))

    wy = axis_w(y0c, y0, ty_f, 2)                            # [P, 2]
    wx = axis_w(x0c, x0, tx_f, 2)                            # [P, 2]
    wgt = (wy[:, :, None] * wx[:, None, :]).astype(x.dtype)  # [P, 2, 2]
    sampled = jnp.einsum("pijc,pij->pc", win, wgt)
    sampled = sampled.reshape(ho, wo, ntap, cin)
    sampled = sampled * mask[..., None].astype(sampled.dtype)

    out = jax.lax.dot_general(
        sampled.reshape(ho * wo, ntap * cin),
        weight.reshape(ntap * cin, cout).astype(sampled.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    out = out.reshape(ho, wo, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
