"""Fused DCNv2 sampling as a Pallas TPU kernel — banded one-hot matmul.

Replaces the round-1 shift-select kernel (slower than XLA; culled per its
own perf notes).  The insight: XLA's gather unit plateaus at ~7-8 ms for
the stage-3 deformable gather (docs/PERF_NOTES.md) while the MXU sits
idle — so reformulate the gather *as* a matmul.  For one output row r of
one image, every bilinear source pixel of every tap lies in a narrow row
band around r (offsets are small in trained DCNs); collecting the band
B×W×C in VMEM, the whole sample-and-modulate step for the row becomes

    sampled[p, c] = Σ_b Σ_j  A_b[p, j] · xband[b, j, c]
    A_b[p, j]     = wy_b[p] · wx[p, j] · σ(mask[p])          p = q·9 + k

with wy/wx the one-hot bilinear row/column weights.  A_b is built on the
VPU in VMEM and immediately consumed by a [9W, W]×[W, C] MXU matmul per
band row — nothing but the [9W, C] sampled block ever goes back to HBM.
The 9C→C im2col contraction then runs as one big XLA matmul outside.

Semantics (vs ops/dcn.modulated_deform_conv, i.e. mmcv DCNv2 with
stride 1 / pad 1 / dilation 1 — the ResNet stage-3/4 case,
detr3d_res101_gridmask.py:41-42):
  * exact — including zero-padding at image borders, which the band
    one-hot reproduces for free — whenever every vertical offset
    satisfies |Δy| ≤ band_radius.  Horizontal offsets are NEVER
    approximated (the one-hot spans the full row width).
  * taps whose vertical sample falls outside the row band contribute
    zero, exactly as if they sampled outside the image.
  * when the band covers the whole image (H ≤ 2·band_radius+5) the
    kernel is exact for all offsets.

Forward-only by design: the flagship freezes the backbone (TransCAR
trains only fusion layers, tools/train.py:238-252); full-backbone
training uses the exact XLA path for autodiff.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, dy_ref, dx_ref, mk_ref, o_ref, a_ref, *, h, w, cin,
            band):
    """One (image, output row) grid step.

    x_ref:  [1, H, W, Cin]  full image (block revisited across rows)
    dy/dx/mk_ref: [1, 1, W, 16] per-tap offset rows (9 used, lane-padded)
    o_ref:  [1, 1, 9·W, Cin] sampled·mask output, p = q·9 + k
    a_ref:  [9·W, band·W] scratch — the assembled band weight matrix

    One MXU dot per grid step: v1 of this kernel issued `band` small
    [9W, W] dots per row and drowned in per-dot launch overhead
    (~2 µs × 21 × 348 ≈ the entire 15 ms it measured, docs/PERF_NOTES.md);
    assembling A in VMEM first and contracting [9W, band·W] × [band·W, C]
    in one shot removes 20/21 of that overhead and of the accumulator
    read-modify-write traffic.
    """
    r = pl.program_id(1)
    s = jnp.clip(r - (band - 1) // 2, 0, h - band)   # band start row

    dy = dy_ref[0, 0, :, :9].astype(jnp.float32)     # [W, 9]
    dx = dx_ref[0, 0, :, :9].astype(jnp.float32)
    mk = jax.nn.sigmoid(mk_ref[0, 0, :, :9].astype(jnp.float32))

    ky = (jax.lax.broadcasted_iota(jnp.int32, (w, 9), 1) // 3 - 1)
    kx = (jax.lax.broadcasted_iota(jnp.int32, (w, 9), 1) % 3 - 1)
    qq = jax.lax.broadcasted_iota(jnp.int32, (w, 9), 0)

    py = r.astype(jnp.float32) + ky.astype(jnp.float32) + dy
    px = qq.astype(jnp.float32) + kx.astype(jnp.float32) + dx
    y0f = jnp.floor(py)
    x0f = jnp.floor(px)
    fy = py - y0f                                    # [W, 9]
    fx = px - x0f
    y0r = y0f.astype(jnp.int32) - s                  # band-relative
    x0 = x0f.astype(jnp.int32)

    # column one-hot bilinear weights with modulation folded in:
    # wx[q, k, j] — exact zero-padding in x falls out of the one-hot
    jj = jax.lax.broadcasted_iota(jnp.int32, (w, 9, w), 2)
    wx = (jnp.where(jj == x0[:, :, None], 1.0 - fx[:, :, None], 0.0)
          + jnp.where(jj == x0[:, :, None] + 1, fx[:, :, None], 0.0))
    wx = wx * mk[:, :, None]                         # [W, 9, W]

    # static unroll (band ≤ ~31): Mosaic requires lane-store offsets to be
    # static (a fori_loop store at pl.ds(b·w) fails to prove alignment)
    for b in range(band):
        wy = (jnp.where(y0r == b, 1.0 - fy, 0.0)
              + jnp.where(y0r == b - 1, fy, 0.0))    # [W, 9]
        a_ref[:, b * w:(b + 1) * w] = (
            wx * wy[:, :, None]).reshape(w * 9, w).astype(a_ref.dtype)
    xband = x_ref[0, pl.ds(s, band)].reshape(band * w, cin)
    o_ref[0, 0] = jax.lax.dot_general(
        a_ref[:], xband,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("band_radius", "interpret"))
def banded_deform_sample(x: jnp.ndarray, offset_mask: jnp.ndarray,
                         band_radius: int = 8,
                         interpret: bool = False) -> jnp.ndarray:
    """Deformable bilinear sampling × sigmoid(mask) for all 9 taps.

    Args:
      x: [N, H, W, Cin]; offset_mask: [N, H, W, 27] raw conv_offset output
        (mmcv layout: ch 2k = Δy_k, 2k+1 = Δx_k, 18+k = mask_k).
    Returns:
      [N, H, W, 9·Cin] sampled taps (tap-major per pixel), x.dtype.
    """
    n, h, w, cin = x.shape
    band = min(2 * band_radius + 5, h)

    om = offset_mask.astype(jnp.float32)
    dy = om[..., 0:18:2]                             # [N, H, W, 9]
    dx = om[..., 1:18:2]
    mk = om[..., 18:27]
    pad9 = ((0, 0), (0, 0), (0, 0), (0, 7))          # lane-pad 9 → 16
    dy, dx, mk = (jnp.pad(a, pad9) for a in (dy, dx, mk))

    sampled = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, cin=cin, band=band),
        grid=(n, h),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda ni, r: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, 16), lambda ni, r: (ni, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, 16), lambda ni, r: (ni, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, 16), lambda ni, r: (ni, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 9 * w, cin),
                               lambda ni, r: (ni, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, 9 * w, cin), x.dtype),
        scratch_shapes=[pltpu.VMEM((9 * w, band * w), x.dtype)],
        interpret=interpret,
    )(x, dy, dx, mk)
    # p = q·9 + k → [N, H, W, 9, Cin] → im2col layout [N, H, W, 9·Cin]
    return sampled.reshape(n, h, w, 9 * cin)


@functools.partial(jax.jit,
                   static_argnames=("band_radius", "interpret"))
def modulated_deform_conv_fast(x: jnp.ndarray, offset_mask: jnp.ndarray,
                               weight: jnp.ndarray,
                               bias: jnp.ndarray | None = None,
                               band_radius: int = 8,
                               interpret: bool = False) -> jnp.ndarray:
    """Batched fused DCNv2, stride 1 / pad 1 / dilation 1 (the ResNet
    case).  Sampling via the banded Pallas kernel; the 9·Cin → Cout
    contraction is one XLA MXU matmul.

    x: [N, H, W, Cin]; offset_mask: [N, H, W, 27]; weight [3, 3, Cin, Cout].
    """
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    sampled = banded_deform_sample(x, offset_mask,
                                   band_radius=band_radius,
                                   interpret=interpret)
    out = jax.lax.dot_general(
        sampled.reshape(n * h * w, 9 * cin),
        weight.reshape(9 * cin, cout).astype(sampled.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(n, h, w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
