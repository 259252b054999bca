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


def _sep_kernel(x_ref, omp_ref, o_ref, *, hp, w, cin, band):
    """Separable one (image, output row) grid step.

    The banded kernel above pays for a [9W, band·W] one-hot assembly (a
    band-iteration store loop full of relayouts) and contracts over
    band·W mostly-zero columns.  This variant splits the bilinear into
    its x and y factors:

        xr[p, b·C+c] = Σ_j wx[p, j] · xband[j, b·C+c]      (one MXU dot)
        out[p, c]    = Σ_b wy[p, b] · xr[p, b·C+c]         (B VPU FMAs)

    with xband the image pre-transposed to [W, H'·C] so the row band is a
    *lane* slice at a provably 256·8-aligned dynamic offset (Mosaic
    requires aligned dynamic slice starts; the band start is clamped to a
    multiple of 8 rows, which costs band coverage — see
    separable_deform_sample for the guarantee).

    x_ref:  [1, W, H'·C]  transposed image (block revisited across rows)
    omp_ref: [1, 1, 9W, 4] per-p offset columns (lane 0=Δy, 1=Δx, 2=mask;
        p = q·9 + k, pre-flattened outside — Mosaic cannot shape-cast
        [W, 9] → [9W, 1] in-kernel)
    o_ref:  [1, 1, 9·W, Cin] sampled·mask output, p = q·9 + k
    """
    r = pl.program_id(1)
    # aligned band start: s8 = 8·t ≈ r − band/2, clamped into the image
    t = jnp.clip((r - band // 2 + 7) // 8, 0, (hp - band) // 8)
    s8 = t * 8

    omp = omp_ref[0, 0].astype(jnp.float32)           # [9W, 4]
    dy = omp[:, 0:1]                                  # [9W, 1], p = q·9+k
    dx = omp[:, 1:2]
    mk = jax.nn.sigmoid(omp[:, 2:3])

    pp = jax.lax.broadcasted_iota(jnp.int32, (w * 9, 1), 0)
    kk = pp % 9
    qq = pp // 9
    ky = (kk // 3 - 1).astype(jnp.float32)
    kx = (kk % 3 - 1).astype(jnp.float32)

    py = r.astype(jnp.float32) + ky + dy
    px = qq.astype(jnp.float32) + kx + dx
    y0f = jnp.floor(py)
    x0f = jnp.floor(px)
    fy = py - y0f                                     # [9W, 1]
    fx = px - x0f
    y0r = y0f.astype(jnp.int32) - s8                  # band-relative
    x0 = x0f.astype(jnp.int32)

    # x one-hot (zero-padding in x exact; modulation folded in)
    jj = jax.lax.broadcasted_iota(jnp.int32, (w * 9, w), 1)
    wx = (jnp.where(jj == x0, 1.0 - fx, 0.0)
          + jnp.where(jj == x0 + 1, fx, 0.0)) * mk    # [9W, W]

    # y bilinear weights over the band (taps outside the band → 0)
    bb = jax.lax.broadcasted_iota(jnp.int32, (w * 9, band), 1)
    wy = (jnp.where(bb == y0r, 1.0 - fy, 0.0)
          + jnp.where(bb == y0r + 1, fy, 0.0))        # [9W, band]

    xband = x_ref[0, :, pl.ds(pl.multiple_of(s8 * cin, 8 * cin),
                              band * cin)]            # [W, band·C]
    xr = jax.lax.dot_general(
        wx.astype(x_ref.dtype), xband,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [9W, band·C]

    acc = jnp.zeros((w * 9, cin), jnp.float32)
    for b in range(band):                             # static lane slices
        acc = acc + wy[:, b:b + 1] * xr[:, b * cin:(b + 1) * cin]
    o_ref[0, 0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("band_rows", "interpret"))
def separable_deform_sample(x: jnp.ndarray, offset_mask: jnp.ndarray,
                            band_rows: int = 24,
                            interpret: bool = False) -> jnp.ndarray:
    """Deformable bilinear sampling × sigmoid(mask), separable kernel.

    Same contract as :func:`banded_deform_sample`.  Exactness guarantee:
    with ``band_rows`` = B (multiple of 8), every tap with vertical
    offset |Δy| ≤ B/2 − 8 is exact (the −8 pays for the 8-row alignment
    of the band start); taps falling outside the band contribute zero.
    Horizontal offsets are never approximated.  B=24 → |Δy| ≤ 4,
    B=32 → |Δy| ≤ 8.

    Args:
      x: [N, H, W, Cin]; offset_mask: [N, H, W, 27] raw conv_offset output
        (mmcv layout: ch 2k = Δy_k, 2k+1 = Δx_k, 18+k = mask_k).
    Returns:
      [N, H, W, 9·Cin] sampled taps (tap-major per pixel), x.dtype.
    """
    n, h, w, cin = x.shape
    hp = max(-(-h // 8) * 8, band_rows)
    band = band_rows

    # [N, W, H'·C]: row band becomes an aligned lane slice
    xt = jnp.transpose(x, (0, 2, 1, 3))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    xt = xt.reshape(n, w, hp * cin)

    om = offset_mask.astype(jnp.float32)
    # per-p (q-major) offset columns: [N, H, 9W, 4]
    omp = jnp.stack([om[..., 0:18:2], om[..., 1:18:2], om[..., 18:27],
                     jnp.zeros_like(om[..., 18:27])], axis=-1)
    omp = omp.reshape(n, h, w * 9, 4)

    sampled = pl.pallas_call(
        functools.partial(_sep_kernel, hp=hp, w=w, cin=cin, band=band),
        grid=(n, h),
        in_specs=[
            pl.BlockSpec((1, w, hp * cin), lambda ni, r: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9 * w, 4), lambda ni, r: (ni, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 9 * w, cin),
                               lambda ni, r: (ni, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, 9 * w, cin), x.dtype),
        interpret=interpret,
    )(xt, omp)
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


@functools.partial(jax.jit,
                   static_argnames=("band_rows", "interpret"))
def modulated_deform_conv_sep(x: jnp.ndarray, offset_mask: jnp.ndarray,
                              weight: jnp.ndarray,
                              bias: jnp.ndarray | None = None,
                              band_rows: int = 24,
                              interpret: bool = False) -> jnp.ndarray:
    """Batched fused DCNv2 via the separable kernel (same contract as
    :func:`modulated_deform_conv_fast`; exact for |Δy| ≤ band_rows/2 − 9,
    Δx unrestricted)."""
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    sampled = separable_deform_sample(x, offset_mask, band_rows=band_rows,
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
