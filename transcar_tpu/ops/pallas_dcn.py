"""Fused DCNv2 as a single Pallas TPU kernel (inference path).

The round-1/round-2 kernel campaign (history + measurements in
docs/PERF_NOTES.md) converged on this design; the earlier shift-select,
banded-one-hot and unfused-separable variants were culled after losing
their benchmarks.  Per (image, output row) grid step:

  1. **x one-hot on the MXU.**  For every tap p = q·9 + k (k-major per
     chunk below) build the bilinear column one-hot ``wx[p, j]`` (two
     nonzeros, modulation σ(mask) folded in) and contract it against a
     narrow row band of the image in ONE dot:
     ``xr = wx [9W, W] × xband [W, B·C]``.
  2. **y bilinear on the VPU.**  ``sampled[p] = Σ_b wy[p, b]·xr[p, b·C:]``
     — B slice-FMAs.
  3. **Fused 9C→C conv.**  Tap rows are contiguous (k-major), so the
     im2col contraction is nine static-slice [W, C] × [C, Cout] dots
     accumulated in fp32 — the [N, H, W, 9C] intermediate of the unfused
     design (and its 9× output DMA, the measured bottleneck) never
     exists.

The row band is a *lane*-axis dynamic slice of the image transposed to
[W, H'·C]: its start s·C is provably 128-aligned for C ≥ 128
(pl.multiple_of), so the band may start at ANY row → B = 2R+4 rows make
the kernel exact for all vertical offsets |Δy| ≤ R = (B−4)/2.
Horizontal offsets are never approximated (the one-hot spans the full
row; out-of-image taps fall out as exact zero-padding).  Taps whose
vertical sample leaves the band contribute zero, exactly as if they
sampled outside the image.

Semantics target: mmcv DCNv2 with stride 1 / pad 1 / dilation 1 — the
ResNet-101 stage-3/4 case (detr3d_res101_gridmask.py:41-42); oracle =
ops/dcn.modulated_deform_conv.  Forward-only by design: TransCAR
training freezes the backbone (tools/train.py:238-252) but grads are
still traced through it, so the training path keeps the autodiff-able
exact gather; this kernel serves inference (models/resnet.py routes on
``dcn_impl``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, omp_ref, w_ref, o_ref, *, hp, w, cin, cout, band,
            rows):
    """One (image, row-chunk) grid step.

    x_ref:   [1, W, H'·C]   transposed image (revisited across rows)
    omp_ref: [1, 1, rows·9W, 8]  per-p precomputed columns (lane 0 =
             absolute y0, 1 = fy, 2 = absolute x0, 3 = fx, 4 = σ(mask),
             5-7 zero padding; p = rr·9W + k·W + q, pre-flattened by
             _omp_precompute — Mosaic cannot shape-cast [W, 9] → [9W, 1]
             in-kernel)
    w_ref:   [9, C, Cout]   conv weights, tap-major
    o_ref:   [1, 1, rows, W, Cout]

    ``rows`` > 1 amortizes the ~10 µs per-grid-step floor (output DMA +
    step machinery, docs/PERF_NOTES.md phase ablation) over several
    output rows.  Each row keeps its OWN band slice, one-hot dot and
    fused conv — the round-2 shared-band m-expansion grew xr to
    [rows·9W, B·C] (VMEM blowup) and cost (rows−1)/2 px of exactness;
    the per-row pipeline keeps xr one-row-sized and the exact margin
    rows-independent, and matches the backward kernel's per-row band
    centering for every ``rows``.
    """
    r0 = pl.program_id(1) * rows
    m = w * 9

    for rr_i in range(rows):
        # per-row band, centered like the rows=1 kernel (and the bwd)
        s = jnp.clip(r0 + rr_i - (band - 4) // 2 - 1, 0, hp - band)

        # per-p quantities are PRECOMPUTED outside (floor/sigmoid/
        # tap-index arithmetic is row-independent because
        # floor(r + ky + dy) = r + ky + floor(dy) for integer r):
        # lane 0 = absolute y0, 1 = fy, 2 = absolute x0, 3 = fx,
        # 4 = σ(mask).  The kernel only builds the two one-hots —
        # in-kernel [m, 1]-column chains ran at 1/128 lane utilization
        # and dominated the ablated assembly cost.
        omp = omp_ref[0, 0, rr_i * m:(rr_i + 1) * m]    # static sublane
        y0r = omp[:, 0:1].astype(jnp.int32) - s         # band-relative
        fy = omp[:, 1:2]
        x0 = omp[:, 2:3].astype(jnp.int32)
        fx = omp[:, 3:4]
        mk = omp[:, 4:5]

        jj = jax.lax.broadcasted_iota(jnp.int32, (m, w), 1)
        wx = (jnp.where(jj == x0, 1.0 - fx, 0.0)
              + jnp.where(jj == x0 + 1, fx, 0.0)) * mk  # [m, W]
        bb = jax.lax.broadcasted_iota(jnp.int32, (m, band), 1)
        wy = (jnp.where(bb == y0r, 1.0 - fy, 0.0)
              + jnp.where(bb == y0r + 1, fy, 0.0))      # [m, B]

        xband = x_ref[0, :,
                      pl.ds(pl.multiple_of(s * cin, cin), band * cin)]
        xr = jax.lax.dot_general(
            wx.astype(x_ref.dtype), xband,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [m, B·C]
        acc = jnp.zeros((m, cin), jnp.float32)
        for b in range(band):                           # static lane slices
            acc = acc + wy[:, b:b + 1] * xr[:, b * cin:(b + 1) * cin]
        sampled = acc.astype(x_ref.dtype)               # [m, C]

        o = jnp.zeros((w, cout), jnp.float32)
        for k in range(9):
            o = o + jax.lax.dot_general(
                sampled[k * w:(k + 1) * w, :], w_ref[k],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, 0, rr_i] = o.astype(o_ref.dtype)


def _kernel_onedot(x_ref, omp_ref, w_ref, o_ref, *, hp, w, wpad, cin,
                   cout, band, rows):
    """One (image, row-chunk) grid step — single-dot sampling variant.

    The banded kernel's [9W, B·C] fp32 ``xr`` intermediate costs ~15 MB
    of VMEM read/write per output row (the measured per-row floor after
    grid coarsening flattened the step count without moving the time).
    Here the y-bilinear folds INTO the one-hot: w2[p, b·W' + j] =
    wy[p, b]·wx[p, j]·σ(mask), so sampling is ONE dot
    ``[9W, B·W'] × [B·W', C] → [9W, C]`` — identical FLOPs, no xr.

    x_ref: [1, H'·W', C] row-major flat image, W' = W padded to 8k so the
    band start s·W' is a provably 8-aligned SUBLANE slice; padding
    columns are zero, so one-hot hits at j ∈ [W, W') contribute exact
    zeros (same out-of-image semantics as the banded kernel).
    """
    r0 = pl.program_id(1) * rows
    m = w * 9

    for rr_i in range(rows):
        s = jnp.clip(r0 + rr_i - (band - 4) // 2 - 1, 0, hp - band)
        omp = omp_ref[0, 0, rr_i * m:(rr_i + 1) * m]
        y0r = omp[:, 0:1].astype(jnp.int32) - s
        fy = omp[:, 1:2]
        x0 = omp[:, 2:3].astype(jnp.int32)
        fx = omp[:, 3:4]
        mk = omp[:, 4:5]

        jj = jax.lax.broadcasted_iota(jnp.int32, (m, band * wpad), 1)
        bi = jj // wpad
        col = jj - bi * wpad
        wcol = (jnp.where(col == x0, 1.0 - fx, 0.0)
                + jnp.where(col == x0 + 1, fx, 0.0))
        wrow = (jnp.where(bi == y0r, 1.0 - fy, 0.0)
                + jnp.where(bi == y0r + 1, fy, 0.0))
        w2 = (wcol * wrow * mk).astype(x_ref.dtype)     # [m, B·W']

        xband = x_ref[0, pl.ds(pl.multiple_of(s * wpad, 8), band * wpad), :]
        sampled = jax.lax.dot_general(
            w2, xband,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [m, C]
        sampled = sampled.astype(x_ref.dtype)

        o = jnp.zeros((w, cout), jnp.float32)
        for k in range(9):
            o = o + jax.lax.dot_general(
                sampled[k * w:(k + 1) * w, :], w_ref[k],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, 0, rr_i] = o.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("band_rows", "rows_per_step",
                                    "variant", "interpret"))
def fused_deform_conv(x: jnp.ndarray, offset_mask: jnp.ndarray,
                      weight: jnp.ndarray,
                      bias: jnp.ndarray | None = None,
                      band_rows: int = 16,
                      rows_per_step: int = 1,
                      variant: str = "banded",
                      interpret: bool = False) -> jnp.ndarray:
    """Batched fused DCNv2, stride 1 / pad 1 / dilation 1.

    Exact for |Δy| ≤ (band_rows − 4)/2 (Δx unrestricted) for ANY
    ``rows_per_step`` — each row in a chunk slices its own band; when
    the band covers the padded image it is exact for arbitrary offsets.

    Args:
      x: [N, H, W, Cin]; offset_mask: [N, H, W, 27] raw conv_offset
        output (mmcv layout: ch 2k = Δy_k, 2k+1 = Δx_k, 18+k = mask_k);
      weight: [3, 3, Cin, Cout]; bias: optional [Cout].
    Returns:
      [N, H, W, Cout], x.dtype.
    """
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    band = band_rows
    hp = max(h, band)       # pad small images up to one full band
    rows = rows_per_step
    hr = -(-h // rows) * rows

    if variant == "onedot":
        # [N, H'·W', C] row-major flat: the band is an 8-aligned sublane
        # slice; W' = W padded to a multiple of 8 with zero columns
        wpad = -(-w // 8) * 8
        xf = jnp.pad(x, ((0, 0), (0, hp - h), (0, wpad - w), (0, 0)))
        xf = xf.reshape(n, hp * wpad, cin)
        kern = functools.partial(_kernel_onedot, hp=hp, w=w, wpad=wpad,
                                 cin=cin, cout=cout, band=band, rows=rows)
        x_spec = pl.BlockSpec((1, hp * wpad, cin), lambda ni, r: (ni, 0, 0),
                              memory_space=pltpu.VMEM)
        x_in = xf
    else:
        # [N, W, H'·C]: the row band becomes a 128-aligned lane slice
        xt = jnp.transpose(x, (0, 2, 1, 3))
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
        xt = xt.reshape(n, w, hp * cin)
        kern = functools.partial(_kernel, hp=hp, w=w, cin=cin, cout=cout,
                                 band=band, rows=rows)
        x_spec = pl.BlockSpec((1, w, hp * cin), lambda ni, r: (ni, 0, 0),
                              memory_space=pltpu.VMEM)
        x_in = xt

    # per-p (k-major) precomputed columns: lane 0=y0, 1=fy, 2=x0, 3=fx,
    # 4=σ(mask) — see _kernel (shared with the backward)
    omp = _omp_precompute(offset_mask, n, h, w)
    omp = jnp.pad(omp, ((0, 0), (0, hr - h), (0, 0), (0, 0)))
    omp = omp.reshape(n, hr // rows, rows * 9 * w, 8)

    w9 = weight.reshape(9, cin, cout).astype(x.dtype)

    out = pl.pallas_call(
        kern,
        grid=(n, hr // rows),
        in_specs=[
            x_spec,
            pl.BlockSpec((1, 1, rows * 9 * w, 8),
                         lambda ni, r: (ni, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda ni, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, w, cout),
                               lambda ni, r: (ni, r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hr // rows, rows, w, cout),
                                       x.dtype),
        # the kernel peaks ~30 MB (xr [9W, B·C] fp32 dominates); leave the
        # rest of VMEM to the surrounding XLA program — a 100 MB limit
        # plus XLA's own VMEM working set faulted the chip at batch 2
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x_in, omp, w9)
    out = out.reshape(n, hr, w, cout)[:, :h]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# backward (custom VJP): the transposed one-hot matmuls
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, omp_ref, w_ref, do_ref, dx_ref, dofs_ref, dw_ref,
                *, hp, w, cin, cout, band):
    """One (image, output row) backward grid step.

    XLA's autodiff of a gather-based DCN emits index-serialized
    scatter-adds (measured 36.6 s/step for the full-backbone train step,
    docs/PERF_NOTES.md); here every contraction is the TRANSPOSE of a
    forward one-hot matmul, so the whole backward rides the MXU:

      d_sampled = d_out × W9ᵀ            (per-tap dots)
      d_W9     += sampledᵀ × d_out       (accumulated across the grid)
      d_xband   = wxᵀ × (wy ⊗ mk·d_sampled)   (the scatter, as a matmul)
      d_Δx/d_Δy = one-hot-derivative dots; d_mask from the mk-free resample

    dx_ref:   [1, W, H'·C] fp32 — per-image accumulator (index (ni,0,0))
    dofs_ref: [1, 1, 9W, 4] — lanes 0=d_Δy, 1=d_Δx, 2=d_mk
    dw_ref:   [9, Cin, Cout] fp32 — whole-grid accumulator (index const)
    """
    ni = pl.program_id(0)
    r = pl.program_id(1)
    m = w * 9
    s = jnp.clip(r - (band - 4) // 2 - 1, 0, hp - band)

    @pl.when(jnp.logical_and(ni == 0, r == 0))
    def _init_dw():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    @pl.when(r == 0)
    def _init_dx():
        dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    omp = omp_ref[0, 0]
    y0r = omp[:, 0:1].astype(jnp.int32) - s
    fy = omp[:, 1:2]
    x0 = omp[:, 2:3].astype(jnp.int32)
    fx = omp[:, 3:4]
    mk = omp[:, 4:5]

    jj = jax.lax.broadcasted_iota(jnp.int32, (m, w), 1)
    wx_raw = (jnp.where(jj == x0, 1.0 - fx, 0.0)
              + jnp.where(jj == x0 + 1, fx, 0.0))          # no mk
    dwx_raw = (jnp.where(jj == x0 + 1, 1.0, 0.0)
               - jnp.where(jj == x0, 1.0, 0.0))
    bb = jax.lax.broadcasted_iota(jnp.int32, (m, band), 1)
    wy = (jnp.where(bb == y0r, 1.0 - fy, 0.0)
          + jnp.where(bb == y0r + 1, fy, 0.0))
    dwy = (jnp.where(bb == y0r + 1, 1.0, 0.0)
           - jnp.where(bb == y0r, 1.0, 0.0))

    # recomputed mk-free resample + reductions against d_sampled
    do = do_ref[0, 0].astype(jnp.float32)                  # [W, Cout]
    d_samp = jnp.concatenate([
        jax.lax.dot_general(do, w_ref[k].astype(jnp.float32),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for k in range(9)], axis=0)                        # [9W, C]
    d_samp_m = mk * d_samp

    # ONE pass over the band, fully streamed: each band row b is gathered
    # with a [2m,W]×[W,C] dot (wx and its derivative stacked into one
    # MXU call) and scattered back with a [W,9W]×[9W,C] dot — the
    # [9W, B·C] fp32 xr/xr_dx/d_xr buffers of earlier designs (~22 MB
    # EACH at band 24, the scoped-VMEM OOM that kept the full-training
    # auto-widened band from compiling at all) never exist.  The d_fy /
    # d_fx reductions are reassociated
    # (Σ_b coeff_b · Σ_c xr_b·d_samp  →  Σ_c (Σ_b coeff_b·xr_b)·d_samp)
    # so the band loop carries three [m, C] accumulators.
    wxc = jnp.concatenate([wx_raw, dwx_raw],
                          axis=0).astype(x_ref.dtype)      # [2m, W]
    wx_f32 = wx_raw.astype(jnp.float32)
    sampled_nomk = jnp.zeros((m, cin), jnp.float32)
    ydy = jnp.zeros((m, cin), jnp.float32)
    ydx = jnp.zeros((m, cin), jnp.float32)
    for b in range(band):
        sl = pl.ds(pl.multiple_of((s + b) * cin, cin), cin)
        xband_b = x_ref[0, :, sl]                          # [W, C]
        both = jax.lax.dot_general(
            wxc, xband_b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [2m, C]
        xr_b = both[:m]
        sampled_nomk = sampled_nomk + wy[:, b:b + 1] * xr_b
        ydy = ydy + dwy[:, b:b + 1] * xr_b
        ydx = ydx + wy[:, b:b + 1] * both[m:]
        # the scatter, transposed: d_xband_b = wx_rawᵀ × (wy_b ⊙ mk·d_samp)
        dxb = jax.lax.dot_general(
            wx_f32, wy[:, b:b + 1] * d_samp_m,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [W, C]
        dx_ref[0, :, sl] += dxb
    d_fy = jnp.sum(ydy * d_samp, axis=1, keepdims=True)
    d_fx = jnp.sum(ydx * d_samp, axis=1, keepdims=True)
    d_mk = jnp.sum(sampled_nomk * d_samp, axis=1, keepdims=True)
    zeros = jnp.zeros((m, 1), jnp.float32)
    dofs_ref[0, 0] = jnp.concatenate(
        [mk * d_fy, mk * d_fx, d_mk, zeros], axis=1)

    # d_W accumulation: sampled = mk ⊙ sampled_nomk, per-tap blocks
    sampled = (mk * sampled_nomk).astype(jnp.float32)
    for k in range(9):
        dw_ref[k] += jax.lax.dot_general(
            sampled[k * w:(k + 1) * w, :], do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _omp_precompute(offset_mask, n, h, w):
    om = offset_mask.astype(jnp.float32)
    dy = om[..., 0:18:2]
    dx = om[..., 1:18:2]
    mk = jax.nn.sigmoid(om[..., 18:27])
    ky = (jnp.arange(9) // 3 - 1).astype(jnp.float32)
    kx = (jnp.arange(9) % 3 - 1).astype(jnp.float32)
    py = dy + ky
    px = dx + kx + jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    y0f, x0f = jnp.floor(py), jnp.floor(px)
    y0_abs = y0f + jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    omp = jnp.stack([y0_abs, py - y0f, x0f, px - x0f, mk,
                     jnp.zeros_like(mk), jnp.zeros_like(mk),
                     jnp.zeros_like(mk)], axis=-1)
    return omp.transpose(0, 1, 3, 2, 4).reshape(n, h, 9 * w, 8)


def _fused_dcn_bwd_impl(x, offset_mask, weight, d_out, band_rows,
                        interpret):
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    band = band_rows
    hp = max(h, band)

    xt = jnp.transpose(x, (0, 2, 1, 3))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    xt = xt.reshape(n, w, hp * cin)
    omp = _omp_precompute(offset_mask, n, h, w)
    w9 = weight.reshape(9, cin, cout).astype(x.dtype)

    d_xt, d_ofs, d_w9 = pl.pallas_call(
        functools.partial(_bwd_kernel, hp=hp, w=w, cin=cin, cout=cout,
                          band=band),
        grid=(n, h),
        in_specs=[
            pl.BlockSpec((1, w, hp * cin), lambda ni, r: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9 * w, 8), lambda ni, r: (ni, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda ni, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, cout), lambda ni, r: (ni, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, w, hp * cin), lambda ni, r: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9 * w, 4), lambda ni, r: (ni, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda ni, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, w, hp * cin), jnp.float32),
            jax.ShapeDtypeStruct((n, h, 9 * w, 4), jnp.float32),
            jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
        ],
        # streamed band loop: the resident blocks (x + dx image panes,
        # dw accumulator) dominate at ~12-20 MB — no [9W, B·C] buffers,
        # so band 24 (full-training auto-widen) compiles where the
        # materialized design blew the scoped-VMEM stack (>96 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xt, omp, w9, d_out)

    # [N, W, H'·C] → [N, H, W, C]
    d_x = d_xt.reshape(n, w, hp, cin).transpose(0, 2, 1, 3)[:, :h]
    d_x = d_x.astype(x.dtype)

    # per-p (k-major) grads → offset_mask layout [N, H, W, 27]
    g = d_ofs.reshape(n, h, 9, w, 4).transpose(0, 1, 3, 2, 4)
    om = offset_mask.astype(jnp.float32)
    sig = jax.nn.sigmoid(om[..., 18:27])
    d_om = jnp.zeros((n, h, w, 27), jnp.float32)
    d_om = d_om.at[..., 0:18:2].set(g[..., 0])             # d_Δy
    d_om = d_om.at[..., 1:18:2].set(g[..., 1])             # d_Δx
    d_om = d_om.at[..., 18:27].set(g[..., 2] * sig * (1 - sig))
    d_om = d_om.astype(offset_mask.dtype)

    d_w = d_w9.reshape(3, 3, cin, cout).astype(weight.dtype)
    return d_x, d_om, d_w


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_deform_conv_ad(x, offset_mask, weight, band_rows=16,
                         rows_per_step=1, interpret=False,
                         variant="banded"):
    """Differentiable fused DCNv2 (no bias): forward is
    :func:`fused_deform_conv`; backward is the transposed-one-hot-matmul
    Pallas kernel above.  Gradients are the exact gradients of the
    banded forward (taps with |Δy| beyond the band contribute zero in
    both directions), validated against the exact path's autodiff in
    tests/test_pallas_dcn.py.

    ``rows_per_step`` is a pure throughput knob: both the forward's
    per-row pipeline and the backward kernel center the band per output
    row with the same formula, so gradients stay exact for any value.
    ``variant`` selects the forward formulation (same math, same band
    semantics — see :func:`fused_deform_conv`); the backward is shared."""
    return fused_deform_conv(x, offset_mask, weight, None,
                             band_rows=band_rows,
                             rows_per_step=rows_per_step,
                             variant=variant, interpret=interpret)


def _fused_ad_fwd(x, offset_mask, weight, band_rows, rows_per_step,
                  interpret, variant):
    out = fused_deform_conv(x, offset_mask, weight, None,
                            band_rows=band_rows,
                            rows_per_step=rows_per_step,
                            variant=variant, interpret=interpret)
    return out, (x, offset_mask, weight)


def _fused_ad_bwd(band_rows, rows_per_step, interpret, variant, res,
                  d_out):
    x, offset_mask, weight = res
    return _fused_dcn_bwd_impl(x, offset_mask, weight,
                               d_out.astype(x.dtype), band_rows, interpret)


fused_deform_conv_ad.defvjp(_fused_ad_fwd, _fused_ad_bwd)
