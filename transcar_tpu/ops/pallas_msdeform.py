"""Banded multi-scale deformable attention as Pallas TPU kernels.

The ObjDGCNN BEV encoder runs deformable self-attention over EVERY BEV
cell (Q = Σ H_l·W_l ≈ 87k tokens at 512² grid, reference
configs/obj_dgcnn/pillar.py:70-79).  The XLA gather formulation of
``ops/msdeform.py`` is per-index-latency-bound on TPU — measured
~450-630 ms per encoder layer across five formulation variants
(chunked/unchunked/paired-tap/bf16, docs/PERF_NOTES.md round-4) — and
its in-model chunked form reproducibly faults the v5e TPU worker.

This kernel removes the gathers entirely with the ops/pallas_dcn.py
recipe: every encoder query's reference point is ITS OWN cell center
(dgcnn.py enc_ref), so its samples into value level ℓ land in a narrow
ROW BAND around the scaled row — load the band once per query row and
contract a bilinear-×-attention one-hot matrix against it on the MXU:

  per (query-level, value-level) pair, per query row r (grid):
    s       = clip(round-scaled r − band/2)          # band start
    xband   = value[W_v, s·C : s·C + band·C]         # lane slice, C≥128
    per head h:
      wx    = one-hot(x0, x0+1)·(fx weights)·attn    # [P·W_q, W_v]
      xr    = wx × xband                             # MXU, fp32 acc
      acc   = Σ_b wy[:, b]·xr[:, b·C:(b+1)·C]        # y bilinear, VPU
      out_h = Σ_p acc[p·W_q:(p+1)·W_q]               # point sum
    out     = Σ_h out_h · head-channel mask          # full-lane select

Exactness: horizontal offsets are never approximated (the one-hot spans
the full value row; off-image taps are exact zeros, grid_sample
``padding_mode='zeros'``).  Vertical taps that leave the ``band``-row
window contribute zero — exact for |Δy| ≤ band/2 − 2 value-level cells
(the mmcv init spreads points ≤ P = 4 cells; same banded contract and
config knob as the DCN kernel, dcn_band_rows).  Forward/inference only:
training keeps the autodiff-able XLA path (models route on impl).

Semantics target: mmcv MultiScaleDeformableAttention
(configs/obj_dgcnn/pillar.py:76,94) — oracle =
ops/msdeform.ms_deform_attn_core, which is itself torch-parity-tested.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _enc_kernel(v_ref, omp_ref, o_ref, *, hq, wq, hv, wv, c, d, heads,
                npts, band):
    """One query-row grid step of one (query-level, value-level) pair.

    v_ref:   [1, W_v, H_v·C]  transposed value map (bf16, revisited)
    omp_ref: [1, 1, heads·P·W_q, 8]  per-tap precompute, head-major then
             point-major (lane 0 = absolute y0 in value-level rows,
             1 = fy, 2 = x0, 3 = fx, 4 = attention weight, 5-7 pad)
    o_ref:   [1, 1, W_q, C]  this row's output (head-blocked channels)
    """
    r = pl.program_id(1)
    center = ((2 * r + 1) * hv) // (2 * hq)       # scaled row center
    s = jnp.clip(center - (band // 2 - 1), 0, hv - band)
    xband = v_ref[0, :, pl.ds(pl.multiple_of(s * c, c), band * c)]

    th = npts * wq
    lane = jax.lax.broadcasted_iota(jnp.int32, (wq, c), 1)
    out = jnp.zeros((wq, c), jnp.float32)
    for h in range(heads):
        omp = omp_ref[0, 0, h * th:(h + 1) * th]   # [th, 8] static rows
        y0r = omp[:, 0:1].astype(jnp.int32) - s
        fy = omp[:, 1:2]
        x0 = omp[:, 2:3].astype(jnp.int32)
        fx = omp[:, 3:4]
        aw = omp[:, 4:5]

        jj = jax.lax.broadcasted_iota(jnp.int32, (th, wv), 1)
        wx = (jnp.where(jj == x0, 1.0 - fx, 0.0)
              + jnp.where(jj == x0 + 1, fx, 0.0)) * aw     # [th, W_v]
        xr = jax.lax.dot_general(
            wx.astype(v_ref.dtype), xband,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [th, B·C]
        bb = jax.lax.broadcasted_iota(jnp.int32, (th, band), 1)
        wy = (jnp.where(bb == y0r, 1.0 - fy, 0.0)
              + jnp.where(bb == y0r + 1, fy, 0.0))         # [th, B]
        acc = jnp.zeros((th, c), jnp.float32)
        for b in range(band):                    # static 256-aligned
            acc = acc + wy[:, b:b + 1] * xr[:, b * c:(b + 1) * c]
        outh = jnp.zeros((wq, c), jnp.float32)
        for p in range(npts):                    # point sum, static rows
            outh = outh + acc[p * wq:(p + 1) * wq]
        # head h owns channels [h·d, (h+1)·d) — full-lane mask select
        # (sub-128 static lane slices are layout-hostile on Mosaic)
        keep = jnp.logical_and(lane >= h * d, lane < (h + 1) * d)
        out = out + jnp.where(keep, outh, 0.0)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _omp_precompute(loc, wgt, hq, wq, hv, wv):
    """[B, Q_l, H, P, 2] locations (this value level) + weights →
    [B, H_q, H·P·W_q, 8] per-tap lanes (head-major, then point)."""
    b = loc.shape[0]
    heads, npts = loc.shape[2], loc.shape[3]
    x = loc[..., 0] * wv - 0.5
    y = loc[..., 1] * hv - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    # sanitize wild/non-finite coordinates: anything far outside the map
    # matches no one-hot column either way
    x0 = jnp.clip(jnp.nan_to_num(x0, nan=-4.0, posinf=wv + 4.0,
                                 neginf=-4.0), -4, wv + 4)
    y0 = jnp.clip(jnp.nan_to_num(y0, nan=-4.0, posinf=hv + 4.0,
                                 neginf=-4.0), -4, hv + 4)
    arr = jnp.stack([y0, fy, x0, fx, wgt], axis=-1)   # [B, Q, H, P, 5]
    arr = arr.reshape(b, hq, wq, heads, npts, 5)
    arr = arr.transpose(0, 1, 3, 4, 2, 5)             # [B,Hq,H,P,Wq,5]
    arr = arr.reshape(b, hq, heads * npts * wq, 5)
    return jnp.pad(arr, ((0, 0), (0, 0), (0, 0), (0, 3)))


def _enc_pair(value_lv, omp, hq, wq, hv, wv, heads, d, npts, band,
              interpret):
    """All of one query level sampling one value level.

    value_lv: [B, H_v, W_v, C]; omp: [B, H_q, H·P·W_q, 8] →
    [B, H_q·W_q, C] partial output (this value level's contribution).

    Batched calls loop per-sample: with the batch in the pallas grid the
    value block's index map varies across grid steps, so Mosaic
    double-buffers the whole [W_v, H_v·C] level (~32 MB at 256² C=256) and
    the scoped-VMEM stack OOMs at compile for b ≥ 2 (73 MB > 64.5 MB,
    measured).  Per-sample calls keep the value block grid-invariant
    (single-buffered) and XLA caches the identical kernel across samples."""
    b = value_lv.shape[0]
    if b > 1:
        return jnp.concatenate(
            [_enc_pair(value_lv[i:i + 1], omp[i:i + 1], hq, wq, hv, wv,
                       heads, d, npts, band, interpret)
             for i in range(b)], axis=0)
    c = heads * d
    vt = jnp.transpose(value_lv, (0, 2, 1, 3)).reshape(b, wv, hv * c)
    kern = functools.partial(_enc_kernel, hq=hq, wq=wq, hv=hv, wv=wv,
                             c=c, d=d, heads=heads, npts=npts, band=band)
    out = pl.pallas_call(
        kern,
        grid=(b, hq),
        in_specs=[
            pl.BlockSpec((1, wv, hv * c), lambda bi, r: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, heads * npts * wq, 8),
                         lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, wq, c), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, wq, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(vt, omp)
    return out.reshape(b, hq * wq, c)


def pallas_msdeform_encoder(value: jnp.ndarray,
                            spatial_shapes: Sequence[Tuple[int, int]],
                            sampling_locations: jnp.ndarray,
                            attention_weights: jnp.ndarray,
                            band: int = 16,
                            interpret: bool = False) -> jnp.ndarray:
    """Banded encoder self-attention (Q = S, grid-ordered per level).

    Args/Returns match ops/msdeform.ms_deform_attn_core: value
    [B, S, H, D], locations [B, S, H, L, P, 2] in [0, 1], weights
    [B, S, H, L, P] → [B, S, H·D].
    """
    b, s, heads, d = value.shape
    _, q, _, l, npts, _ = sampling_locations.shape
    assert q == s, "encoder kernel requires query==token grid order"
    c = heads * d
    vt = value.astype(jnp.bfloat16)

    starts, acc = [], 0
    for (hl, wl) in spatial_shapes:
        starts.append(acc)
        acc += hl * wl

    outs = []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        q0 = starts[lq]
        nl = hq * wq
        out_q = None
        for lv, (hv, wv) in enumerate(spatial_shapes):
            bnd = min(band, hv)
            vl = vt[:, starts[lv]:starts[lv] + hv * wv]
            vl = vl.reshape(b, hv, wv, c)
            omp = _omp_precompute(
                sampling_locations[:, q0:q0 + nl, :, lv],
                attention_weights[:, q0:q0 + nl, :, lv],
                hq, wq, hv, wv)
            part = _enc_pair(vl, omp, hq, wq, hv, wv, heads, d, npts,
                             bnd, interpret)
            out_q = part if out_q is None else out_q + part
        outs.append(out_q)
    return jnp.concatenate(outs, axis=1)
