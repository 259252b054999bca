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
config knob as the DCN kernel, dcn_band_rows).

Training: :func:`pallas_msdeform_encoder_ad` adds a custom-VJP banded
backward (the ops/pallas_dcn.py recipe).  The XLA autodiff of the
gather encoder materializes 59.7 GB at full BEV resolution and every
chunked construct (lax.map or unrolled) faults the v5e worker
(docs/PERF_NOTES.md round 4) — full-res LiDAR training needs kernels.
Two backward kernels per (query-level, value-level) pair:

  K1 (grid over query rows, forward structure): recompute the banded
     taps plus their ∂/∂fx, ∂/∂fy one-hot-derivative dots in one
     stacked MXU call, reduce against the head-masked output grads →
     per-tap (d_attn, d_fx, d_fy).
  K2 (grid over value rows × query-row blocks): d_value[v] gathers the
     output grads of the ~band·H_q/H_v query rows whose bands cover v
     (block index map walks the range) and contracts a transposed
     bilinear one-hot, point-presummed, against them — the scatter as
     a matmul, with NO revisited [W_v, H_v·C] fp32 accumulator (the
     VMEM-OOM a DCN-style dx accumulator would hit at 256² C=256).

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


def _enc_band_start(r, hq, hv, band):
    """Band start row s for query row r (shared by the kernel body and
    the windowed-mode BlockSpec index maps — they MUST agree)."""
    center = ((2 * r + 1) * hv) // (2 * hq)       # scaled row center
    return jnp.clip(center - (band // 2 - 1), 0, hv - band)


def _window_chunk(r, hq, hv, band, m):
    """Chunk index k of the first of the two m-row value chunks covering
    query row r's band: rows [k·m, (k+2)·m) ⊇ [s, s+band) whenever
    m ≥ band (s − k·m < m ⇒ s + band ≤ k·m + m + band ≤ k·m + 2m)."""
    s = _enc_band_start(r, hq, hv, band)
    return jnp.clip(s // m, 0, hv // m - 2)


def _enc_hgroups(wq, hv, wv, c, heads, npts, band, window_m):
    """Head-group count for the stacked forward kernel: the smallest
    power-of-two split keeping estimated scoped VMEM under budget.

    Calibrated against a Mosaic compile-OOM measurement (v5e, 256² pair,
    band 24, m=32, full stack): 71.99 MB total, of which ~26 MB is the
    fixed part (two double-buffered m-row chunk blocks + the 2m scratch)
    and ~46 MB scales with the per-group stacked rows — ≈ 5.5 words per
    (row × max(W_v, C)) across the one-hot build, dot output and
    accumulator.  Budget 52 MiB leaves ≥12 MB headroom for schedule
    variance (the check is schedule-dependent; an overflow that
    compiles is a runtime worker fault, round-4 lesson)."""
    m = window_m
    fixed = (2 * 2 * wv * m * c * 2 + wv * 2 * m * c * 2) if m \
        else wv * hv * c * 2             # whole-level block, single sample
    th = heads * npts * wq
    g = 1
    while g < heads:
        temps = 5.5 * (th // g) * max(wv, c) * 4
        if fixed + temps <= 52 * 1024 * 1024:
            break
        g *= 2
    return g


def _enc_kernel(v_ref, *refs, hq, wq, hv, wv, c, d, heads,
                npts, band, window_m=0):
    """One query-row grid step of one (query-level, value-level) pair.

    v_ref:   value rows — whole level [1, W_v, H_v·C] (window_m == 0,
             revisited) or the FIRST of two m-row banded chunks
             [1, W_v, m·C] (window_m = m > 0, with vb_ref the second:
             together they cover the band window; shrinking the block
             ~H_v/2m× is what lets the batch ride the pallas grid
             without double-buffering the whole level — the bs≥2
             scoped-VMEM OOM that forced per-sample serialized calls).
             In windowed mode the LAST positional ref is a [W_v, 2m·C]
             VMEM scratch: the chunk pair is copied into it once per
             chunk switch (~every m query rows) so the hot band loop
             keeps a single dynamic-slice load per MXU dot.  Measured
             verdict (v5e round 5): the window mechanism is FREE at
             pair AND full-model level (707.1 windowed vs 703.2
             whole-level), so it ships for what it buys — batched grids
             and a batched backward with no per-sample barriers.
    omp_ref: [1, 1, heads·P·W_q, 8]  per-tap precompute, head-major then
             point-major (lane 0 = absolute y0 in value-level rows,
             1 = fy, 2 = x0, 3 = fx, 4 = attention weight, 5-7 pad)
    o_ref:   [1, 1, W_q, C]  this row's output (head-blocked channels)
    """
    if window_m:
        vb_ref, omp_ref, o_ref, win_ref = refs
    else:
        vb_ref = win_ref = None
        omp_ref, o_ref = refs
    r = pl.program_id(1)
    s = _enc_band_start(r, hq, hv, band)
    if window_m:
        # rel row index into the two stacked chunks, in [0, 2m)
        k = _window_chunk(r, hq, hv, band, window_m)
        rel0 = s - k * window_m
        # refresh the scratch window only when the chunk pair changed
        # (grid iterates r fastest; r == 0 is a fresh sample's blocks)
        kprev = _window_chunk(jnp.maximum(r - 1, 0), hq, hv, band,
                              window_m)
        mc = window_m * c

        @pl.when(jnp.logical_or(r == 0, k != kprev))
        def _fill_window():
            win_ref[:, :mc] = v_ref[0]
            win_ref[:, mc:] = vb_ref[0]

    tp = npts * wq

    # HEADS-STACKED band loop: a group of heads' taps ride ONE
    # [Hg·P·W_q, W_v] one-hot matrix, so each band row is a single tall
    # MXU dot and a single dynamic-slice load.  History: round 4 first
    # unrolled heads×band (scoped-VMEM overflow at the training band 24
    # — a runtime worker fault, the compile check is schedule-dependent),
    # then ROLLED both loops (97d7afa) which fixed the fault but cost
    # heads×band loop iterations of slice/loop overhead per query row —
    # measured 324.5 → ~740 ms full pillar model (the camera-only bench
    # artifact hid it until round 5).  Stacking keeps the rolled band
    # loop's O(1) temporaries while cutting iterations and slices ~8×,
    # and the taller dot fills the MXU better.  The full 8-head stack
    # needs ~72 MB scoped VMEM at the 256² band-24 pair (measured
    # compile OOM) — `_enc_hgroups` splits heads into the smallest
    # power-of-two groups that fit a 52 MiB budget.
    hg = _enc_hgroups(wq, hv, wv, c, heads, npts, band, window_m)
    hpg = heads // hg
    thg = hpg * tp

    # rolled group loop — an unrolled one stacks every iteration's
    # one-hot/accumulator temporaries (Mosaic does not reuse across
    # unrolled bodies; the round-4 70.6 MB lesson), which would undo
    # exactly the VMEM the grouping is buying
    def group_body(g, out):
        omp = omp_ref[0, 0, pl.ds(pl.multiple_of(g * thg, 8), thg)]
        y0r = omp[:, 0:1].astype(jnp.int32) - s
        fy = omp[:, 1:2]
        x0 = omp[:, 2:3].astype(jnp.int32)
        fx = omp[:, 3:4]
        aw = omp[:, 4:5]

        jj = jax.lax.broadcasted_iota(jnp.int32, (thg, wv), 1)
        wx = ((jnp.where(jj == x0, 1.0 - fx, 0.0)
               + jnp.where(jj == x0 + 1, fx, 0.0)) * aw)  # [thg, W_v]
        wx = wx.astype(v_ref.dtype)

        def band_body(b, acc):
            if window_m:
                # band row s+b = scratch row rel0+b ∈ [0, 2m): one
                # 128-aligned dynamic-slice load per dot
                xb = win_ref[:, pl.ds(pl.multiple_of((rel0 + b) * c, c),
                                      c)]
            else:
                xb = v_ref[0, :, pl.ds(pl.multiple_of((s + b) * c, c),
                                       c)]
            xr_b = jax.lax.dot_general(
                wx, xb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [thg, C]
            wy_b = (jnp.where(y0r == b, 1.0 - fy, 0.0)
                    + jnp.where(y0r == b - 1, fy, 0.0))    # [thg, 1]
            return acc + wy_b * xr_b

        acc = jax.lax.fori_loop(0, band, band_body,
                                jnp.zeros((thg, c), jnp.float32))
        # head/point sum + per-head channel ownership, vectorized:
        # splitting leading (non-lane) dims is a legal Mosaic reshape
        # (the (sublane, lane) tile is untouched); head h keeps lanes
        # [h·d, (h+1)·d) via an iota compare instead of unrolled slices
        acc4 = acc.reshape(hpg, npts, wq, c)
        summed = jnp.sum(acc4, axis=1)                     # [Hg, W_q, C]
        hh = jax.lax.broadcasted_iota(jnp.int32, (hpg, wq, c), 0) \
            + g * hpg
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (hpg, wq, c), 2)
        return out + jnp.sum(jnp.where(lane3 // d == hh, summed, 0.0),
                             axis=0)

    out = jax.lax.fori_loop(0, hg, group_body,
                            jnp.zeros((wq, c), jnp.float32))
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _bwd_taps_kernel(v_ref, *refs, hq, wq, hv, wv,
                     c, d, heads, npts, band, window_m=0):
    """K1 — one query row: per-tap (d_attn, d_fx, d_fy, 0) lanes.

    v_ref:    value rows — whole level [1, W_v, H_v·C] (window_m == 0)
              or the first of two m-row banded chunks (window_m = m,
              with vb_ref the second; same two-chunk window as the
              forward `_enc_kernel`, and for the same reason: whole
              revisited levels block the batch from riding the grid)
    omp_ref:  [1, 1, heads·P·W_q, 8] forward per-tap precompute
    g_ref:    [1, 1, W_q, C] output grad rows (fp32)
    dofs_ref: [1, 1, heads·P·W_q, 4]
    """
    if window_m:
        vb_ref, omp_ref, g_ref, dofs_ref, win_ref = refs
    else:
        vb_ref = win_ref = None
        omp_ref, g_ref, dofs_ref = refs
    r = pl.program_id(1)
    s = _enc_band_start(r, hq, hv, band)
    if window_m:
        k = _window_chunk(r, hq, hv, band, window_m)
        rel0 = s - k * window_m
        kprev = _window_chunk(jnp.maximum(r - 1, 0), hq, hv, band,
                              window_m)
        mc = window_m * c

        @pl.when(jnp.logical_or(r == 0, k != kprev))
        def _fill_window():
            win_ref[:, :mc] = v_ref[0]
            win_ref[:, mc:] = vb_ref[0]

    tp = npts * wq
    g_row = g_ref[0, 0].astype(jnp.float32)              # [W_q, C]
    lane = jax.lax.broadcasted_iota(jnp.int32, (wq, c), 1)

    # BOTH loops rolled (fori_loop): unrolled heads×band stacks every
    # iteration's temporaries — 198 MB of 128 MB total VMEM at the 256²
    # pair, a hard compile failure (measured).  The wy/dwy columns are
    # recomputed per band row from scalar b (dynamic slicing of a
    # materialized [tp, band] VALUE is unsupported on Mosaic); the
    # value band row is sliced from the REF at (s+b)·C (128-aligned).
    def head_body(h, _):
        omp = omp_ref[0, 0, pl.ds(pl.multiple_of(h * tp, 8), tp)]
        y0r = omp[:, 0:1].astype(jnp.int32) - s
        fy = omp[:, 1:2]
        x0 = omp[:, 2:3].astype(jnp.int32)
        fx = omp[:, 3:4]
        aw = omp[:, 4:5]

        jj = jax.lax.broadcasted_iota(jnp.int32, (tp, wv), 1)
        wx_raw = (jnp.where(jj == x0, 1.0 - fx, 0.0)
                  + jnp.where(jj == x0 + 1, fx, 0.0))    # aw-free
        dwx = (jnp.where(jj == x0 + 1, 1.0, 0.0)
               - jnp.where(jj == x0, 1.0, 0.0))
        # one stacked MXU call per band row: taps and their ∂/∂fx
        wxc = jnp.concatenate([wx_raw, dwx], axis=0).astype(v_ref.dtype)

        def band_body(b, carry):
            snk, ydy, ydx = carry
            if window_m:
                xb = win_ref[:, pl.ds(pl.multiple_of((rel0 + b) * c, c),
                                      c)]
            else:
                xb = v_ref[0, :, pl.ds(pl.multiple_of((s + b) * c, c), c)]
            both = jax.lax.dot_general(
                wxc, xb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [2tp, C]
            xr_b = both[:tp]
            wy_b = (jnp.where(y0r == b, 1.0 - fy, 0.0)
                    + jnp.where(y0r == b - 1, fy, 0.0))  # [tp, 1]
            dwy_b = (jnp.where(y0r == b - 1, 1.0, 0.0)
                     - jnp.where(y0r == b, 1.0, 0.0))
            return (snk + wy_b * xr_b, ydy + dwy_b * xr_b,
                    ydx + wy_b * both[tp:])

        z = jnp.zeros((tp, c), jnp.float32)
        snk, ydy, ydx = jax.lax.fori_loop(0, band, band_body, (z, z, z))

        # head-masked grad rows, tiled per point (rows p·W_q + i)
        gm = jnp.where(jnp.logical_and(lane >= h * d, lane < (h + 1) * d),
                       g_row, 0.0)
        gt = jnp.concatenate([gm] * npts, axis=0)        # [tp, C]
        d_aw = jnp.sum(snk * gt, axis=1, keepdims=True)
        d_fx = aw * jnp.sum(ydx * gt, axis=1, keepdims=True)
        d_fy = aw * jnp.sum(ydy * gt, axis=1, keepdims=True)
        dofs_ref[0, 0, pl.ds(pl.multiple_of(h * tp, 8), tp)] = \
            jnp.concatenate(
                [d_aw, d_fx, d_fy, jnp.zeros((tp, 1), jnp.float32)],
                axis=1)
        return 0

    jax.lax.fori_loop(0, heads, head_body, 0)


def _bwd_value_kernel(ompt_ref, g_ref, dval_ref, *, hq, wq, hv, wv, c, d,
                      heads, npts, band, qg, nq):
    """K2 — one (value row v, query-row block k): add the block's
    contribution to d_value[v].

    ompt_ref: [1, 1, 8, qg·heads·P·W_q] TRANSPOSED per-tap precompute
              (taps on the LANE axis: an [taps, 8] layout pads the
              8-wide lane dim to 128 — a 32 MB×2 block and scoped-VMEM
              compile OOM, measured)
    g_ref:    [1, 1, qg·W_q, C] output grad rows of the same q-rows
    dval_ref: [1, 1, W_v, C] — revisited across k (index constant in k)

    Loops are ROLLED (fori_loop): unrolled, Mosaic stacks every
    iteration's one-hot temporaries without reuse (82.78 MB scoped at
    the voxel 128² level, measured).  Dynamic starts: j·wq sublane
    (8-aligned); lane starts are multiples of tp_pad = P·W_q padded to
    a 128-multiple (padded tap columns carry aw = 0).
    """
    v = pl.program_id(1)
    k = pl.program_id(2)
    qb = _k2_qbase(v, hq, hv, band, qg, nq)

    @pl.when(k == 0)
    def _init():
        dval_ref[...] = jnp.zeros(dval_ref.shape, dval_ref.dtype)

    tp = npts * wq
    tp_pad = -(-tp // 128) * 128
    th_pad = heads * tp_pad
    lane = jax.lax.broadcasted_iota(jnp.int32, (wq, c), 1)

    def body(j, acc):
        r = (qb + k) * qg + j
        center = ((2 * r + 1) * hv) // (2 * hq)
        s = jnp.clip(center - (band // 2 - 1), 0, hv - band)
        in_band = jnp.logical_and(v - s >= 0, v - s <= band - 1)
        g_loc = g_ref[0, 0, pl.ds(pl.multiple_of(j * wq, 8), wq)]
        g_loc = g_loc.astype(jnp.float32)

        def head_body(h, acc_h):
            ompt = ompt_ref[0, 0, :, pl.ds(
                pl.multiple_of(j * th_pad + h * tp_pad, 128),
                tp_pad)]                                  # [8, tp_pad]
            y0 = ompt[0:1].astype(jnp.int32)
            fy = ompt[1:2]
            x0 = ompt[2:3].astype(jnp.int32)
            fx = ompt[3:4]
            aw = ompt[4:5]
            # vertical weight of each tap onto value row v, exactly as
            # the forward's band loop counted it (wy at b = v−s)
            wvert = (jnp.where(y0 == v, 1.0 - fy, 0.0)
                     + jnp.where(y0 == v - 1, fy, 0.0)) * aw
            wvert = jnp.where(in_band, wvert, 0.0)       # [1, tp_pad]
            ii = jax.lax.broadcasted_iota(jnp.int32, (wv, tp_pad), 0)
            w2t = (jnp.where(ii == x0, 1.0 - fx, 0.0)
                   + jnp.where(ii == x0 + 1, fx, 0.0)) * wvert  # [Wv,tp]
            # pre-sum over points (grad rows are point-independent):
            # static lane slices at p·W_q, 128-aligned
            wp = sum(w2t[:, p * wq:(p + 1) * wq] for p in range(npts))
            gh = jnp.where(
                jnp.logical_and(lane >= h * d, lane < (h + 1) * d),
                g_loc, 0.0)                               # [W_q, C]
            return acc_h + jax.lax.dot_general(
                wp.astype(jnp.bfloat16), gh.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [W_v, C]

        return jax.lax.fori_loop(0, heads, head_body, acc)

    acc = jax.lax.fori_loop(0, qg, body,
                            jnp.zeros((wv, c), jnp.float32))
    dval_ref[0, 0] += acc


def _k2_qbase(v, hq, hv, band, qg, nq):
    """First query-row BLOCK whose rows can band-cover value row v.
    Conservative: the [qb, qb+nq) blocks provably cover every query row
    r with s(r) ≤ v ≤ s(r)+band−1 (s is nondecreasing in r)."""
    qb = ((v - band) * hq // hv - qg) // qg
    return jnp.clip(qb, 0, hq // qg - nq)


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


def _window_rows(hv, band):
    """Chunk height m for the banded value window: the smallest
    power of two ≥ band that still leaves ≥ 2 chunks in H_v (the window
    is two adjacent m-row chunks — BlockSpec index maps offset in whole
    blocks, so an overlapping band window is expressed as the PAIR of
    aligned chunks that covers it).  0 = no windowing (tiny level: ship
    the whole [W_v, H_v·C] block like before — it is already small).

    ``TRANSCAR_MSDEF_WINDOW`` env: "0" disables windowing everywhere
    (whole-level blocks + per-sample barrier-serialized calls, the
    round-4 configuration); an integer forces that chunk height (perf
    probes).  Default: auto (smallest valid power of two)."""
    import os
    env = os.environ.get("TRANSCAR_MSDEF_WINDOW", "")
    if env == "0":
        return 0
    if env.isdigit():
        m = int(env)
        return m if (m >= band and hv % m == 0 and hv >= 2 * m) else 0
    m = 8
    while m < band:
        m *= 2
    return m if (hv % m == 0 and hv >= 2 * m) else 0


def _enc_pair(value_lv, omp, hq, wq, hv, wv, heads, d, npts, band,
              interpret):
    """All of one query level sampling one value level — one pallas call
    with the batch riding the grid's slow axis.

    value_lv: [B, H_v, W_v, C]; omp: [B, H_q, H·P·W_q, 8] →
    [B, H_q·W_q, C] partial output (this value level's contribution).

    The kernel sees only the two m-row value chunks covering the current
    query row's band (index maps below; _window_rows).  History: round 4
    shipped whole-level value blocks, which forced per-sample calls
    serialized via optimization_barrier — with batch in the grid Mosaic
    double-buffers the whole ~32 MB level (73 MB scoped-VMEM compile
    OOM), and unserialized per-sample calls stack two scoped allocations
    via XLA's async prefetch (71.69 MB, also OOM).  Result: ObjDGCNN
    batch ANTI-scaling (voxel bs2 1.76 vs bs1 2.35 samples/s).  The
    banded window shrinks the block H_v/2m× so double-buffering is
    cheap and the batch parallelism comes back."""
    b = value_lv.shape[0]
    c = heads * d
    m = _window_rows(hv, band)
    if m == 0 and b > 1:
        # whole-level fallback (window disabled/invalid): per-sample
        # calls serialized with optimization_barrier — with batch in the
        # grid Mosaic double-buffers the whole value level (73 MB scoped
        # OOM), and unserialized per-sample calls stack two scoped
        # allocations via XLA's async prefetch (71.69 MB, also OOM)
        outs = []
        for i in range(b):
            vi = value_lv[i:i + 1]
            if outs:
                vi, _ = jax.lax.optimization_barrier((vi, outs[-1]))
            outs.append(_enc_pair(vi, omp[i:i + 1], hq, wq, hv, wv,
                                  heads, d, npts, band, interpret))
        return jnp.concatenate(outs, axis=0)
    vt = jnp.transpose(value_lv, (0, 2, 1, 3)).reshape(b, wv, hv * c)
    kern = functools.partial(_enc_kernel, hq=hq, wq=wq, hv=hv, wv=wv,
                             c=c, d=d, heads=heads, npts=npts, band=band,
                             window_m=m)
    if m:
        vspecs = [
            pl.BlockSpec((1, wv, m * c),
                         lambda bi, r: (bi, 0,
                                        _window_chunk(r, hq, hv, band, m)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wv, m * c),
                         lambda bi, r: (bi, 0,
                                        _window_chunk(r, hq, hv, band, m)
                                        + 1),
                         memory_space=pltpu.VMEM),
        ]
        vals = (vt, vt)
    else:
        vspecs = [pl.BlockSpec((1, wv, hv * c), lambda bi, r: (bi, 0, 0),
                               memory_space=pltpu.VMEM)]
        vals = (vt,)
    out = pl.pallas_call(
        kern,
        grid=(b, hq),
        in_specs=vspecs + [
            pl.BlockSpec((1, 1, heads * npts * wq, 8),
                         lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, wq, c), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, wq, c), jnp.float32),
        scratch_shapes=([pltpu.VMEM((wv, 2 * m * c), vt.dtype)]
                        if m else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*vals, omp)
    return out.reshape(b, hq * wq, c)


def _bwd_taps_pair(vt, omp, g, hq, wq, hv, wv, heads, d, npts, band,
                   interpret):
    """K1 driver, whole batch: → dofs [B, H_q, heads·P·W_q, 4].

    Batch rides the grid's slow axis; the value blocks use the same
    two-chunk band window as the forward (whole revisited levels would
    double-buffer ~the full level per batch step — the scoped-VMEM OOM
    that used to force per-sample calls)."""
    b = vt.shape[0]
    c = heads * d
    th = heads * npts * wq
    m = _window_rows(hv, band)
    if m == 0 and b > 1:
        # same whole-level per-sample barrier fallback as _enc_pair
        outs = []
        for i in range(b):
            vi = vt[i:i + 1]
            if outs:
                vi, _ = jax.lax.optimization_barrier((vi, outs[-1]))
            outs.append(_bwd_taps_pair(vi, omp[i:i + 1], g[i:i + 1],
                                       hq, wq, hv, wv, heads, d, npts,
                                       band, interpret))
        return jnp.concatenate(outs, axis=0)
    kern = functools.partial(_bwd_taps_kernel, hq=hq, wq=wq, hv=hv,
                             wv=wv, c=c, d=d, heads=heads, npts=npts,
                             band=band, window_m=m)
    if m:
        vspecs = [
            pl.BlockSpec((1, wv, m * c),
                         lambda bi, r: (bi, 0,
                                        _window_chunk(r, hq, hv, band, m)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wv, m * c),
                         lambda bi, r: (bi, 0,
                                        _window_chunk(r, hq, hv, band, m)
                                        + 1),
                         memory_space=pltpu.VMEM),
        ]
        vals = (vt, vt)
    else:
        vspecs = [pl.BlockSpec((1, wv, hv * c), lambda bi, r: (bi, 0, 0),
                               memory_space=pltpu.VMEM)]
        vals = (vt,)
    return pl.pallas_call(
        kern,
        grid=(b, hq),
        in_specs=vspecs + [
            pl.BlockSpec((1, 1, th, 8), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wq, c), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, th, 4), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hq, th, 4), jnp.float32),
        scratch_shapes=([pltpu.VMEM((wv, 2 * m * c), vt.dtype)]
                        if m else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*vals, omp, g)


def _bwd_value_pair(omp, g, hq, wq, hv, wv, heads, d, npts, band,
                    interpret):
    """K2 driver, whole batch: → d_value [B, H_v, W_v, C].  Every K2
    block is small (per-(v,k) tap/grad slices, a per-v output row), so
    the batch rides the grid with no windowing needed."""
    b = omp.shape[0]
    c = heads * d
    qg = min(8, hq)
    nblocks = hq // qg
    width_rows = 2 * band * hq // hv + 2 * qg + 2
    nq = min(nblocks, -(-width_rows // qg))
    # transposed per-tap lanes: taps on the LANE axis (an [taps, 8]
    # block pads its 8-wide lane dim to 128 — 16× VMEM, measured OOM).
    # Each head's tap run pads to a 128-multiple so in-kernel lane
    # slice starts are provably aligned (padded taps carry aw = 0).
    tp = npts * wq
    tp_pad = -(-tp // 128) * 128
    omp5 = omp.reshape(b, hq, heads, tp, 8)
    omp5 = jnp.pad(omp5, ((0, 0), (0, 0), (0, 0), (0, tp_pad - tp),
                          (0, 0)))
    ompt = omp5.transpose(0, 4, 1, 2, 3).reshape(
        b, 8, nblocks, qg * heads * tp_pad)
    ompt = ompt.transpose(0, 2, 1, 3)    # [B, nblocks, 8, qg·H·tp_pad]
    gb = g.reshape(b, nblocks, qg * wq, c)
    kern = functools.partial(_bwd_value_kernel, hq=hq, wq=wq, hv=hv,
                             wv=wv, c=c, d=d, heads=heads, npts=npts,
                             band=band, qg=qg, nq=nq)

    def _qmap(bi, v, k):
        return (bi, _k2_qbase(v, hq, hv, band, qg, nq) + k, 0, 0)

    return pl.pallas_call(
        kern,
        grid=(b, hv, nq),
        in_specs=[
            pl.BlockSpec((1, 1, 8, qg * heads * tp_pad), _qmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qg * wq, c), _qmap,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, wv, c),
                               lambda bi, v, k: (bi, v, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hv, wv, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(ompt, gb)


def _encoder_bwd_impl(value, spatial_shapes, sampling_locations,
                      attention_weights, band, interpret, g):
    """Banded backward: per (query level, value level) pair run K1
    (per-tap d_attn/d_loc) and K2 (d_value) over the whole batch and
    reassemble.  (Round 4 looped per sample because K1's whole-level
    value blocks couldn't share VMEM across batch grid steps; the
    two-chunk band window removed that, so the batch rides the pallas
    grid here exactly as in the forward.)"""
    b, s, heads, d = value.shape
    _, q, _, l, npts, _ = sampling_locations.shape
    c = heads * d
    vt = value.astype(jnp.bfloat16)

    starts, acc = [], 0
    for (hl, wl) in spatial_shapes:
        starts.append(acc)
        acc += hl * wl

    d_val_lv = [None] * l
    d_loc_lq, d_aw_lq = [], []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        q0 = starts[lq]
        nl = hq * wq
        g_lq = g[:, q0:q0 + nl].reshape(b, hq, wq, c)
        d_loc_parts, d_aw_parts = [], []
        for lv, (hv, wv) in enumerate(spatial_shapes):
            bnd = min(band, hv)
            vl = vt[:, starts[lv]:starts[lv] + hv * wv]
            vl_t = jnp.transpose(
                vl.reshape(b, hv, wv, c), (0, 2, 1, 3)
            ).reshape(b, wv, hv * c)
            omp = _omp_precompute(
                sampling_locations[:, q0:q0 + nl, :, lv],
                attention_weights[:, q0:q0 + nl, :, lv],
                hq, wq, hv, wv)
            dofs = _bwd_taps_pair(vl_t, omp, g_lq, hq, wq, hv, wv,
                                  heads, d, npts, bnd, interpret)
            dofs = dofs.reshape(b, hq, heads, npts, wq, 4)
            dofs = dofs.transpose(0, 1, 4, 2, 3, 5)   # [B,Hq,Wq,H,P,4]
            dofs = dofs.reshape(b, nl, heads, npts, 4)
            d_aw_parts.append(dofs[..., 0])
            d_loc_parts.append(jnp.stack(
                [dofs[..., 1] * wv, dofs[..., 2] * hv], axis=-1))
            dv = _bwd_value_pair(omp, g_lq, hq, wq, hv, wv, heads,
                                 d, npts, bnd, interpret)
            d_val_lv[lv] = dv if d_val_lv[lv] is None \
                else d_val_lv[lv] + dv
        d_aw_lq.append(jnp.stack(d_aw_parts, axis=3))  # [B,nl,H,L,P]
        d_loc_lq.append(jnp.stack(d_loc_parts, axis=3))

    d_value = jnp.concatenate(
        [d_val_lv[lv].reshape(b, hl * wl, heads, d)
         for lv, (hl, wl) in enumerate(spatial_shapes)],
        axis=1).astype(value.dtype)
    d_loc = jnp.concatenate(d_loc_lq, axis=1).astype(
        sampling_locations.dtype)
    d_aw = jnp.concatenate(d_aw_lq, axis=1).astype(
        attention_weights.dtype)
    return d_value, d_loc, d_aw


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def pallas_msdeform_encoder_ad(value, spatial_shapes, sampling_locations,
                               attention_weights, band=16,
                               interpret=False):
    """Differentiable banded encoder attention: the forward kernel plus
    a custom banded Pallas VJP (see module docstring).  Gradients equal
    the exact XLA path's wherever every vertical tap stays in band —
    the same contract as the forward."""
    return pallas_msdeform_encoder(value, spatial_shapes,
                                   sampling_locations, attention_weights,
                                   band, interpret)


def _ad_fwd(value, spatial_shapes, sampling_locations, attention_weights,
            band, interpret):
    out = pallas_msdeform_encoder(value, spatial_shapes,
                                  sampling_locations, attention_weights,
                                  band, interpret)
    return out, (value, sampling_locations, attention_weights)


def _ad_bwd(spatial_shapes, band, interpret, res, g):
    value, loc, aw = res
    return _encoder_bwd_impl(value, spatial_shapes, loc, aw, band,
                             interpret, g)


pallas_msdeform_encoder_ad.defvjp(_ad_fwd, _ad_bwd)


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
