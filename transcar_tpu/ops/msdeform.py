"""Multi-scale deformable attention sampling (N9 of SURVEY.md §2.4).

The reference's DGCNN track uses mmcv's ``MultiScaleDeformableAttention``
CUDA extension (configs/obj_dgcnn/pillar.py:76,94).  The core op — sample
each (query, head, level, point) location bilinearly from the per-head
value maps and reduce with softmaxed attention weights
(``multi_scale_deformable_attn_pytorch`` semantics, grid_sample
align_corners=False) — reuses the shared bilinear gather.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from transcar_tpu.ops.sampling import bilinear_sample_nhwc


def ms_deform_attn_core(value: jnp.ndarray,
                        spatial_shapes: Sequence[Tuple[int, int]],
                        sampling_locations: jnp.ndarray,
                        attention_weights: jnp.ndarray,
                        query_chunk: int = 0) -> jnp.ndarray:
    """Args:
      value: [B, S, H, D] flattened multi-level values (S = Σ H_l·W_l).
      spatial_shapes: static list of (H_l, W_l).
      sampling_locations: [B, Q, H, L, P, 2] in [0, 1] per level (x, y).
      attention_weights: [B, Q, H, L, P] (already softmaxed over L·P).
      query_chunk: when > 0 and Q > query_chunk, process queries in
        sequential chunks of this size (an unrolled Python loop — see the
        in-body comment for why not ``lax.map``/``scan`` — with a ragged
        final chunk, no padding) — EXACT, trades one materialized
        [B·H, Q·P, D] gather (4+ GB for
        the encoder's Q = Σ H_l·W_l self-attention at full BEV
        resolution — an HBM-OOM at batch 2 on v5e) for sequential
        ~chunk-sized gathers.  0 = single pass (decoder-sized Q).
    Returns:
      [B, Q, H·D].
    """
    b, s, h, d = value.shape
    _, q, _, l, p, _ = sampling_locations.shape

    if query_chunk and q > query_chunk:
        # UNROLLED chunk loop, deliberately not lax.map/scan: the
        # scan-form chunking reproducibly crashed the v5e TPU worker
        # ("kernel fault") when embedded in the full ObjDGCNN program
        # (2/2 runs; the op in isolation ran fine) — a plain Python loop
        # compiles to the same sequential schedule without the scan
        # machinery.  nc is ~6 at 512² BEV, far from the unroll limits.
        outs = []
        for s0 in range(0, q, query_chunk):
            s1 = min(s0 + query_chunk, q)
            outs.append(ms_deform_attn_core(
                value, spatial_shapes,
                sampling_locations[:, s0:s1], attention_weights[:, s0:s1]))
        return jnp.concatenate(outs, axis=1)

    starts = []
    acc = 0
    for (hl, wl) in spatial_shapes:
        starts.append(acc)
        acc += hl * wl

    out = jnp.zeros((b, q, h, d), value.dtype)
    for li, (hl, wl) in enumerate(spatial_shapes):
        vmap_lvl = value[:, starts[li]:starts[li] + hl * wl]   # [B,HW,H,D]
        vmap_lvl = vmap_lvl.transpose(0, 2, 1, 3).reshape(b * h, hl, wl, d)
        loc = sampling_locations[:, :, :, li]                  # [B,Q,H,P,2]
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(b * h, q * p, 2)
        sampled = jax.vmap(bilinear_sample_nhwc)(vmap_lvl, loc)
        sampled = sampled.reshape(b, h, q, p, d)
        wgt = attention_weights[:, :, :, li].transpose(0, 2, 1, 3)  # [B,H,Q,P]
        out = out + jnp.einsum("bhqpd,bhqp->bqhd", sampled,
                               wgt.astype(sampled.dtype),
                               precision=jax.lax.Precision.HIGHEST)
    return out.reshape(b, q, h * d)
