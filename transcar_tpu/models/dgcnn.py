"""ObjDGCNN: LiDAR pillar → BEV deformable-DETR detector (C12-C15).

Parity targets:
  * ``ObjDGCNN`` detector (models/detectors/obj_dgcnn.py): voxelize → VFE →
    scatter → SECOND → FPN → head.
  * ``DGCNN3DHead`` (models/dense_heads/dgcnn3d_head.py): BEV sine
    positional encodings over all-valid masks (:129-141), deformable-DETR
    2-layer encoder + 6-layer decoder with 2D reference points (:168-175),
    xy-only denormalization of outputs (:176-190), same Hungarian loss /
    NMSFree decode as the TransCAR head.
  * ``DGCNNAttn`` (models/utils/dgcnn_attn.py): cdist affinity → top-K=16
    neighbors — the reference takes the K *largest* distances (:86), kept —
    edge features cat(neighbor, center) → two 1×1 conv-BN-ReLU stages with
    channel max (:70-80).
  * ``Deformable3DDetrTransformerDecoder`` (models/utils/detr.py:67-100):
    refinement keeps only the first 2 dims of the 10-dim reg output.

BN layers are trainable (batch_stats collection; see models/second.py).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.core.boxes import inverse_sigmoid
from transcar_tpu.core.config import HeadConfig
from transcar_tpu.models.common import (FFN, LN_EPS, Dense, FrozenBN,
                                        MaskedBN, MLP, train_bn)
from transcar_tpu.models.second import BNFPN, SECOND
from transcar_tpu.ops.msdeform import ms_deform_attn_core
from transcar_tpu.ops.voxelize import hard_voxelize, pillar_scatter


def sine_positional_encoding(h: int, w: int, num_feats: int = 128,
                             temperature: float = 10000.0,
                             offset: float = -0.5,
                             scale: float = 2 * math.pi) -> jnp.ndarray:
    """mmdet SinePositionalEncoding(normalize=True, offset=-0.5) over an
    all-valid mask → [H, W, 2·num_feats]."""
    eps = 1e-6
    y = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=0)
    x = jnp.cumsum(jnp.ones((h, w), jnp.float32), axis=1)
    y = (y + offset) / (y[-1:, :] + eps) * scale
    x = (x + offset) / (x[:, -1:] + eps) * scale
    dim_t = temperature ** (2 * (jnp.arange(num_feats) // 2) / num_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                   axis=-1).reshape(h, w, num_feats)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                   axis=-1).reshape(h, w, num_feats)
    return jnp.concatenate([py, px], axis=-1)


class MSDeformAttention(nn.Module):
    """mmcv MultiScaleDeformableAttention parameter layout + math."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.1
    # exact query chunking for token-count-sized Q (the BEV encoder's
    # self-attention) — bounds the materialized gather intermediates;
    # see ops/msdeform.py::ms_deform_attn_core
    query_chunk: int = 0
    # "xla" | "pallas": the banded one-hot-matmul encoder kernel
    # (ops/pallas_msdeform.py, TPU inference; exact for |Δy| ≤ band/2−2
    # value-level cells, the DCN-kernel contract)
    impl: str = "xla"
    band: int = 16

    @nn.compact
    def __call__(self, query, query_pos, value,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 reference_points, deterministic: bool = True):
        """query: [B, Q, E]; value: [B, S, E]; reference_points:
        [B, Q, L, 2] in [0, 1]."""
        h, l, p = self.num_heads, self.num_levels, self.num_points
        identity = query
        if query_pos is not None:
            query = query + query_pos
        b, q, e = query.shape

        def offset_bias_init(key, shape, dtype=jnp.float32):
            # mmcv init: heads spread on a circle, scaled by point index
            thetas = jnp.arange(h, dtype=jnp.float32) * (2 * math.pi / h)
            grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
            grid = grid / jnp.abs(grid).max(-1, keepdims=True)
            grid = jnp.tile(grid[:, None, None, :], (1, l, p, 1))
            grid = grid * (jnp.arange(1, p + 1, dtype=jnp.float32)
                           [None, None, :, None])
            return grid.reshape(-1).astype(dtype)

        offsets = Dense(h * l * p * 2, kernel_init=nn.initializers.zeros,
                        bias_init=offset_bias_init,
                        name="sampling_offsets")(query)
        offsets = offsets.reshape(b, q, h, l, p, 2)
        weights = Dense(h * l * p, kernel_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        weights = jax.nn.softmax(weights.reshape(b, q, h, l * p), axis=-1)
        weights = weights.reshape(b, q, h, l, p)

        val = Dense(self.embed_dims, name="value_proj")(value)
        val = val.reshape(b, -1, h, e // h)
        normalizer = jnp.asarray([[wl, hl] for hl, wl in spatial_shapes],
                                 jnp.float32)                    # [L, 2]
        loc = (reference_points[:, :, None, :, None, :]
               + offsets / normalizer[None, None, None, :, None, :])
        if self.impl == "pallas":
            # the custom-VJP wrapper: identical forward kernel; under
            # a training backward it routes to the banded Pallas K1/K2
            # kernels (the XLA encoder backward is a 59.7 GB OOM at
            # full BEV resolution — docs/PERF_NOTES.md round 4)
            from transcar_tpu.ops.pallas_msdeform import (
                pallas_msdeform_encoder_ad)
            out = pallas_msdeform_encoder_ad(val, tuple(spatial_shapes),
                                             loc, weights, self.band)
        else:
            out = ms_deform_attn_core(val, spatial_shapes, loc, weights,
                                      query_chunk=self.query_chunk)
        out = Dense(self.embed_dims, name="output_proj")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return identity + out


class DGCNNAttn(nn.Module):
    """Graph self-attention replacement (dgcnn_attn.py:40-96)."""

    embed_dims: int = 256
    k: int = 16
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, query_pos, deterministic: bool = True):
        residual = query
        if query_pos is not None:
            query = query + query_pos

        def edge_feats(x):
            # affinity = cdist; torch.topk keeps the K LARGEST distances
            d2 = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, -1)
            aff = jnp.sqrt(jnp.maximum(d2, 0.0))
            k = min(self.k, x.shape[1])
            _, idx = jax.lax.top_k(aff, k)                   # [B, N, K]
            # gather neighbor ROWS directly: an earlier
            # repeat+take_along_axis form materialized [N, N, C] (every
            # i-slice identical) and its backward scatter-add into that
            # 92 MB buffer faulted the v5e worker (the LiDAR train-step
            # crash, bisected by scripts/probe_pillar_fault.py)
            neigh = jax.vmap(lambda xb, ib: xb[ib])(x, idx)  # [B, N, K, C]
            center = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
            return jnp.concatenate([neigh, center], axis=-1)

        def conv_bn_relu(x, name):
            # BN trains with the rest of the LiDAR track (type='BN')
            x = Dense(self.embed_dims, use_bias=False, name=name)(x)
            x = train_bn(self.embed_dims, name=name + "_bn")(
                x, use_running_average=deterministic)
            return nn.relu(x)

        e1 = conv_bn_relu(edge_feats(query), "conv1").max(axis=2)
        e2 = conv_bn_relu(edge_feats(e1), "conv2").max(axis=2)
        out = e1 + e2
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return residual + out


class PillarFeatureNet(nn.Module):
    """mmdet3d PillarFeatureNet (legacy=False): raw 5-dim point features +
    3 cluster-center offsets + 2 pillar-center offsets → Linear-BN-ReLU →
    max over points."""

    feat_channels: int = 64
    voxel_size: Tuple[float, float] = (0.2, 0.2)
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)

    @nn.compact
    def __call__(self, voxels, coords, counts, train: bool = False):
        """voxels: [P, M, 5]; coords: [P, 3] (z, y, x); counts: [P]."""
        p, m, _ = voxels.shape
        cnt = jnp.maximum(counts, 1)[:, None, None].astype(voxels.dtype)
        mean = jnp.sum(voxels[..., :3], axis=1, keepdims=True) / cnt
        f_cluster = voxels[..., :3] - mean
        vx, vy = self.voxel_size
        cx = (coords[:, 2:3].astype(voxels.dtype) * vx + vx / 2
              + self.pc_range[0])
        cy = (coords[:, 1:2].astype(voxels.dtype) * vy + vy / 2
              + self.pc_range[1])
        f_center = jnp.stack([
            voxels[..., 0] - cx, voxels[..., 1] - cy], axis=-1)
        feats = jnp.concatenate([voxels, f_cluster, f_center], axis=-1)
        mask = (jnp.arange(m)[None, :] < counts[:, None])[..., None]
        feats = feats * mask.astype(feats.dtype)
        x = Dense(self.feat_channels, use_bias=False, name="pfn0")(feats)
        # stats over real voxels only (padded [max_voxels] rows excluded;
        # zero-padded points within real voxels included, as in PFNLayer)
        x = MaskedBN(self.feat_channels, eps=1e-3, name="pfn0_bn")(
            x, (counts > 0)[:, None], train=train)
        x = nn.relu(x)
        x = jnp.where(mask, x, -jnp.inf)
        x = jnp.max(x, axis=1)
        return jnp.where(counts[:, None] > 0, x, 0.0)


class DGCNN3DHead(nn.Module):
    """Deformable-DETR head over BEV features."""

    cfg: HeadConfig
    bev_hw: Tuple[int, int] = (512, 512)
    num_encoder_layers: int = 2
    num_points: int = 4
    # chunk the encoder's token-count-sized deformable self-attention
    # (Q = Σ H_l·W_l ≈ 87k at 512² BEV): bounds gather intermediates to
    # ~chunk-size (HBM-OOM at bs2 unchunked on v5e); 0 disables
    encoder_query_chunk: int = 16384
    # "xla" | "pallas" — banded one-hot-matmul encoder attention
    # (ops/pallas_msdeform.py); resolved by build_model (TPU inference
    # AND training — the custom-VJP banded backward)
    encoder_msdeform_impl: str = "xla"
    # vertical band (value-level rows) of the pallas encoder attention;
    # training builds widen it (same policy as the DCN band)
    encoder_band: int = 16

    @nn.compact
    def __call__(self, mlvl_feats, deterministic: bool = True):
        c = self.cfg
        e = c.embed_dims
        b = mlvl_feats[0].shape[0]
        l = len(mlvl_feats)
        shapes = [(f.shape[1], f.shape[2]) for f in mlvl_feats]
        lo = jnp.asarray(c.pc_range[:3], jnp.float32)
        hi = jnp.asarray(c.pc_range[3:], jnp.float32)

        # flatten levels + positional & level embeddings
        level_embed = self.param("level_embeds",
                                 nn.initializers.normal(1.0), (l, e))
        tokens, pos = [], []
        for li, f in enumerate(mlvl_feats):
            hl, wl = shapes[li]
            tokens.append(f.reshape(b, hl * wl, e))
            pe = sine_positional_encoding(hl, wl, e // 2).reshape(1, -1, e)
            pos.append(jnp.broadcast_to(pe, (b, hl * wl, e))
                       + level_embed[li])
        value = jnp.concatenate(tokens, axis=1)        # [B, S, E]
        pos_embed = jnp.concatenate(pos, axis=1)

        # encoder reference points: per-level normalized cell centers,
        # broadcast across the L sampling-level axis
        refs = []
        for hl, wl in shapes:
            ry = (jnp.arange(hl, dtype=jnp.float32) + 0.5) / hl
            rx = (jnp.arange(wl, dtype=jnp.float32) + 0.5) / wl
            g = jnp.stack(jnp.meshgrid(rx, ry, indexing="xy"), -1)
            refs.append(g.reshape(-1, 2))
        enc_ref = jnp.concatenate(refs, 0)[None, :, None, :]
        enc_ref = jnp.broadcast_to(enc_ref, (b, enc_ref.shape[1], l, 2))

        x = value
        for i in range(self.num_encoder_layers):
            x = MSDeformAttention(e, c.num_heads, l, self.num_points,
                                  query_chunk=self.encoder_query_chunk,
                                  impl=self.encoder_msdeform_impl,
                                  band=self.encoder_band,
                                  name=f"encoder{i}_attn")(
                x, pos_embed, x, shapes, enc_ref,
                deterministic=deterministic)
            x = nn.LayerNorm(epsilon=LN_EPS, name=f"encoder{i}_norm1")(x)
            x = FFN(e, c.ffn_dims, name=f"encoder{i}_ffn")(
                x, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=LN_EPS, name=f"encoder{i}_norm2")(x)
        memory = x

        query_embedding = self.param("query_embedding",
                                     nn.initializers.normal(1.0),
                                     (c.num_query, 2 * e))
        query_pos = jnp.broadcast_to(query_embedding[:, :e],
                                     (b, c.num_query, e))
        query = jnp.broadcast_to(query_embedding[:, e:],
                                 (b, c.num_query, e))
        ref = nn.sigmoid(Dense(2, name="reference_points")(query_pos))

        cls_branches = [MLP((e, e, c.num_classes), layer_norm=True,
                            name=f"cls_branch{i}")
                        for i in range(c.num_decoder_layers)]
        reg_branches = [MLP((e, e, c.code_size), name=f"reg_branch{i}")
                        for i in range(c.num_decoder_layers)]

        out_cls, out_coord = [], []
        for i in range(c.num_decoder_layers):
            query = DGCNNAttn(e, name=f"decoder{i}_self_attn")(
                query, query_pos, deterministic=deterministic)
            query = nn.LayerNorm(epsilon=LN_EPS, name=f"decoder{i}_norm1")(
                query)
            ref_in = jnp.broadcast_to(ref[:, :, None, :],
                                      (b, c.num_query, l, 2))
            query = MSDeformAttention(e, c.num_heads, l, self.num_points,
                                      name=f"decoder{i}_cross_attn")(
                query, query_pos, memory, shapes, ref_in,
                deterministic=deterministic)
            query = nn.LayerNorm(epsilon=LN_EPS, name=f"decoder{i}_norm2")(
                query)
            query = FFN(e, c.ffn_dims, name=f"decoder{i}_ffn")(
                query, deterministic=deterministic)
            query = nn.LayerNorm(epsilon=LN_EPS, name=f"decoder{i}_norm3")(
                query)

            tmp = reg_branches[i](query)
            ref_logit = inverse_sigmoid(ref)
            xy = nn.sigmoid(tmp[..., 0:2] + ref_logit)
            coord = jnp.concatenate([
                xy * (hi[:2] - lo[:2]) + lo[:2], tmp[..., 2:]], axis=-1)
            out_cls.append(cls_branches[i](query))
            out_coord.append(coord)
            ref = jax.lax.stop_gradient(xy)

        return {
            "all_cls_scores": jnp.stack(out_cls),
            "all_bbox_preds": jnp.stack(out_coord),
        }


class ObjDGCNN(nn.Module):
    """Full LiDAR detector: pillars/voxels → SECOND → FPN → DGCNN head.

    ``encoder='pillar'``: PillarFeatureNet + scatter (pillar.py config).
    ``encoder='voxel'``: HardSimpleVFE (per-voxel point mean) + sparse 3D
    encoder (voxel.py:30-43) with the voxel config's two-stage SECOND
    (in 256, out (128, 256), strides (1, 2), :44-51).
    """

    cfg: HeadConfig
    encoder: str = "pillar"
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 8.0)
    max_points: int = 20
    max_voxels: int = 30000
    bev_hw: Tuple[int, int] = (512, 512)
    sparse_shape: Tuple[int, int, int] = (41, 1024, 1024)
    # SECOND+FPN BEV conv compute dtype (camera-track bf16 policy:
    # params/BN stats fp32, convs bf16, head fp32); None = fp32
    compute_dtype: Optional[str] = "bfloat16"
    # encoder deformable-attention impl (resolved by build_model:
    # "pallas" on TPU for inference AND training — custom-VJP banded
    # backward; "xla" on CPU)
    encoder_msdeform_impl: str = "xla"
    encoder_band: int = 16
    # sparse middle-encoder formulation: "gather" (static buffers +
    # dense-table lookup, the full-res default) | "dense" (masked MXU
    # convs; OOMs at full grid) — see models/sparse_encoder.py
    sparse_impl: str = "gather"

    @nn.compact
    def __call__(self, points, num_points, deterministic: bool = True):
        """points: [B, N_max, 5]; num_points: [B]."""
        c = self.cfg
        b = points.shape[0]
        voxels, coords, counts, nv = jax.vmap(
            lambda p, n: hard_voxelize(p, n, self.voxel_size, c.pc_range,
                                       self.max_points, self.max_voxels)
        )(points, num_points)
        pv, m, f = voxels.shape[1:]

        bev_dt = (jnp.dtype(self.compute_dtype) if self.compute_dtype
                  else jnp.float32)
        if self.encoder == "pillar":
            feats = PillarFeatureNet(64, self.voxel_size[:2], c.pc_range,
                                     name="vfe")(
                voxels.reshape(b * pv, m, f), coords.reshape(b * pv, 3),
                counts.reshape(b * pv), train=not deterministic)
            feats = feats.reshape(b, pv, -1)
            canvas = jax.vmap(
                lambda ft, co, n: pillar_scatter(ft, co, n, self.bev_hw)
            )(feats, coords, nv)                            # [B, H, W, 64]
            feats = SECOND(name="backbone")(canvas.astype(bev_dt),
                                            train=not deterministic)
        elif self.encoder == "voxel":
            from transcar_tpu.models.sparse_encoder import SparseEncoder

            # HardSimpleVFE: per-voxel mean of raw point features
            denom = jnp.maximum(counts, 1)[..., None].astype(voxels.dtype)
            vfeats = jnp.sum(voxels, axis=2) / denom        # [B, V, F]
            canvas = SparseEncoder(
                sparse_shape=self.sparse_shape, impl=self.sparse_impl,
                compute_dtype=(self.compute_dtype
                               if self.sparse_impl == "dense" else None),
                name="middle_encoder")(
                vfeats, coords, nv,
                train=not deterministic)                    # [B, H', W', 256]
            feats = SECOND(layer_nums=(5, 5), layer_strides=(1, 2),
                           out_channels=(128, 256), name="backbone")(
                canvas.astype(bev_dt), train=not deterministic)
        else:
            raise ValueError(f"unknown encoder {self.encoder!r}")

        feats = BNFPN(in_channels=tuple(f.shape[-1] for f in feats),
                      num_outs=c.num_levels, name="neck")(
            feats, train=not deterministic)
        # head math runs fp32 (same boundary as the camera track)
        feats = [f.astype(jnp.float32) for f in feats]
        return DGCNN3DHead(c, self.bev_hw,
                           encoder_msdeform_impl=self.encoder_msdeform_impl,
                           encoder_band=self.encoder_band,
                           name="head")(
            feats, deterministic=deterministic)
