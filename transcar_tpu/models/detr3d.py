"""DETR3D query decoder: self-attn → 3D-reference cross-attn → FFN.

Parity targets (projects/mmdet3d_plugin/models/utils/detr3d_transformer.py):
  * ``Detr3DCrossAtten`` (:218-378): per-query learned attention weights
    ``Linear(E, cams·points·levels)``, feature_sampling projection + bilinear
    gather, sigmoid(weights)·visibility-mask weighted sum, output proj +
    residual + ``position_encoder(inverse_sigmoid(ref))``.
  * layer order ('self_attn','norm','cross_attn','norm','ffn','norm') with
    mmcv ``MultiheadAttention`` residual semantics (query_pos added to q and
    k but not v; identity is the pre-pos query), config :65-82.

The iterative bbox refinement loop lives in the head (models/head.py) so the
reg branches are evaluated once and reused for both refinement and output
coords (the reference computes the identical quantity twice:
detr3d_transformer.py:191 and detr3d_head.py:284).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.core.boxes import denorm_points, inverse_sigmoid
from transcar_tpu.core.geometry import project_points_to_cams
from transcar_tpu.models.common import FFN, LN_EPS, Dense, MLP, TorchMHA
from transcar_tpu.ops.sampling import sample_multiview_multilevel


class Detr3DCrossAttention(nn.Module):
    """Project 3D reference points into every camera, sample FPN features,
    and fuse with learned per-(cam, point, level) weights."""

    embed_dims: int = 256
    num_heads: int = 8
    num_cams: int = 6
    num_points: int = 1
    num_levels: int = 4
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, query_pos, ref_points01, mlvl_feats, lidar2img,
                 img_hw, deterministic: bool = True):
        """query/query_pos: [B, Q, E]; ref_points01: [B, Q, 3] in [0, 1];
        mlvl_feats: list of [B, N, H, W, E]; lidar2img: [B, N, 4, 4]."""
        inp_residual = query
        q = query + query_pos

        # zero-init so initial attention is uniform 0.5 after sigmoid
        # (Detr3DCrossAtten.init_weight, detr3d_transformer.py:297-300)
        weights = Dense(
            self.num_cams * self.num_points * self.num_levels,
            kernel_init=nn.initializers.zeros, name="attention_weights")(q)
        b, nq, _ = q.shape
        weights = weights.reshape(
            b, nq, self.num_cams, self.num_points, self.num_levels)

        ref_m = denorm_points(ref_points01, self.pc_range)
        uv01, vis = project_points_to_cams(ref_m, lidar2img, img_hw)
        sampled = sample_multiview_multilevel(mlvl_feats, uv01)
        # sampled: [B, Q, N, L, E]; insert the (single) point axis
        sampled = sampled[:, :, :, None, :, :]                # [B,Q,N,P,L,E]
        vis_w = vis.transpose(0, 2, 1)[:, :, :, None, None]   # [B,Q,N,1,1]
        w = nn.sigmoid(weights) * vis_w.astype(weights.dtype)
        fused = jnp.einsum("bqnple,bqnpl->bqe", sampled, w,
                           precision=jax.lax.Precision.HIGHEST)

        out = Dense(self.embed_dims, name="output_proj")(fused)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        pos_feat = MLP(
            (self.embed_dims, self.embed_dims), layer_norm=True,
            final_activation=True, name="position_encoder",
        )(inverse_sigmoid(ref_points01))
        return out + inp_residual + pos_feat


class Detr3DDecoderLayer(nn.Module):
    """One DetrTransformerDecoderLayer (config :65-82)."""

    embed_dims: int = 256
    num_heads: int = 8
    ffn_dims: int = 512
    num_cams: int = 6
    num_points: int = 1
    num_levels: int = 4
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, query_pos, ref_points01, mlvl_feats, lidar2img,
                 img_hw, deterministic: bool = True):
        # self attention (mmcv MultiheadAttention: pos added to q/k, not v;
        # residual is the pre-pos query)
        q = query + query_pos
        attn = TorchMHA(self.embed_dims, self.num_heads, self.dropout,
                        name="self_attn")(q, q, query,
                                          deterministic=deterministic)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        query = query + attn
        query = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(query)

        query = Detr3DCrossAttention(
            self.embed_dims, self.num_heads, self.num_cams, self.num_points,
            self.num_levels, self.pc_range, self.dropout, name="cross_attn",
        )(query, query_pos, ref_points01, mlvl_feats, lidar2img, img_hw,
          deterministic=deterministic)
        query = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(query)

        query = FFN(self.embed_dims, self.ffn_dims, self.dropout,
                    name="ffn")(query, deterministic=deterministic)
        query = nn.LayerNorm(epsilon=LN_EPS, name="norm3")(query)
        return query
