"""TransCAR head: DETR3D camera decoding + radar-fusion decoder layers.

Parity target: ``Detr3DHead``
(projects/mmdet3d_plugin/models/dense_heads/detr3d_head.py).  Structure:

  1. 900 learned query embeddings, split 512 → (query_pos, query) (:263,
     detr3d_transformer.py:119), initial 3D reference points =
     sigmoid(Linear(query_pos)) (:122-123).
  2. 6 decoder layers with iterative (detached) bbox refinement
     (detr3d_transformer.py:181-208); per-layer camera cls/reg outputs
     (:277-298) — kept for the camera-only DETR3D preset, *discarded from
     the loss* in TransCAR mode (:607-608).
  3. Radar token encoders: xyz MLP + 36-dim feature MLP, summed (:173-189,
     :531-536).  Radar tokens are produced by the input pipeline
     (data/radar.py), not inside forward — SURVEY.md §7 inversion #1.
  4. 3 fusion layers (:538-729): distance-circle attention masks (center +
     front/rear circles at ±0.25·length along heading with the reference's
     −sin/−cos convention :554-555), masked cross attention with an
     any-token-visible update gate (replacing the row gather/scatter
     :573-581), FFN, per-layer final cls/reg heads, reference chaining.

``strict_reference_compat`` replicates the z-denormalization no-op of
(:596-598): ``reference[..., 4:5]`` on a 3-dim tensor is an empty slice, so
fusion layer 1 adds *normalized* z as its base.  Set False to fix it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.core.boxes import inverse_sigmoid
from transcar_tpu.core.config import HeadConfig
from transcar_tpu.models.common import LN_EPS, MLP, Dense, TorchMHA
from transcar_tpu.models.detr3d import Detr3DDecoderLayer


class TransCARHead(nn.Module):
    """Full head; see module docstring."""

    cfg: HeadConfig

    def setup(self):
        c = self.cfg
        e = c.embed_dims
        self.query_embedding = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (c.num_query, 2 * e))
        self.reference_points = Dense(
            3, kernel_init=nn.initializers.variance_scaling(
                1.0, "fan_avg", "uniform"), name="reference_points")
        self.decoder_layers = [
            Detr3DDecoderLayer(
                embed_dims=e, num_heads=c.num_heads, ffn_dims=c.ffn_dims,
                num_cams=c.num_cams, num_points=c.num_points,
                num_levels=c.num_levels, pc_range=c.pc_range,
                name=f"decoder_layer{i}")
            for i in range(c.num_decoder_layers)
        ]
        self.cls_branches = [
            MLP((e, e, c.num_classes), layer_norm=True,
                name=f"cls_branch{i}")
            for i in range(c.num_decoder_layers)
        ]
        self.reg_branches = [
            MLP((e, e, c.code_size), name=f"reg_branch{i}")
            for i in range(c.num_decoder_layers)
        ]
        if c.with_radar_fusion:
            self.radar_pos_encoder = MLP(
                (e, e), layer_norm=True, final_activation=True,
                name="radar_pos_encoder")
            self.radar_feat_encoder = MLP(
                (64, 128, e), final_activation=True,
                name="radar_feat_encoder")
            self.fusion_attns = [
                TorchMHA(e, c.num_heads, name=f"fusion{i}_attn")
                for i in range(c.num_fusion_layers)]
            self.fusion_linear1 = [
                Dense(c.ffn_dims, name=f"fusion{i}_linear1")
                for i in range(c.num_fusion_layers)]
            self.fusion_linear2 = [
                Dense(e, name=f"fusion{i}_linear2")
                for i in range(c.num_fusion_layers)]
            self.fusion_norm2 = [
                nn.LayerNorm(epsilon=LN_EPS, name=f"fusion{i}_norm2")
                for i in range(c.num_fusion_layers)]
            self.fusion_norm3 = [
                nn.LayerNorm(epsilon=LN_EPS, name=f"fusion{i}_norm3")
                for i in range(c.num_fusion_layers)]
            self.final_cls = [
                MLP((e, e, c.num_classes), layer_norm=True,
                    name=f"final_cls{i}")
                for i in range(c.num_fusion_layers)]
            self.final_reg = [
                MLP((e, e, c.code_size), name=f"final_reg{i}")
                for i in range(c.num_fusion_layers)]

    def __call__(self, mlvl_feats, lidar2img, img_hw, radar_tokens=None,
                 deterministic: bool = True,
                 stop_camera_grad: bool = False):
        """Args:
          mlvl_feats: list of [B, N, H_l, W_l, E] FPN levels (fp32).
          lidar2img: [B, N, 4, 4].
          img_hw: static (H, W) of the padded input image.
          radar_tokens: [B, T, 36] featurized radar (padding rows filled
            with the 500.0 sentinel, data/radar.py) — required when
            cfg.with_radar_fusion.
          stop_camera_grad: cut the gradient at the fusion input.  The
            reference trains ONLY the fusion stage (tools/train.py:238-252
            sets requires_grad=False on the whole camera net, so torch
            never computes a camera backward); this reproduces that
            compute shape — the loss/grads of the trainable params are
            bitwise unchanged, the camera backward is simply not built.
        Returns:
          dict(all_cls_scores [L, B, Q, num_classes],
               all_bbox_preds [L, B, Q, code_size]).
        """
        c = self.cfg
        e = c.embed_dims
        b = mlvl_feats[0].shape[0]
        lo = jnp.asarray(c.pc_range[:3], jnp.float32)
        hi = jnp.asarray(c.pc_range[3:], jnp.float32)

        query_pos = jnp.broadcast_to(
            self.query_embedding[:, :e], (b, c.num_query, e))
        query = jnp.broadcast_to(
            self.query_embedding[:, e:], (b, c.num_query, e))
        ref = nn.sigmoid(self.reference_points(query_pos))   # [B, Q, 3]

        cam_cls, cam_coord, inter_refs = [], [], []
        for lid, layer in enumerate(self.decoder_layers):
            query = layer(query, query_pos, ref, mlvl_feats, lidar2img,
                          img_hw, deterministic=deterministic)
            tmp = self.reg_branches[lid](query)              # [B, Q, 10]
            ref_logit = inverse_sigmoid(ref)
            # camera output coords (pre-update reference, :287-293)
            xy = nn.sigmoid(tmp[..., 0:2] + ref_logit[..., 0:2])
            z = nn.sigmoid(tmp[..., 4:5] + ref_logit[..., 2:3])
            coord = jnp.concatenate([
                xy * (hi[:2] - lo[:2]) + lo[:2],
                tmp[..., 2:4],
                z * (hi[2] - lo[2]) + lo[2],
                tmp[..., 5:],
            ], axis=-1)
            cam_cls.append(self.cls_branches[lid](query))
            cam_coord.append(coord)
            # iterative refinement, detached (detr3d_transformer.py:195-203)
            ref = jax.lax.stop_gradient(
                jnp.concatenate([xy, z], axis=-1))
            inter_refs.append(ref)

        if not c.with_radar_fusion:
            return {
                "all_cls_scores": jnp.stack(cam_cls),
                "all_bbox_preds": jnp.stack(cam_coord),
            }
        cam_query, cam_coord_last = query, cam_coord[-1]
        if stop_camera_grad:
            cam_query = jax.lax.stop_gradient(cam_query)
            cam_coord_last = jax.lax.stop_gradient(cam_coord_last)
        return self.fuse(cam_query, inter_refs[-1], cam_coord_last,
                         radar_tokens, deterministic=deterministic)

    def fuse(self, query, ref01, cam_coord_last, radar_tokens,
             deterministic: bool = True):
        """TransCAR fusion stage (detr3d_head.py:538-729), exposed as its
        own method so parity tests can drive it with fixed decoder outputs.

        query: [B, Q, E] final decoder features (hs[5]);
        ref01: [B, Q, 3] post-layer-6 reference points in [0, 1];
        cam_coord_last: [B, Q, 10] camera layer-6 denormalized coords
        (drives the layer-1 mask geometry); radar_tokens: [B, T, 36].
        """
        c = self.cfg
        lo = jnp.asarray(c.pc_range[:3], jnp.float32)
        hi = jnp.asarray(c.pc_range[3:], jnp.float32)
        radar_xy = radar_tokens[..., :2].astype(jnp.float32)  # [B, T, 2]
        radar_emb = (
            self.radar_pos_encoder(radar_tokens[..., :3])
            + self.radar_feat_encoder(radar_tokens))          # [B, T, E]

        ref_m = ref01 * (hi - lo) + lo                        # denorm (:545-547)
        base_xy = ref_m[..., 0:2]
        if c.strict_reference_compat:
            base_z = ref01[..., 2:3]      # the z-denorm no-op quirk (:596-598)
        else:
            base_z = ref_m[..., 2:3]
        tmp_prev = cam_coord_last         # camera layer-6 coords drive masks

        out_cls, out_coord = [], []
        centers_xy = base_xy
        for i in range(c.num_fusion_layers):
            keep = self._fusion_keep_mask(
                centers_xy, tmp_prev, radar_xy, c.fusion_radius_clamps[i])
            attn_out, _ = self._fusion_attend(i, query, radar_emb, keep,
                                              deterministic)
            query = query + attn_out
            query = self.fusion_norm2[i](query)
            ffn = self.fusion_linear2[i](
                self._dropout(nn.relu(self.fusion_linear1[i](query)),
                              deterministic))
            query = query + self._dropout(ffn, deterministic)
            query = self.fusion_norm3[i](query)

            cls = self.final_cls[i](query)
            reg = self.final_reg[i](query)
            coord = jnp.concatenate([
                reg[..., 0:2] + centers_xy,
                reg[..., 2:4],
                reg[..., 4:5] + base_z,
                reg[..., 5:],
            ], axis=-1)
            out_cls.append(cls)
            out_coord.append(coord)
            # next layer's reference = this layer's box center (:615-617)
            centers_xy = coord[..., 0:2]
            base_z = coord[..., 4:5]
            tmp_prev = coord

        return {
            "all_cls_scores": jnp.stack(out_cls),
            "all_bbox_preds": jnp.stack(out_coord),
        }

    def _fusion_attend(self, i, query, radar_emb, keep, deterministic):
        """Masked cross attention + the reference's attn-output dropout
        (rf_dropout2*, applied only to updated rows)."""
        attn = self.fusion_attns[i]
        out = attn(query, radar_emb, radar_emb, mask=~keep,
                   deterministic=deterministic,
                   use_pallas=self.cfg.use_pallas_attention)
        gate = jnp.any(keep, axis=-1, keepdims=True).astype(query.dtype)
        out = self._dropout(out, deterministic) * gate
        return out, gate

    def _dropout(self, x, deterministic, rate: float = 0.1):
        if deterministic:
            return x
        rng = self.make_rng("dropout")
        keepp = 1.0 - rate
        keep = jax.random.bernoulli(rng, keepp, x.shape)
        return x * keep / keepp

    def _fusion_keep_mask(self, centers_xy, box_coord, radar_xy, clamp):
        return fusion_keep_mask(centers_xy, box_coord, radar_xy, clamp)


def fusion_keep_mask(centers_xy, box_coord, radar_xy, clamp):
    """Three-circle visibility mask (detr3d_head.py:549-571).

    centers_xy: [B, Q, 2] metric; box_coord: [B, Q, 10] denormalized box
    code driving (length, heading); radar_xy: [B, T, 2].
    Returns bool [B, Q, T], True = radar token visible to query.
    """
    length = jnp.exp(box_coord[..., 3])                  # [B, Q]
    # the reference negates both sin and cos and applies sin→x, cos→y
    # (:554-559); replicated verbatim.
    s = -box_coord[..., 6]
    co = -box_coord[..., 7]
    offset = 0.25 * length
    front = centers_xy + jnp.stack([offset * s, offset * co], axis=-1)
    rear = centers_xy - jnp.stack([offset * s, offset * co], axis=-1)
    radii = jnp.clip(length * 0.5, clamp[0], clamp[1])[..., None]

    def dist(a):
        d2 = jnp.sum(
            (a[:, :, None, :] - radar_xy[:, None, :, :]) ** 2, axis=-1)
        return jnp.sqrt(jnp.maximum(d2, 0.0))

    keep = ((dist(centers_xy) < radii) | (dist(front) < radii)
            | (dist(rear) < radii))
    return keep
