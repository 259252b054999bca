"""NMS-free box decoding (C7 of SURVEY.md §2).

Parity target: ``NMSFreeCoder.decode_single``
(core/bbox/coders/nms_free_coder.py:39-111) + the gravity→bottom-center z
shift at ``get_bboxes`` (detr3d_head.py:1018):

  * sigmoid scores, flat top-k (max_num=300) over query×class,
  * labels = idx % num_classes, boxes via ``denormalize_bbox``,
  * post-center-range filter (± optional score threshold),
  * only the last decoder layer is decoded (:104-105),
  * z := z − h/2 back to bottom-center.

Static-shape version: always returns ``max_num`` rows plus a validity mask
(the reference returns a ragged filtered list; callers drop invalid rows on
the host).  jit- and vmap-safe.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from transcar_tpu.core.boxes import denormalize_bbox
from transcar_tpu.core.config import HeadConfig


def nms_free_decode(preds: Dict[str, jnp.ndarray],
                    cfg: HeadConfig) -> Dict[str, jnp.ndarray]:
    """Decode the last layer's predictions for a batch.

    Args:
      preds: dict with all_cls_scores [L, B, Q, C], all_bbox_preds
        [L, B, Q, 10].
    Returns:
      dict(boxes [B, max_num, 9] bottom-center boxes, scores [B, max_num],
           labels [B, max_num], valid [B, max_num] bool).
    """
    cls_scores = preds["all_cls_scores"][-1]
    bbox_preds = preds["all_bbox_preds"][-1]
    return jax.vmap(lambda c, b: _decode_single(c, b, cfg))(
        cls_scores, bbox_preds)


def _decode_single(cls_scores, bbox_preds, cfg: HeadConfig):
    nc = cfg.num_classes
    scores = jax.nn.sigmoid(cls_scores).reshape(-1)          # [Q*C]
    k = min(cfg.max_detections, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    labels = (idx % nc).astype(jnp.int32)
    box_idx = idx // nc
    box_codes = bbox_preds[box_idx]                          # [K, 10]
    boxes = denormalize_bbox(box_codes)                      # [K, 9] grav-z

    pcr = jnp.asarray(cfg.post_center_range, jnp.float32)
    centers = boxes[..., :3]
    valid = ((centers >= pcr[:3]).all(-1) & (centers <= pcr[3:]).all(-1))
    if cfg.score_threshold is not None:
        valid = valid & (top_scores > cfg.score_threshold)

    # gravity-center z → bottom-center z (detr3d_head.py:1018)
    boxes = boxes.at[..., 2].add(-0.5 * boxes[..., 5])
    return {
        "boxes": boxes,
        "scores": top_scores,
        "labels": labels,
        "valid": valid,
    }
