"""Sigmoid focal loss + focal matching cost (N4 of SURVEY.md §2.4).

The reference uses mmcv's CUDA ``sigmoid_focal_loss`` via mmdet's
``FocalLoss`` (config detr3d_res101_gridmask.py:95-100) and mmdet's
``FocalLossCost`` for Hungarian matching (config :111).  Both are pure
elementwise math here; XLA fuses them into surrounding computation.

Semantics matched against mmdet's ``py_sigmoid_focal_loss``:
  pt            = (1 - p) * t + p * (1 - t)
  focal_weight  = (alpha * t + (1 - alpha) * (1 - t)) * pt ** gamma
  loss          = BCE_with_logits(x, t) * focal_weight
with integer labels one-hot-expanded and label == num_classes meaning
background (all-zero one-hot row).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_weights: jnp.ndarray,
    num_classes: int,
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor: jnp.ndarray | float = 1.0,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Focal classification loss over flat query predictions.

    Args:
      logits: [N, num_classes] raw class logits.
      labels: [N] int labels in [0, num_classes]; num_classes = background.
      label_weights: [N] per-query weights (also used to void padded queries).
      avg_factor: normalizer (num_pos + bg_weight * num_neg, possibly
        pmean-synced across devices; detr3d_head.py:889-895).
    Returns:
      scalar loss.
    """
    onehot = jax.nn.one_hot(labels, num_classes + 1,
                            dtype=logits.dtype)[..., :num_classes]
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * onehot + p * (1.0 - onehot)
    focal_weight = (alpha * onehot + (1.0 - alpha) * (1.0 - onehot)) * (
        pt ** gamma)
    bce = _bce_with_logits(logits, onehot)
    loss = bce * focal_weight * label_weights[..., None]
    return loss_weight * jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)


def focal_loss_cost(
    logits: jnp.ndarray,
    gt_labels: jnp.ndarray,
    weight: float = 2.0,
    gamma: float = 2.0,
    alpha: float = 0.25,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """mmdet ``FocalLossCost`` for Hungarian matching.

    cost = (pos_cost - neg_cost)[query, gt_label], where
      neg_cost = -(1 - p + eps).log() * (1 - alpha) * p^gamma
      pos_cost = -(p + eps).log() * alpha * (1 - p)^gamma

    Args:
      logits: [Q, num_classes]; gt_labels: [G] int.
    Returns:
      [Q, G] classification cost.
    """
    p = jax.nn.sigmoid(logits)
    neg_cost = -jnp.log(1.0 - p + eps) * (1.0 - alpha) * p ** gamma
    pos_cost = -jnp.log(p + eps) * alpha * (1.0 - p) ** gamma
    cls_cost = pos_cost[:, gt_labels] - neg_cost[:, gt_labels]
    return cls_cost * weight


def _bce_with_logits(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable binary cross entropy with logits."""
    return jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weights: jnp.ndarray,
    avg_factor: jnp.ndarray | float = 1.0,
    loss_weight: float = 0.25,
) -> jnp.ndarray:
    """Weighted L1 regression loss (mmdet ``L1Loss``, config :101)."""
    loss = jnp.abs(pred - target) * weights
    return loss_weight * jnp.sum(loss) / jnp.maximum(avg_factor, 1.0)
