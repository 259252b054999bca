"""Test-time augmentation utilities.

The reference's ObjDGCNN ``aug_test_pts`` (obj_dgcnn.py:84-187) is inherited
CenterPoint code: it indexes CenterHead-style ``reg``/``rot``/``vel`` output
maps that ``DGCNN3DHead`` never produces, so it cannot run with the model it
ships with.  Here we provide a *working* double-flip TTA for the DETR-style
heads: flip the input point cloud, decode each view, map boxes back to the
canonical frame, concatenate and keep the global top-k.

LiDAR flip conventions (mmdet3d ``LiDARInstance3DBoxes.flip``):
  horizontal (BEV y): y → −y, yaw → −yaw, vy → −vy
  vertical   (BEV x): x → −x, yaw → −yaw + π, vx → −vx
"""
from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np


def flip_points(points: jnp.ndarray, horizontal: bool = False,
                vertical: bool = False) -> jnp.ndarray:
    """points: [..., N, F] with xyz in the first 3 dims."""
    pts = points
    if horizontal:
        pts = pts.at[..., 1].multiply(-1.0)
    if vertical:
        pts = pts.at[..., 0].multiply(-1.0)
    return pts


def unflip_boxes(boxes: jnp.ndarray, horizontal: bool = False,
                 vertical: bool = False) -> jnp.ndarray:
    """boxes: [..., 9] (x, y, z, w, l, h, yaw, vx, vy) decoded in the
    flipped frame → canonical frame."""
    b = boxes
    if horizontal:
        b = b.at[..., 1].multiply(-1.0)
        b = b.at[..., 6].multiply(-1.0)
        if b.shape[-1] > 8:
            b = b.at[..., 8].multiply(-1.0)
    if vertical:
        b = b.at[..., 0].multiply(-1.0)
        b = b.at[..., 6].set(-b[..., 6] + jnp.pi)
        if b.shape[-1] > 7:
            b = b.at[..., 7].multiply(-1.0)
    return b


def merge_flip_detections(decoded: List[Dict[str, jnp.ndarray]],
                          flips: List[tuple],
                          max_num: int = 300) -> Dict[str, np.ndarray]:
    """Merge per-view decoded detections (eval.decode output format, one
    sample each) into a single top-k set.

    Args:
      decoded: list of dicts with boxes [K, 9], scores [K], labels [K],
        valid [K] — one per augmented view.
      flips: matching list of (horizontal, vertical) the view was run with.
    """
    boxes, scores, labels = [], [], []
    for det, (hor, ver) in zip(decoded, flips):
        b = unflip_boxes(jnp.asarray(det["boxes"]), hor, ver)
        s = np.asarray(det["scores"]) * np.asarray(det["valid"])
        boxes.append(np.asarray(b))
        scores.append(s)
        labels.append(np.asarray(det["labels"]))
    boxes = np.concatenate(boxes)
    scores = np.concatenate(scores)
    labels = np.concatenate(labels)
    order = np.argsort(-scores)[:max_num]
    return {
        "boxes": boxes[order],
        "scores": scores[order],
        "labels": labels[order],
        "valid": scores[order] > 0,
    }
