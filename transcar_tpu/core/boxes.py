"""3D box codec and geometry helpers.

Behavioral parity targets (cited into /root/reference):
  * ``normalize_bbox`` / ``denormalize_bbox``:
    projects/mmdet3d_plugin/core/bbox/util.py:4-53 — the 10-dim box code is
    ``(cx, cy, log w, log l, cz, log h, sin yaw, cos yaw, vx, vy)``.
  * gravity-center target construction:
    projects/mmdet3d_plugin/models/dense_heads/detr3d_head.py:963-965 —
    loss targets use the box *gravity* center (bottom z + h/2).
  * decode-time z shift: detr3d_head.py:1018 — predicted gravity-center z is
    shifted back to bottom-center by ``z - h/2``.

Everything here is pure jax.numpy on static shapes so it fuses under jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize_bbox(bboxes: jnp.ndarray) -> jnp.ndarray:
    """Encode raw boxes ``(cx, cy, cz, w, l, h, yaw[, vx, vy])`` into the
    10-dim (or 8-dim) regression code.

    Parity: core/bbox/util.py:4-24.  Note the reordering: z moves to slot 4,
    dims are log-ed, yaw becomes (sin, cos).
    """
    cx = bboxes[..., 0:1]
    cy = bboxes[..., 1:2]
    cz = bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    parts = [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(normalized: jnp.ndarray) -> jnp.ndarray:
    """Decode the regression code back to
    ``(cx, cy, cz, w, l, h, yaw[, vx, vy])``.

    Parity: core/bbox/util.py:26-53 (atan2 on (sin, cos), exp on dims).
    """
    rot = jnp.arctan2(normalized[..., 6:7], normalized[..., 7:8])
    cx = normalized[..., 0:1]
    cy = normalized[..., 1:2]
    cz = normalized[..., 4:5]
    w = jnp.exp(normalized[..., 2:3])
    l = jnp.exp(normalized[..., 3:4])
    h = jnp.exp(normalized[..., 5:6])
    parts = [cx, cy, cz, w, l, h, rot]
    if normalized.shape[-1] > 8:
        parts += [normalized[..., 8:9], normalized[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)


def gravity_center_boxes(bottom_boxes: jnp.ndarray) -> jnp.ndarray:
    """LiDAR boxes with bottom-center z → gravity-center z.

    nuScenes GT boxes store ``(x, y, z_bottom, w, l, h, yaw, vx, vy)``; the
    loss targets concatenate ``gravity_center`` with dims/yaw/vel
    (detr3d_head.py:963-965; gravity z = z_bottom + h/2).
    """
    z_grav = bottom_boxes[..., 2:3] + bottom_boxes[..., 5:6] * 0.5
    return jnp.concatenate(
        [bottom_boxes[..., 0:2], z_grav, bottom_boxes[..., 3:]], axis=-1
    )


def bottom_center_boxes(gravity_boxes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`gravity_center_boxes` (decode path,
    detr3d_head.py:1018: ``bboxes[:, 2] -= bboxes[:, 5] * 0.5``)."""
    z_bot = gravity_boxes[..., 2:3] - gravity_boxes[..., 5:6] * 0.5
    return jnp.concatenate(
        [gravity_boxes[..., 0:2], z_bot, gravity_boxes[..., 3:]], axis=-1
    )


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Numerically clamped logit (detr3d_transformer.py:17-32)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def denorm_points(points01: jnp.ndarray, pc_range) -> jnp.ndarray:
    """Map [0,1]-normalized xyz reference points into metric pc_range space
    (feature_sampling, detr3d_transformer.py:389-391)."""
    lo = jnp.asarray(pc_range[:3], dtype=points01.dtype)
    hi = jnp.asarray(pc_range[3:], dtype=points01.dtype)
    return points01 * (hi - lo) + lo


def norm_points(points_m: jnp.ndarray, pc_range) -> jnp.ndarray:
    """Inverse of :func:`denorm_points`."""
    lo = jnp.asarray(pc_range[:3], dtype=points_m.dtype)
    hi = jnp.asarray(pc_range[3:], dtype=points_m.dtype)
    return (points_m - lo) / (hi - lo)
