"""Camera geometry: lidar→image projection and lidar2img assembly.

Parity targets:
  * projection + visibility mask: feature_sampling,
    projects/mmdet3d_plugin/models/utils/detr3d_transformer.py:381-410
    (homogeneous point × 4×4 lidar2img, perspective divide clamped at 1e-5,
    normalize to [-1, 1] by img_shape, in-frustum mask).
  * lidar2img assembly from intrinsics + lidar2cam:
    projects/mmdet3d_plugin/datasets/nuscenes_dataset.py:46-62
    (viewpad @ lidar2cam with a 4×4 identity-padded intrinsic).

All functions are batched and jit-safe.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def build_lidar2img(sensor2lidar_rot: np.ndarray,
                    sensor2lidar_trans: np.ndarray,
                    cam_intrinsic: np.ndarray) -> np.ndarray:
    """Assemble per-camera 4×4 lidar2img matrices (host-side, numpy).

    Mirrors nuscenes_dataset.py:46-62: ``lidar2cam_rt`` built from the
    inverse of sensor2lidar, then ``viewpad @ lidar2cam_rt.T``.

    Args:
      sensor2lidar_rot: [num_cams, 3, 3]
      sensor2lidar_trans: [num_cams, 3]
      cam_intrinsic: [num_cams, 3, 3]
    Returns:
      [num_cams, 4, 4] float64 lidar2img.
    """
    num_cams = sensor2lidar_rot.shape[0]
    out = np.zeros((num_cams, 4, 4), dtype=np.float64)
    for i in range(num_cams):
        lidar2cam_r = np.linalg.inv(sensor2lidar_rot[i])
        lidar2cam_t = sensor2lidar_trans[i] @ lidar2cam_r.T
        lidar2cam_rt = np.eye(4)
        lidar2cam_rt[:3, :3] = lidar2cam_r.T
        lidar2cam_rt[3, :3] = -lidar2cam_t
        viewpad = np.eye(4)
        viewpad[:3, :3] = cam_intrinsic[i]
        out[i] = viewpad @ lidar2cam_rt.T
    return out


def project_points_to_cams(points_m: jnp.ndarray,
                           lidar2img: jnp.ndarray,
                           img_hw,
                           eps: float = 1e-5):
    """Project metric lidar-frame points into every camera.

    Parity: feature_sampling (detr3d_transformer.py:393-410), with the same
    eps-clamped perspective divide and strict in-frustum test.

    Args:
      points_m: [B, Q, 3] points in lidar frame (meters).
      lidar2img: [B, num_cams, 4, 4].
      img_hw: static (H, W) of the (padded) input image.
    Returns:
      uv01: [B, num_cams, Q, 2] image coords normalized to [0, 1]
            (0.5*(grid+1) of the reference's [-1, 1] grid coords).
      mask: [B, num_cams, Q] bool visibility (depth > eps and inside frame).
    """
    h, w = img_hw
    ones = jnp.ones_like(points_m[..., :1])
    pts_h = jnp.concatenate([points_m, ones], axis=-1)          # [B,Q,4]
    # [B,N,4,4] @ [B,1,Q,4] → einsum over the homogeneous dim
    cam_pts = jnp.einsum("bnij,bqj->bnqi", lidar2img, pts_h)    # [B,N,Q,4]
    depth = cam_pts[..., 2:3]
    mask = depth[..., 0] > eps
    uv = cam_pts[..., 0:2] / jnp.maximum(depth, eps)
    uv01 = uv / jnp.asarray([w, h], dtype=uv.dtype)
    grid = (uv01 - 0.5) * 2.0
    inside = ((grid[..., 0] > -1.0) & (grid[..., 0] < 1.0)
              & (grid[..., 1] > -1.0) & (grid[..., 1] < 1.0))
    return uv01, mask & inside
