"""Shared test-fixture camera geometry.

A ring of pure z-rotations with no forward axis (the original fixture)
leaves every pc-range point at the camera plane: 0% of projections are
valid, the visibility mask zeroes every sampled feature, and any test
comparing outputs downstream of feature sampling passes VACUOUSLY
(both sides see zeros).  This helper builds the valid outward-looking
ring (z_cam = forward, x_cam = right, y_cam = down, small eccentric
translation) so sampled camera features are real on both sides of a
parity comparison.
"""
import numpy as np


def camera_ring_l2i(n_cams: int, img_h: int, img_w: int,
                    fov_scale: float = 0.8) -> np.ndarray:
    """[n_cams, 4, 4] lidar2img with every pc-range point visible in at
    least one camera (~1/n per camera)."""
    fx = fov_scale * img_w
    k = np.array([[fx, 0, img_w / 2], [0, fx, img_h / 2], [0, 0, 1]],
                 np.float64)
    out = np.zeros((n_cams, 4, 4), np.float32)
    for i in range(n_cams):
        a = 2 * np.pi * i / n_cams
        fwd = np.array([np.cos(a), np.sin(a), 0.0])
        right = np.array([-np.sin(a), np.cos(a), 0.0])
        down = np.array([0.0, 0.0, -1.0])
        rot = np.stack([right, down, fwd])               # world → cam
        trans = -rot @ np.array([1.5 * np.cos(a), 1.5 * np.sin(a), 1.0])
        m = np.eye(4)
        m[:3, :3] = k @ rot
        m[:3, 3] = k @ trans
        out[i] = m.astype(np.float32)
    return out
