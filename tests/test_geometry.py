"""Camera geometry: lidar2img assembly (nuscenes_dataset.py:46-62
semantics) checked against direct K·[R|t]⁻¹ projection of random points."""
import numpy as np
import jax.numpy as jnp

from transcar_tpu.core.geometry import build_lidar2img, project_points_to_cams


def test_build_lidar2img_projects_like_k_rt():
    rng = np.random.default_rng(0)
    n = 4
    rots, trans, intr = [], [], []
    for _ in range(n):
        a, b, c = rng.uniform(0, 2 * np.pi, 3)

        def rz(t):
            return np.array([[np.cos(t), -np.sin(t), 0],
                             [np.sin(t), np.cos(t), 0], [0, 0, 1]])

        def rx(t):
            return np.array([[1, 0, 0], [0, np.cos(t), -np.sin(t)],
                             [0, np.sin(t), np.cos(t)]])

        rots.append(rz(a) @ rx(b) @ rz(c))       # sensor2lidar rotation
        trans.append(rng.uniform(-3, 3, 3))
        intr.append(np.array([[800.0, 0, 800], [0, 800, 450], [0, 0, 1]]))
    rots, trans, intr = map(np.stack, (rots, trans, intr))

    l2i = build_lidar2img(rots, trans, intr)     # [n, 4, 4]

    pts = rng.uniform(-30, 30, (50, 3))
    for cam in range(n):
        # manual: lidar point → camera frame via inverse of sensor2lidar,
        # then pinhole projection
        cam_pts = (pts - trans[cam]) @ rots[cam]   # R⁻¹ = Rᵀ applied rowwise
        proj = cam_pts @ intr[cam].T
        homo = np.concatenate([pts, np.ones((50, 1))], axis=1)
        via_l2i = homo @ l2i[cam].T
        np.testing.assert_allclose(via_l2i[:, :3], proj, rtol=1e-5,
                                   atol=1e-6)

    # the jit projection helper agrees on uv + visibility
    uv01, vis = project_points_to_cams(
        jnp.asarray(pts[None], jnp.float32),
        jnp.asarray(l2i[None], jnp.float32), (900, 1600))
    cam_pts0 = (pts - trans[0]) @ rots[0]
    proj0 = cam_pts0 @ intr[0].T
    front = proj0[:, 2] > 1e-5
    uv_ref = proj0[:, :2] / np.maximum(proj0[:, 2:3], 1e-5)
    uv_ref01 = uv_ref / np.asarray([1600, 900])
    got = np.asarray(uv01[0, 0])
    np.testing.assert_allclose(got[front], uv_ref01[front], rtol=1e-3,
                               atol=1e-4)
    inside = (front & (uv_ref01[:, 0] > 0) & (uv_ref01[:, 0] < 1)
              & (uv_ref01[:, 1] > 0) & (uv_ref01[:, 1] < 1))
    np.testing.assert_array_equal(np.asarray(vis[0, 0]), inside)
