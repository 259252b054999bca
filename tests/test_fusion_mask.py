"""Fusion attention-mask parity vs a torch restatement of the reference's
three-circle construction (detr3d_head.py:549-571), including the −sin/−cos
convention and the per-layer radius clamps."""
import numpy as np
import jax.numpy as jnp
import torch

from transcar_tpu.models.head import fusion_keep_mask


def _torch_reference_mask(ref_xy, tmp, radar_xy, lo, hi):
    """Restated reference math: dist/front/rear circles with clamp."""
    ref = torch.from_numpy(ref_xy)           # [1, Q, 2]
    tmp = torch.from_numpy(tmp)              # [1, Q, 10]
    radar = torch.from_numpy(radar_xy)       # [1, T, 2]
    dist = torch.cdist(ref, radar, p=2.0)
    front = ref.clone()
    rear = ref.clone()
    length = tmp[..., 3].exp()
    s = -tmp[..., 6]
    c = -tmp[..., 7]
    front[..., 0] += length * 0.25 * s
    front[..., 1] += length * 0.25 * c
    rear[..., 0] -= length * 0.25 * s
    rear[..., 1] -= length * 0.25 * c
    dist_f = torch.cdist(front, radar, p=2.0)
    dist_r = torch.cdist(rear, radar, p=2.0)
    radii = (length / 2.0).reshape(-1, 1).repeat(1, radar.shape[1])
    radii = torch.clamp(radii, min=lo, max=hi)
    center_m = dist[0] < radii
    front_m = dist_f[0] < radii
    rear_m = dist_r[0] < radii
    # reference builds the IGNORE mask as ~(c|f|r); our keep = c|f|r
    return (center_m | front_m | rear_m).numpy()


def test_fusion_mask_matches_reference():
    rng = np.random.default_rng(0)
    q, t = 64, 100
    ref_xy = rng.uniform(-50, 50, (1, q, 2)).astype(np.float32)
    tmp = rng.normal(size=(1, q, 10)).astype(np.float32)
    tmp[..., 3] = rng.uniform(-0.5, 2.5, (1, q))    # log-length
    radar_xy = rng.uniform(-52, 52, (1, t, 2)).astype(np.float32)
    # include padding-sentinel tokens at (500, 500)
    radar_xy[0, -10:] = 500.0

    for clamp in [(1.0, 2.0), (0.5, 1.0)]:
        ours = np.asarray(fusion_keep_mask(
            jnp.asarray(ref_xy), jnp.asarray(tmp), jnp.asarray(radar_xy),
            clamp))
        ref = _torch_reference_mask(ref_xy, tmp, radar_xy, *clamp)
        np.testing.assert_array_equal(ours[0], ref)
        # padding tokens are never visible
        assert not ours[0, :, -10:].any()
