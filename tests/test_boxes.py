"""Box codec numeric parity vs a torch re-statement of the reference
(core/bbox/util.py:4-53)."""
import numpy as np
import jax.numpy as jnp
import torch

from transcar_tpu.core import boxes


def _torch_normalize(bboxes):
    # reference semantics restated (core/bbox/util.py:4-24)
    cx, cy, cz = bboxes[..., 0:1], bboxes[..., 1:2], bboxes[..., 2:3]
    w, l, h = (bboxes[..., 3:4].log(), bboxes[..., 4:5].log(),
               bboxes[..., 5:6].log())
    rot = bboxes[..., 6:7]
    return torch.cat(
        (cx, cy, w, l, cz, h, rot.sin(), rot.cos(),
         bboxes[..., 7:8], bboxes[..., 8:9]), dim=-1)


def test_normalize_roundtrip_and_parity():
    rng = np.random.default_rng(0)
    raw = np.concatenate(
        [
            rng.uniform(-50, 50, (64, 2)),       # cx, cy
            rng.uniform(-4, 2, (64, 1)),         # cz
            rng.uniform(0.5, 20, (64, 3)),       # w, l, h
            rng.uniform(-np.pi, np.pi, (64, 1)), # yaw
            rng.uniform(-10, 10, (64, 2)),       # vx, vy
        ],
        axis=-1,
    ).astype(np.float32)

    ours = np.asarray(boxes.normalize_bbox(jnp.asarray(raw)))
    ref = _torch_normalize(torch.from_numpy(raw)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)

    decoded = np.asarray(boxes.denormalize_bbox(jnp.asarray(ours)))
    # yaw wraps through atan2(sin, cos) → compare via sin/cos
    np.testing.assert_allclose(decoded[:, :6], raw[:, :6], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.sin(decoded[:, 6]), np.sin(raw[:, 6]),
                               atol=1e-5)
    np.testing.assert_allclose(decoded[:, 7:], raw[:, 7:], rtol=1e-5,
                               atol=1e-5)


def test_gravity_center_roundtrip():
    rng = np.random.default_rng(1)
    raw = rng.normal(size=(16, 9)).astype(np.float32)
    raw[:, 5] = np.abs(raw[:, 5]) + 0.1
    grav = boxes.gravity_center_boxes(jnp.asarray(raw))
    np.testing.assert_allclose(
        np.asarray(grav[:, 2]), raw[:, 2] + raw[:, 5] * 0.5, rtol=1e-6)
    back = boxes.bottom_center_boxes(grav)
    np.testing.assert_allclose(np.asarray(back), raw, rtol=1e-6, atol=1e-6)


def test_inverse_sigmoid_matches_reference_clamping():
    x = jnp.asarray([0.0, 1e-7, 0.5, 1 - 1e-7, 1.0])
    y = boxes.inverse_sigmoid(x)
    t = torch.tensor([0.0, 1e-7, 0.5, 1 - 1e-7, 1.0])
    t = t.clamp(0, 1)
    ref = torch.log(t.clamp(min=1e-5) / (1 - t).clamp(min=1e-5))
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), rtol=1e-5)
