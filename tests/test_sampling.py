"""Bilinear sampling parity vs torch ``F.grid_sample`` (the reference's
sampler, detr3d_transformer.py:417: bilinear, zeros padding,
align_corners=False)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from transcar_tpu.ops.sampling import (bilinear_sample_nhwc,
                                       sample_multiview_multilevel)


def _torch_grid_sample(feat_hwc, uv01):
    # torch wants NCHW + grid in [-1, 1]
    f = torch.from_numpy(np.ascontiguousarray(
        feat_hwc.transpose(2, 0, 1)))[None]                    # [1,C,H,W]
    grid = torch.from_numpy(uv01 * 2.0 - 1.0)[None, :, None, :]  # [1,P,1,2]
    out = F.grid_sample(f, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    return out[0, :, :, 0].numpy().T                           # [P, C]


def test_bilinear_matches_grid_sample_interior_and_border():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(29, 50, 16)).astype(np.float32)
    # interior, border-straddling, and fully outside points
    uv = np.concatenate([
        rng.uniform(0.05, 0.95, (200, 2)),
        rng.uniform(-0.05, 0.05, (50, 2)),
        rng.uniform(0.95, 1.05, (50, 2)),
        rng.uniform(-0.5, -0.2, (20, 2)),
        rng.uniform(1.2, 1.5, (20, 2)),
    ]).astype(np.float32)

    ours = np.asarray(bilinear_sample_nhwc(jnp.asarray(feat), jnp.asarray(uv)))
    ref = _torch_grid_sample(feat, uv)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_multiview_multilevel_shapes_and_values():
    rng = np.random.default_rng(1)
    b, n, q, c = 2, 6, 64, 8
    shapes = [(16, 28), (8, 14), (4, 7), (2, 4)]
    feats = [jnp.asarray(rng.normal(size=(b, n, h, w, c)).astype(np.float32))
             for h, w in shapes]
    uv = jnp.asarray(rng.uniform(0, 1, (b, n, q, 2)).astype(np.float32))

    out = sample_multiview_multilevel(feats, uv)
    assert out.shape == (b, q, n, 4, c)

    # cross-check one (batch, cam, level) slice against torch
    lvl, bi, ni = 1, 1, 3
    ref = _torch_grid_sample(np.asarray(feats[lvl][bi, ni]),
                             np.asarray(uv[bi, ni]))
    np.testing.assert_allclose(np.asarray(out[bi, :, ni, lvl]), ref,
                               rtol=1e-5, atol=1e-5)
