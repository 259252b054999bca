"""Sparse middle encoder for the voxel ObjDGCNN variant (N7).

Parity target: mmdet3d ``SparseEncoder`` as configured by
configs/obj_dgcnn/voxel.py:34-43 — in 5 channels, sparse shape
[41, 1024, 1024] (z, y, x at 0.1×0.1×0.2 m voxels), encoder channels
((16,16,32), (32,32,64), (64,64,128), (128,128)), BEV output consumed by a
SECOND backbone with 256 input channels.

TPU-native redesign notes (documented deviations — spconv is CUDA-only and
unavailable to test against bit-for-bit):
  * SubMConv3d → ops/sparse.subm_conv (sort + searchsorted neighbor
    lookup, exact submanifold semantics — oracle-tested);
  * inter-stage SparseConv3d(k3, s2, p1) → ops/sparse.sparse_conv_down
    (exact site-set semantics — oracle-tested); it strides z together with
    y/x (mmdet3d strides all dims here too);
  * the final ``conv_out`` (kernel (3,1,1), stride (2,1,1)) is replaced by
    scattering the last stage's sites into a dense [Z', H', W'] grid and
    folding z into channels, followed by a dense 1×1 conv to the 256 BEV
    channels — the same z-collapse role, MXU-friendly.
  * BN uses stored statistics (FrozenBN) like the rest of the LiDAR track.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.models.common import Dense, FrozenBN
from transcar_tpu.ops.sparse import sparse_conv_down, subm_conv


class SparseConvBlock(nn.Module):
    """SubM or strided sparse conv + FrozenBN + ReLU."""

    out_channels: int
    downsample: bool = False
    out_max: int = 0     # required when downsample

    @nn.compact
    def __call__(self, feats, coords, count, grid):
        cin = feats.shape[-1]
        weight = self.param(
            "weight", nn.initializers.he_normal(),
            (27, cin, self.out_channels))
        if self.downsample:
            feats, coords, count = sparse_conv_down(
                feats, coords, count, weight, grid, self.out_max)
            grid = tuple((g + 1) // 2 for g in grid)
        else:
            feats = subm_conv(feats, coords, count, weight, grid)
        feats = FrozenBN(self.out_channels, eps=1e-3, name="bn")(feats)
        valid = (jnp.arange(feats.shape[0]) < count)[:, None]
        feats = nn.relu(feats) * valid.astype(feats.dtype)
        return feats, coords, count, grid


class SparseEncoder(nn.Module):
    """Voxel features → dense BEV map."""

    sparse_shape: Tuple[int, int, int] = (41, 1024, 1024)   # (z, y, x)
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    bev_channels: int = 256

    @nn.compact
    def __call__(self, feats, coords, count):
        """feats: [V, C]; coords: [V, 3] (z, y, x); count: scalar.
        Returns [H', W', bev_channels] dense BEV (single sample; vmap for
        batch)."""
        grid = self.sparse_shape
        v = feats.shape[0]
        feats, coords, count, grid = SparseConvBlock(
            self.encoder_channels[0][0], name="conv_input")(
            feats, coords, count, grid)

        n_stages = len(self.encoder_channels)
        for si, chans in enumerate(self.encoder_channels):
            for ci, ch in enumerate(chans):
                last = ci == len(chans) - 1
                down = last and si != n_stages - 1
                feats, coords, count, grid = SparseConvBlock(
                    ch, downsample=down, out_max=v,
                    name=f"stage{si}_conv{ci}")(feats, coords, count, grid)

        # densify: scatter into [Z', H', W', C], fold z into channels
        gz, gy, gx = grid
        c = feats.shape[-1]
        valid = jnp.arange(feats.shape[0]) < count
        lin = jnp.where(
            valid,
            (coords[:, 0] * gy + coords[:, 1]) * gx + coords[:, 2],
            gz * gy * gx)
        canvas = jnp.zeros((gz * gy * gx + 1, c), feats.dtype)
        canvas = canvas.at[lin].set(
            jnp.where(valid[:, None], feats, 0.0))
        dense = canvas[:-1].reshape(gz, gy, gx, c)
        bev = dense.transpose(1, 2, 0, 3).reshape(gy, gx, gz * c)
        bev = Dense(self.bev_channels, name="out_conv")(bev)
        bev = FrozenBN(self.bev_channels, eps=1e-3, name="out_bn")(bev)
        return nn.relu(bev)
