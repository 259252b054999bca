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
  * BN is trainable: masked batch statistics over real voxels of the WHOLE
    batch (sparse-tensor BN1d analog; common.MaskedBN), running averages
    in the batch_stats collection.  The module is batch-native — the pure
    sparse ops vmap per sample inside while BN sees the full batch, so
    statistics stay global (per-sample vmapped BN would make the mutable
    running stats inconsistent across the batch).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.models.common import Dense, MaskedBN, train_bn
from transcar_tpu.ops.sparse import sparse_conv_down, subm_conv


class SparseConvBlock(nn.Module):
    """SubM or strided sparse conv (vmapped over batch) + masked trainable
    BN over the batch's real voxels + ReLU."""

    out_channels: int
    downsample: bool = False
    out_max: int = 0     # required when downsample

    @nn.compact
    def __call__(self, feats, coords, count, grid, train: bool = False):
        """feats: [B, V, C]; coords: [B, V, 3]; count: [B]."""
        cin = feats.shape[-1]
        weight = self.param(
            "weight", nn.initializers.he_normal(),
            (27, cin, self.out_channels))
        if self.downsample:
            feats, coords, count = jax.vmap(
                lambda f, c, n: sparse_conv_down(f, c, n, weight, grid,
                                                 self.out_max)
            )(feats, coords, count)
            grid = tuple((g + 1) // 2 for g in grid)
        else:
            feats = jax.vmap(
                lambda f, c, n: subm_conv(f, c, n, weight, grid)
            )(feats, coords, count)
        valid = (jnp.arange(feats.shape[1])[None, :]
                 < count[:, None])                           # [B, V]
        # BN statistics over the batch's real voxels only
        feats = MaskedBN(self.out_channels, eps=1e-3, name="bn")(
            feats, valid, train=train)
        feats = nn.relu(feats) * valid[..., None].astype(feats.dtype)
        return feats, coords, count, grid


class SparseEncoder(nn.Module):
    """Batched voxel features → dense BEV maps."""

    sparse_shape: Tuple[int, int, int] = (41, 1024, 1024)   # (z, y, x)
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    bev_channels: int = 256

    @nn.compact
    def __call__(self, feats, coords, count, train: bool = False):
        """feats: [B, V, C]; coords: [B, V, 3] (z, y, x); count: [B].
        Returns [B, H', W', bev_channels] dense BEV."""
        grid = self.sparse_shape
        v = feats.shape[1]
        feats, coords, count, grid = SparseConvBlock(
            self.encoder_channels[0][0], name="conv_input")(
            feats, coords, count, grid, train=train)

        n_stages = len(self.encoder_channels)
        for si, chans in enumerate(self.encoder_channels):
            for ci, ch in enumerate(chans):
                last = ci == len(chans) - 1
                down = last and si != n_stages - 1
                feats, coords, count, grid = SparseConvBlock(
                    ch, downsample=down, out_max=v,
                    name=f"stage{si}_conv{ci}")(feats, coords, count, grid,
                                                train=train)

        # densify: scatter into [Z', H', W', C], fold z into channels
        gz, gy, gx = grid
        c = feats.shape[-1]

        def densify(f, co, n):
            valid = jnp.arange(f.shape[0]) < n
            lin = jnp.where(
                valid,
                (co[:, 0] * gy + co[:, 1]) * gx + co[:, 2],
                gz * gy * gx)
            canvas = jnp.zeros((gz * gy * gx + 1, c), f.dtype)
            canvas = canvas.at[lin].set(jnp.where(valid[:, None], f, 0.0))
            dense = canvas[:-1].reshape(gz, gy, gx, c)
            return dense.transpose(1, 2, 0, 3).reshape(gy, gx, gz * c)

        bev = jax.vmap(densify)(feats, coords, count)
        bev = Dense(self.bev_channels, name="out_conv")(bev)
        bev = train_bn(self.bev_channels, eps=1e-3, name="out_bn")(
            bev, use_running_average=not train)
        return nn.relu(bev)
