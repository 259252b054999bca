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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.models.common import Dense, MaskedBN, train_bn
from transcar_tpu.ops.sparse import sparse_conv_down, subm_conv


def _conv3d_zshift(x: jnp.ndarray, w27: jnp.ndarray, stride: int,
                   compute_dtype) -> jnp.ndarray:
    """3×3×3 conv (pad 1) as three z-shifted batched 2D convs.

    x: [B, Z, Y, X, Cin]; w27: [27, Cin, Cout] in ops/sparse
    ``_kernel_offsets`` order (dz slowest) → [B, Z', Y', X', Cout] fp32.

    TPU-native formulation: the z axis folds into the conv BATCH (B·Z'
    images), so each dz tap is one large batched 2D conv on the MXU —
    the same op class the camera backbones run at 85-91% MFU — instead
    of a 3D conv XLA handles poorly on TPU.
    """
    b, z, h, ww, cin = x.shape
    cout = w27.shape[-1]
    w = w27.reshape(3, 3, 3, cin, cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    if compute_dtype is not None:
        xp = xp.astype(compute_dtype)
        w = w.astype(compute_dtype)
    zo = (z + 1) // 2 if stride == 2 else z
    ho = (h + 1) // 2 if stride == 2 else h
    wo = (ww + 1) // 2 if stride == 2 else ww
    out = jnp.zeros((b * zo, ho, wo, cout), jnp.float32)
    for dz in range(3):
        # output z index oz reads padded input z = stride·oz + dz
        xs = (xp[:, dz:dz + z] if stride == 1
              else xp[:, dz:dz + 2 * zo - 1:2])
        xs = xs.reshape(b * zo, h, ww, cin)
        # same-dtype conv (+ f32 cast for the dz accumulation): a
        # preferred_element_type=f32 conv over bf16 operands has a
        # transpose rule that feeds the f32 cotangent into a bf16 conv
        # and fails type-checking under grad (hit by the voxel train
        # step); bf16 convs accumulate in f32 on the MXU regardless.
        out = out + jax.lax.conv_general_dilated(
            xs, w[dz], window_strides=(stride, stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
    return out.reshape(b, zo, ho, wo, cout)


def _downsample_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Active-site set of SparseConv3d(k3, s2, p1): an output site o is
    active iff any input site lies in its 3³ window (o·2 + t = i,
    t ∈ [-1, 1]³) — a stride-2 max-pool of the mask.  Matches
    ops/sparse.sparse_conv_down's site-set semantics WITHOUT its
    ``out_max`` cap (spconv has no cap either)."""
    pooled = jax.lax.reduce_window(
        mask.astype(jnp.float32), -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 3), window_strides=(1, 2, 2, 2),
        padding=((0, 0), (1, 1), (1, 1), (1, 1)))
    return pooled > 0


class DenseSparseConvBlock(nn.Module):
    """Dense-grid formulation of :class:`SparseConvBlock` — identical
    param tree ({weight [27, Cin, Cout]}, bn) and identical math:
    inactive cells hold zeros (≡ the gather path's zero-row misses),
    outputs are masked back to the active set, and BN statistics run
    over active cells only.  Convs ride the MXU as batched 2D convs
    (z folded into batch); no sorts, searchsorteds, or gathers."""

    out_channels: int
    downsample: bool = False
    compute_dtype: Optional[str] = None    # conv compute; BN stays fp32

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        """x: [B, Z, Y, X, C]; mask: [B, Z, Y, X] bool."""
        cin = x.shape[-1]
        weight = self.param(
            "weight", nn.initializers.he_normal(),
            (27, cin, self.out_channels))
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        x = _conv3d_zshift(x, weight, 2 if self.downsample else 1, dt)
        if dt is not None:
            # keep inter-block activations in the compute dtype: the
            # stage-0 grid is [41, 1024, 1024, C] — fp32 storage would
            # stream 2.75 GB per 16-channel block (BN still reduces its
            # statistics in fp32 internally)
            x = x.astype(dt)
        if self.downsample:
            mask = _downsample_mask(mask)
        x = x * mask[..., None].astype(x.dtype)
        x = MaskedBN(self.out_channels, eps=1e-3, name="bn")(
            x, mask, train=train)
        x = nn.relu(x) * mask[..., None].astype(x.dtype)
        return x, mask


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
    """Batched voxel features → dense BEV maps.

    Two exact formulations behind ``impl`` (identical param trees —
    checkpoints interchangeable):

    * ``"gather"`` (the model default at full resolution): static-buffer
      sparse ops with dense-table neighbor lookup (ops/sparse.py),
      vmapped per sample.  Keeps FLOPs sparse; downsample site sets cap
      at V.
    * ``"dense"``: scatter the sites into the dense grid ONCE, then
      every block is masked batched-2D convs on the MXU
      (:class:`DenseSparseConvBlock`).  No table/gathers at all and
      exact spconv site sets (no ``out_max`` cap) — but at the full
      [41, 1024, 1024] stage-0 grid XLA's (8, 128) tiling pads the
      16-channel activations 3.1× (24.5 GB HBM, measured) — use on
      small grids / CPU.
    """

    sparse_shape: Tuple[int, int, int] = (41, 1024, 1024)   # (z, y, x)
    encoder_channels: Tuple[Tuple[int, ...], ...] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    bev_channels: int = 256
    impl: str = "gather"   # matches ModelConfig.sparse_impl: the dense
                           # formulation OOMs at the class's own default
                           # full-res grid (XLA pads f32[41,1024,1024,16]
                           # 3.1x -> 24.5 GB); pass impl="dense" for
                           # small grids / CPU oracles
    compute_dtype: Optional[str] = None    # dense-impl conv compute dtype

    @nn.compact
    def __call__(self, feats, coords, count, train: bool = False):
        """feats: [B, V, C]; coords: [B, V, 3] (z, y, x); count: [B].
        Returns [B, H', W', bev_channels] dense BEV."""
        if self.impl == "dense":
            return self._dense_forward(feats, coords, count, train)
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

    def _dense_forward(self, feats, coords, count, train):
        gz, gy, gx = self.sparse_shape
        cin = feats.shape[-1]

        def scatter(f, co, n):
            valid = jnp.arange(f.shape[0]) < n
            lin = jnp.where(
                valid,
                (co[:, 0] * gy + co[:, 1]) * gx + co[:, 2],
                gz * gy * gx)
            canvas = jnp.zeros((gz * gy * gx + 1, cin), f.dtype)
            canvas = canvas.at[lin].set(jnp.where(valid[:, None], f, 0.0))
            m = jnp.zeros((gz * gy * gx + 1,), bool).at[lin].set(valid)
            return (canvas[:-1].reshape(gz, gy, gx, cin),
                    m[:-1].reshape(gz, gy, gx))

        x, mask = jax.vmap(scatter)(feats, coords, count)
        if self.compute_dtype:
            # the first conv casts to the compute dtype anyway; storing
            # the 860 MB full-grid canvas at bf16 halves its stream
            x = x.astype(self.compute_dtype)
        x, mask = DenseSparseConvBlock(
            self.encoder_channels[0][0], compute_dtype=self.compute_dtype,
            name="conv_input")(x, mask, train=train)

        n_stages = len(self.encoder_channels)
        for si, chans in enumerate(self.encoder_channels):
            for ci, ch in enumerate(chans):
                last = ci == len(chans) - 1
                down = last and si != n_stages - 1
                x, mask = DenseSparseConvBlock(
                    ch, downsample=down, compute_dtype=self.compute_dtype,
                    name=f"stage{si}_conv{ci}")(x, mask, train=train)

        # already dense: fold z into channels, 1×1 to BEV channels
        b, zz, hh, ww, c = x.shape
        bev = x.transpose(0, 2, 3, 1, 4).reshape(b, hh, ww, zz * c)
        bev = Dense(self.bev_channels, name="out_conv")(bev)
        bev = train_bn(self.bev_channels, eps=1e-3, name="out_bn")(
            bev, use_running_average=not train)
        return nn.relu(bev)
