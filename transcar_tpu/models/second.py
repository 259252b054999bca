"""SECOND BEV backbone + BN-FPN neck for the ObjDGCNN track.

Parity: configs/obj_dgcnn/pillar.py:44-59 — SECOND(layer_nums=(3,5,5),
strides=(2,2,2), channels=(64,128,256), bias-free convs + BN + ReLU) and an
mmdet FPN with BN+ReLU ConvModules, start_level 0, num_outs 4 where the
extra level comes from stride-2 max pooling (mmdet FPN default when
``add_extra_convs`` is unset).

BN is TRAINABLE (``norm_cfg=dict(type='BN')`` — the reference trains the
LiDAR track's norms, pillar.py:65-80): batch statistics collect in the
``batch_stats`` collection during training (``train=True``) and the
running averages serve inference.  Statistics are computed over the
global sharded batch under jit, i.e. cross-chip-synced by GSPMD
(models/common.py train_bn note).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.models.common import ConvBN


class SECOND(nn.Module):
    layer_nums: Tuple[int, ...] = (3, 5, 5)
    layer_strides: Tuple[int, ...] = (2, 2, 2)
    out_channels: Tuple[int, ...] = (64, 128, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for s, (n_layers, stride, ch) in enumerate(
                zip(self.layer_nums, self.layer_strides, self.out_channels)):
            x = ConvBN(ch, kernel=3, stride=stride, padding=1,
                       dtype=x.dtype, norm="batch",
                       name=f"block{s}_conv0")(x, train=train)
            for i in range(n_layers):
                x = ConvBN(ch, kernel=3, padding=1, dtype=x.dtype,
                           norm="batch",
                           name=f"block{s}_conv{i + 1}")(x, train=train)
            outs.append(x)
        return outs


class BNFPN(nn.Module):
    """mmdet FPN with norm+act ConvModules and max-pool extra levels."""

    in_channels: Tuple[int, ...] = (64, 128, 256)
    out_channels: int = 256
    num_outs: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        laterals = [
            ConvBN(self.out_channels, kernel=1, dtype=feats[i].dtype,
                   norm="batch", name=f"lateral{i}")(feats[i], train=train)
            for i in range(len(self.in_channels))
        ]
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[-3:-1]
            ry = (jnp.arange(h) * laterals[i].shape[-3] // h)
            rx = (jnp.arange(w) * laterals[i].shape[-2] // w)
            laterals[i - 1] = laterals[i - 1] + laterals[i][..., ry[:, None],
                                                            rx[None, :], :]
        outs = [
            ConvBN(self.out_channels, kernel=3, padding=1,
                   dtype=laterals[i].dtype, norm="batch",
                   name=f"fpn{i}")(laterals[i], train=train)
            for i in range(len(laterals))
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs
