"""Shared model building blocks.

Conventions:
  * NHWC feature layout everywhere (TPU/XLA native; the reference's NCHW is
    a CUDA convention we deliberately do not carry over).
  * LayerNorm eps = 1e-5 (torch default) so converted checkpoints match.
  * Decoder/head matmuls run at ``Precision.HIGHEST``: they are a rounding
    error of total FLOPs next to the backbone but decide box quality, so we
    do not let TPU default-bf16 matmul precision touch them.  The backbone
    computes in bfloat16 by design (the @auto_fp16 analog, detr3d.py:68).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.ops.attention import multihead_attention

HP = jax.lax.Precision.HIGHEST
LN_EPS = 1e-5


class Dense(nn.Dense):
    """nn.Dense pinned to HIGHEST matmul precision."""

    precision: jax.lax.Precision = HP


class TorchMHA(nn.Module):
    """Parameter container matching torch ``nn.MultiheadAttention`` after the
    in_proj split (see ops/attention.py for the math and mask semantics).

    ``use_pallas`` (with a keep-mask, deterministic, on TPU) routes through
    the fused VMEM-resident kernel (ops/pallas_attention.py); the XLA path
    serves training/autodiff and CPU.
    """

    embed_dims: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, deterministic: bool = True,
                 use_pallas: bool = False):
        e = self.embed_dims
        init = nn.initializers.xavier_uniform()
        params = {}
        for name in ("wq", "wk", "wv", "wo"):
            params[name] = self.param(name, init, (e, e))
            params["b" + name[1:]] = self.param(
                "b" + name[1:], nn.initializers.zeros, (e,))
        if (use_pallas and deterministic and mask is not None
                and jax.default_backend() == "tpu"):
            from transcar_tpu.ops.pallas_attention import masked_mha_pallas
            return masked_mha_pallas(q, k, v, params, self.num_heads, ~mask)
        rng = None
        if not deterministic and self.dropout > 0:
            rng = self.make_rng("dropout")
        return multihead_attention(
            q, k, v, params, self.num_heads, mask=mask,
            dropout_rate=self.dropout, deterministic=deterministic, rng=rng)


class MLP(nn.Module):
    """Linear stack with optional LayerNorm between layers.

    Covers the reference's three MLP shapes: cls branch (Linear-LN-ReLU ×2 +
    Linear), reg branch (Linear-ReLU ×2 + Linear), position/radar encoders
    (Linear-LN-ReLU ×2, detr3d_head.py:74-126,173-189).
    """

    features: Sequence[int]
    layer_norm: bool = False
    final_activation: bool = False
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        n = len(self.features)
        for i, feat in enumerate(self.features):
            x = Dense(feat, name=f"linear{i}")(x)
            last = i == n - 1
            if not last or self.final_activation:
                if self.layer_norm:
                    x = nn.LayerNorm(epsilon=LN_EPS, name=f"ln{i}")(x)
                x = self.activation(x)
        return x


class FFN(nn.Module):
    """mmcv FFN: Linear→ReLU→Dropout→Linear→Dropout + residual
    (config feedforward_channels=512, ffn_dropout=0.1)."""

    embed_dims: int
    hidden_dims: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = Dense(self.hidden_dims, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = Dense(self.embed_dims, name="linear2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return x + y


class FrozenBN(nn.Module):
    """BatchNorm with frozen statistics and affine params
    (``norm_cfg=dict(type='BN2d', requires_grad=False)``, norm_eval=True,
    config :38-39).  Pure elementwise scale/bias — XLA folds it into the
    surrounding convs."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        scale = gamma * jax.lax.rsqrt(var + self.eps)
        bias = beta - mean * scale
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def train_bn(features: int, eps: float = 1e-5,
             name: str = "bn") -> nn.BatchNorm:
    """Trainable BatchNorm factory (``norm_cfg=dict(type='BN')`` — the
    ObjDGCNN track trains its norms, pillar.py:65-80).  Running statistics
    live in the ``batch_stats`` collection; torch momentum 0.1 ≡ flax 0.9.
    Call with ``use_running_average=not train``.

    Cross-device sync: the train step jits over the GLOBAL sharded batch
    (GSPMD), so the batch-axis mean/var reductions are global — XLA
    inserts the cross-chip collectives; no axis_name plumbing needed
    (this upgrades the reference's per-GPU unsynced BN to global-batch
    statistics)."""
    return nn.BatchNorm(momentum=0.9, epsilon=eps, name=name)


class MaskedBN(nn.Module):
    """Trainable BatchNorm whose batch statistics ignore padding rows.

    The TPU-first static buffers ([max_voxels, ...] with a valid count)
    contain fake rows torch's dynamic shapes never see; feeding them into
    plain BN would bias the statistics toward zero.  ``mask`` marks real
    rows (broadcastable to ``x[..., 0]``); zero-padded *points inside real
    voxels* are intentionally included, matching mmdet3d's PFNLayer
    BatchNorm1d over [real_voxels, C, max_points]."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.9          # torch momentum 0.1

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if train:
            m = jnp.broadcast_to(
                mask.astype(jnp.float32)[..., None], x.shape)
            n = jnp.maximum(jnp.sum(m) / self.features, 1.0)
            xf = x.astype(jnp.float32) * m
            axes = tuple(range(x.ndim - 1))
            mean = jnp.sum(xf, axis=axes) / n
            var = jnp.sum(m * (x.astype(jnp.float32)
                               - mean) ** 2, axis=axes) / n
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


class ConvKernelParams(nn.Module):
    """Param-holder matching nn.Conv's {kernel} tree (no compute)."""

    cin: int
    cout: int
    ksize: int = 1

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.ksize, self.ksize, self.cin, self.cout))


class BNStatsParams(nn.Module):
    """Param-holder matching FrozenBN's {scale,bias,mean,var} tree."""

    features: int

    @nn.compact
    def __call__(self):
        f = (self.features,)
        return (self.param("scale", nn.initializers.ones, f),
                self.param("bias", nn.initializers.zeros, f),
                self.param("mean", nn.initializers.zeros, f),
                self.param("var", nn.initializers.ones, f))


class ConvBNParams(nn.Module):
    """Declares the same {conv/kernel, bn/{scale,bias,mean,var}} tree a
    ConvBN owns, without computing — for fused-kernel paths that consume
    the raw params while keeping checkpoints interchangeable."""

    cin: int
    cout: int
    ksize: int = 1

    @nn.compact
    def __call__(self):
        kernel = ConvKernelParams(self.cin, self.cout, self.ksize,
                                  name="conv")()
        return (kernel,) + BNStatsParams(self.cout, name="bn")()


def bn_affine(gamma, beta, mean, var, eps: float = 1e-5):
    """Folded FrozenBN affine: y = x*scale + bias."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale


class ConvBN(nn.Module):
    """Conv2D + BN (+ optional ReLU), NHWC.

    ``norm='frozen'`` (camera trunk, norm_eval) folds stored statistics;
    ``norm='batch'`` (LiDAR track) is trainable BatchNorm — pass
    ``train=True`` during training steps.

    ``quantize='int8'`` (opt-in serving mode, ops/int8.py) runs the conv
    as dynamic int8 x int8 → int32 on the MXU and dequantizes into
    ``dtype``; the param tree is IDENTICAL to the fp path (same
    ``conv/kernel``), so checkpoints are interchangeable."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    relu: bool = True
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None
    norm: str = "frozen"
    bn_eps: float = 1e-5
    quantize: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quantize == "int8":
            if self.use_bias:
                raise ValueError("int8 ConvBN supports use_bias=False "
                                 "(backbone convs); bias lives in BN")
            from transcar_tpu.ops.int8 import dynamic_int8_conv

            k = ConvKernelParams(x.shape[-1], self.features, self.kernel,
                                 name="conv")()
            x = dynamic_int8_conv(
                x, k, stride=self.stride, padding=self.padding,
                dilation=self.dilation, out_dtype=self.dtype or x.dtype)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=self.bn_eps, dtype=x.dtype,
                             name="bn")(x)
        else:
            x = FrozenBN(self.features, eps=self.bn_eps, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x
