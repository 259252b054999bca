"""VoVNet-99-eSE backbone (test-set submission config).

Parity target: projects/mmdet3d_plugin/models/backbones/vovnet.py — spec
"V-99-eSE" (:71-79): stem (64, 64, 128) with strides (2, 1, 2), stage conv
channels (128, 160, 192, 224), stage out channels (256, 512, 768, 1024),
5 convs per OSA block, blocks per stage (1, 3, 9, 3).

Behavioral notes reproduced:
  * eSE channel attention is applied in *every* OSA block — the reference's
    SE constructor flag is dead code; ``_OSA_module.forward`` applies
    ``self.ese`` unconditionally (:208, :225).
  * identity residual on every non-first block of a stage (:249-265).
  * stage 2 has no pooling; stages 3-5 maxpool 3×3 stride 2 with ceil mode
    (:240-241).
  * BN frozen (norm_eval, :371-375) → FrozenBN.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.models.common import ConvBN

V99_SPEC = dict(
    stem=(64, 64, 128),
    stage_conv_ch=(128, 160, 192, 224),
    stage_out_ch=(256, 512, 768, 1024),
    layer_per_block=5,
    block_per_stage=(1, 3, 9, 3),
)


class eSE(nn.Module):
    """Effective squeeze-excitation: GAP → 1×1 conv → hard-sigmoid gate."""

    channels: int

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(-3, -2), keepdims=True)
        g = nn.Conv(self.channels, (1, 1), dtype=x.dtype, name="fc")(g)
        g = jnp.clip(g + 3.0, 0.0, 6.0) / 6.0       # Hsigmoid (:156-162)
        return x * g


class _eSEGate(nn.Module):
    """eSE gate from a precomputed per-image mean (the fused OSA tail
    kernel emits channel sums, so the GAP re-read of the feature map is
    skipped).  Same {fc/{kernel,bias}} param tree as :class:`eSE`."""

    channels: int

    @nn.compact
    def __call__(self, mean_n11c):
        g = nn.Conv(self.channels, (1, 1), dtype=mean_n11c.dtype,
                    name="fc")(mean_n11c)
        return jnp.clip(g + 3.0, 0.0, 6.0) / 6.0


class _ConvKernel(nn.Module):
    """Param-holder matching nn.Conv's {kernel} tree (no compute)."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (1, 1, self.cin, self.cout))


class _BNStats(nn.Module):
    """Param-holder matching FrozenBN's {scale,bias,mean,var} tree."""

    features: int

    @nn.compact
    def __call__(self):
        f = (self.features,)
        return (self.param("scale", nn.initializers.ones, f),
                self.param("bias", nn.initializers.zeros, f),
                self.param("mean", nn.initializers.zeros, f),
                self.param("var", nn.initializers.ones, f))


class _ConcatReduceParams(nn.Module):
    """Declares the same {conv/kernel, bn/{scale,bias,mean,var}} tree the
    XLA ConvBN("concat") owns, so both OSA tail impls load identical
    checkpoints."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        kernel = _ConvKernel(self.cin, self.cout, name="conv")()
        return (kernel,) + _BNStats(self.cout, name="bn")()


class OSABlock(nn.Module):
    """One-shot aggregation: chain of 3×3 convs, concat all, 1×1 reduce,
    eSE, optional identity.

    ``reduce_impl="pallas"`` (TPU inference) runs the concat-1×1-BN-ReLU
    tail as the fused ops/pallas_osa.py kernel — the concatenated
    [N, H, W, ΣC_i] tensor is never materialized (it measured ~half the
    block's runtime under XLA, docs/PERF_NOTES.md VoVNet campaign).  The
    param tree is identical either way, so checkpoints are
    interchangeable; training/CPU keep the autodiff-able XLA path."""

    stage_ch: int
    concat_ch: int
    layer_per_block: int
    identity: bool = False
    reduce_impl: str = "xla"       # "xla" (autodiff path) | "pallas"
    interpret: bool = False        # pallas interpret mode (CPU tests)

    @nn.compact
    def __call__(self, x):
        identity_feat = x
        outputs = [x]
        for i in range(self.layer_per_block):
            x = ConvBN(self.stage_ch, kernel=3, padding=1, dtype=x.dtype,
                       name=f"conv{i}")(x)
            outputs.append(x)
        if self.reduce_impl == "pallas":
            from transcar_tpu.ops.pallas_osa import osa_reduce

            cin = sum(p.shape[-1] for p in outputs)
            kernel, gamma, beta, mean, var = _ConcatReduceParams(
                cin, self.concat_ch, name="concat")()
            scale = gamma * jax.lax.rsqrt(var + 1e-5)
            bias = beta - mean * scale
            w2d = kernel.reshape(cin, self.concat_ch)
            splits, off = [], 0
            for p in outputs:
                splits.append(w2d[off:off + p.shape[-1]])
                off += p.shape[-1]
            x, csums = osa_reduce(outputs, splits, scale, bias, relu=True,
                                  interpret=self.interpret)
            gap = (csums / float(x.shape[-3] * x.shape[-2]))
            gap = gap.astype(x.dtype)[:, None, None, :]
            x = x * _eSEGate(self.concat_ch, name="ese")(gap)
        else:
            x = jnp.concatenate(outputs, axis=-1)
            x = ConvBN(self.concat_ch, kernel=1, dtype=x.dtype,
                       name="concat")(x)
            x = eSE(self.concat_ch, name="ese")(x)
        if self.identity:
            x = x + identity_feat
        return x


class VoVNet(nn.Module):
    """V-99-eSE returning stage2..stage5 feature maps (NHWC)."""

    out_stages: Tuple[int, ...] = (2, 3, 4, 5)
    compute_dtype: Optional[str] = "bfloat16"
    reduce_impl: str = "xla"       # OSA tail: "xla" | "pallas" (see OSABlock)
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else x.dtype
        x = x.astype(dtype)
        spec = V99_SPEC
        s1, s2, s3 = spec["stem"]
        x = ConvBN(s1, kernel=3, stride=2, padding=1, dtype=dtype,
                   name="stem1")(x)
        x = ConvBN(s2, kernel=3, stride=1, padding=1, dtype=dtype,
                   name="stem2")(x)
        x = ConvBN(s3, kernel=3, stride=2, padding=1, dtype=dtype,
                   name="stem3")(x)

        outs = []
        for si in range(4):
            stage_num = si + 2
            if stage_num > 2:
                # maxpool 3×3 s2 ceil_mode → pad to make output ceil(h/2)
                h, w = x.shape[-3], x.shape[-2]
                ph = (2 * (h // 2 - 1) + 3) - h
                pw = (2 * (w // 2 - 1) + 3) - w
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=[(0, max(ph, 0)), (0, max(pw, 0))])
            # stage3 (ch 160) is the one shape where the fused tail
            # measured slower than XLA (scripts/bench_osa_pallas.py, in
            # docs/PERF_NOTES.md) — keep XLA there
            impl = ("xla" if si == 1 and self.reduce_impl == "pallas"
                    else self.reduce_impl)
            for b in range(spec["block_per_stage"][si]):
                x = OSABlock(
                    spec["stage_conv_ch"][si],
                    spec["stage_out_ch"][si],
                    spec["layer_per_block"],
                    identity=(b > 0),
                    reduce_impl=impl,
                    interpret=self.interpret,
                    name=f"stage{stage_num}_block{b}",
                )(x)
            if stage_num in self.out_stages:
                outs.append(x)
        return outs
