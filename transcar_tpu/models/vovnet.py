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

from transcar_tpu.models.common import ConvBN, ConvBNParams, bn_affine

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


_ConcatReduceParams = ConvBNParams   # (name kept for existing callers)


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
    reduce_impl: str = "xla"       # "xla" (autodiff) | "pallas" (fused
                                   # tail) | "fused" (whole-block kernel)
    rows_per_chunk: Optional[int] = None   # "fused": image rows per grid
                                           # step (None = whole image)
    interpret: bool = False        # pallas interpret mode (CPU tests)
    quantize: str = "none"         # "int8": chain/reduce ConvBNs run as
                                   # dynamic int8 (ops/int8.py; ignored
                                   # by the experimental "fused" path)

    @nn.compact
    def __call__(self, x):
        identity_feat = x
        if self.reduce_impl == "fused":
            from transcar_tpu.ops.pallas_osa_block import osa_block_fused

            conv_ws, conv_affs = [], []
            cin = x.shape[-1]
            for i in range(self.layer_per_block):
                k, g, b, m, v = _ConcatReduceParams(
                    cin, self.stage_ch, ksize=3, name=f"conv{i}")()
                conv_ws.append(k)
                conv_affs.append(bn_affine(g, b, m, v))
                cin = self.stage_ch
            tot = x.shape[-1] + self.layer_per_block * self.stage_ch
            rk, rg, rb, rm, rv = _ConcatReduceParams(
                tot, self.concat_ch, name="concat")()
            raff = bn_affine(rg, rb, rm, rv)
            w2d = rk.reshape(tot, self.concat_ch)
            widths = [x.shape[-1]] + [self.stage_ch] * self.layer_per_block
            splits, off = [], 0
            for wd in widths:
                splits.append(w2d[off:off + wd])
                off += wd
            out, csums = osa_block_fused(
                x, conv_ws, conv_affs, splits, raff,
                rows_per_chunk=self.rows_per_chunk,
                interpret=self.interpret)
            gap = (csums / float(x.shape[-3] * x.shape[-2]))
            gap = gap.astype(out.dtype)[:, None, None, :]
            out = out * _eSEGate(self.concat_ch, name="ese")(gap)
            if self.identity:
                out = out + identity_feat
            return out
        outputs = [x]
        for i in range(self.layer_per_block):
            x = ConvBN(self.stage_ch, kernel=3, padding=1, dtype=x.dtype,
                       quantize=self.quantize, name=f"conv{i}")(x)
            outputs.append(x)
        if self.reduce_impl == "pallas":
            from transcar_tpu.ops.pallas_osa import osa_reduce

            cin = sum(p.shape[-1] for p in outputs)
            kernel, gamma, beta, mean, var = _ConcatReduceParams(
                cin, self.concat_ch, name="concat")()
            scale, bias = bn_affine(gamma, beta, mean, var)
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
                       quantize=self.quantize, name="concat")(x)
            x = eSE(self.concat_ch, name="ese")(x)
        if self.identity:
            x = x + identity_feat
        return x


class VoVNet(nn.Module):
    """V-99-eSE returning stage2..stage5 feature maps (NHWC)."""

    out_stages: Tuple[int, ...] = (2, 3, 4, 5)
    compute_dtype: Optional[str] = "bfloat16"
    reduce_impl: str = "xla"       # "xla" | "pallas" (measured-best mix
                                   # of kernels per stage, see below)
    stage_impls: Optional[Tuple[str, ...]] = None  # explicit per-stage
                                   # override (experiments): "xla" |
                                   # "pallas" (fused tail) | "fused"
                                   # (whole-block kernel)
    stem_impl: str = "xla"         # "xla" | "phase" (ops/phase_stem.py —
                                   # same params, conv math re-expressed
                                   # on the stride-4 phase grid where XLA
                                   # hits 85-91% MFU instead of 14-30%)
    remat: bool = False            # rematerialize OSA blocks on backward
                                   # (full-backbone training HBM control;
                                   # resolved by build_model like ResNet)
    quantize: str = "none"         # "int8" serving mode (resolved by
                                   # build_model; inference only)
    interpret: bool = False

    # measured-best TPU-inference mix (scripts/bench_vovnet_mixes.py,
    # docs/PERF_NOTES.md): the fused-TAIL kernel everywhere.  The
    # whole-block "fused" kernel ties it at model level (94-96 ms both)
    # but hits remote-compiler failures in some full-model contexts, so
    # it stays an explicit-opt-in experiment via ``stage_impls``
    PALLAS_STAGE_IMPLS = ("pallas", "pallas", "pallas", "pallas")
    STAGE_CHUNK_ROWS = (29, 29, None, None)

    @nn.compact
    def __call__(self, x):
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else x.dtype
        x = x.astype(dtype)
        spec = V99_SPEC
        s1, s2, s3 = spec["stem"]
        if self.stem_impl == "phase":
            from transcar_tpu.ops.phase_stem import vovnet_phase_stem

            k1, *bn1 = ConvBNParams(3, s1, ksize=3, name="stem1")()
            k2, *bn2 = ConvBNParams(s1, s2, ksize=3, name="stem2")()
            k3, *bn3 = ConvBNParams(s2, s3, ksize=3, name="stem3")()
            x = vovnet_phase_stem(
                x, k1.astype(dtype), bn_affine(*bn1),
                k2.astype(dtype), bn_affine(*bn2),
                k3.astype(dtype), bn_affine(*bn3))
        else:
            # the stem sees raw-scale images whose dynamic range a
            # per-tensor activation scale handles fine; quantize it with
            # the rest of the backbone
            x = ConvBN(s1, kernel=3, stride=2, padding=1, dtype=dtype,
                       quantize=self.quantize, name="stem1")(x)
            x = ConvBN(s2, kernel=3, stride=1, padding=1, dtype=dtype,
                       quantize=self.quantize, name="stem2")(x)
            x = ConvBN(s3, kernel=3, stride=2, padding=1, dtype=dtype,
                       quantize=self.quantize, name="stem3")(x)

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
            if self.stage_impls is not None:
                impl = self.stage_impls[si]
            elif self.reduce_impl == "pallas":
                impl = self.PALLAS_STAGE_IMPLS[si]
            else:
                impl = self.reduce_impl
            block_cls = nn.remat(OSABlock) if self.remat else OSABlock
            for b in range(spec["block_per_stage"][si]):
                x = block_cls(
                    spec["stage_conv_ch"][si],
                    spec["stage_out_ch"][si],
                    spec["layer_per_block"],
                    identity=(b > 0),
                    reduce_impl=impl,
                    rows_per_chunk=(self.STAGE_CHUNK_ROWS[si]
                                    if impl == "fused" else None),
                    interpret=self.interpret,
                    quantize=self.quantize,
                    name=f"stage{stage_num}_block{b}",
                )(x)
            if stage_num in self.out_stages:
                outs.append(x)
        return outs
