"""ResNet-101 (caffe style) with DCNv2 stages 3-4 and frozen BN.

Parity target: the mmdet ``ResNet`` the primary config builds
(configs/detr3d/detr3d_res101_gridmask.py:32-42): depth 101,
out_indices (0,1,2,3), frozen_stages=1, BN frozen (FrozenBN here),
style='caffe' (stride on the 1×1 conv of each bottleneck, so the 3×3/DCN
conv is always stride 1), ``stage_with_dcn=(F, F, T, T)``.

TPU-first choices: NHWC layout, bfloat16 compute for convs (params stay
fp32), DCN coordinate math in fp32 (see ops/dcn.py).  Freezing is enforced
by the optimizer mask (train/optim.py), mirroring ``frozen_stages`` +
norm_eval + the TransCAR full camera freeze (tools/train.py:238-252).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from transcar_tpu.models.common import ConvBN, FrozenBN
from transcar_tpu.ops.dcn import modulated_deform_conv

RESNET_DEPTHS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


class DCNConv(nn.Module):
    """DCNv2 layer: zero-initialized offset conv + deformable 3×3 conv.

    Torch param mapping: ``convN.weight`` → `weight`,
    ``convN.conv_offset.{weight,bias}`` → the `conv_offset` submodule.
    mmcv zero-inits conv_offset so initial behavior is a regular conv with
    0.5 modulation (sigmoid(0)).
    """

    in_features: int
    features: int
    stride: int = 1
    impl: str = "exact"        # "exact" (autodiff-able XLA gather) |
    band_rows: int = 16        # "pallas" (fused inference kernel)
    rows_per_step: int = 1     # pallas grid coarsening (see BackboneConfig)
    variant: str = "banded"    # pallas formulation (see ops/pallas_dcn.py)
    interpret: bool = False    # pallas interpret mode (CPU tests)

    @nn.compact
    def __call__(self, x):
        # offset conv runs at DCN stride/padding (mmcv ModulatedDeformConv2dPack)
        om = nn.Conv(
            27, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=x.dtype,
            name="conv_offset",
        )(x)
        weight = self.param(
            "weight", nn.initializers.he_normal(),
            (3, 3, self.in_features, self.features))
        if self.impl == "pallas" and self.stride == 1:
            from transcar_tpu.ops.pallas_dcn import fused_deform_conv_ad

            # band-overflow telemetry: fraction of taps whose vertical
            # offset leaves the exact window |Δy| ≤ (band−4)/2 (beyond it
            # the banded kernel returns 0 output AND 0 gradient — see
            # ops/pallas_dcn.py).  Sown into "intermediates" so eval/bench
            # can audit real checkpoints against the shipped band; free
            # when "intermediates" is not mutable.
            if not self.is_initializing():
                margin = (self.band_rows - 4) / 2
                dy = om[..., 0:18:2].astype(jnp.float32)
                self.sow("intermediates", "dcn_overflow_frac",
                         jnp.mean((jnp.abs(dy) > margin).astype(jnp.float32)))
            return fused_deform_conv_ad(x, om, weight, self.band_rows,
                                        self.rows_per_step, self.interpret,
                                        self.variant)
        fn = lambda xi, omi: modulated_deform_conv(
            xi, omi, weight, stride=self.stride, padding=1)
        return jax.vmap(fn)(x, om)


class Bottleneck(nn.Module):
    """Caffe-style bottleneck: 1×1(stride)-3×3-1×1 with frozen BN.

    ``impl="fused"`` (TPU inference, stride-1 non-DCN blocks) runs the
    whole block as one Pallas kernel (ops/pallas_bottleneck.py) — the
    64/128-channel intermediates that make these blocks HBM-bound under
    XLA never leave VMEM.  Param tree identical either way."""

    planes: int
    stride: int = 1
    downsample: bool = False
    with_dcn: bool = False
    dcn_impl: str = "exact"
    dcn_band_rows: int = 16
    dcn_rows_per_step: int = 1
    dcn_variant: str = "banded"
    dcn_interpret: bool = False
    impl: str = "xla"            # "xla" | "fused" (see class docstring)
    quantize: str = "none"       # "int8": plain (non-DCN) convs run as
                                 # dynamic int8 (ops/int8.py; the DCN
                                 # conv2 and the experimental fused path
                                 # stay fp)

    @nn.compact
    def __call__(self, x):
        rows = None
        if (self.impl == "fused" and self.stride == 1
                and not self.with_dcn):
            from transcar_tpu.ops.pallas_bottleneck import _pick_rows

            rows = _pick_rows(x.shape[-3], x.shape[-2], x.shape[-1],
                              self.planes, self.planes * 4)
        if rows is not None:
            from transcar_tpu.models.common import ConvBNParams, bn_affine
            from transcar_tpu.ops.pallas_bottleneck import bottleneck_fused

            cin = x.shape[-1]
            k1, *bn1 = ConvBNParams(cin, self.planes, 1, name="conv1")()
            k2, *bn2 = ConvBNParams(self.planes, self.planes, 3,
                                    name="conv2")()
            k3, *bn3 = ConvBNParams(self.planes, self.planes * 4, 1,
                                    name="conv3")()
            kw = {}
            if self.downsample:
                kd, *bnd = ConvBNParams(cin, self.planes * 4, 1,
                                        name="downsample")()
                kw = dict(wd=kd, affd=bn_affine(*bnd))
            return bottleneck_fused(
                x, k1, bn_affine(*bn1), k2, bn_affine(*bn2),
                k3, bn_affine(*bn3), rows_per_chunk=rows,
                interpret=self.dcn_interpret, **kw)
        identity = x
        out = ConvBN(self.planes, kernel=1, stride=self.stride, relu=True,
                     dtype=x.dtype, quantize=self.quantize,
                     name="conv1")(x)
        if self.with_dcn:
            out = DCNConv(self.planes, self.planes, impl=self.dcn_impl,
                          band_rows=self.dcn_band_rows,
                          rows_per_step=self.dcn_rows_per_step,
                          variant=self.dcn_variant,
                          interpret=self.dcn_interpret, name="conv2")(out)
            out = FrozenBN(self.planes, name="bn2")(out)
            out = nn.relu(out)
        else:
            out = ConvBN(self.planes, kernel=3, stride=1, padding=1,
                         relu=True, dtype=x.dtype, quantize=self.quantize,
                         name="conv2")(out)
        out = ConvBN(self.planes * 4, kernel=1, relu=False, dtype=x.dtype,
                     quantize=self.quantize, name="conv3")(out)
        if self.downsample:
            identity = ConvBN(self.planes * 4, kernel=1, stride=self.stride,
                              relu=False, dtype=x.dtype,
                              quantize=self.quantize,
                              name="downsample")(x)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Multi-stage ResNet returning C2..C5 feature maps (NHWC)."""

    depth: int = 101
    with_dcn: Tuple[bool, ...] = (False, False, True, True)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    compute_dtype: Optional[str] = "bfloat16"
    remat: bool = True   # rematerialize blocks on backward (HBM for FLOPs)
    dcn_impl: str = "exact"      # "exact" | "pallas" (see models docstring)
    dcn_band_rows: int = 16
    dcn_rows_per_step: int = 1
    dcn_variant: str = "banded"  # pallas formulation (ops/pallas_dcn.py)
    dcn_interpret: bool = False  # pallas interpret mode (CPU tests)
    stem_impl: str = "xla"       # "xla" | "phase" (ops/phase_stem.py —
                                 # same params, stem conv+pool on the
                                 # stride-4 phase grid)
    block_impl: str = "xla"      # "xla" | "fused" — fused Pallas
                                 # bottleneck for stride-1 non-DCN blocks
                                 # (ops/pallas_bottleneck.py)
    quantize: str = "none"       # "int8" serving mode (resolved by
                                 # build_model; inference only, plain
                                 # convs only — DCN stays fp)

    @nn.compact
    def __call__(self, x):
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else x.dtype
        x = x.astype(dtype)
        # stem: 7×7/64 s2 + maxpool 3×3 s2 (mmdet ResNet, deep_stem=False)
        if self.stem_impl == "phase":
            from transcar_tpu.models.common import ConvBNParams, bn_affine
            from transcar_tpu.ops.phase_stem import resnet_phase_stem

            k, *bn = ConvBNParams(3, 64, ksize=7, name="stem")()
            x = resnet_phase_stem(x, k.astype(dtype), bn_affine(*bn))
        else:
            x = ConvBN(64, kernel=7, stride=2, padding=3, relu=True,
                       dtype=dtype, quantize=self.quantize,
                       name="stem")(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])

        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        blocks = RESNET_DEPTHS[self.depth]
        outs = []
        planes = 64
        for stage, num_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            for b in range(num_blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    with_dcn=self.with_dcn[stage],
                    dcn_impl=self.dcn_impl,
                    dcn_band_rows=self.dcn_band_rows,
                    dcn_rows_per_step=self.dcn_rows_per_step,
                    dcn_variant=self.dcn_variant,
                    dcn_interpret=self.dcn_interpret,
                    impl=self.block_impl,
                    quantize=self.quantize,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return outs
