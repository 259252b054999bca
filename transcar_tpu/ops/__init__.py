from transcar_tpu.ops.sampling import (
    bilinear_sample_nhwc,
    sample_multiview_multilevel,
)
from transcar_tpu.ops.attention import multihead_attention, masked_cross_attention
from transcar_tpu.ops.focal import sigmoid_focal_loss, focal_loss_cost
from transcar_tpu.ops.hungarian import hungarian_match

__all__ = [
    "bilinear_sample_nhwc",
    "sample_multiview_multilevel",
    "multihead_attention",
    "masked_cross_attention",
    "sigmoid_focal_loss",
    "focal_loss_cost",
    "hungarian_match",
]
