"""Dynamic int8 quantized convolution (opt-in serving mode).

The v5e MXU peaks at 394 TOPS int8 vs 197 TFLOPS bf16, and the VoVNet
backbone's 3x3 chain convs sit at the lane-fill/MFU bound in bf16
(docs/PERF_NOTES.md VoVNet close-out) — int8 is the one remaining
throughput lever that doesn't fight XLA.  This implements the standard
production recipe (TensorRT-style): symmetric per-output-channel weight
scales + symmetric dynamic per-tensor activation scale, int8 x int8 →
int32 accumulation on the MXU, fp dequantize fused by XLA into the
following BN/ReLU.

This is an ACCURACY-FOR-SPEED trade (quantization error ~1% per conv)
gated behind ``BackboneConfig.quantize="int8"`` — it is never a parity
path and never used in training (build_model forces it off).  The
reference has no quantized inference at all.

No reference analog to cite; the fp32 semantics being approximated are
mmcv's ConvModule convs (SURVEY.md §2.4 N11).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def quantize_per_tensor(x: jnp.ndarray):
    """Symmetric per-tensor int8 quantization.  Returns (q, scale)."""
    s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                 -127, 127).astype(jnp.int8)
    return q, s


def quantize_weight_per_channel(kernel: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of an HWIO conv
    kernel.  Returns (q, scale[cout])."""
    s = jnp.maximum(
        jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=(0, 1, 2)),
        _EPS) / 127.0
    q = jnp.clip(jnp.round(kernel.astype(jnp.float32) / s),
                 -127, 127).astype(jnp.int8)
    return q, s


def dynamic_int8_conv(x: jnp.ndarray, kernel: jnp.ndarray, *,
                      stride: int = 1, padding: int = 0,
                      dilation: int = 1,
                      out_dtype=None) -> jnp.ndarray:
    """NHWC conv with on-the-fly int8 quantization of both operands.

    y = dequant(conv_int8(quant(x), quant(w))): exact int32 accumulation,
    one fp multiply per output element for the (s_x · s_w[c]) dequant —
    XLA fuses it into whatever elementwise op follows.  The weight-side
    max/round runs per call but is O(|W|), trivial next to the conv (and
    constant-folds if the params are donated/baked).
    """
    out_dtype = out_dtype or x.dtype
    xq, s_x = quantize_per_tensor(x)
    wq, s_w = quantize_weight_per_channel(kernel)
    y = lax.conv_general_dilated(
        xq, wq,
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s_x * s_w)).astype(out_dtype)
