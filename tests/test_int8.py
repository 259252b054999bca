"""Dynamic int8 conv serving mode (ops/int8.py, ConvBN quantize="int8").

The quantized path is an opt-in accuracy-for-speed serving mode (no
reference analog — the reference has no quantized inference).  These
tests pin its contract: bounded quantization error vs the fp conv, exact
positive-scale invariance, a param tree identical to the fp path
(checkpoint interchangeability), and build_model forcing fp in training.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from transcar_tpu.ops.int8 import (dynamic_int8_conv, quantize_per_tensor,
                                   quantize_weight_per_channel)


def _ref_conv(x, k, stride=1, padding=0, dilation=1):
    return lax.conv_general_dilated(
        x, k, window_strides=(stride, stride),
        padding=[(padding, padding)] * 2, rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("stride,padding", [(1, 1), (2, 1), (1, 0)])
def test_dynamic_int8_conv_error_bound(stride, padding):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 20, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 32, 48)) * 0.1, jnp.float32)
    y_fp = _ref_conv(x, k, stride, padding)
    y_q = dynamic_int8_conv(x, k, stride=stride, padding=padding,
                            out_dtype=jnp.float32)
    assert y_q.shape == y_fp.shape and y_q.dtype == jnp.float32
    rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
    # 8-bit symmetric quant of gaussian data: ~1% relative error per
    # operand; the conv contraction averages per-element noise down
    assert rel < 0.03, rel


def test_int8_quantization_is_exact_for_representable_values():
    # integers in [-127, 127] scaled by max/127 are exactly representable
    # → the quantized conv reproduces an integer conv bit-exactly
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-127, 128, (1, 8, 8, 16)), jnp.float32)
    k_int = rng.integers(-127, 128, (3, 3, 16, 8)).astype(np.float32)
    # force |max| = 127 per channel so per-channel scales are exactly 1
    k_int[0, 0, 0, :] = 127.0
    k = jnp.asarray(k_int)
    x = x.at[0, 0, 0, 0].set(127.0)
    y_fp = _ref_conv(x, k, 1, 1)
    y_q = dynamic_int8_conv(x, k, stride=1, padding=1,
                            out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_fp))


def test_positive_scale_invariance():
    # scaling the input by alpha > 0 leaves the int8 codes unchanged and
    # scales the output exactly by alpha (dynamic per-tensor scale)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 10, 12, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)), jnp.float32)
    y1 = dynamic_int8_conv(x, k, stride=1, padding=1,
                           out_dtype=jnp.float32)
    y2 = dynamic_int8_conv(x * 7.5, k, stride=1, padding=1,
                           out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1) * 7.5,
                               rtol=1e-5, atol=1e-5)


def test_quantizers_roundtrip_bounds():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 6, 6, 12)), jnp.float32)
    q, s = quantize_per_tensor(x)
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(q, np.float32) * float(s),
                               np.asarray(x), atol=float(s) / 2 + 1e-7)
    k = jnp.asarray(rng.normal(size=(3, 3, 12, 5)), jnp.float32)
    qk, sk = quantize_weight_per_channel(k)
    assert qk.dtype == jnp.int8 and sk.shape == (5,)
    np.testing.assert_allclose(
        np.asarray(qk, np.float32) * np.asarray(sk), np.asarray(k),
        atol=float(np.max(np.asarray(sk))) / 2 + 1e-7)


def test_convbn_int8_param_tree_matches_fp():
    from transcar_tpu.models.common import ConvBN

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), jnp.float32)
    fp = ConvBN(24, kernel=3, padding=1)
    q = ConvBN(24, kernel=3, padding=1, quantize="int8")
    v_fp = fp.init(jax.random.PRNGKey(0), x)
    v_q = q.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_fp)
            == jax.tree_util.tree_structure(v_q))
    shapes_fp = jax.tree_util.tree_map(jnp.shape, v_fp)
    shapes_q = jax.tree_util.tree_map(jnp.shape, v_q)
    assert shapes_fp == shapes_q
    # the SAME (fp-trained) params drive both paths: checkpoint
    # interchangeability is the contract
    y_fp = fp.apply(v_fp, x)
    y_q = q.apply(v_fp, x)
    rel = float(jnp.linalg.norm(y_q - y_fp)
                / jnp.maximum(jnp.linalg.norm(y_fp), 1e-6))
    assert rel < 0.05, rel


def test_bottleneck_int8_close_to_fp():
    from transcar_tpu.models.resnet import Bottleneck

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 12, 16, 64)), jnp.float32)
    fp = Bottleneck(planes=16, downsample=True)
    q = Bottleneck(planes=16, downsample=True, quantize="int8")
    v = fp.init(jax.random.PRNGKey(0), x)
    y_fp = np.asarray(fp.apply(v, x)).ravel()
    y_q = np.asarray(q.apply(v, x)).ravel()
    cos = float(np.dot(y_fp, y_q)
                / (np.linalg.norm(y_fp) * np.linalg.norm(y_q) + 1e-12))
    assert cos > 0.995, cos


def test_build_model_resolves_quantize():
    import dataclasses

    from transcar_tpu.core.config import get_preset
    from transcar_tpu.models.detector import build_model

    cfg = get_preset("transcar_vovnet_trainval")
    bb = dataclasses.replace(cfg.model.backbone, quantize="int8")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backbone=bb))
    assert build_model(cfg).backbone_quantize == "int8"
    # training always runs fp: gradients through round/clip are useless
    assert build_model(cfg, training=True).backbone_quantize == "none"
