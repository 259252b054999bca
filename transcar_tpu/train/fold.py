"""Precompute frozen-BN affines (tools/misc/fuse_conv_bn.py analog).

XLA already fuses FrozenBN's elementwise scale/bias into adjacent convs at
compile time, so unlike the CUDA reference this is not a speed lever; it is
provided for tool parity and for exporting inference-ready checkpoints.

Every FrozenBN param group ``{scale, bias, mean, var}`` is rewritten to an
equivalent precomputed affine: ``scale' = γ/√(var+eps)``,
``bias' = β − mean·γ/√(var+eps)``, stats neutralized (mean 0, var 1−eps),
so the module structure is unchanged and ``apply`` is bit-identical.
"""
from __future__ import annotations

import numpy as np


def _is_frozen_bn_group(node) -> bool:
    return (isinstance(node, dict)
            and {"scale", "bias", "mean", "var"} <= set(node)
            and not any(isinstance(v, dict) for v in node.values()))


def fold_frozen_bn(params: dict, eps: float = 1e-5) -> dict:
    """Return a new param tree with all FrozenBN groups precomputed."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        if _is_frozen_bn_group(node):
            gamma = np.asarray(node["scale"], np.float64)
            beta = np.asarray(node["bias"], np.float64)
            mean = np.asarray(node["mean"], np.float64)
            var = np.asarray(node["var"], np.float64)
            s = gamma / np.sqrt(var + eps)
            return {
                "scale": s.astype(np.float32),
                "bias": (beta - mean * s).astype(np.float32),
                "mean": np.zeros_like(mean, np.float32),
                "var": (np.ones_like(var) - eps).astype(np.float32),
            }
        return {k: rec(v) for k, v in node.items()}

    return rec(params)


def fold_bn_into_conv(params: dict, eps: float = 1e-5) -> dict:
    """True conv-BN fusion (tools/misc/fuse_conv_bn.py:10-24 semantics):
    multiply each frozen-BN scale γ/√(var+eps) into the preceding conv's
    kernel output channels and neutralize the BN to a pure bias add.

    Unlike :func:`fold_frozen_bn` (bit-identical affine precompute) this
    changes where the multiply happens, so bf16 backbones round slightly
    differently (≤1 ulp of the conv output) — the eval default; pass
    ``fold_bn=False`` to ``evaluate`` for unfolded numerics.

    Recognized patterns (models/resnet.py, models/vovnet.py, models/fpn.py):
      * ConvBN:  node = {"conv": {kernel,...}, "bn": <FrozenBN group>}
      * DCN:     node = {"conv2": {weight, conv_offset}, "bn2": <group>}
    Trainable BatchNorm (LiDAR track) keeps its stats in ``batch_stats``
    and never matches the 4-param group, so it is untouched.
    """

    def fold_pair(conv: dict, bn: dict, weight_key: str):
        gamma = np.asarray(bn["scale"], np.float64)
        beta = np.asarray(bn["bias"], np.float64)
        mean = np.asarray(bn["mean"], np.float64)
        var = np.asarray(bn["var"], np.float64)
        s = gamma / np.sqrt(var + eps)
        kernel = np.asarray(conv[weight_key], np.float64) * s
        new_conv = dict(conv)
        new_conv[weight_key] = kernel.astype(
            np.asarray(conv[weight_key]).dtype)
        new_bn = {
            "scale": np.ones_like(s, np.float32),
            "bias": (beta - mean * s).astype(np.float32),
            "mean": np.zeros_like(mean, np.float32),
            "var": (np.ones_like(var) - eps).astype(np.float32),
        }
        return new_conv, new_bn

    def rec(node):
        if not isinstance(node, dict):
            return node
        out = {k: rec(v) for k, v in node.items()}
        if ("conv" in out and "bn" in out and _is_frozen_bn_group(out["bn"])
                and isinstance(out["conv"], dict) and "kernel" in out["conv"]):
            out["conv"], out["bn"] = fold_pair(out["conv"], out["bn"],
                                               "kernel")
        if ("conv2" in out and "bn2" in out
                and _is_frozen_bn_group(out["bn2"])
                and isinstance(out["conv2"], dict)
                and "weight" in out["conv2"]):
            out["conv2"], out["bn2"] = fold_pair(out["conv2"], out["bn2"],
                                                 "weight")
        return out

    return rec(params)
