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


def fold_frozen_bn(params: dict, eps: float = 1e-5) -> dict:
    """Return a new param tree with all FrozenBN groups precomputed."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        if {"scale", "bias", "mean", "var"} <= set(node) and not any(
                isinstance(v, dict) for v in node.values()):
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
