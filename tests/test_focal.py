"""Focal loss / focal cost parity vs a torch re-statement of mmdet's
``py_sigmoid_focal_loss`` and ``FocalLossCost`` (config :95-100,111)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from transcar_tpu.ops.focal import sigmoid_focal_loss, focal_loss_cost, l1_loss

NC = 10


def _torch_focal(pred, target_onehot, weight, gamma, alpha, avg_factor):
    p = pred.sigmoid()
    pt = (1 - p) * target_onehot + p * (1 - target_onehot)
    fw = (alpha * target_onehot + (1 - alpha) * (1 - target_onehot)) * pt.pow(
        gamma)
    loss = F.binary_cross_entropy_with_logits(
        pred, target_onehot, reduction="none") * fw
    loss = loss * weight[:, None]
    return loss.sum() / avg_factor


def test_focal_loss_matches_mmdet_semantics():
    rng = np.random.default_rng(0)
    n = 128
    logits = rng.normal(size=(n, NC)).astype(np.float32) * 3
    labels = rng.integers(0, NC + 1, size=(n,))   # NC = background
    weights = np.ones((n,), np.float32)
    avg = 17.0

    ours = sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights),
        NC, gamma=2.0, alpha=0.25, avg_factor=avg, loss_weight=2.0)

    onehot = np.zeros((n, NC), np.float32)
    for i, l in enumerate(labels):
        if l < NC:
            onehot[i, l] = 1.0
    ref = 2.0 * _torch_focal(
        torch.from_numpy(logits), torch.from_numpy(onehot),
        torch.from_numpy(weights), 2.0, 0.25, avg)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_focal_cost_matches_mmdet():
    rng = np.random.default_rng(1)
    q, g = 64, 7
    logits = rng.normal(size=(q, NC)).astype(np.float32)
    gt = rng.integers(0, NC, size=(g,))

    ours = np.asarray(focal_loss_cost(jnp.asarray(logits), jnp.asarray(gt),
                                      weight=2.0))

    # mmdet FocalLossCost restated
    p = torch.from_numpy(logits).sigmoid()
    eps = 1e-12
    neg = -(1 - p + eps).log() * (1 - 0.25) * p.pow(2)
    pos = -(p + eps).log() * 0.25 * (1 - p).pow(2)
    ref = (pos[:, gt] - neg[:, gt]) * 2.0
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)


def test_l1_loss():
    rng = np.random.default_rng(2)
    pred = rng.normal(size=(30, 10)).astype(np.float32)
    tgt = rng.normal(size=(30, 10)).astype(np.float32)
    w = rng.uniform(size=(30, 10)).astype(np.float32)
    ours = l1_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(w),
                   avg_factor=5.0, loss_weight=0.25)
    ref = 0.25 * (np.abs(pred - tgt) * w).sum() / 5.0
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)
