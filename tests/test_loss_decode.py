"""Loss + decode behavior tests: Hungarian-target construction, loss
finiteness/gradients, decode parity with a torch restatement of
NMSFreeCoder."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from transcar_tpu.core.config import HeadConfig
from transcar_tpu.core.boxes import normalize_bbox
from transcar_tpu.eval.decode import nms_free_decode
from transcar_tpu.train.loss import detr3d_loss

CFG = HeadConfig(num_query=64)


def _fake_preds(rng, nl=3, b=2, q=64, nc=10):
    return {
        "all_cls_scores": jnp.asarray(
            rng.normal(size=(nl, b, q, nc)).astype(np.float32)),
        "all_bbox_preds": jnp.asarray(
            rng.normal(size=(nl, b, q, 10)).astype(np.float32)),
    }


def _fake_gt(rng, b=2, g=16, counts=(5, 9)):
    boxes = np.ones((b, g, 9), np.float32)
    labels = np.zeros((b, g), np.int32)
    for i, n in enumerate(counts):
        boxes[i, :n, 0:2] = rng.uniform(-40, 40, (n, 2))
        boxes[i, :n, 2] = rng.uniform(-2, 1, n)
        boxes[i, :n, 3:6] = rng.uniform(0.5, 8, (n, 3))
        boxes[i, :n, 6] = rng.uniform(-np.pi, np.pi, n)
        boxes[i, :n, 7:9] = rng.uniform(-5, 5, (n, 2))
        labels[i, :n] = rng.integers(0, 10, n)
    return (jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(np.asarray(counts), dtype=jnp.int32))


def test_loss_structure_and_finiteness():
    rng = np.random.default_rng(0)
    preds = _fake_preds(rng)
    gt_boxes, gt_labels, num_gt = _fake_gt(rng)
    losses = jax.jit(
        lambda p, b, l, n: detr3d_loss(p, b, l, n, CFG))(
        preds, gt_boxes, gt_labels, num_gt)
    keys = {"loss_cls", "loss_bbox", "d0.loss_cls", "d0.loss_bbox",
            "d1.loss_cls", "d1.loss_bbox", "total"}
    assert set(losses) == keys
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0 or k == "total"


def test_loss_zero_gt_sample():
    rng = np.random.default_rng(1)
    preds = _fake_preds(rng, b=2)
    gt_boxes, gt_labels, _ = _fake_gt(rng)
    num_gt = jnp.asarray([0, 0], jnp.int32)
    losses = detr3d_loss(preds, gt_boxes, gt_labels, num_gt, CFG)
    assert np.isfinite(float(losses["total"]))
    # no positives → bbox loss must be exactly 0
    assert float(losses["loss_bbox"]) == 0.0


def test_loss_gradients_flow():
    rng = np.random.default_rng(2)
    preds = _fake_preds(rng)
    gt_boxes, gt_labels, num_gt = _fake_gt(rng)

    def f(preds):
        return detr3d_loss(preds, gt_boxes, gt_labels, num_gt, CFG)["total"]

    grads = jax.grad(f)(preds)
    g = np.asarray(grads["all_cls_scores"])
    assert np.isfinite(g).all() and np.abs(g).sum() > 0
    g2 = np.asarray(grads["all_bbox_preds"])
    assert np.isfinite(g2).all() and np.abs(g2).sum() > 0


def test_perfect_predictions_have_lower_cost_match():
    """Queries placed exactly on GT boxes must be matched to them."""
    rng = np.random.default_rng(3)
    q, g = 64, 4
    gt_boxes, gt_labels, num_gt = _fake_gt(rng, b=1, g=8, counts=(g,))
    gt_norm = np.asarray(normalize_bbox(gt_boxes[0, :g]))
    bbox_preds = rng.normal(size=(1, 1, q, 10)).astype(np.float32) * 5
    cls_scores = np.full((1, 1, q, 10), -8.0, np.float32)
    bbox_preds[0, 0, 10:10 + g] = gt_norm
    for i in range(g):
        cls_scores[0, 0, 10 + i, int(gt_labels[0, i])] = 8.0
    preds = {"all_cls_scores": jnp.asarray(cls_scores),
             "all_bbox_preds": jnp.asarray(bbox_preds)}
    losses = detr3d_loss(preds, gt_boxes, gt_labels, num_gt, CFG)
    # bbox loss ≈ 0 because matched rows coincide with targets
    assert float(losses["loss_bbox"]) < 1e-4


def test_decode_matches_torch_restatement():
    rng = np.random.default_rng(4)
    q, nc, k = 64, 10, 30
    cfg = HeadConfig(num_query=q, max_detections=k)
    cls = rng.normal(size=(1, 1, q, nc)).astype(np.float32)
    box = rng.normal(size=(1, 1, q, 10)).astype(np.float32)
    box[..., 0:2] *= 30
    out = nms_free_decode(
        {"all_cls_scores": jnp.asarray(cls),
         "all_bbox_preds": jnp.asarray(box)}, cfg)

    # torch restatement of NMSFreeCoder.decode_single (:52-78) + z shift
    scores_t = torch.from_numpy(cls[0, 0]).sigmoid().view(-1)
    top, idx = scores_t.topk(k)
    labels_t = idx % nc
    bidx = torch.div(idx, nc, rounding_mode="floor")
    bp = torch.from_numpy(box[0, 0])[bidx]
    rot = torch.atan2(bp[:, 6:7], bp[:, 7:8])
    boxes_t = torch.cat([bp[:, 0:2], bp[:, 4:5], bp[:, 2:4].exp(),
                         bp[:, 5:6].exp(), rot, bp[:, 8:10]], dim=-1)
    pcr = np.asarray(cfg.post_center_range)
    valid_t = ((boxes_t[:, :3].numpy() >= pcr[:3]).all(1)
               & (boxes_t[:, :3].numpy() <= pcr[3:]).all(1))
    boxes_t[:, 2] -= boxes_t[:, 5] * 0.5

    np.testing.assert_allclose(np.asarray(out["scores"][0]), top.numpy(),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["labels"][0]),
                                  labels_t.numpy())
    np.testing.assert_allclose(np.asarray(out["boxes"][0]), boxes_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["valid"][0]), valid_t)


def test_double_flip_tta_roundtrip():
    """Flipping points, decoding, and unflipping must reproduce the
    canonical boxes; the merge keeps the best-scored detections."""
    from transcar_tpu.eval.tta import flip_points, unflip_boxes, \
        merge_flip_detections
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.normal(size=(1, 20, 5)).astype(np.float32))
    # flip twice = identity
    np.testing.assert_allclose(
        np.asarray(flip_points(flip_points(pts, True, True), True, True)),
        np.asarray(pts))
    boxes = rng.normal(size=(5, 9)).astype(np.float32)
    back = unflip_boxes(unflip_boxes(jnp.asarray(boxes), True, False),
                        True, False)
    np.testing.assert_allclose(np.asarray(back), boxes, rtol=1e-6)
    # vertical double-unflip restores geometry up to yaw mod 2π
    back_v = unflip_boxes(unflip_boxes(jnp.asarray(boxes), False, True),
                          False, True)
    np.testing.assert_allclose(np.asarray(back_v)[:, :6], boxes[:, :6],
                               rtol=1e-6)
    np.testing.assert_allclose(np.sin(np.asarray(back_v)[:, 6]),
                               np.sin(boxes[:, 6]), atol=1e-6)

    views = []
    for i in range(2):
        views.append({
            "boxes": rng.normal(size=(4, 9)).astype(np.float32),
            "scores": np.asarray([0.9 - i * 0.1, 0.5, 0.3, 0.2],
                                 np.float32),
            "labels": np.arange(4, dtype=np.int32),
            "valid": np.asarray([True, True, False, True]),
        })
    merged = merge_flip_detections(views, [(False, False), (True, False)],
                                   max_num=5)
    assert merged["boxes"].shape == (5, 9)
    assert (np.diff(merged["scores"]) <= 0).all()
    assert merged["scores"][0] == np.float32(0.9)
