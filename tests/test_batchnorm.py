"""Train-mode BatchNorm for the LiDAR track (VERDICT round-2 item 5).

The reference trains the ObjDGCNN norms (``norm_cfg=dict(type='BN')``,
pillar.py:65-80) while the camera trunk freezes them (norm_eval,
detr3d_res101_gridmask.py:38-39).  Checks: running statistics update
during an ObjDGCNN train step, MaskedBN excludes static padding rows from
the statistics, BN affine params land in the trainable group, and the
camera model carries no batch_stats collection at all."""
import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from transcar_tpu.core.config import get_preset
from transcar_tpu.models.common import MaskedBN
from transcar_tpu.models.detector import build_model
from transcar_tpu.train.step import init_state, make_train_step


def _tiny_lidar_cfg():
    return get_preset("objdgcnn_pillar", {
        "data.max_points": "512",
        "data.max_gt_boxes": "4",
        "model.head.num_query": "8",
        "model.head.num_decoder_layers": "1",
        "model.voxel_size": "[12.8,12.8,8.0]",
        "model.max_voxels": "64",
        "model.bev_hw": "[8,8]",
        "train.optim.warmup_iters": "2",
    })


def _lidar_batch(rng, b=1, n=512, max_gt=4):
    pts = rng.uniform(-45, 45, (b, n, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-4, 2, (b, n))
    gt = np.ones((b, max_gt, 9), np.float32)
    gt[..., :2] = rng.uniform(-30, 30, (b, max_gt, 2))
    gt[..., 3:6] = rng.uniform(1, 4, (b, max_gt, 3))
    return {"points": pts, "num_points": np.full((b,), n, np.int32),
            "gt_boxes": gt,
            "gt_labels": rng.integers(0, 10, (b, max_gt)).astype(np.int32),
            "num_gt": np.full((b,), 3, np.int32)}


def test_objdgcnn_bn_stats_update_during_training():
    cfg = _tiny_lidar_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = _lidar_batch(rng)
    state, tx = init_state(cfg, model, batch, total_steps=10,
                           rng=jax.random.PRNGKey(0))
    stats0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    leaves0 = jax.tree_util.tree_leaves(stats0)
    assert leaves0, "LiDAR model must carry a batch_stats collection"
    assert "backbone" in stats0 and "vfe" in stats0 and "neck" in stats0

    step = make_train_step(cfg, model, tx)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    state2, losses = step(state, batch_j, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))
    moved = [
        not np.allclose(a, np.asarray(b))
        for a, b in zip(leaves0, jax.tree_util.tree_leaves(
            state2.batch_stats))
    ]
    assert any(moved), "running BN statistics did not update"
    # BN affine params train (norm_eval=False): find a backbone bn scale
    p0 = state.params["backbone"]["block0_conv0"]["bn"]["scale"]
    assert p0 is not None


def test_camera_model_has_no_batch_stats():
    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=8, radar_tokens=16)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, 1, 6, 64, 96, 16, max_gt=4)
    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["images"]),
                           jnp.asarray(batch["lidar2img"]),
                           jnp.asarray(batch["radar_tokens"]))
    assert "batch_stats" not in variables, \
        "camera trunk must keep FrozenBN (norm_eval)"


def test_masked_bn_ignores_padding_rows():
    m = MaskedBN(4)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(10, 4)).astype(np.float32)
    x[6:] = 99.0                                  # padding garbage
    mask = np.arange(10) < 6
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(mask), train=True)
    y, new_vars = m.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                          train=True, mutable=["batch_stats"])
    real = x[:6]
    mean = real.mean(0)
    var = real.var(0)
    expect = (real - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y)[:6], expect, rtol=1e-4,
                               atol=1e-4)
    # running stats moved toward the masked statistics, momentum 0.9
    np.testing.assert_allclose(
        np.asarray(new_vars["batch_stats"]["mean"]), 0.1 * mean, rtol=1e-4,
        atol=1e-5)
    # eval mode uses the running averages, not the batch
    y2 = m.apply({"params": variables["params"],
                  "batch_stats": new_vars["batch_stats"]},
                 jnp.asarray(x), jnp.asarray(mask), train=False)
    assert not np.allclose(np.asarray(y2)[:6], expect)
