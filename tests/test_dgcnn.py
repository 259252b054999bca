"""ObjDGCNN track tests: voxelizer vs a numpy oracle, pillar scatter,
MSDeformAttn core vs a torch grid_sample restatement, sine positional
encoding, and a full tiny-shape forward."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from transcar_tpu.core.config import HeadConfig
from transcar_tpu.models.dgcnn import ObjDGCNN, sine_positional_encoding
from transcar_tpu.ops.msdeform import ms_deform_attn_core
from transcar_tpu.ops.voxelize import hard_voxelize, pillar_scatter

PC = (-8.0, -8.0, -3.0, 8.0, 8.0, 3.0)
VS = (0.5, 0.5, 6.0)


def test_hard_voxelize_matches_numpy_grouping():
    rng = np.random.default_rng(0)
    n = 300
    pts = np.zeros((n, 5), np.float32)
    pts[:, :3] = rng.uniform(-9, 9, (n, 3))
    pts[:, 2] = rng.uniform(-2.5, 2.5, n)
    pts[:, 3:] = rng.normal(size=(n, 2))
    n_real = 250

    voxels, coords, counts, nv = hard_voxelize(
        jnp.asarray(pts), jnp.int32(n_real), VS, PC,
        max_points=8, max_voxels=128)
    voxels, coords, counts = map(np.asarray, (voxels, coords, counts))
    nv = int(nv)

    # numpy oracle: group in-range points by voxel id
    groups = {}
    for i in range(n_real):
        idx = np.floor((pts[i, :3] - np.asarray(PC[:3])) /
                       np.asarray(VS)).astype(int)
        grid = ((np.asarray(PC[3:]) - np.asarray(PC[:3])) /
                np.asarray(VS)).round().astype(int)
        if (idx < 0).any() or (idx >= grid).any():
            continue
        groups.setdefault(tuple(idx[::-1]), []).append(i)

    assert nv == min(len(groups), 128)
    seen = {tuple(coords[v]): counts[v] for v in range(nv)}
    for key, members in groups.items():
        if key in seen:
            assert seen[key] == min(len(members), 8)
    # every voxel's points actually fall inside the voxel
    for v in range(nv):
        z, y, x = coords[v]
        for p in range(counts[v]):
            q = voxels[v, p, :3]
            ix = np.floor((q - np.asarray(PC[:3])) / np.asarray(VS))
            assert (ix == [x, y, z]).all()


def test_pillar_scatter_places_features():
    feats = jnp.asarray(np.eye(4, dtype=np.float32))
    coords = jnp.asarray([[0, 1, 2], [0, 3, 0], [0, 0, 0], [0, 2, 3]],
                         dtype=jnp.int32)
    canvas = pillar_scatter(feats, coords, jnp.int32(3), (4, 4))
    out = np.asarray(canvas)
    assert out[1, 2, 0] == 1.0 and out[3, 0, 1] == 1.0 and out[0, 0, 2] == 1.0
    assert out[2, 3].sum() == 0.0   # voxel 3 beyond num_voxels


def test_msdeform_core_matches_torch():
    rng = np.random.default_rng(1)
    b, h, d, q, p = 1, 2, 8, 5, 3
    shapes = [(6, 9), (3, 4)]
    s = sum(hl * wl for hl, wl in shapes)
    value = rng.normal(size=(b, s, h, d)).astype(np.float32)
    loc = rng.uniform(0.1, 0.9, (b, q, h, len(shapes), p, 2)).astype(
        np.float32)
    w = rng.uniform(size=(b, q, h, len(shapes), p)).astype(np.float32)

    ours = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))

    # torch restatement (multi_scale_deformable_attn_pytorch)
    tv = torch.from_numpy(value)
    tl = torch.from_numpy(loc)
    tw = torch.from_numpy(w)
    start = 0
    out_t = torch.zeros(b, q, h, d)
    for li, (hl, wl) in enumerate(shapes):
        v = tv[:, start:start + hl * wl].permute(0, 2, 3, 1).reshape(
            b * h, d, hl, wl)
        start += hl * wl
        grid = 2 * tl[:, :, :, li] - 1
        grid = grid.permute(0, 2, 1, 3, 4).reshape(b * h, q, p, 2)
        samp = F.grid_sample(v, grid, mode="bilinear",
                             padding_mode="zeros", align_corners=False)
        samp = samp.reshape(b, h, d, q, p)
        out_t += torch.einsum("bhdqp,bqhp->bqhd", samp,
                              tw[:, :, :, li])
    np.testing.assert_allclose(ours, out_t.reshape(b, q, h * d).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_sine_positional_encoding_properties():
    pe = np.asarray(sine_positional_encoding(8, 12, 128))
    assert pe.shape == (8, 12, 256)
    assert np.isfinite(pe).all()
    # y-features vary down columns, x-features across rows
    assert np.abs(np.diff(pe[:, 0, 0])).sum() > 0
    assert np.abs(np.diff(pe[0, :, 128])).sum() > 0


def test_objdgcnn_forward_tiny():
    rng = np.random.default_rng(2)
    cfg = HeadConfig(num_query=16, num_decoder_layers=2,
                     with_radar_fusion=False, num_levels=4,
                     pc_range=PC)
    model = ObjDGCNN(cfg, voxel_size=VS, max_points=8, max_voxels=256,
                     bev_hw=(32, 32))
    pts = rng.uniform(-7, 7, (1, 400, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 2, (1, 400))
    n = jnp.asarray([350], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pts), n)
    out = model.apply(params, jnp.asarray(pts), n)
    assert out["all_cls_scores"].shape == (2, 1, 16, 10)
    assert out["all_bbox_preds"].shape == (2, 1, 16, 10)
    assert np.isfinite(np.asarray(out["all_bbox_preds"])).all()


def test_objdgcnn_voxel_forward_tiny():
    rng = np.random.default_rng(3)
    cfg = HeadConfig(num_query=8, num_decoder_layers=1,
                     with_radar_fusion=False, num_levels=4, pc_range=PC)
    model = ObjDGCNN(cfg, encoder="voxel", voxel_size=(0.5, 0.5, 0.75),
                     max_points=5, max_voxels=256, bev_hw=(32, 32),
                     sparse_shape=(8, 32, 32))
    pts = rng.uniform(-7, 7, (1, 300, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2.5, 2.5, (1, 300))
    n = jnp.asarray([250], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pts), n)
    out = model.apply(params, jnp.asarray(pts), n)
    assert out["all_cls_scores"].shape == (1, 1, 8, 10)
    assert np.isfinite(np.asarray(out["all_bbox_preds"])).all()


@pytest.mark.slow
def test_objdgcnn_voxel_train_step_updates_sparse_encoder():
    """Voxel track is trainable end-to-end: one train step through the
    sparse 3D encoder produces finite loss and moves encoder params (the
    pillar track has a full e2e test; this covers the spconv-analog
    path, configs/obj_dgcnn/voxel.py)."""
    import optax

    from transcar_tpu.train.loss import detr3d_loss

    rng = np.random.default_rng(7)
    cfg = HeadConfig(num_query=8, num_decoder_layers=1,
                     with_radar_fusion=False, num_levels=4, pc_range=PC)
    model = ObjDGCNN(cfg, encoder="voxel", voxel_size=(1.0, 1.0, 1.5),
                     max_points=4, max_voxels=128, bev_hw=(16, 16),
                     sparse_shape=(4, 16, 16))
    pts = rng.uniform(-7, 7, (1, 200, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2.5, 2.5, (1, 200))
    n = jnp.asarray([160], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts), n)
    params, stats = variables["params"], variables.get("batch_stats", {})

    gt = np.ones((1, 4, 9), np.float32)
    gt[:, :, :2] = rng.uniform(-6, 6, (1, 4, 2))
    gt_labels = rng.integers(0, 10, (1, 4)).astype(np.int32)
    num_gt = np.asarray([3], np.int32)

    def loss_fn(p):
        var = {"params": p}
        mutable = []
        if stats:
            var["batch_stats"] = stats
            mutable = ["batch_stats"]
        out = model.apply(var, jnp.asarray(pts), n, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          mutable=mutable)
        preds = out[0] if mutable else out
        losses = detr3d_loss(preds, jnp.asarray(gt), jnp.asarray(gt_labels),
                             jnp.asarray(num_gt), cfg)
        return losses["total"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    enc_grads = jax.tree_util.tree_leaves(grads["middle_encoder"])
    assert enc_grads and any(
        float(jnp.abs(g).max()) > 0 for g in enc_grads), \
        "no gradient reached the sparse 3D encoder"
    tx = optax.adamw(1e-3)
    upd, _ = tx.update(grads, tx.init(params), params)
    p2 = optax.apply_updates(params, upd)
    before = jax.tree_util.tree_leaves(params["middle_encoder"])[0]
    after = jax.tree_util.tree_leaves(p2["middle_encoder"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_msdeform_query_chunking_is_exact():
    """query_chunk (the encoder's HBM-OOM guard, ops/msdeform.py) is an
    exact reformulation: chunked == unchunked, including a non-dividing
    chunk size (zero-padded tail)."""
    from transcar_tpu.ops.msdeform import ms_deform_attn_core

    rng = np.random.default_rng(3)
    shapes = [(8, 12), (4, 6)]
    s = sum(h * w for h, w in shapes)
    b, h, d, l, p, q = 2, 4, 8, len(shapes), 3, 50
    value = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.1, 1.1,
                                  (b, q, h, l, p, 2)).astype(np.float32))
    wgt = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(b, q, h, l, p)).astype(np.float32))
        .reshape(b, q, h, l * p), axis=-1).reshape(b, q, h, l, p)

    ref = ms_deform_attn_core(value, shapes, loc, wgt)
    for chunk in (16, 50, 7):    # dividing, exact, and padded-tail cases
        out = ms_deform_attn_core(value, shapes, loc, wgt,
                                  query_chunk=chunk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6, err_msg=str(chunk))
    # chunk >= q is a no-op path
    out = ms_deform_attn_core(value, shapes, loc, wgt, query_chunk=64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_lidar_bf16_backbone_close_to_fp32():
    """lidar_compute_dtype="bfloat16" (SECOND+FPN convs in bf16, BN
    stats fp32 — the camera track's compute policy) stays within bf16
    rounding of the fp32 path and returns fp32 head outputs."""
    from transcar_tpu.core.config import HeadConfig

    rng = np.random.default_rng(11)
    cfg = HeadConfig(num_query=8, num_decoder_layers=1,
                     with_radar_fusion=False, num_levels=4, pc_range=PC)
    pts = rng.uniform(-7, 7, (1, 300, 5)).astype(np.float32)
    n = jnp.asarray([250], jnp.int32)
    outs = {}
    for dt in (None, "bfloat16"):
        model = ObjDGCNN(cfg, voxel_size=(1.0, 1.0, 8.0), max_points=8,
                         max_voxels=256, bev_hw=(16, 16), compute_dtype=dt)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts), n)
        outs[dt] = model.apply(variables, jnp.asarray(pts), n)
    for k in ("all_cls_scores", "all_bbox_preds"):
        a = np.asarray(outs[None][k])
        b = np.asarray(outs["bfloat16"][k])
        assert b.dtype == np.float32
        scale = np.abs(a).max()
        assert np.max(np.abs(a - b)) < 0.03 * (1 + scale), k
    assert not np.array_equal(np.asarray(outs[None]["all_cls_scores"]),
                              np.asarray(outs["bfloat16"]["all_cls_scores"]))


def test_lidar_encoder_band_agrees_between_train_and_eval(monkeypatch):
    """The banded encoder kernel's vertical band must key on the CONFIG,
    never on build_model(training=...): every ObjDGCNN preset trains the
    encoder (no freeze list), so an eval forward at a narrower band would
    silently zero taps that trained offsets legitimately reach — the same
    invariant resolve_dcn_band enforces for the camera DCN band."""
    from transcar_tpu.core.config import get_preset
    from transcar_tpu.models import detector as det

    # simulate the TPU resolution (CPU meshes resolve to the exact XLA
    # gather, where the band is unused)
    monkeypatch.setattr(det.jax, "default_backend", lambda: "tpu")
    cfg = get_preset("objdgcnn_pillar")
    m_train = det.build_model(cfg, training=True)
    m_eval = det.build_model(cfg, training=False)
    assert m_train.encoder_msdeform_impl == "pallas"
    assert m_train.encoder_band == m_eval.encoder_band
    # the override knob plumbs through unchanged
    cfg2 = get_preset("objdgcnn_pillar",
                      {"model.encoder_band_rows": 32})
    assert det.build_model(cfg2, training=False).encoder_band == 32
