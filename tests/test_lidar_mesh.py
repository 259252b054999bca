"""Multi-device coverage for the LiDAR (ObjDGCNN) track.

The reference trains ObjDGCNN under the same DDP launchers as TransCAR
(tools/dist_train.sh:7-9, tools/train.py:153-160 wrap either model in
MMDistributedDataParallel), so the sharded train/eval steps here must be
held to the same bar as the camera track: dp-on-mesh numerically matches
the single-device run (tests/test_train_step.py's camera analogs)."""
import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.core.config import get_preset
from transcar_tpu.models.detector import build_model
from transcar_tpu.parallel.mesh import make_mesh, shard_batch
from transcar_tpu.train.step import (init_state, make_eval_step,
                                     make_train_step)

# tiny pillar preset: same code path as the production config (preset →
# build_model → modality dispatch on "points"), CPU-mesh friendly shapes.
# fp32 compute: sharded-vs-unsharded programs are not bit-identical, and
# bf16 BEV noise is enough to flip the discrete Hungarian matching /
# decode top-k (measured: loss_bbox Δ 0.25% from one flipped pair) —
# fp32 keeps the comparison about SHARDING rules, not bf16 reproducibility
TINY = {
    "model.lidar_compute_dtype": "float32",
    "data.max_points": 600,
    "data.max_gt_boxes": 4,
    "model.max_voxels": 256,
    "model.bev_hw": [32, 32],
    "model.voxel_size": [3.2, 3.2, 8.0],
    "model.head.num_query": 16,
    "model.head.num_decoder_layers": 1,
}


def _pillar_cfg():
    return get_preset("objdgcnn_pillar", dict(TINY))


def _lidar_batch(rng, b, cfg):
    pc = cfg.model.head.pc_range
    n_max = cfg.data.max_points
    mg = cfg.data.max_gt_boxes
    pts = np.zeros((b, n_max, 5), np.float32)
    pts[:, :, 0] = rng.uniform(pc[0], pc[3], (b, n_max))
    pts[:, :, 1] = rng.uniform(pc[1], pc[4], (b, n_max))
    pts[:, :, 2] = rng.uniform(pc[2], pc[5], (b, n_max))
    pts[:, :, 3] = rng.uniform(0, 255, (b, n_max))
    pts[:, :, 4] = rng.uniform(0, 0.45, (b, n_max))
    gt = np.ones((b, mg, 9), np.float32)
    gt[:, :, :2] = rng.uniform(-20, 20, (b, mg, 2))
    gt[:, :, 3:6] = rng.uniform(0.5, 6, (b, mg, 3))
    return {
        "points": pts,
        "num_points": np.full((b,), int(n_max * 0.9), np.int32),
        "gt_boxes": gt,
        "gt_labels": rng.integers(0, 10, (b, mg)).astype(np.int32),
        "num_gt": np.full((b,), 3, np.int32),
    }


def test_lidar_train_step_on_mesh_matches_single_device():
    """One sharded ObjDGCNN(pillar) train step on a dp4 mesh returns the
    same losses, updated params AND updated BN running stats as the
    unsharded step on the same global batch — a broken sharding rule on
    the LiDAR batch layout (points/num_points have no camera axis)
    diverges loudly here."""
    cfg = _pillar_cfg()
    model = build_model(cfg, training=True)
    rng = np.random.default_rng(0)
    batch = _lidar_batch(rng, 4, cfg)

    state0, tx = init_state(cfg, model, batch, total_steps=10,
                            rng=jax.random.PRNGKey(0))
    assert state0.batch_stats, "pillar track must train its BN"

    # single device (the donated step consumes its state — init twice)
    step_ref = make_train_step(cfg, model, tx)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    s_ref, losses_ref = step_ref(state0, batch_j, jax.random.PRNGKey(1))

    mesh = make_mesh(shape=(4,), devices=jax.devices()[:4])
    state1, _ = init_state(cfg, model, batch, total_steps=10,
                           rng=jax.random.PRNGKey(0))
    step_dp = make_train_step(cfg, model, tx, mesh=mesh)
    sharded = shard_batch(batch, mesh)
    s_dp, losses_dp = step_dp(state1, sharded, jax.random.PRNGKey(1))

    for k in losses_ref:
        np.testing.assert_allclose(float(losses_dp[k]),
                                   float(losses_ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for name, tref, tdp in (("params", s_ref.params, s_dp.params),
                            ("batch_stats", s_ref.batch_stats,
                             s_dp.batch_stats)):
        flat_ref = jax.tree_util.tree_leaves_with_path(tref)
        flat_dp = jax.tree_util.tree_leaves(tdp)
        assert flat_ref and len(flat_ref) == len(flat_dp)
        # atol 1e-4: AdamW divides by sqrt(v)+eps, amplifying fp32
        # reduction-order noise on near-zero-grad entries (measured: 1
        # element in 65k at 4.9e-5 with everything else equal); a broken
        # sharding rule produces O(1) divergence on whole tensors
        for (path, a), b in zip(flat_ref, flat_dp):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
                err_msg=f"{name}{jax.tree_util.keystr(path)}")


def test_voxel_eval_step_on_mesh_matches_single_device():
    """Same bar for the VOXEL encoder variant (sparse 3D encoder +
    SECOND backbone — a different layout again: per-sample voxel tables
    and batch-stats-free sparse convs must shard cleanly)."""
    cfg = get_preset("objdgcnn_voxel", {
        **TINY,
        "model.sparse_shape": [11, 64, 64],
        "model.voxel_size": [1.6, 1.6, 0.8],
    })
    model = build_model(cfg)
    rng = np.random.default_rng(2)
    batch = _lidar_batch(rng, 4, cfg)
    state, _ = init_state(cfg, model, batch, total_steps=10,
                          rng=jax.random.PRNGKey(0))

    ref_step = make_eval_step(cfg, model)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    ref = ref_step(state.params, batch_j, state.batch_stats)

    mesh = make_mesh(shape=(4,), devices=jax.devices()[:4])
    eval_step = make_eval_step(cfg, model, mesh=mesh)
    out = eval_step(state.params, shard_batch(batch, mesh),
                    state.batch_stats)
    for k in ("boxes", "scores", "labels", "valid"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_lidar_eval_step_on_mesh_matches_single_device():
    """make_eval_step over a dp4 mesh with a points batch (+ running BN
    stats riding as the third argument) decodes identically to the
    unsharded path (multi_gpu_test analog, tools/test.py:218-223)."""
    cfg = _pillar_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    batch = _lidar_batch(rng, 4, cfg)
    state, _ = init_state(cfg, model, batch, total_steps=10,
                          rng=jax.random.PRNGKey(0))

    ref_step = make_eval_step(cfg, model)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    ref = ref_step(state.params, batch_j, state.batch_stats)

    mesh = make_mesh(shape=(4,), devices=jax.devices()[:4])
    eval_step = make_eval_step(cfg, model, mesh=mesh)
    out = eval_step(state.params, shard_batch(batch, mesh),
                    state.batch_stats)

    assert out["boxes"].shape[0] == 4
    for k in ("boxes", "scores", "labels", "valid"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
