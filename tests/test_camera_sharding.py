"""Camera-axis model parallelism for serving (parallel/mesh.py
camera_mesh / shard_batch_cameras): the 6 camera streams are independent
through backbone+FPN (detector.py [B,N,...] → [B·N,...] reshape, same as
the reference's Detr3D, detr3d.py:39-66), so sharding the camera dim
across chips cuts batch-1 latency — something data parallelism cannot
do.  These tests pin (a) mesh-size selection, (b) output identity of the
sharded eval step vs single-device, (c) the full evaluate() path with
``shard_cameras=True`` producing the identical submission json."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from transcar_tpu.models.detector import build_model
from transcar_tpu.parallel.mesh import camera_mesh, shard_batch_cameras
from transcar_tpu.train.step import init_state, make_eval_step


def test_camera_mesh_picks_largest_divisor():
    devs = jax.devices()
    assert len(devs) >= 8, "virtual CPU mesh missing"
    assert camera_mesh(6, devs).devices.size == 6
    assert camera_mesh(6, devs[:4]).devices.size == 3
    assert camera_mesh(6, devs[:2]).devices.size == 2
    assert camera_mesh(6, devs[:1]).devices.size == 1
    assert camera_mesh(5, devs).devices.size == 5


def test_camera_sharded_eval_step_matches_single_device():
    """Committed camera shardings through the PLAIN jitted eval step:
    jit partitions the backbone per-camera and the decode matches the
    unsharded path.

    fp32 backbone compute: the partitioned program matches exactly.  A
    bf16 backbone differs by rounding noise (per-device conv batch is 1
    instead of 6, so XLA tiles — and rounds — the bf16 contractions
    differently), the same class of difference as changing the batch
    size; decode's score sort then reorders near-ties, so bf16 output
    comparison needs set-matching, not positional identity."""
    import dataclasses

    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=24, radar_tokens=32)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, backbone=dataclasses.replace(
                cfg.model.backbone, compute_dtype=None)))
    model = build_model(cfg)
    rng = np.random.default_rng(3)
    batch = ge._fake_batch(rng, 1, 6, 64, 96, 32, max_gt=4)
    state, _ = init_state(cfg, model, batch, total_steps=10,
                          rng=jax.random.PRNGKey(0))

    eval_step = make_eval_step(cfg, model)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    ref = eval_step(state.params, batch_j)

    mesh = camera_mesh(cfg.model.head.num_cams)
    assert mesh.devices.size == 6
    from transcar_tpu.parallel.mesh import replicated
    params = jax.device_put(state.params, replicated(mesh))
    sharded = shard_batch_cameras(batch, mesh)
    assert sharded["images"].sharding.spec == (None, "cam")
    out = eval_step(params, sharded)

    for k in ("boxes", "scores", "labels", "valid"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-5, atol=2e-5)


def test_evaluate_shard_cameras_submission_identical(tmp_path):
    """Full evaluate() with shard_cameras=True on the synthetic on-disk
    dataset: submission json identical to the single-device run
    (--shard-cameras CLI semantics)."""
    from tests.test_train_loop_e2e import _cfg, _make_dataset
    from transcar_tpu.train.loop import evaluate

    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    _make_dataset(root, n_samples=2)
    cfg = _cfg(root, str(tmp_path / "work"))
    model = build_model(cfg)
    b = ge._fake_batch(np.random.default_rng(0), 1, 6, 64, 96, 32, max_gt=8)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(b["images"]),
        jnp.asarray(b["lidar2img"]))["params"]

    p_ref = evaluate(cfg, params, out_path=str(tmp_path / "ref.json"))
    p_cam = evaluate(cfg, params, out_path=str(tmp_path / "cam.json"),
                     shard_cameras=True)
    ref = json.load(open(p_ref))
    cam = json.load(open(p_cam))
    assert ref["results"].keys() == cam["results"].keys()
    for tok in ref["results"]:
        a, b_ = ref["results"][tok], cam["results"][tok]
        assert len(a) == len(b_)
        for da, db in zip(a, b_):
            np.testing.assert_allclose(da["translation"],
                                       db["translation"], rtol=2e-4,
                                       atol=2e-4)
            np.testing.assert_allclose(da["detection_score"],
                                       db["detection_score"], rtol=2e-4,
                                       atol=2e-4)
            assert da["detection_name"] == db["detection_name"]
