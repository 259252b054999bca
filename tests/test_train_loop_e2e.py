"""End-to-end train() integration test on a synthetic on-disk dataset:
infos pkl + PNG images → loader → sharded train step → json log +
checkpoint; then evaluate() → nuScenes submission json."""
import json
import os
import pickle

import numpy as np
import pytest

from transcar_tpu.core.config import (BackboneConfig, DataConfig, HeadConfig,
                                      ModelConfig, OptimConfig, TrainConfig,
                                      TransCARConfig)

H, W = 64, 96


def _make_dataset(root, n_samples=4):
    from PIL import Image

    img_dir = os.path.join(root, "samples")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    infos = []
    for i in range(n_samples):
        cams = {}
        for ci, cam in enumerate(("CAM_FRONT", "CAM_FRONT_RIGHT",
                                  "CAM_FRONT_LEFT", "CAM_BACK",
                                  "CAM_BACK_LEFT", "CAM_BACK_RIGHT")):
            path = os.path.join(img_dir, f"s{i}_{cam}.png")
            Image.fromarray(
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8)).save(path)
            a = 2 * np.pi * ci / 6
            rot = np.array([[np.cos(a), -np.sin(a), 0],
                            [np.sin(a), np.cos(a), 0], [0, 0, 1]])
            cams[cam] = {
                "data_path": path,
                "sensor2lidar_rotation": rot,
                "sensor2lidar_translation": np.zeros(3),
                "cam_intrinsic": np.array(
                    [[W, 0, W / 2], [0, W, H / 2], [0, 0, 1.0]]),
            }
        g = 3
        boxes = np.zeros((g, 7))
        boxes[:, :2] = rng.uniform(-30, 30, (g, 2))
        boxes[:, 2] = rng.uniform(-1, 1, g)
        boxes[:, 3:6] = rng.uniform(1, 4, (g, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, g)
        infos.append({
            "token": f"tok{i}",
            "timestamp": 1000 + i,
            "lidar_path": "",
            "sweeps": [],
            "cams": cams,
            "lidar2ego_rotation": [1, 0, 0, 0],
            "lidar2ego_translation": [0, 0, 0],
            "ego2global_rotation": [1, 0, 0, 0],
            "ego2global_translation": [0, 0, 0],
            "gt_boxes": boxes,
            "gt_names": ["car", "bus", "pedestrian"],
            "gt_velocity": rng.uniform(-2, 2, (g, 2)),
            "num_lidar_pts": np.array([5, 5, 5]),
            "num_radar_pts": np.array([1, 1, 1]),
            "valid_flag": np.array([True, True, True]),
        })
    for name in ("nuscenes_infos_train.pkl", "nuscenes_infos_val.pkl"):
        with open(os.path.join(root, name), "wb") as f:
            pickle.dump({"infos": infos, "metadata": {"version": "test"}}, f)


def _cfg(root, work):
    return TransCARConfig(
        name="e2e_test",
        model=ModelConfig(
            backbone=BackboneConfig(
                kind="resnet50", compute_dtype=None,
                with_dcn=(False,) * 4),
            head=HeadConfig(num_query=16, num_decoder_layers=1,
                            with_radar_fusion=False),
            use_grid_mask=True),
        data=DataConfig(data_root=root, img_hw=(H, W), max_gt_boxes=8,
                        workers=2),
        train=TrainConfig(
            optim=OptimConfig(total_epochs=1, warmup_iters=2,
                              freeze_camera_branch=False),
            work_dir=work, mesh_shape=(2,)),
    )


def _make_lidar_dataset(root, n_samples=4, n_pts=400):
    """Synthetic infos pkl + raw .bin point files + 2-sweep chains
    (nuscenes_converter schema: lidar_path, sweeps with sensor2lidar R/T +
    timestamp)."""
    os.makedirs(os.path.join(root, "samples"), exist_ok=True)
    rng = np.random.default_rng(0)
    infos = []
    for i in range(n_samples):
        key = rng.uniform(-45, 45, (n_pts, 5)).astype(np.float32)
        key[:, 2] = rng.uniform(-4, 2, n_pts)
        kp = os.path.join(root, "samples", f"lidar{i}.bin")
        key.tofile(kp)
        sweeps = []
        for s in range(2):
            sw = rng.uniform(-45, 45, (n_pts // 2, 5)).astype(np.float32)
            sw[:, 2] = rng.uniform(-4, 2, n_pts // 2)
            sp = os.path.join(root, "samples", f"lidar{i}_sw{s}.bin")
            sw.tofile(sp)
            a = 0.02 * (s + 1)
            sweeps.append({
                "data_path": sp,
                "sensor2lidar_rotation": np.array(
                    [[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0], [0, 0, 1]]),
                "sensor2lidar_translation": rng.uniform(-1, 1, 3),
                "timestamp": (1000 + i) * 1e6 - (s + 1) * 5e4,
            })
        g = 3
        boxes = np.zeros((g, 7))
        boxes[:, :2] = rng.uniform(-30, 30, (g, 2))
        boxes[:, 2] = rng.uniform(-1, 1, g)
        boxes[:, 3:6] = rng.uniform(1, 4, (g, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, g)
        infos.append({
            "token": f"tok{i}",
            "timestamp": (1000 + i) * 1e6,
            "lidar_path": kp,
            "sweeps": sweeps,
            "cams": {},
            "lidar2ego_rotation": [1, 0, 0, 0],
            "lidar2ego_translation": [0, 0, 0],
            "ego2global_rotation": [1, 0, 0, 0],
            "ego2global_translation": [0, 0, 0],
            "gt_boxes": boxes,
            "gt_names": ["car", "bus", "pedestrian"],
            "gt_velocity": rng.uniform(-2, 2, (g, 2)),
            "num_lidar_pts": np.array([5, 5, 5]),
            "num_radar_pts": np.array([1, 1, 1]),
            "valid_flag": np.array([True, True, True]),
        })
    for name in ("nuscenes_infos_train.pkl", "nuscenes_infos_val.pkl"):
        with open(os.path.join(root, name), "wb") as f:
            pickle.dump({"infos": infos, "metadata": {"version": "test"}}, f)


@pytest.mark.slow
def test_objdgcnn_pillar_train_e2e(tmp_path):
    """ObjDGCNN pillar track: synthetic infos pkl → real point pipeline
    (multisweep load, GlobalRotScaleTrans, RandomFlip3D, range filter,
    shuffle, static padding) → voxelize → sharded train step (VERDICT
    round-2 item 4; pillar.py:174-216)."""
    root = str(tmp_path / "data")
    work = str(tmp_path / "work")
    os.makedirs(root)
    _make_lidar_dataset(root)

    from transcar_tpu.core.config import get_preset
    from transcar_tpu.train.loop import train

    cfg = get_preset("objdgcnn_pillar", {
        "data.data_root": root,
        "data.max_points": "2048",
        "data.max_gt_boxes": "8",
        "data.workers": "2",
        "data.use_cbgs": "false",
        "data.samples_per_device": "1",
        "model.head.num_query": "16",
        "model.head.num_decoder_layers": "1",
        "model.voxel_size": "[6.4,6.4,8.0]",
        "model.max_voxels": "256",
        "model.bev_hw": "[16,16]",
        "train.work_dir": work,
        "train.mesh_shape": "[2]",
        "train.optim.total_epochs": "1",
        "train.optim.warmup_iters": "2",
    })
    state = train(cfg, max_steps=2, log_interval=1)
    assert int(state.step) == 2
    logs = [f for f in os.listdir(work) if f.endswith(".log.json")]
    with open(os.path.join(work, logs[0])) as f:
        recs = [json.loads(l) for l in f]
    train_recs = [r for r in recs if r.get("mode") == "train"]
    assert train_recs and all(np.isfinite(r["loss_cls"])
                              for r in train_recs)


@pytest.mark.slow
def test_train_and_evaluate_end_to_end(tmp_path):
    root = str(tmp_path / "data")
    work = str(tmp_path / "work")
    os.makedirs(root)
    _make_dataset(root)
    cfg = _cfg(root, work)

    from transcar_tpu.train.loop import evaluate, train

    trace_dir = os.path.join(work, "trace")
    state = train(cfg, max_steps=2, log_interval=1, eval_samples=2,
                  trace_dir=trace_dir, trace_start=0, trace_steps=1)
    assert int(state.step) == 2
    # --trace-dir analog captured a steady-state step (SURVEY §5 tracing)
    assert os.path.isdir(trace_dir) and os.listdir(trace_dir)
    logs = [f for f in os.listdir(work) if f.endswith(".log.json")]
    assert logs
    with open(os.path.join(work, logs[0])) as f:
        recs = [json.loads(l) for l in f]
    assert any(r.get("mode") == "train" and "loss_cls" in r for r in recs)
    # EvalHook analog: a val record + val submission written mid-training
    # (detr3d_res101_gridmask.py:223, tools/train.py:253-260)
    val_recs = [r for r in recs if r.get("mode") == "val"]
    assert val_recs and val_recs[0]["epoch"] == 1
    # devkit absent in CI → the native evaluator (eval/metrics.py) must
    # have produced real mAP/NDS numbers from the infos-pkl GT
    assert val_recs[0].get("metrics_source") == "native"
    assert 0.0 <= val_recs[0]["mAP"] <= 1.0
    assert 0.0 <= val_recs[0]["NDS"] <= 1.0
    assert any(f.startswith("val_epoch") for f in os.listdir(work))
    # checkpoint-on-done + config manifest (runner/ckpt-hook analogs)
    assert os.path.isdir(os.path.join(work, "checkpoints"))
    assert os.path.exists(os.path.join(work, "config.json"))

    out_path = evaluate(cfg, state.params, max_samples=2,
                        out_path=os.path.join(work, "results.json"))
    with open(out_path) as f:
        sub = json.load(f)
    assert "results" in sub and len(sub["results"]) == 2
    for annos in sub["results"].values():
        for a in annos:
            assert set(a) >= {"sample_token", "translation", "size",
                              "rotation", "velocity", "detection_name",
                              "detection_score", "attribute_name"}

    # batched eval path: bs=2 over 3 samples (padded tail) must reproduce
    # the bs=1 submission exactly (tools/test.py:183-189 samples_per_gpu)
    bs1 = evaluate(cfg, state.params, max_samples=3,
                   out_path=os.path.join(work, "results_bs1.json"))
    bs2 = evaluate(cfg, state.params, max_samples=3, batch_size=2,
                   out_path=os.path.join(work, "results_bs2.json"))
    with open(bs1) as f:
        sub1 = json.load(f)["results"]
    with open(bs2) as f:
        sub2 = json.load(f)["results"]
    assert set(sub1) == set(sub2) and len(sub1) == 3
    for tok in sub1:
        for a, b in zip(sub1[tok], sub2[tok]):
            assert a["detection_name"] == b["detection_name"]
            np.testing.assert_allclose(a["translation"], b["translation"],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(a["detection_score"],
                                       b["detection_score"],
                                       rtol=1e-5, atol=1e-6)
