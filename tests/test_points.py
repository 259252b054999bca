"""LiDAR point pipeline tests (pillar.py:175-206 semantics; the mmdet3d
ops themselves live in the upstream submodule which is an empty pointer in
the reference checkout, so these are restatement oracles of the documented
0.17 behaviors — loading/sweep-transform math is additionally checked
against direct matrix algebra)."""
import os
import pickle

import numpy as np
import pytest

from transcar_tpu.core.config import DataConfig
from transcar_tpu.data import points as P

PC_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def _write_bin(path, pts):
    np.asarray(pts, np.float32).tofile(path)


def _key_and_sweep(tmp_path, n_key=50, n_sweep=30, seed=0):
    rng = np.random.default_rng(seed)
    key = rng.uniform(-40, 40, (n_key, 5)).astype(np.float32)
    key[:, 2] = rng.uniform(-3, 1, n_key)
    key[:, 4] = rng.uniform(0, 31, n_key)          # ring index channel
    sweep = rng.uniform(-40, 40, (n_sweep, 5)).astype(np.float32)
    sweep[:, 2] = rng.uniform(-3, 1, n_sweep)
    _write_bin(tmp_path / "key.bin", key)
    _write_bin(tmp_path / "sweep.bin", sweep)
    return key, sweep


def test_multisweep_transform_and_time_channel(tmp_path):
    key, sweep = _key_and_sweep(tmp_path)
    a = 0.3
    rot = np.array([[np.cos(a), -np.sin(a), 0],
                    [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    tr = np.array([1.0, -2.0, 0.5])
    ts_key = 10_000_000.0                           # µs
    sweeps = [{"data_path": str(tmp_path / "sweep.bin"),
               "sensor2lidar_rotation": rot,
               "sensor2lidar_translation": tr,
               "timestamp": ts_key - 450_000.0}]
    out = P.load_points_multisweep(
        str(tmp_path / "key.bin"), sweeps, ts_key, nsweeps=9,
        remove_close_radius=0.0)
    nk = len(key)
    # key frame first, time channel zeroed
    np.testing.assert_allclose(out[:nk, :3], key[:, :3])
    assert np.all(out[:nk, 4] == 0.0)
    # sweep: xyz @ R.T + t, col 4 = (key − sweep) timestamp seconds
    np.testing.assert_allclose(out[nk:, :3], sweep[:, :3] @ rot.T + tr,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[nk:, 4], 0.45, rtol=1e-6)


def test_multisweep_remove_close_spares_key_frame(tmp_path):
    key = np.zeros((4, 5), np.float32)              # all at ego center
    sweep = np.zeros((6, 5), np.float32)
    sweep[:3, 0] = 20.0                             # 3 far, 3 close
    _write_bin(tmp_path / "key.bin", key)
    _write_bin(tmp_path / "sweep.bin", sweep)
    sweeps = [{"data_path": str(tmp_path / "sweep.bin"),
               "sensor2lidar_rotation": np.eye(3),
               "sensor2lidar_translation": np.zeros(3),
               "timestamp": 0.0}]
    out = P.load_points_multisweep(str(tmp_path / "key.bin"), sweeps, 0.0,
                                   nsweeps=9, remove_close_radius=1.0)
    # 4 key points kept (reference skips _remove_close on the key frame),
    # 3 of 6 sweep points dropped
    assert len(out) == 4 + 3


def test_multisweep_pad_empty_repeats_filtered_key(tmp_path):
    key = np.zeros((5, 5), np.float32)
    key[:2, 0] = 30.0                               # 2 far, 3 close
    _write_bin(tmp_path / "key.bin", key)
    out = P.load_points_multisweep(str(tmp_path / "key.bin"), [], 0.0,
                                   nsweeps=3, pad_empty_sweeps=True,
                                   remove_close_radius=1.0)
    assert len(out) == 5 + 3 * 2


def test_rot_scale_trans_boxes_follow_points():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-10, 10, (100, 5)).astype(np.float32)
    boxes = np.zeros((2, 9), np.float32)
    boxes[:, :3] = pts[:2, :3]                      # centers ride on points
    boxes[:, 3:6] = 2.0
    boxes[:, 6] = (0.5, -1.0)
    boxes[:, 7:9] = ((3.0, 0.0), (0.0, -2.0))
    g = np.random.default_rng(7)
    p2, b2 = P.global_rot_scale_trans(pts, boxes, g,
                                      rot_range=(0.2, 0.2),
                                      scale_range=(1.1, 1.1),
                                      trans_std=(0.0, 0.0, 0.0))
    # centers transformed exactly like the coinciding points
    np.testing.assert_allclose(b2[:, :3], p2[:2, :3], rtol=1e-5, atol=1e-5)
    # yaw += angle; dims × scale; velocity rotated+scaled, norm × 1.1
    np.testing.assert_allclose(b2[:, 6], boxes[:, 6] + 0.2, rtol=1e-5)
    np.testing.assert_allclose(b2[:, 3:6], 2.2, rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(b2[:, 7:9], axis=1),
                               1.1 * np.linalg.norm(boxes[:, 7:9], axis=1),
                               rtol=1e-5)


def test_flip_conventions():
    pts = np.array([[1.0, 2.0, 0.5, 0.1, 0.0]], np.float32)
    boxes = np.array([[1.0, 2.0, 0.0, 2.0, 4.0, 1.5, 0.3, 1.0, 2.0]],
                     np.float32)

    class _R:                                       # force h-flip only
        def random(self):
            self.n = getattr(self, "n", 0) + 1
            return 0.0 if self.n == 1 else 1.0

    p2, b2 = P.random_flip_3d(pts, boxes, _R(), 0.5, 0.5)
    np.testing.assert_allclose(p2[0, 1], -2.0)
    # mmdet3d 0.17 LiDARInstance3DBoxes.flip('horizontal'):
    # y → −y, vy → −vy, yaw → π − yaw
    np.testing.assert_allclose(b2[0, [1, 8]], [-2.0, -2.0])
    np.testing.assert_allclose(b2[0, 6], np.pi - 0.3, rtol=1e-6)
    np.testing.assert_allclose(b2[0, 7], 1.0)       # vx untouched

    class _R2:                                      # force v-flip only
        def random(self):
            self.n = getattr(self, "n", 0) + 1
            return 1.0 if self.n == 1 else 0.0

    p3, b3 = P.random_flip_3d(pts, boxes, _R2(), 0.5, 0.5)
    np.testing.assert_allclose(p3[0, 0], -1.0)
    np.testing.assert_allclose(b3[0, [0, 7]], [-1.0, -1.0])
    np.testing.assert_allclose(b3[0, 6], -0.3, rtol=1e-6)


def test_range_filter_and_pad():
    pts = np.array([[0, 0, 0, 0, 0],
                    [60, 0, 0, 0, 0],        # x out
                    [0, 0, 2.9, 0, 0],
                    [0, 0, 3.1, 0, 0]],      # z out
                   np.float32)
    kept = P.points_range_filter(pts, PC_RANGE)
    assert len(kept) == 2
    buf, n = P.pad_points(kept, 5)
    assert buf.shape == (5, 5) and n == 2 and np.all(buf[2:] == 0)
    buf2, n2 = P.pad_points(np.ones((9, 5), np.float32), 5)
    assert n2 == 5 and buf2.shape == (5, 5)


def test_prepare_lidar_sample_static_shapes(tmp_path):
    key, _ = _key_and_sweep(tmp_path)
    info = {"lidar_path": str(tmp_path / "key.bin"), "sweeps": [],
            "timestamp": 0.0}
    cfg = DataConfig(max_points=128, max_gt_boxes=4)
    gt = np.zeros((2, 9), np.float32)
    gt[:, 3:6] = 2.0
    out = P.prepare_lidar_sample(info, cfg, training=True,
                                 rng=np.random.default_rng(0),
                                 pc_range=PC_RANGE, gt_boxes=gt,
                                 gt_labels=np.zeros((2,), np.int32))
    assert out["points"].shape == (128, 5)
    assert out["gt_boxes"].shape == (4, 9)
    assert 0 < int(out["num_points"]) <= 128
    assert int(out["num_gt"]) == 2
