"""Parity-harness self-test: capture → compare round trip on a synthetic
on-disk dataset (VERDICT r2 next-round #6 — the harness must stand ready
for the moment real checkpoints/data exist, so it validates against its
own capture format here)."""
import os

import numpy as np
import pytest

from tests.test_train_loop_e2e import _cfg, _make_dataset


@pytest.mark.slow
def test_capture_compare_round_trip(tmp_path):
    import jax

    from transcar_tpu.cli.parity_check import (capture_outputs,
                                               compare_outputs)
    from transcar_tpu.models.detector import build_model

    import dataclasses

    root = str(tmp_path / "data")
    os.makedirs(root)
    _make_dataset(root, n_samples=3)
    cfg = _cfg(root, str(tmp_path / "work"))
    # random-init params decode boxes at the pc-range corners (sigmoid
    # saturation) which the default post_center_range filters to ZERO
    # detections — which made the whole comparison vacuous.  Widen the
    # range so the capture carries real rows and the check discriminates.
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, head=dataclasses.replace(
                cfg.model.head,
                post_center_range=(-1e4,) * 3 + (1e4,) * 3)))

    model = build_model(cfg)
    h, w = cfg.data.img_hw
    images = np.zeros((1, cfg.model.head.num_cams, h, w, 3), np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32),
                  (1, cfg.model.head.num_cams, 1, 1))
    params = model.init(jax.random.PRNGKey(0), images, l2i, None)["params"]

    npz = str(tmp_path / "captured.npz")
    capture_outputs(cfg, params, npz, max_samples=3)
    data = np.load(npz)
    assert set(data.files) >= {"tokens", "boxes", "scores", "labels",
                               "num_dets"}
    k = min(cfg.model.head.max_detections,
            cfg.model.head.num_query * cfg.model.head.num_classes)
    assert data["boxes"].shape == (3, k, 9)

    # the capture must carry real detections — a zero-row capture would
    # make every comparison below vacuous
    assert int(data["num_dets"].sum()) > 0

    # same params → parity passes
    report = compare_outputs(cfg, params, npz, box_tol=1e-4,
                             score_tol=1e-5)
    assert report["passed"], report
    assert report["n_samples"] == 3
    assert report["compared_rows"] > 0

    # perturbed params → parity fails (the harness actually discriminates)
    import jax.numpy as jnp
    bad = jax.tree_util.tree_map(lambda a: a + 0.05 * jnp.ones_like(a),
                                 params)
    report_bad = compare_outputs(cfg, bad, npz, box_tol=1e-4,
                                 score_tol=1e-5)
    assert not report_bad["passed"]


def test_parity_check_rejects_token_mismatch(tmp_path):
    """A captured token absent from the val infos must be a loud error,
    not a silent skip (split mismatches are the classic parity footgun)."""
    from transcar_tpu.cli.parity_check import compare_outputs

    root = str(tmp_path / "data")
    os.makedirs(root)
    _make_dataset(root, n_samples=2)
    cfg = _cfg(root, str(tmp_path / "work"))

    npz = str(tmp_path / "bogus.npz")
    np.savez(npz, tokens=np.asarray(["not_a_token"]),
             boxes=np.zeros((1, 300, 9), np.float32),
             scores=np.zeros((1, 300), np.float32),
             labels=np.zeros((1, 300), np.int32),
             num_dets=np.asarray([0], np.int32))
    with pytest.raises(ValueError, match="not in"):
        compare_outputs(cfg, None, npz)
