"""Camera test-time augmentation (make_aug_eval_step / --aug-test):
the reference's ``aug_test`` feature-averaging TTA (detr3d.py:195-219),
wired end-to-end (VERDICT r3 item 5).
"""
import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import __graft_entry__ as ge
from transcar_tpu.models.detector import build_model
from transcar_tpu.train.step import (init_state, make_aug_eval_step,
                                     make_eval_step)


def _fp32_cfg():
    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=24, radar_tokens=32)
    return dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, backbone=dataclasses.replace(
                cfg.model.backbone, compute_dtype=None)))


def test_identity_aug_equals_simple_forward():
    """A=1 identity TTA must reproduce the plain eval step (the mean
    over one view is that view); two identity copies likewise (mean of
    two bitwise-identical feature sets)."""
    cfg = _fp32_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, 1, 6, 64, 96, 32, max_gt=4)
    state, _ = init_state(cfg, model, batch, total_steps=10,
                          rng=jax.random.PRNGKey(0))
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)

    ref = make_eval_step(cfg, model)(state.params, batch_j)
    for augs in (("identity",), ("identity", "identity")):
        out = make_aug_eval_step(cfg, model, augs)(state.params, batch_j)
        for k in ("boxes", "scores", "labels", "valid"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]),
                rtol=2e-5, atol=2e-5, err_msg=f"{augs}/{k}")


def test_flip_aug_changes_predictions():
    """identity+flip must actually merge a second view: decoded boxes
    differ from the simple forward (non-vacuous wiring) and stay finite."""
    cfg = _fp32_cfg()
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    batch = ge._fake_batch(rng, 1, 6, 64, 96, 32, max_gt=4)
    state, _ = init_state(cfg, model, batch, total_steps=10,
                          rng=jax.random.PRNGKey(0))
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)

    ref = make_eval_step(cfg, model)(state.params, batch_j)
    out = make_aug_eval_step(cfg, model, ("identity", "flip"))(
        state.params, batch_j)
    assert np.all(np.isfinite(np.asarray(out["boxes"])))
    assert out["boxes"].shape == ref["boxes"].shape
    assert not np.allclose(np.asarray(out["scores"]),
                           np.asarray(ref["scores"]), atol=1e-6)


def test_unknown_aug_rejected():
    cfg = _fp32_cfg()
    model = build_model(cfg)
    with pytest.raises(ValueError, match="unknown aug"):
        make_aug_eval_step(cfg, model, ("identity", "vflip"))


def test_evaluate_aug_test_identity_submission_identical(tmp_path):
    """Full evaluate() with aug_test=("identity",) on the synthetic
    on-disk dataset writes the same submission as the plain path
    (--aug-test CLI semantics)."""
    from tests.test_train_loop_e2e import _cfg, _make_dataset
    from transcar_tpu.train.loop import evaluate

    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    _make_dataset(root, n_samples=2)
    cfg = _cfg(root, str(tmp_path / "work"))
    model = build_model(cfg)
    b = ge._fake_batch(np.random.default_rng(0), 1, 6, 64, 96, 32,
                       max_gt=8)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(b["images"]),
        jnp.asarray(b["lidar2img"]))["params"]

    p_ref = evaluate(cfg, params, out_path=str(tmp_path / "ref.json"))
    p_aug = evaluate(cfg, params, out_path=str(tmp_path / "aug.json"),
                     aug_test=("identity",))
    ref = json.load(open(p_ref))["results"]
    aug = json.load(open(p_aug))["results"]
    assert ref.keys() == aug.keys()
    for tok in ref:
        assert len(ref[tok]) == len(aug[tok])
        for da, db in zip(ref[tok], aug[tok]):
            np.testing.assert_allclose(da["translation"],
                                       db["translation"],
                                       rtol=2e-4, atol=2e-4)
            assert da["detection_name"] == db["detection_name"]
