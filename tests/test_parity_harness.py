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


@pytest.mark.slow
def test_parity_check_cli_dry_run_on_synthetic_weights(tmp_path, capsys):
    """The whole artifact-arrival runbook, end to end, on synthetic
    weights: a reference-layout torch .pth → cli.parity_check.main
    (convert → forward → compare) must PASS against a capture taken from
    the identical conversion — re-verifying that cli/parity_check.py and
    train/convert.py still fit the current model tree (VERDICT r4 #7).
    The runbook itself is docs/MIGRATION.md 'Checkpoint parity'."""
    import torch

    import jax

    from tests.test_convert import _synthetic_reference_sd
    from transcar_tpu.cli.parity_check import capture_outputs, main
    from transcar_tpu.cli.train import _try_radar_fn, parse_overrides
    from transcar_tpu.core.config import get_preset
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.loop import _load_params

    root = str(tmp_path / "data")
    os.makedirs(root)
    _make_dataset(root, n_samples=2)
    sd = _synthetic_reference_sd(num_layers=1, blocks=(3, 4, 6, 3),
                                 with_dcn=(False,) * 4)
    # the fixture draws everything from N(0,1) (fine for the tree
    # tests) — a FORWARD pass through 50 layers of unit-scale weights
    # with mismatched BN running stats explodes to NaN and decode then
    # filters every box.  Scale to the largest factor that stays finite
    # (0.1, measured) with neutral running stats.
    def _tame(k, v):
        if k.endswith("running_var"):
            return np.ones_like(v)
        if k.endswith("running_mean"):
            return np.zeros_like(v)
        return v * 0.1
    sd = {k: _tame(k, v) for k, v in sd.items()}
    pth = str(tmp_path / "ref.pth")
    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, pth)

    # random weights decode at the pc-range corners → the default
    # post_center_range filters everything → a vacuous comparison; widen
    # it so the capture carries rows the check can discriminate on
    overrides = [
        f"data.data_root={root}", "data.img_hw=[64,96]",
        "model.backbone.kind=resnet50",
        "model.backbone.with_dcn=[false,false,false,false]",
        "model.backbone.compute_dtype=float32",
        "model.head.num_decoder_layers=1",
        "model.head.post_center_range=[-10000,-10000,-10000,"
        "10000,10000,10000]",
    ]
    cfg = get_preset("transcar_r101", parse_overrides(overrides))
    model = build_model(cfg)
    h, w = cfg.data.img_hw
    images = np.zeros((1, cfg.model.head.num_cams, h, w, 3), np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32),
                  (1, cfg.model.head.num_cams, 1, 1))
    radar = np.full((1, cfg.model.head.num_radar_tokens, 36), 500.0,
                    np.float32)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images, l2i, radar)
    )["params"]
    params = _load_params(pth, cfg, template)

    npz = str(tmp_path / "captured.npz")
    capture_outputs(cfg, params, npz, max_samples=2,
                    radar_fn=_try_radar_fn(cfg))
    assert int(np.load(npz)["num_dets"].sum()) > 0, "vacuous capture"

    rc = main([
        "transcar_r101", "--checkpoint", pth, "--reference-npz", npz,
        "--box-tol", "1e-4", "--score-tol", "1e-5",
        "--report-out", str(tmp_path / "report.json"),
        "--cfg-options", *overrides])
    assert rc == 0
    assert "PARITY PASSED" in capsys.readouterr().out


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
