"""Export CLI: the serialized StableHLO artifact reproduces the live
jitted eval step (same inputs → identical decoded outputs) and records
an honest sidecar."""
import json

import numpy as np
import jax
import pytest

from transcar_tpu.cli.train import parse_overrides
from transcar_tpu.core.config import get_preset

OVERRIDES = [
    "model.backbone.kind=resnet50",
    "model.backbone.compute_dtype=float32",
    "model.backbone.with_dcn=[false,false,false,false]",
    "model.head.num_query=16",
    "model.head.num_decoder_layers=1",
    "model.head.with_radar_fusion=false",
    "data.img_hw=[64,96]",
]


@pytest.fixture(scope="module")
def tiny_cfg():
    return get_preset("detr3d_r101", parse_overrides(OVERRIDES))


def test_export_artifact_matches_live_eval_step(tiny_cfg, tmp_path):
    from jax import export as jexport

    from transcar_tpu.cli.export import export_eval_step
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.step import make_eval_step

    cfg = tiny_cfg
    rng = np.random.default_rng(0)
    n = cfg.model.head.num_cams
    h, w = cfg.data.img_hw
    images = rng.normal(size=(1, n, h, w, 3)).astype(np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (1, n, 1, 1))
    l2i[:, :, 0, 3] = rng.normal(size=(1, n))
    batch = {"images": images, "lidar2img": l2i}

    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), images, l2i, None)["params"]
    want = make_eval_step(cfg, model)(params, batch)

    exp, sidecar = export_eval_step(cfg, batch_size=1)
    blob = exp.serialize()
    reloaded = jexport.deserialize(bytearray(blob))
    got = reloaded.call(params, batch)

    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)
    assert sidecar["takes_batch_stats"] is False
    assert sidecar["batch"]["images"] == f"float32[1, {n}, {h}, {w}, 3]"


def test_export_cli_writes_artifact_and_sidecar(tiny_cfg, tmp_path):
    from transcar_tpu.cli.export import main as export_main

    out = str(tmp_path / "model.stablehlo")
    export_main(["detr3d_r101", "--out", out, "--cfg-options", *OVERRIDES])
    assert (tmp_path / "model.stablehlo").stat().st_size > 1000
    with open(out + ".json") as f:
        sidecar = json.load(f)
    assert sidecar["preset"] == "detr3d_r101"
    assert "boxes" in sidecar["outputs"]
