"""Full user-journey CLI test: train CLI (with --cfg-options overrides) →
publish_model CLI (strip optimizer) → test CLI (load published params,
write submission json) on the synthetic on-disk dataset."""
import json
import os

import numpy as np
import pytest

from tests.test_train_loop_e2e import _make_dataset

OVERRIDES = [
    "model.backbone.kind=resnet50",
    "model.backbone.compute_dtype=float32",
    "model.backbone.with_dcn=[false,false,false,false]",
    "model.head.num_query=16",
    "model.head.num_decoder_layers=1",
    "model.head.with_radar_fusion=false",
    "data.img_hw=[64,96]",
    "data.max_gt_boxes=8",
    "data.workers=2",
    "train.mesh_shape=[2]",
    "train.optim.total_epochs=1",
    "train.optim.warmup_iters=2",
    "train.optim.freeze_camera_branch=false",
]


@pytest.mark.slow
def test_train_publish_test_cli_journey(tmp_path, capsys):
    root = str(tmp_path / "data")
    work = str(tmp_path / "work")
    os.makedirs(root)
    _make_dataset(root)

    from transcar_tpu.cli.train import main as train_main
    train_main(["detr3d_r101", "--work-dir", work, "--max-steps", "2",
                "--seed", "0", "--cfg-options",
                f"data.data_root={root}", *OVERRIDES])
    assert os.path.isdir(os.path.join(work, "checkpoints"))

    from transcar_tpu.cli.publish_model import main as publish_main
    out_prefix = str(tmp_path / "published" / "ckpt")
    publish_main([work, out_prefix])
    published = [str(p) for p in (tmp_path / "published").iterdir()]
    assert len(published) == 1
    capsys.readouterr()

    from transcar_tpu.cli.test import main as test_main
    results = str(tmp_path / "results.json")
    test_main(["detr3d_r101", published[0], "--format-only",
               "--fuse-conv-bn",
               "--out", results, "--max-samples", "2", "--cfg-options",
               f"data.data_root={root}", *OVERRIDES])
    with open(results) as f:
        sub = json.load(f)
    assert len(sub["results"]) == 2
    for annos in sub["results"].values():
        assert isinstance(annos, list)
