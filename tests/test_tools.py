"""Tool-layer tests: BN folding preserves outputs bit-for-bit, config CLI
round-trips, log analyzer parses the trainer's json lines."""
import json

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.models.resnet import ResNet
from transcar_tpu.train.fold import fold_frozen_bn


def test_fold_frozen_bn_preserves_outputs():
    rng = np.random.default_rng(0)
    bb = ResNet(depth=50, with_dcn=(False,) * 4, out_indices=(3,),
                compute_dtype=None)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = bb.init(jax.random.PRNGKey(0), x)
    # give BN nontrivial stats
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * rng.normal(size=a.shape).astype(a.dtype), params)
    ref = bb.apply(params, x)[0]
    folded = {"params": fold_frozen_bn(params["params"])}
    out = bb.apply(folded, x)[0]
    # 50 conv layers on randomly perturbed weights amplify magnitudes to
    # ~1e11, so compare relatively
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-3,
                               atol=1e-4)


def test_fold_bn_into_conv_matches_unfolded():
    """Kernel-level conv-BN fusion (the eval default) reproduces the
    unfolded outputs within fp tolerance, including the DCN conv2/bn2
    pattern (fuse_conv_bn.py:10-24 semantics)."""
    from transcar_tpu.train.fold import fold_bn_into_conv

    rng = np.random.default_rng(1)
    bb = ResNet(depth=50, with_dcn=(False, False, True, True),
                out_indices=(2, 3), compute_dtype=None, dcn_impl="exact")
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    params = bb.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * rng.normal(size=a.shape).astype(a.dtype), params)
    ref = bb.apply(params, x)
    folded = {"params": fold_bn_into_conv(params["params"])}
    out = bb.apply(folded, x)
    # the fold relocates the BN multiply across the conv reduction, so
    # fp32 reassociation through 50 randomly perturbed layers (magnitudes
    # ~1e4) shows up; a *wrong* fold would be off by orders of magnitude
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=5e-2,
                                   atol=1e-3)


def test_print_config_cli(capsys):
    from transcar_tpu.cli.print_config import main
    main(["transcar_r101", "--cfg-options", "train.optim.lr=0.001"])
    out = json.loads(capsys.readouterr().out)
    assert out["train"]["optim"]["lr"] == 0.001
    assert out["model"]["head"]["num_query"] == 900


def test_analyze_logs_cli(tmp_path, capsys):
    from transcar_tpu.cli.analyze_logs import main
    log = tmp_path / "x.log.json"
    with open(log, "w") as f:
        for i in range(4):
            f.write(json.dumps({"mode": "train", "epoch": 1, "iter": i,
                                "time": 0.5 + i * 0.1, "loss_cls": 1.0,
                                "loss_bbox": 2.0}) + "\n")
    with open(log, "a") as f:
        f.write(json.dumps({"mode": "val", "epoch": 1, "iter": 4,
                            "mAP": 0.1, "NDS": 0.2}) + "\n")
    main(["cal_train_time", str(log)])
    out = capsys.readouterr().out
    assert "overall mean" in out
    assert "slowest epoch" in out
    csv = tmp_path / "curve.csv"
    main(["plot_curve", str(log), "--out", str(csv)])
    assert csv.read_text().startswith("iter,loss_cls,loss_bbox")
    assert len(csv.read_text().strip().split("\n")) == 5
    # PNG rendering (reference analyze_logs.py:33-106; matplotlib Agg)
    png = tmp_path / "curve.png"
    main(["plot_curve", str(log), "--out", str(png), "--title", "t"])
    assert png.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    # eval mode: per-epoch val metrics
    png2 = tmp_path / "val.png"
    main(["plot_curve", str(log), "--keys", "mAP", "NDS",
          "--mode", "eval", "--out", str(png2)])
    assert png2.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_config_overrides_and_presets():
    from transcar_tpu.core.config import get_preset, list_presets
    assert set(list_presets()) == {
        "detr3d_r101", "transcar_r101", "transcar_r101_cbgs",
        "transcar_vovnet_trainval", "objdgcnn_pillar", "objdgcnn_voxel"}
    cfg = get_preset("transcar_vovnet_trainval")
    assert cfg.model.backbone.kind == "vovnet99"
    assert cfg.model.backbone.fpn_start_level == 0
    cfg2 = get_preset("transcar_r101",
                      {"model.head.num_query": "300",
                       "data.img_hw": [256, 704]})
    assert cfg2.model.head.num_query == 300
    assert cfg2.data.img_hw == (256, 704)


def test_train_cli_autoscale_lr(tmp_path, monkeypatch, capsys):
    """--autoscale-lr applies the linear scaling rule against the
    reference's 8-GPU schedule (tools/train.py:148-150)."""
    import jax

    from transcar_tpu.cli import train as train_cli

    captured = {}

    def fake_train(cfg, radar_fn=None, max_steps=None, **kwargs):
        captured["lr"] = cfg.train.optim.lr
        return None

    import transcar_tpu.train.loop as loop
    monkeypatch.setattr(loop, "train", fake_train)
    from transcar_tpu.core.config import get_preset
    base_lr = get_preset("detr3d_r101").train.optim.lr
    train_cli.main(["detr3d_r101", "--work-dir", str(tmp_path),
                    "--autoscale-lr", "--max-steps", "1"])
    expected = base_lr * jax.device_count() / 8.0
    assert abs(captured["lr"] - expected) < 1e-12


def test_bev_render_writes_pngs(tmp_path):
    """render_submission draws box plots from a submission json (the
    headless --show-dir analog of tools/test.py:43-45)."""
    import json
    import os

    from transcar_tpu.eval.bev_plot import render_submission

    rng = np.random.default_rng(0)
    results = {}
    for t in ("tok_a", "tok_b"):
        annos = []
        for _ in range(6):
            yaw = float(rng.uniform(-np.pi, np.pi))
            annos.append({
                "sample_token": t,
                "translation": [float(rng.uniform(600, 640)),
                                float(rng.uniform(1600, 1640)), 0.5],
                "size": [2.0, 4.5, 1.6],
                "rotation": [float(np.cos(yaw / 2)), 0, 0,
                             float(np.sin(yaw / 2))],
                "velocity": [1.0, 0.3],
                "detection_name": "car",
                "detection_score": float(rng.uniform(0.2, 0.9)),
                "attribute_name": "",
            })
        results[t] = annos
    sub = tmp_path / "results_nusc.json"
    sub.write_text(json.dumps({"meta": {}, "results": results}))

    out = render_submission(str(sub), str(tmp_path / "viz"),
                            score_thr=0.3)
    assert len(out) == 2
    for p in out:
        assert os.path.getsize(p) > 5000      # a real figure, not a stub

    from transcar_tpu.cli.visualize_results import main as viz_main
    viz_main([str(sub), "--save-dir", str(tmp_path / "viz2"), "--num", "1"])
    assert len(os.listdir(tmp_path / "viz2")) == 2


def test_benchmark_cli_with_trace(tmp_path, capsys):
    """FPS benchmark CLI (tools/analysis_tools/benchmark.py analog) on a
    tiny camera-only config; --trace-dir captures a jax.profiler trace of
    the timed loop (SURVEY.md §5 tracing subsystem)."""
    import os

    from transcar_tpu.cli.benchmark import main as bench_main

    trace_dir = str(tmp_path / "trace")
    bench_main(["detr3d_r101", "--samples", "2", "--warmup", "1",
                "--height", "64", "--width", "96",
                "--trace-dir", trace_dir, "--cfg-options",
                "model.backbone.kind=resnet50",
                "model.backbone.compute_dtype=float32",
                "model.backbone.with_dcn=[false,false,false,false]",
                "model.head.num_query=16",
                "model.head.num_decoder_layers=1",
                "model.head.with_radar_fusion=false",
                "data.img_hw=[64,96]"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["batch"] == 1 and rec["samples_per_sec"] > 0
    # the profiler wrote a trace under <dir>/plugins/profile/<ts>/
    found = []
    for dirpath, _dirnames, filenames in os.walk(trace_dir):
        found += [f for f in filenames if f.endswith((".trace.json.gz",
                                                      ".xplane.pb"))]
    assert found, f"no trace artifacts under {trace_dir}"


def test_benchmark_cli_lidar_preset(capsys):
    """The FPS benchmark CLI serves the LiDAR track too (the reference's
    benchmark.py takes any config, including obj_dgcnn)."""
    from transcar_tpu.cli.benchmark import main as bench_main

    bench_main(["objdgcnn_pillar", "--samples", "2", "--warmup", "1",
                "--cfg-options",
                "data.max_points=600", "model.max_voxels=256",
                "model.bev_hw=[32,32]",
                "model.voxel_size=[3.2,3.2,8.0]",
                "model.head.num_query=16",
                "model.head.num_decoder_layers=1"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["samples_per_sec"] > 0
    assert rec["max_points"] == 600


def test_get_flops_cli_camera_and_lidar(capsys):
    """get_flops (tools/analysis_tools/get_flops.py analog) covers BOTH
    modalities via XLA cost analysis — the reference's hook counter
    explicitly cannot (get_flops.py:57-60)."""
    from transcar_tpu.cli.get_flops import main as flops_main

    flops_main(["detr3d_r101", "--height", "64", "--width", "96",
                "--cfg-options",
                "model.backbone.kind=resnet50",
                "model.backbone.compute_dtype=float32",
                "model.backbone.with_dcn=[false,false,false,false]",
                "model.head.num_query=16",
                "model.head.num_decoder_layers=1",
                "model.head.with_radar_fusion=false",
                "data.img_hw=[64,96]"])
    cam = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert cam["gflops"] > 0 and cam["params_m"] > 0
    assert cam["input"] == [1, 6, 64, 96, 3]

    flops_main(["objdgcnn_pillar", "--cfg-options",
                "data.max_points=600", "model.max_voxels=256",
                "model.bev_hw=[32,32]",
                "model.voxel_size=[3.2,3.2,8.0]",
                "model.head.num_query=16",
                "model.head.num_decoder_layers=1"])
    lid = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert lid["gflops"] > 0 and lid["params_m"] > 0
    assert lid["input"] == [1, 600, 5]
