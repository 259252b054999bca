"""Real-data numeric parity harness against the reference implementation.

The project's north star (BASELINE.md; /root/reference/README.md:34-49) is
weights-in → boxes-out parity with the published TransCAR/DETR3D
checkpoints.  The published .pth files and nuScenes data are not shipped in
this container, so this CLI makes the check a ONE-COMMAND affair the moment
the artifacts exist:

  1. Capture reference outputs next to the torch repo (its own env):
         python scripts/capture_reference_outputs.py \
             <config.py> <ckpt.pth> --out ref_outputs.npz --max-samples 50
  2. Run the same samples through this framework and diff:
         python -m transcar_tpu.cli.parity_check transcar_r101 \
             --checkpoint ckpt.pth --reference-npz ref_outputs.npz \
             --cfg-options data.data_root=/path/to/nuscenes

Capture format (np.savez): ``tokens`` [N] <U..>, ``boxes`` [N, K, 9]
(bottom-center, decode order), ``scores`` [N, K], ``labels`` [N, K] int,
``num_dets`` [N] int.  Rows are sorted by descending score — both the
reference NMSFreeCoder (nms_free_coder.py:52-58 topk) and eval/decode.py
emit that order, so rows are compared index-aligned.

Self-test: ``capture_outputs`` below writes the same format from THIS
framework, so a convert → forward → re-export → parity_check round trip
validates the harness without reference artifacts
(tests/test_parity_harness.py).
"""
from __future__ import annotations

import argparse
import json
from typing import Callable, Dict, Optional

import numpy as np


def capture_outputs(cfg, params, out_npz: str,
                    max_samples: Optional[int] = None,
                    radar_fn: Optional[Callable] = None,
                    batch_stats=None, dataset=None) -> str:
    """Forward the val split and save decoded outputs in the capture
    format (the framework-side twin of
    scripts/capture_reference_outputs.py)."""
    import os

    from transcar_tpu.data.infos import NuScenesInfos
    from transcar_tpu.data.loader import PrefetchLoader
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.step import make_eval_step

    if dataset is None:
        dataset = NuScenesInfos(
            os.path.join(cfg.data.data_root, cfg.data.ann_val),
            class_names=cfg.data.class_names, test_mode=True,
            data_root=cfg.data.data_root)
    model = build_model(cfg)
    eval_step = make_eval_step(cfg, model)
    n = len(dataset) if max_samples is None else min(max_samples,
                                                     len(dataset))
    loader = PrefetchLoader(dataset, cfg.data, batch_size=1,
                            training=False, indices=np.arange(n),
                            radar_fn=radar_fn,
                            modality="lidar" if cfg.model.lidar_encoder
                            else "camera")
    tokens, boxes, scores, labels, num_dets = [], [], [], [], []
    for idx, batch in enumerate(loader.epoch(0)):
        out = eval_step(params, batch, batch_stats)
        valid = np.asarray(out["valid"][0])
        tokens.append(dataset.infos[idx]["token"])
        boxes.append(np.asarray(out["boxes"][0], np.float32))
        scores.append(np.asarray(out["scores"][0], np.float32))
        labels.append(np.asarray(out["labels"][0], np.int32))
        num_dets.append(int(valid.sum()))
    np.savez(out_npz, tokens=np.asarray(tokens),
             boxes=np.stack(boxes), scores=np.stack(scores),
             labels=np.stack(labels),
             num_dets=np.asarray(num_dets, np.int32))
    return out_npz


def compare_outputs(cfg, params, reference_npz: str,
                    radar_fn: Optional[Callable] = None,
                    batch_stats=None,
                    box_tol: float = 0.05, score_tol: float = 0.01,
                    top_k: int = 50, num_det_slack: int = 0,
                    dataset=None) -> Dict:
    """Forward every captured sample and diff against the reference.

    Compares the ``top_k`` highest-score detections index-aligned (both
    sides emit score-descending decode order): box L∞ in meters/state
    units, score L∞, and label agreement.  The compared row count is
    ``min(top_k, reference num_dets)`` — deliberately NOT capped by our
    own valid count, so a model that drops detections the reference kept
    is compared (and fails) instead of passing vacuously.  Detection
    counts must also agree within ``num_det_slack``.  Returns a report
    dict; the check passes when every per-sample deviation is within
    tolerance.
    """
    import os

    from transcar_tpu.data.infos import NuScenesInfos
    from transcar_tpu.data.loader import PrefetchLoader, prepare_sample
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.step import make_eval_step

    ref = np.load(reference_npz, allow_pickle=False)
    ref_tokens = [str(t) for t in ref["tokens"]]

    if dataset is None:
        dataset = NuScenesInfos(
            os.path.join(cfg.data.data_root, cfg.data.ann_val),
            class_names=cfg.data.class_names, test_mode=True,
            data_root=cfg.data.data_root)
    token_to_idx = {info["token"]: i for i, info in enumerate(dataset.infos)}
    missing = [t for t in ref_tokens if t not in token_to_idx]
    if missing:
        raise ValueError(
            f"{len(missing)} captured tokens not in {cfg.data.ann_val}, "
            f"e.g. {missing[:3]} — val split mismatch")

    model = build_model(cfg)
    eval_step = make_eval_step(cfg, model)
    indices = np.asarray([token_to_idx[t] for t in ref_tokens])
    loader = PrefetchLoader(dataset, cfg.data, batch_size=1,
                            training=False, indices=indices,
                            radar_fn=radar_fn,
                            modality="lidar" if cfg.model.lidar_encoder
                            else "camera")

    per_sample = []
    for i, batch in enumerate(loader.epoch(0)):
        out = eval_step(params, batch, batch_stats)
        k = min(top_k, int(ref["num_dets"][i]))
        ours_b = np.asarray(out["boxes"][0][:k], np.float64)
        ours_s = np.asarray(out["scores"][0][:k], np.float64)
        ours_l = np.asarray(out["labels"][0][:k])
        ref_b = np.asarray(ref["boxes"][i][:k], np.float64)
        ref_s = np.asarray(ref["scores"][i][:k], np.float64)
        ref_l = np.asarray(ref["labels"][i][:k])
        per_sample.append({
            "token": ref_tokens[i],
            "k": k,
            "num_dets_ours": int(np.asarray(out["valid"][0]).sum()),
            "num_dets_ref": int(ref["num_dets"][i]),
            "box_max_abs": float(np.abs(ours_b - ref_b).max()) if k else 0.0,
            "score_max_abs": (float(np.abs(ours_s - ref_s).max())
                              if k else 0.0),
            "label_agree": (float((ours_l == ref_l).mean()) if k else 1.0),
        })

    box_max = max((s["box_max_abs"] for s in per_sample), default=0.0)
    score_max = max((s["score_max_abs"] for s in per_sample), default=0.0)
    label_min = min((s["label_agree"] for s in per_sample), default=1.0)
    det_diff_max = max((abs(s["num_dets_ours"] - s["num_dets_ref"])
                        for s in per_sample), default=0)
    report = {
        "n_samples": len(per_sample),
        "compared_rows": int(sum(s["k"] for s in per_sample)),
        "box_max_abs": box_max,
        "score_max_abs": score_max,
        "label_agree_min": label_min,
        "num_det_diff_max": det_diff_max,
        "box_tol": box_tol,
        "score_tol": score_tol,
        "passed": bool(box_max <= box_tol and score_max <= score_tol
                       and label_min == 1.0
                       and det_diff_max <= num_det_slack),
        "per_sample": per_sample,
    }
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("preset")
    ap.add_argument("--checkpoint", required=True,
                    help="reference torch .pth (converted on load) or "
                         "orbax params dir")
    ap.add_argument("--reference-npz", required=True,
                    help="captured reference outputs "
                         "(scripts/capture_reference_outputs.py)")
    ap.add_argument("--box-tol", type=float, default=0.05)
    ap.add_argument("--score-tol", type=float, default=0.01)
    ap.add_argument("--top-k", type=int, default=50)
    ap.add_argument("--num-det-slack", type=int, default=0,
                    help="allowed |num_dets_ours − num_dets_ref| per "
                         "sample (0 = exact count parity)")
    ap.add_argument("--report-out", help="write the full json report here")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args(argv)

    import jax

    from transcar_tpu.cli.train import _try_radar_fn, parse_overrides
    from transcar_tpu.core.config import get_preset
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.loop import _load_params

    cfg = get_preset(args.preset, parse_overrides(args.cfg_options))
    model = build_model(cfg)
    h, w = cfg.data.img_hw
    images = np.zeros((1, cfg.model.head.num_cams, h, w, 3), np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32),
                  (1, cfg.model.head.num_cams, 1, 1))
    radar = (np.full((1, cfg.model.head.num_radar_tokens, 36), 500.0,
                     np.float32)
             if cfg.model.head.with_radar_fusion else None)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images, l2i, radar)
    )["params"]
    params = _load_params(args.checkpoint, cfg, template)
    radar_fn = (_try_radar_fn(cfg)
                if cfg.model.head.with_radar_fusion else None)

    report = compare_outputs(cfg, params, args.reference_npz,
                             radar_fn=radar_fn, box_tol=args.box_tol,
                             score_tol=args.score_tol, top_k=args.top_k,
                             num_det_slack=args.num_det_slack)
    if args.report_out:
        with open(args.report_out, "w") as f:
            json.dump(report, f, indent=2)
    print(f"samples: {report['n_samples']}  "
          f"rows compared: {report['compared_rows']}  "
          f"box max |Δ|: {report['box_max_abs']:.5f} (tol {args.box_tol})  "
          f"score max |Δ|: {report['score_max_abs']:.5f} "
          f"(tol {args.score_tol})  "
          f"label agreement: {report['label_agree_min']:.3f}  "
          f"num_det max |Δ|: {report['num_det_diff_max']}")
    print("PARITY " + ("PASSED" if report["passed"] else "FAILED"))
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
