"""Capture reference TransCAR/DETR3D outputs for the parity harness.

RUN THIS NEXT TO THE REFERENCE TORCH REPO, inside ITS environment (mmcv /
mmdet / mmdet3d / torch-cuda installed, nuScenes data prepared per its
README):

    cd /path/to/TransCAR
    python /path/to/this/script.py \
        projects/configs/detr3d/detr3d_res101_gridmask.py \
        /path/to/transcar.pth --out ref_outputs.npz --max-samples 50

It drives only the reference's public entry APIs (the same path
tools/test.py takes: Config.fromfile + plugin import + build_model +
load_checkpoint + single-sample forward, /root/reference/tools/test.py:
124-223) and exports the decoded per-sample outputs in the capture format
transcar_tpu/cli/parity_check.py consumes:

    tokens [N], boxes [N, K, 9] (bottom-center: cx cy cz w l h yaw vx vy,
    decode order = descending score), scores [N, K], labels [N, K],
    num_dets [N].
"""
import argparse
import importlib
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--out", default="ref_outputs.npz")
    ap.add_argument("--max-samples", type=int, default=50)
    ap.add_argument("--pad-dets", type=int, default=300,
                    help="pad/truncate per-sample detections to this many "
                         "rows (NMSFreeCoder max_num)")
    args = ap.parse_args()

    import torch
    from mmcv import Config
    from mmcv.parallel import MMDataParallel
    from mmcv.runner import load_checkpoint
    from mmdet3d.datasets import build_dataloader, build_dataset
    from mmdet3d.models import build_model

    cfg = Config.fromfile(args.config)
    # plugin import (tools/test.py:124-146 behavior)
    if cfg.get("plugin") and cfg.get("plugin_dir"):
        plugin_dir = cfg.plugin_dir
        module_path = plugin_dir.rstrip("/").replace("/", ".")
        sys.path.insert(0, os.path.dirname(os.path.abspath(args.config)))
        importlib.import_module(module_path)

    cfg.data.test.test_mode = True
    dataset = build_dataset(cfg.data.test)
    loader = build_dataloader(dataset, samples_per_gpu=1, workers_per_gpu=2,
                              dist=False, shuffle=False)

    model = build_model(cfg.model, test_cfg=cfg.get("test_cfg"))
    load_checkpoint(model, args.checkpoint, map_location="cpu")
    model = MMDataParallel(model, device_ids=[0])
    model.eval()

    k = args.pad_dets
    tokens, boxes, scores, labels, num_dets = [], [], [], [], []
    with torch.no_grad():
        for i, data in enumerate(loader):
            if i >= args.max_samples:
                break
            result = model(return_loss=False, rescale=True, **data)
            r = result[0]["pts_bbox"]
            b = r["boxes_3d"].tensor.cpu().numpy()     # [n, 9] bottom-center
            s = r["scores_3d"].cpu().numpy()
            l = r["labels_3d"].cpu().numpy()
            n = min(len(s), k)
            bp = np.zeros((k, 9), np.float32)
            sp = np.zeros((k,), np.float32)
            lp = np.zeros((k,), np.int32)
            bp[:n] = b[:n, :9]
            sp[:n] = s[:n]
            lp[:n] = l[:n]
            tokens.append(dataset.data_infos[i]["token"])
            boxes.append(bp)
            scores.append(sp)
            labels.append(lp)
            num_dets.append(n)
            print(f"[{i + 1}/{args.max_samples}] {tokens[-1]}: {n} dets",
                  flush=True)

    np.savez(args.out, tokens=np.asarray(tokens), boxes=np.stack(boxes),
             scores=np.stack(scores), labels=np.stack(labels),
             num_dets=np.asarray(num_dets, np.int32))
    print(f"wrote {len(tokens)} samples to {args.out}")


if __name__ == "__main__":
    main()
