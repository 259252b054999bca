"""End-to-end SERVING benchmark: evaluate() wall-clock through the full
pipeline — JPEG decode (native one-pass), uint8 wire, device
normalize+forward, NMS-free decode, submission formatting.

The reference's FPS benchmark (tools/analysis_tools/benchmark.py:64-91)
times model.forward only and skips the dataloader; its real eval loop
(tools/test.py single_gpu_test) is fully serial.  This script measures
what a user actually gets from ``cli/test.py``: samples/s through
``train/loop.py::evaluate`` including the one-deep software pipeline
(dispatch batch i+1 before pulling batch i's outputs).

Synthetic on-disk dataset at the flagship input size (6 cams, 1600x900
JPEG, worst-case high-entropy content) so the host decode cost is real.

Usage: python scripts/bench_eval_e2e.py [--samples 16] [--bs 1 2]
"""
import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root, n_samples, h=900, w=1600):
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
            path = os.path.join(img_dir, f"s{i}_{cam}.jpg")
            if not os.path.exists(path):
                Image.fromarray(rng.integers(0, 255, (h, w, 3),
                                             dtype=np.uint8)).save(
                    path, quality=90)
            a = 2 * np.pi * ci / 6
            fwd = np.array([np.cos(a), np.sin(a), 0.0])
            right = np.array([-np.sin(a), np.cos(a), 0.0])
            down = np.array([0.0, 0.0, -1.0])
            # sensor2lidar = cam→lidar (rows of world→cam, transposed)
            rot = np.stack([right, down, fwd]).astype(np.float64).T
            cams[cam] = {
                "data_path": path,
                "sensor2lidar_rotation": rot,
                "sensor2lidar_translation": np.zeros(3),
                "cam_intrinsic": np.array(
                    [[0.8 * w, 0, w / 2], [0, 0.8 * w, h / 2], [0, 0, 1.0]]),
            }
        g = 3
        boxes = np.zeros((g, 7))
        boxes[:, :2] = rng.uniform(-30, 30, (g, 2))
        boxes[:, 3:6] = rng.uniform(1, 4, (g, 3))
        infos.append({
            "token": f"tok{i}", "timestamp": 1000 + i, "lidar_path": "",
            "sweeps": [], "cams": cams,
            "lidar2ego_rotation": [1, 0, 0, 0],
            "lidar2ego_translation": [0, 0, 0],
            "ego2global_rotation": [1, 0, 0, 0],
            "ego2global_translation": [0, 0, 0],
            "gt_boxes": boxes, "gt_names": ["car", "bus", "pedestrian"],
            "gt_velocity": rng.uniform(-2, 2, (g, 2)),
            "num_lidar_pts": np.array([5, 5, 5]),
            "num_radar_pts": np.array([1, 1, 1]),
            "valid_flag": np.array([True, True, True]),
        })
    with open(os.path.join(root, "nuscenes_infos_val.pkl"), "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "bench"}}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--bs", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--preset", default="transcar_r101")
    ap.add_argument("--root", default="/tmp/eval_e2e_data")
    ap.add_argument("--hw", type=int, nargs=2, default=[900, 1600],
                    metavar=("H", "W"), help="on-disk image size")
    ap.add_argument("-o", "--opt", action="append", default=[],
                    help="config override key=value (repeatable)")
    args = ap.parse_args()

    make_dataset(args.root, args.samples, h=args.hw[0], w=args.hw[1])

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from transcar_tpu.core.config import get_preset
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.loop import evaluate
    from transcar_tpu.train.step import make_eval_step
    from transcar_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)

    overrides = {"data.data_root": args.root}
    for kv in args.opt:
        k, v = kv.split("=", 1)
        overrides[k] = v
    cfg = get_preset(args.preset, overrides)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    fake = ge._fake_batch(rng, 1, 6, cfg.data.img_hw[0], cfg.data.img_hw[1],
                          cfg.model.head.num_radar_tokens)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(fake["images"]),
        jnp.asarray(fake["lidar2img"]),
        jnp.asarray(fake["radar_tokens"]))["params"]

    tok_rng = np.random.default_rng(1)
    radar_cache = {}

    def radar_fn(token):
        if token not in radar_cache:
            r = np.full((cfg.model.head.num_radar_tokens, 36), 500.0,
                        np.float32)
            r[:40] = tok_rng.normal(size=(40, 36)).astype(np.float32)
            r[:40, 0:2] *= 30.0
            radar_cache[token] = r
        return radar_cache[token]

    for bs in args.bs:
        eval_step = make_eval_step(cfg, model)
        # warmup/compile pass over one batch
        evaluate(cfg, params, radar_fn=radar_fn, max_samples=bs,
                 batch_size=bs, out_path=f"/tmp/eval_e2e_warm_bs{bs}.json",
                 _eval_step=eval_step)
        t0 = time.perf_counter()
        evaluate(cfg, params, radar_fn=radar_fn, max_samples=args.samples,
                 batch_size=bs, out_path=f"/tmp/eval_e2e_bs{bs}.json",
                 _eval_step=eval_step)
        dt = time.perf_counter() - t0
        print(f"evaluate e2e bs{bs}: {args.samples / dt:.2f} samples/s "
              f"({dt / args.samples * 1e3:.0f} ms/sample, "
              f"{args.samples} samples)", flush=True)


if __name__ == "__main__":
    main()
