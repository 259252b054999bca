"""ObjDGCNN (LiDAR track) TPU perf campaign — VERDICT r4 item 3.

Reference FPS protocol (tools/analysis_tools/benchmark.py:64-91): warmup,
synchronized timing, forward only — at realistic nuScenes load (~300k
points = 10 sweeps, the static budget data.max_points).  Rows: pillar +
voxel presets, inference bs1/bs2, train step bs1, plus phase probes
(voxelize alone; encoder+backbone+head via delta) to locate hotspots.

Run detached (one TPU process at a time):
  setsid nohup python scripts/bench_objdgcnn.py > /tmp/objdgcnn_bench.log \
      2>&1 < /dev/null & disown
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.core.config import get_preset
from transcar_tpu.models.detector import build_model
from transcar_tpu.utils.compile_cache import enable_persistent_cache


def make_points(rng, b, n_max, n_real, pc_range):
    pts = np.zeros((b, n_max, 5), np.float32)
    pts[:, :, 0] = rng.uniform(pc_range[0], pc_range[3], (b, n_max))
    pts[:, :, 1] = rng.uniform(pc_range[1], pc_range[4], (b, n_max))
    pts[:, :, 2] = rng.uniform(pc_range[2], pc_range[5], (b, n_max))
    pts[:, :, 3] = rng.uniform(0, 255, (b, n_max))
    pts[:, :, 4] = rng.uniform(0, 0.45, (b, n_max))
    return pts, np.full((b,), n_real, np.int32)


def bench(fn, sync, iters=20, warmup=3):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def run_preset(name, tiny=False, parts=("infer", "train")):
    overrides = {}
    if tiny:   # CPU smoke of the script logic, not a perf number
        overrides = {"data.max_points": 4000, "model.max_voxels": 2000,
                     "model.bev_hw": [64, 64],
                     "model.sparse_shape": [11, 128, 128],
                     "model.voxel_size": [0.8, 0.8, 1.6]
                     if name == "objdgcnn_voxel" else [1.6, 1.6, 8.0],
                     "model.head.num_query": 32,
                     "model.head.num_decoder_layers": 1,
                     "data.max_gt_boxes": 8}
    cfg = get_preset(name, overrides)
    pc = cfg.model.head.pc_range
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    n_max = cfg.data.max_points

    for b in (1, 2) if "infer" in parts else ():
        pts, n = make_points(rng, b, n_max, int(n_max * 0.9), pc)
        ptsj, nj = jnp.asarray(pts), jnp.asarray(n)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), ptsj, nj)
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        var = {"params": params}
        if stats:
            var["batch_stats"] = stats

        @jax.jit
        def infer(var, p, m):
            return model.apply(var, p, m)

        var = jax.device_put(var)
        dt = bench(lambda: infer(var, ptsj, nj),
                   lambda o: float(jnp.sum(o["all_bbox_preds"][..., 0])))
        print(f"{name} infer bs{b}: {dt * 1e3:.1f} ms/batch = "
              f"{b / dt:.2f} samples/s", flush=True)

        if b == 1:
            # phase probe: voxelize alone (same static shapes)
            from transcar_tpu.ops.voxelize import hard_voxelize

            @jax.jit
            def vox(p, m):
                return jax.vmap(lambda pp, nn: hard_voxelize(
                    pp, nn, cfg.model.voxel_size, pc,
                    cfg.model.max_points_per_voxel,
                    cfg.model.max_voxels))(p, m)

            dtv = bench(lambda: vox(ptsj, nj),
                        lambda o: float(jnp.sum(o[3])))
            print(f"{name} voxelize bs1: {dtv * 1e3:.1f} ms "
                  f"({100 * dtv / dt:.0f}% of forward)", flush=True)

    # train step bs1 + bs2 (training build: autodiff-able encoder path).
    # bs2 proves the windowed-kernel batch scaling holds under grad too
    # (round 4's per-sample serialization anti-scaled at bs2).
    if "train" not in parts:
        return
    from transcar_tpu.train.step import init_state, make_train_step
    model = build_model(cfg, training=True)
    for b in (1, 2):
        pts, n = make_points(rng, b, n_max, int(n_max * 0.9), pc)
        gt = np.ones((b, cfg.data.max_gt_boxes, 9), np.float32)
        gt[:, :, :2] = rng.uniform(-40, 40, (b, cfg.data.max_gt_boxes, 2))
        gt[:, :, 3:6] = rng.uniform(0.5, 6, (b, cfg.data.max_gt_boxes, 3))
        batch = {"points": pts, "num_points": n, "gt_boxes": gt,
                 "gt_labels": rng.integers(
                     0, 10, (b, cfg.data.max_gt_boxes)).astype(np.int32),
                 "num_gt": np.full((b,), 9, np.int32)}
        state, tx = init_state(cfg, model, batch, total_steps=100,
                               rng=jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx)
        batch_j = jax.device_put(batch)
        state = jax.device_put(state)

        def one():
            nonlocal state
            state, losses = step(state, batch_j, jax.random.PRNGKey(1))
            return losses

        dt = bench(one, lambda o: float(o["total"]), iters=10)
        print(f"{name} train bs{b}: {dt * 1e3:.1f} ms/step = "
              f"{b / dt:.2f} samples/s", flush=True)


def main():
    import argparse
    import os
    import sys
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--preset", choices=["pillar", "voxel"], default=None,
                    help="run only this preset (default: both)")
    ap.add_argument("--parts", default="infer,train",
                    help="comma list of infer,train (voxel train faults "
                         "the v5e worker — run it last, isolated)")
    args = ap.parse_args()
    tiny = args.tiny
    parts = tuple(p for p in args.parts.split(",") if p)
    if not tiny:
        # ride out axon worker crash/restart windows (probe in a
        # subprocess — failed in-process init is cached by jax)
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench as _bench
        _bench._wait_for_backend(max_tries=4, sleep_s=90.0)
    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)
    names = {"pillar": ("objdgcnn_pillar",), "voxel": ("objdgcnn_voxel",),
             None: ("objdgcnn_pillar", "objdgcnn_voxel")}[args.preset]
    for name in names:
        try:
            run_preset(name, tiny=tiny, parts=parts)
        except Exception as e:  # noqa: BLE001 — record and continue
            import traceback
            print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
