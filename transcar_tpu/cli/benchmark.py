"""FPS benchmark CLI (tools/analysis_tools/benchmark.py analog).

Times jitted batch-1 inference with hard host-sync (the reference uses
cuda.synchronize; through the axon relay a scalar host transfer is the
reliable sync).  Random weights/inputs — this measures compute, like the
reference's loop does once data loading is excluded.
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("preset", nargs="?", default="transcar_r101")
    ap.add_argument("--samples", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--height", type=int, default=928)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--trace-dir", default=None,
                    help="capture a jax.profiler trace of the timed loop "
                         "into this directory (view with TensorBoard / "
                         "xprof); SURVEY.md §5 tracing subsystem")
    ap.add_argument("--cfg-options", nargs="*", default=[],
                    help="dotted deep overrides, same as the train CLI")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from transcar_tpu.cli.train import parse_overrides
    from transcar_tpu.core.config import get_preset
    from transcar_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from transcar_tpu.models.detector import build_model
    import __graft_entry__ as ge

    cfg = get_preset(args.preset, parse_overrides(args.cfg_options))
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    if cfg.model.lidar_encoder:
        # LiDAR-track presets time the points path (the reference's
        # benchmark.py serves obj_dgcnn configs through the same tool)
        pc = cfg.model.head.pc_range
        n_max = cfg.data.max_points
        pts = np.zeros((args.batch, n_max, 5), np.float32)
        pts[:, :, 0] = rng.uniform(pc[0], pc[3], (args.batch, n_max))
        pts[:, :, 1] = rng.uniform(pc[1], pc[4], (args.batch, n_max))
        pts[:, :, 2] = rng.uniform(pc[2], pc[5], (args.batch, n_max))
        pts[:, :, 3] = rng.uniform(0, 255, (args.batch, n_max))
        pts[:, :, 4] = rng.uniform(0, 0.45, (args.batch, n_max))
        fwd_args = (jnp.asarray(pts),
                    jnp.asarray(np.full((args.batch,), int(n_max * 0.9),
                                        np.int32)))
    else:
        batch = ge._fake_batch(rng, args.batch, cfg.model.head.num_cams,
                               args.height, args.width,
                               cfg.model.head.num_radar_tokens)
        radar = (jnp.asarray(batch["radar_tokens"])
                 if cfg.model.head.with_radar_fusion else None)
        fwd_args = (jnp.asarray(batch["images"]),
                    jnp.asarray(batch["lidar2img"]), radar)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *fwd_args)

    @jax.jit
    def infer(params, *fwd_args):
        return model.apply(params, *fwd_args)

    def sync(out):
        return float(jnp.sum(out["all_bbox_preds"][..., 0]))

    for _ in range(args.warmup):
        sync(infer(params, *fwd_args))
    import contextlib
    from transcar_tpu.utils.profiling import trace
    tracer = (trace(args.trace_dir) if args.trace_dir
              else contextlib.nullcontext())
    with tracer:
        t0 = time.perf_counter()
        for _ in range(args.samples):
            out = infer(params, *fwd_args)
        sync(out)
        dt = time.perf_counter() - t0
    sps = args.samples * args.batch / dt
    rec = {
        "preset": args.preset,
        "batch": args.batch,
        "samples_per_sec": round(sps, 3),
        "ms_per_sample": round(1000 * dt / (args.samples * args.batch), 2),
    }
    if cfg.model.lidar_encoder:
        rec["max_points"] = cfg.data.max_points
    else:
        rec["img_hw"] = [args.height, args.width]
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
