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
    batch = ge._fake_batch(rng, args.batch, cfg.model.head.num_cams,
                           args.height, args.width,
                           cfg.model.head.num_radar_tokens)
    images = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    radar = (jnp.asarray(batch["radar_tokens"])
             if cfg.model.head.with_radar_fusion else None)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, l2i, radar)

    @jax.jit
    def infer(params, images, l2i, radar):
        return model.apply(params, images, l2i, radar)

    def sync(out):
        return float(jnp.sum(out["all_bbox_preds"][..., 0]))

    for _ in range(args.warmup):
        sync(infer(params, images, l2i, radar))
    import contextlib
    from transcar_tpu.utils.profiling import trace
    tracer = (trace(args.trace_dir) if args.trace_dir
              else contextlib.nullcontext())
    with tracer:
        t0 = time.perf_counter()
        for _ in range(args.samples):
            out = infer(params, images, l2i, radar)
        sync(out)
        dt = time.perf_counter() - t0
    sps = args.samples * args.batch / dt
    print(json.dumps({
        "preset": args.preset,
        "batch": args.batch,
        "img_hw": [args.height, args.width],
        "samples_per_sec": round(sps, 3),
        "ms_per_sample": round(1000 * dt / (args.samples * args.batch), 2),
    }))


if __name__ == "__main__":
    main()
