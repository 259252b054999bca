"""Static FLOPs CLI (tools/analysis_tools/get_flops.py analog).

Uses XLA's own cost analysis of the compiled forward — unlike the
reference's mmcv hook counter, this covers the full multi-modality model
(the reference explicitly can't, get_flops.py:57-60), and serves the
LiDAR presets through the points path.
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("preset", nargs="?", default="transcar_r101")
    ap.add_argument("--height", type=int, default=928)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--cfg-options", nargs="*", default=[],
                    help="dotted deep overrides, same as the train CLI")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from transcar_tpu.cli.train import parse_overrides
    from transcar_tpu.core.config import get_preset
    from transcar_tpu.models.detector import build_model

    cfg = get_preset(args.preset, parse_overrides(args.cfg_options))
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    if cfg.model.lidar_encoder:
        pc = cfg.model.head.pc_range
        n_max = cfg.data.max_points
        pts = np.zeros((1, n_max, 5), np.float32)
        pts[:, :, 0] = rng.uniform(pc[0], pc[3], (1, n_max))
        pts[:, :, 1] = rng.uniform(pc[1], pc[4], (1, n_max))
        pts[:, :, 2] = rng.uniform(pc[2], pc[5], (1, n_max))
        fwd_args = (jnp.asarray(pts),
                    jnp.asarray(np.full((1,), n_max, np.int32)))
        input_desc = [1, n_max, 5]
    else:
        batch = ge._fake_batch(rng, 1, cfg.model.head.num_cams,
                               args.height, args.width,
                               cfg.model.head.num_radar_tokens)
        radar = (jnp.asarray(batch["radar_tokens"])
                 if cfg.model.head.with_radar_fusion else None)
        fwd_args = (jnp.asarray(batch["images"]),
                    jnp.asarray(batch["lidar2img"]), radar)
        input_desc = [1, cfg.model.head.num_cams, args.height,
                      args.width, 3]
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *fwd_args))

    lowered = jax.jit(
        lambda p, *a: model.apply(p, *a)
    ).lower(params, *fwd_args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    n_params = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(params["params"]))
    print(json.dumps({
        "preset": args.preset,
        "input": input_desc,
        "gflops": round(cost.get("flops", 0.0) / 1e9, 2),
        "bytes_accessed_gb": round(
            cost.get("bytes accessed", 0.0) / 1e9, 2),
        "params_m": round(n_params / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
