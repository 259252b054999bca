"""Static FLOPs CLI (tools/analysis_tools/get_flops.py analog).

Uses XLA's own cost analysis of the compiled forward — unlike the
reference's mmcv hook counter, this covers the full multi-modality model
(the reference explicitly can't, get_flops.py:57-60).
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("preset", nargs="?", default="transcar_r101")
    ap.add_argument("--height", type=int, default=928)
    ap.add_argument("--width", type=int, default=1600)
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge
    from transcar_tpu.core.config import get_preset
    from transcar_tpu.models.detector import build_model

    cfg = get_preset(args.preset)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, 1, cfg.model.head.num_cams, args.height,
                           args.width, cfg.model.head.num_radar_tokens)
    images = jnp.asarray(batch["images"])
    l2i = jnp.asarray(batch["lidar2img"])
    radar = (jnp.asarray(batch["radar_tokens"])
             if cfg.model.head.with_radar_fusion else None)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images, l2i, radar))

    lowered = jax.jit(
        lambda p, i, l, r: model.apply(p, i, l, r)
    ).lower(params, images, l2i, radar)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    n_params = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(params["params"]))
    print(json.dumps({
        "preset": args.preset,
        "input": [1, cfg.model.head.num_cams, args.height, args.width, 3],
        "gflops": round(cost.get("flops", 0.0) / 1e9, 2),
        "bytes_accessed_gb": round(
            cost.get("bytes accessed", 0.0) / 1e9, 2),
        "params_m": round(n_params / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
