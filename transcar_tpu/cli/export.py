"""Export CLI: serialize the jitted inference step to a portable
StableHLO artifact (``jax.export``).

No reference analog — mmdetection3d deploys through torch checkpoints +
the python stack.  A TPU-native production framework wants a
runtime-loadable serving artifact: this serializes the WHOLE inference
step (backbone → FPN → head → NMS-free decode, the same jitted function
``evaluate()`` runs) with parameters as call arguments, so one artifact
serves any checkpoint with the matching tree.

Usage:
    python -m transcar_tpu.cli.export <preset> --out model.stablehlo \
        [--batch-size B] [--platform cpu|tpu] [--cfg-options ...]

Serving side:
    from jax import export
    exp = export.deserialize(open("model.stablehlo", "rb").read())
    out = exp.call(params, batch)            # boxes/scores/labels/valid

Parameters are pytree ARGUMENTS (only shapes/dtypes are baked), so fold
the checkpoint's frozen BN first exactly like ``evaluate()`` does
(``train.fold.fold_bn_into_conv`` — shape-preserving) or pass
``--no-fold-bn`` here to export the unfolded calling convention.
A ``.json`` sidecar records the expected input/output trees.
"""
from __future__ import annotations

import argparse
import json


def build_specs(cfg, batch_size: int):
    """(params_spec, batch_spec, batch_stats_spec|None) as
    ShapeDtypeStructs — the exported calling convention."""
    import jax
    import numpy as np

    from transcar_tpu.models.detector import build_model

    model = build_model(cfg)
    if cfg.model.lidar_encoder:
        points = np.zeros((batch_size, cfg.data.max_points, 5), np.float32)
        npts = np.zeros((batch_size,), np.int32)
        var_spec = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), points, npts))
        batch = {"points": jax.ShapeDtypeStruct(points.shape, points.dtype),
                 "num_points": jax.ShapeDtypeStruct(npts.shape, npts.dtype)}
        bs_spec = var_spec.get("batch_stats")
    else:
        h, w = cfg.data.img_hw
        n = cfg.model.head.num_cams
        images = jax.ShapeDtypeStruct((batch_size, n, h, w, 3), "float32")
        l2i = jax.ShapeDtypeStruct((batch_size, n, 4, 4), "float32")
        var_spec = jax.eval_shape(
            lambda: build_model(cfg).init(
                jax.random.PRNGKey(0),
                jax.numpy.zeros(images.shape, images.dtype),
                jax.numpy.zeros(l2i.shape, l2i.dtype),
                (jax.numpy.zeros(
                    (batch_size, cfg.model.head.num_radar_tokens, 36),
                    "float32")
                 if cfg.model.head.with_radar_fusion else None)))
        batch = {"images": images, "lidar2img": l2i}
        if cfg.model.head.with_radar_fusion:
            batch["radar_tokens"] = jax.ShapeDtypeStruct(
                (batch_size, cfg.model.head.num_radar_tokens, 36),
                "float32")
        bs_spec = None
    return model, var_spec["params"], batch, bs_spec


def export_eval_step(cfg, batch_size: int = 1, platform: str | None = None):
    """Returns (Exported, sidecar_dict)."""
    import jax
    from jax import export as jexport

    from transcar_tpu.train.step import make_eval_step

    model, params_spec, batch_spec, bs_spec = build_specs(cfg, batch_size)
    eval_step = make_eval_step(cfg, model)   # jitted inference + decode

    platforms = [platform] if platform else None
    if bs_spec is not None:
        exp = jexport.export(eval_step, platforms=platforms)(
            params_spec, batch_spec, bs_spec)
    else:
        exp = jexport.export(eval_step, platforms=platforms)(
            params_spec, batch_spec)

    def tree_doc(t):
        return jax.tree_util.tree_map(
            lambda x: f"{jax.numpy.dtype(x.dtype).name}{list(x.shape)}", t)

    sidecar = {
        "preset": cfg.name,
        "platforms": list(exp.platforms),
        "batch": tree_doc(batch_spec),
        "outputs": tree_doc(jax.eval_shape(
            eval_step, params_spec, batch_spec,
            *([bs_spec] if bs_spec is not None else []))),
        "takes_batch_stats": bs_spec is not None,
        "params": "same tree as checkpoint (fold_bn_into_conv first "
                  "unless exported with --no-fold-bn)",
    }
    return exp, sidecar


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("preset")
    ap.add_argument("--out", required=True,
                    help="output artifact path (.stablehlo)")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--platform", choices=["cpu", "tpu", "cuda"],
                    help="lowering platform (default: current backend)")
    ap.add_argument("--no-fold-bn", action="store_true",
                    help="documented calling convention only: export "
                         "assumes UNfolded params (fold is "
                         "shape-preserving, so the artifact is identical;"
                         " the sidecar records the convention)")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args(argv)

    from transcar_tpu.cli.train import parse_overrides
    from transcar_tpu.core.config import get_preset

    cfg = get_preset(args.preset, parse_overrides(args.cfg_options))
    exp, sidecar = export_eval_step(cfg, batch_size=args.batch_size,
                                    platform=args.platform)
    sidecar["params"] = (sidecar["params"] if not args.no_fold_bn
                         else "same tree as checkpoint (unfolded)")
    with open(args.out, "wb") as f:
        f.write(exp.serialize())
    with open(args.out + ".json", "w") as f:
        json.dump(sidecar, f, indent=1)
    print(f"exported {args.preset} (platforms {sidecar['platforms']}) "
          f"to {args.out}")


if __name__ == "__main__":
    main()
