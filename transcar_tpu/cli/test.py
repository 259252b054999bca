"""Eval CLI (tools/test.py analog).

Usage:
    python -m transcar_tpu.cli.test <preset> <checkpoint>
        [--format-only] [--eval bbox] [--out results.json]
        [--max-samples N] [--cfg-options ...]

Checkpoint may be an orbax params dir or a reference torch .pth (converted
on load).  --eval bbox runs the devkit DetectionEval when available.
"""
from __future__ import annotations

import argparse
import os

from transcar_tpu.cli.train import parse_overrides, _try_radar_fn


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("preset")
    ap.add_argument("checkpoint")
    ap.add_argument("--format-only", action="store_true")
    ap.add_argument("--eval", dest="eval_metric", nargs="?", const="bbox")
    ap.add_argument("--out")
    ap.add_argument("--max-samples", type=int)
    ap.add_argument("--show-dir",
                    help="render BEV PNGs of the predictions into this "
                         "directory (tools/test.py:43-45 analog, headless)")
    ap.add_argument("--batch-size", type=int, default=1,
                    help="inference batch size (samples_per_gpu analog, "
                         "tools/test.py:183-189); the tail batch is padded "
                         "and padded rows dropped, so results match bs=1")
    ap.add_argument("--fuse-conv-bn", action="store_true",
                    help="precompute frozen-BN affines before inference "
                         "(tools/test.py:27-30 analog; kernel-level fusion "
                         "is the eval default — see --no-fold-bn)")
    ap.add_argument("--no-fold-bn", action="store_true",
                    help="disable the default conv-BN kernel fold at eval "
                         "(bit-exact unfolded numerics)")
    ap.add_argument("--shard-cameras", action="store_true",
                    help="camera-axis model parallelism: run the 6 camera "
                         "streams on separate chips through backbone+FPN "
                         "(batch-1 latency lever data parallelism doesn't "
                         "have; output-identical, camera track only)")
    ap.add_argument("--aug-test", nargs="?", const="identity,flip",
                    help="test-time augmentation: comma list from "
                         "{identity, flip}; features are averaged over "
                         "the augmented copies before the head "
                         "(reference aug_test, detr3d.py:195-219). "
                         "Bare flag = 'identity,flip'")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args(argv)

    import jax
    from transcar_tpu.core.config import get_preset
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.parallel.distributed import (
        maybe_initialize_distributed)
    from transcar_tpu.train.loop import _load_params, evaluate
    from transcar_tpu.utils.compile_cache import enable_persistent_cache

    # must run before anything touches a jax backend (orbax restore below)
    maybe_initialize_distributed()
    enable_persistent_cache()
    cfg = get_preset(args.preset, parse_overrides(args.cfg_options))

    # materialize a params template, then load the checkpoint over it
    import numpy as np
    model = build_model(cfg)
    if cfg.model.lidar_encoder:
        points = np.zeros((1, cfg.data.max_points, 5), np.float32)
        npts = np.zeros((1,), np.int32)
        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), points, npts)
        )["params"]
    else:
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
    if args.fuse_conv_bn:
        from transcar_tpu.train.fold import fold_frozen_bn
        params = fold_frozen_bn(params)

    radar_fn = (_try_radar_fn(cfg)
                if cfg.model.head.with_radar_fusion else None)
    from transcar_tpu.train.checkpoint import load_batch_stats
    batch_stats = load_batch_stats(args.checkpoint) or None
    if cfg.model.lidar_encoder and batch_stats is None:
        ap.error(
            f"checkpoint {args.checkpoint!r} carries no batch_stats, but "
            f"the LiDAR track's BatchNorms need running statistics for "
            f"inference — evaluate from a training checkpoint dir (the "
            f"step dirs under work_dir/checkpoints save them)")
    out_path = evaluate(cfg, params, radar_fn=radar_fn,
                        max_samples=args.max_samples, out_path=args.out,
                        batch_stats=batch_stats,
                        batch_size=args.batch_size,
                        fold_bn=not args.no_fold_bn,
                        shard_cameras=args.shard_cameras,
                        aug_test=(args.aug_test.split(",")
                                  if args.aug_test else None))
    # only rank 0 writes the submission (train/loop.py evaluate);
    # post-processing of the file is rank-0 work too
    if jax.process_index() != 0:
        return
    print(f"results written to {out_path}")

    if args.show_dir:
        from transcar_tpu.eval.bev_plot import render_submission
        render_submission(out_path, args.show_dir)

    if args.eval_metric:
        metrics = None
        try:    # devkit DetectionEval when raw data is on disk
            from transcar_tpu.eval.submission import evaluate_nuscenes
            metrics = evaluate_nuscenes(out_path, cfg.data.data_root,
                                        version=cfg.data.version)
            print("metrics source: nuscenes-devkit")
        except (ImportError, FileNotFoundError) as e:
            # genuinely unavailable (no devkit / no raw data on disk)
            print(f"devkit unavailable ({type(e).__name__}: {e}); "
                  f"using the native evaluator")
        except Exception as e:
            # the devkit IS present but evaluation failed (bad
            # submission, wrong split/version) — surface the real error
            # before falling back so it can't be mistaken for a
            # missing-devkit environment
            print(f"devkit evaluation FAILED ({type(e).__name__}: {e}); "
                  f"falling back to the native evaluator")
        if metrics is None:
            # native evaluator (eval/metrics.py): same metric pipeline
            # computed from the infos pkl alone
            from transcar_tpu.eval.metrics import evaluate_native
            metrics = evaluate_native(
                out_path, ann_file=os.path.join(cfg.data.data_root,
                                                cfg.data.ann_val))
        for k, v in metrics.items():
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
