"""Train CLI (tools/train.py analog).

Usage:
    python -m transcar_tpu.cli.train <preset> [--work-dir D]
        [--load-from CKPT] [--resume-from DIR] [--seed N]
        [--max-steps N] [--cfg-options k.subkey=value ...]

Presets replace the reference's config files; --cfg-options is the deep
override (tools/train.py:59-68 analog).  Radar tokens are produced by the
input pipeline when the preset has radar fusion and nuscenes-devkit + raw
data are available.
"""
from __future__ import annotations

import argparse
import os


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        out[k] = v
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("preset")
    ap.add_argument("--work-dir")
    ap.add_argument("--load-from")
    ap.add_argument("--resume-from")
    ap.add_argument("--seed", type=int)
    ap.add_argument("--max-steps", type=int)
    ap.add_argument("--autoscale-lr", action="store_true",
                    help="linear LR scaling by device count / 8 "
                         "(tools/train.py:148-150; arXiv:1706.02677)")
    ap.add_argument("--no-validate", action="store_true",
                    help="disable the mid-training eval hook "
                         "(tools/train.py:44-46 analog)")
    ap.add_argument("--eval-samples", type=int,
                    help="bound each mid-training val pass to N samples")
    ap.add_argument("--trace-dir",
                    help="capture a jax.profiler trace of a few "
                         "steady-state train steps into this directory "
                         "(view with TensorBoard/xprof; SURVEY §5 tracing)")
    ap.add_argument("--trace-steps", type=int, default=3,
                    help="steps to include in the --trace-dir capture")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args(argv)

    from transcar_tpu.core.config import get_preset
    from transcar_tpu.parallel.distributed import (
        maybe_initialize_distributed)
    from transcar_tpu.utils.compile_cache import enable_persistent_cache

    # persist compiled executables across processes (full-model XLA
    # compiles run minutes; preemption-resumed runs recompile for free)
    enable_persistent_cache()

    # multi-host: connect the process group before any jax backend use
    # (tools/train.py:153-160 init_dist analog; no-op single host)
    maybe_initialize_distributed()
    overrides = parse_overrides(args.cfg_options)
    if args.work_dir:
        overrides["train.work_dir"] = args.work_dir
    else:
        overrides.setdefault("train.work_dir", f"work_dirs/{args.preset}")
    if args.load_from:
        # fail fast: model init takes minutes at full resolution; a typo'd
        # path should not cost that
        if not os.path.exists(args.load_from):
            ap.error(f"--load-from path does not exist: {args.load_from}")
        overrides["train.load_from"] = args.load_from
    if args.resume_from:
        if not os.path.exists(args.resume_from):
            ap.error(f"--resume-from path does not exist: "
                     f"{args.resume_from}")
        overrides["train.resume_from"] = args.resume_from
    if args.seed is not None:
        overrides["train.seed"] = args.seed
    if args.no_validate:
        overrides["train.eval_interval_epochs"] = "0"
    cfg = get_preset(args.preset, overrides)
    if args.autoscale_lr:
        # linear scaling rule against the reference's 8-GPU schedule
        # (tools/train.py:148-150); device count = the global data mesh
        import dataclasses

        import jax

        scale = jax.device_count() / 8.0
        optim = dataclasses.replace(cfg.train.optim,
                                    lr=cfg.train.optim.lr * scale)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, optim=optim))
        print(f"autoscale-lr: {jax.device_count()} devices → "
              f"lr {optim.lr:.2e}")

    radar_fn = None
    if cfg.model.head.with_radar_fusion:
        radar_fn = _try_radar_fn(cfg)

    from transcar_tpu.train.loop import train
    train(cfg, radar_fn=radar_fn, max_steps=args.max_steps,
          eval_samples=args.eval_samples, trace_dir=args.trace_dir,
          trace_steps=args.trace_steps)


def _try_radar_fn(cfg):
    """Radar token provider: devkit-free ingestion (data/radar_io.py
    tables + .pcd reader; C++ featurizer when built) with an on-disk
    per-sample cache — tokens are deterministic given the sample, so
    they are computed once per dataset, not per epoch (vs the
    reference's per-step devkit file IO, detr3d_head.py:301-536)."""
    try:
        import os

        import numpy as np
        from transcar_tpu.data.radar import (empty_radar_tokens,
                                             load_radar_tokens)
        from transcar_tpu.data.radar_io import NuScenesTables

        nusc = NuScenesTables(cfg.data.data_root,
                              version=cfg.data.version)
        # fail fast here (not inside the loader workers) when the raw
        # tables are absent — triggers the sentinel-buffer fallback
        nusc.tokens("sample")
        cache_dir = os.path.join(cfg.data.data_root, "radar_token_cache",
                                 f"{cfg.data.radar_sweeps}sweep_"
                                 f"{cfg.model.head.num_radar_tokens}")
        os.makedirs(cache_dir, exist_ok=True)

        warned = set()

        def radar_fn(token):
            path = os.path.join(cache_dir, f"{token}.npy")
            if os.path.exists(path):
                return np.load(path)
            try:
                tokens = load_radar_tokens(
                    nusc, token, nsweeps=cfg.data.radar_sweeps,
                    num_tokens=cfg.model.head.num_radar_tokens)
            except Exception as e:   # token absent from tables / bad .pcd
                if type(e).__name__ not in warned:
                    warned.add(type(e).__name__)
                    print(f"[train] radar ingestion failed for sample "
                          f"{token} ({type(e).__name__}: {e}); feeding "
                          "the sentinel buffer for such samples")
                return empty_radar_tokens(cfg.model.head.num_radar_tokens)
            np.save(path, tokens)
            return tokens

        return radar_fn
    except Exception as e:          # devkit or raw data unavailable
        from transcar_tpu.data.radar import empty_radar_tokens
        print(f"[train] radar pipeline unavailable ({e}); feeding the "
              "all-sentinel radar buffer (queries see no radar tokens)")
        return lambda token: empty_radar_tokens(
            cfg.model.head.num_radar_tokens)


if __name__ == "__main__":
    main()
