"""Training loop: epochs, logging, eval hook, checkpointing.

EpochBasedRunner analog (SURVEY.md §2.6): 24 epochs, json+text logging
compatible with the log-analysis CLI, EvalHook every N epochs, checkpoint
hook every epoch, warm-start / resume.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from transcar_tpu.core.config import TransCARConfig, config_to_dict
from transcar_tpu.data.infos import NuScenesInfos, cbgs_indices
from transcar_tpu.data.loader import PrefetchLoader
from transcar_tpu.eval.submission import (detections_to_nusc_annos,
                                          write_submission)
from transcar_tpu.models.detector import build_model
from transcar_tpu.parallel.distributed import (allgather_eval_outputs,
                                               maybe_initialize_distributed)
from transcar_tpu.parallel.mesh import make_mesh, shard_batch
from transcar_tpu.train import checkpoint as ckpt
from transcar_tpu.train.optim import lr_schedule
from transcar_tpu.train.step import (TrainState, init_state, make_eval_step,
                                     make_train_step)


class JsonLogger:
    """mmcv-style json-line logger (work_dirs/<name>/<ts>.log.json) — the
    format tools/analysis_tools/analyze_logs.py parses.  ``enabled=False``
    (non-zero ranks in a multi-host run) makes it a no-op."""

    def __init__(self, work_dir: str, enabled: bool = True):
        self.enabled = enabled
        if not enabled:
            self.path = None
            return
        os.makedirs(work_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S")
        self.path = os.path.join(work_dir, f"{stamp}.log.json")

    def log(self, record: Dict):
        if not self.enabled:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        mode = record.get("mode", "")
        human = ", ".join(f"{k}: {v}" for k, v in record.items()
                          if k not in ("mode",))
        print(f"[{mode}] {human}", flush=True)


def train(cfg: TransCARConfig,
          radar_fn: Optional[Callable[[str], np.ndarray]] = None,
          max_steps: Optional[int] = None,
          log_interval: int = 50,
          eval_samples: Optional[int] = None,
          trace_dir: Optional[str] = None,
          trace_start: int = 8,
          trace_steps: int = 3) -> TrainState:
    """Full training run driven by a config (tools/train.py analog).

    Mid-training evaluation (EvalHook analog — the reference evaluates
    every 2 epochs, detr3d_res101_gridmask.py:223 via mmdet3d
    train_model, tools/train.py:253-260): every
    ``cfg.train.eval_interval_epochs`` epochs and after the final epoch,
    the val split runs through the current params, the submission json is
    written under work_dir, devkit metrics (when the raw dataset is
    present) land in a ``mode="val"`` json-log record that
    cli/analyze_logs can parse.  ``eval_interval_epochs <= 0`` disables
    the hook.  ``eval_samples`` bounds the val pass (tests/smoke runs).

    ``trace_dir`` captures a ``jax.profiler`` trace of
    ``trace_steps`` steady-state steps (global step index
    ``trace_start`` onward, past warmup/compile) — the SURVEY §5
    tracing subsystem on the training path; rank 0 only.

    Multi-host: when jax.distributed env is set (tools/dist_train.sh),
    every host runs this function; the mesh spans the global device set,
    the loader feeds each host its slice of the global batch, and rank 0
    owns logging/manifest writes (init_dist + DDP analog,
    tools/train.py:153-160)."""
    pi, pc = maybe_initialize_distributed()
    work_dir = cfg.train.work_dir
    os.makedirs(work_dir, exist_ok=True)
    logger = JsonLogger(work_dir, enabled=pi == 0)
    # dump-on-run manifest (train.py:165 analog)
    if pi == 0:
        with open(os.path.join(work_dir, "config.json"), "w") as f:
            json.dump(config_to_dict(cfg), f, indent=2)

    dataset = NuScenesInfos(
        os.path.join(cfg.data.data_root, cfg.data.ann_train),
        class_names=cfg.data.class_names, data_root=cfg.data.data_root)
    indices = cbgs_indices(dataset) if cfg.data.use_cbgs else None

    devices = jax.devices()      # global device set under jax.distributed
    if pc > 1:
        # multi-host: the mesh MUST span every host's devices — a mesh
        # over a prefix would leave other processes with no addressable
        # shard of the global arrays (DDP analog: one group over all
        # ranks).  mesh_shape stays a single-host knob.
        mesh_n = len(devices)
    else:
        mesh_n = min(int(np.prod(cfg.train.mesh_shape)), len(devices))
    mesh = make_mesh((mesh_n,), ("data",), devices[:mesh_n])
    batch_size = cfg.data.samples_per_device * mesh_n

    modality = "lidar" if cfg.model.lidar_encoder else "camera"
    loader = PrefetchLoader(dataset, cfg.data, batch_size, training=True,
                            indices=indices, radar_fn=radar_fn,
                            seed=cfg.train.seed,
                            process_index=pi, process_count=pc,
                            modality=modality)
    steps_per_epoch = max(len(loader), 1)
    total_steps = steps_per_epoch * cfg.train.optim.total_epochs
    if max_steps is not None:
        total_steps = min(total_steps, max_steps)

    model = build_model(cfg, training=True)
    sample_batch = next(iter(loader.epoch(0)))
    state, tx = init_state(cfg, model, sample_batch, total_steps,
                           jax.random.PRNGKey(cfg.train.seed))

    if cfg.train.load_from:
        params = _load_params(cfg.train.load_from, cfg, state.params)
        state = state._replace(params=params)
    start_epoch = 0
    if cfg.train.resume_from:
        state, step = ckpt.restore_checkpoint(cfg.train.resume_from, state)
        start_epoch = int(step) // steps_per_epoch

    train_step = make_train_step(cfg, model, tx, mesh=mesh)
    sched = lr_schedule(cfg.train.optim, total_steps)
    rng = jax.random.PRNGKey(cfg.train.seed + 1)

    # preemption handling (SURVEY.md §5 failure detection — the reference
    # has none; we checkpoint on SIGTERM/SIGINT before exiting)
    import signal

    preempted = {"flag": False}

    def _on_signal(signum, frame):
        preempted["flag"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except ValueError:
            pass    # not on the main thread

    def save(state):
        # multi-host: every process participates (orbax coordinates its
        # own barriers and primary-host writes); the replicated state is
        # pulled to host numpy first so no cross-host array resharding is
        # needed at write time
        host = state if pc == 1 else jax.tree_util.tree_map(
            np.asarray, state)
        ckpt.save_checkpoint(work_dir, int(state.step), host,
                             config_dict=config_to_dict(cfg))

    # EvalHook context — built lazily at the first val pass so the jitted
    # eval step and val dataset are reused across epochs (one compile)
    eval_ctx: Dict[str, object] = {}

    def run_val(epoch: int, state: TrainState):
        t0 = time.time()
        if not eval_ctx:
            eval_ctx["dataset"] = NuScenesInfos(
                os.path.join(cfg.data.data_root, cfg.data.ann_val),
                class_names=cfg.data.class_names, test_mode=True,
                data_root=cfg.data.data_root)
            eval_ctx["step"] = make_eval_step(cfg, build_model(cfg))
        result_path = evaluate(
            cfg, state.params, radar_fn=radar_fn,
            max_samples=eval_samples,
            out_path=os.path.join(work_dir,
                                  f"val_epoch{epoch + 1}_nusc.json"),
            batch_stats=state.batch_stats or None,
            _eval_step=eval_ctx["step"], _dataset=eval_ctx["dataset"])
        rec = {"mode": "val", "epoch": epoch + 1, "iter": len(loader),
               "time": round(time.time() - t0, 4)}
        if pi == 0:
            try:    # devkit mAP/NDS when the raw dataset is available
                from transcar_tpu.eval.submission import evaluate_nuscenes
                rec.update({k: round(float(v), 4) for k, v in
                            evaluate_nuscenes(
                                result_path, cfg.data.data_root,
                                version=cfg.data.version).items()})
                rec["metrics_source"] = "devkit"
            except Exception as e:
                rec["devkit"] = f"unavailable: {type(e).__name__}"
                # native evaluator: same metric pipeline from the infos
                # pkl alone (eval/metrics.py), no raw dataset needed
                val_infos = eval_ctx["dataset"].infos
                if any("gt_boxes" in i for i in val_infos):
                    # guard the fallback too — a metric failure must not
                    # abort a training run at a periodic eval hook
                    try:
                        from transcar_tpu.eval.metrics import (
                            evaluate_native)
                        rec.update({k: round(float(v), 4) for k, v in
                                    evaluate_native(
                                        result_path,
                                        infos=val_infos).items()})
                        rec["metrics_source"] = "native"
                    except Exception as e2:
                        rec["native"] = (f"failed: {type(e2).__name__}: "
                                         f"{e2}")
        logger.log(rec)

    # profiler-trace window (rank 0): [trace_start, trace_start+trace_steps)
    # counted in steps SINCE THIS PROCESS STARTED (a resumed run's global
    # step is already past the window, but its first local steps are the
    # cold-compile ones the window exists to skip)
    tracing = {"on": False, "done": trace_dir is None or pi != 0,
               "local": 0}

    def trace_tick(state):
        if tracing["done"]:
            return
        gstep = tracing["local"]
        tracing["local"] += 1
        if not tracing["on"] and gstep >= trace_start:
            # drain queued work so the trace holds only steady-state steps
            int(jax.device_get(state.step))
            jax.profiler.start_trace(trace_dir)
            tracing["on"] = True
        elif tracing["on"] and gstep >= trace_start + trace_steps:
            int(jax.device_get(state.step))
            jax.profiler.stop_trace()
            tracing["on"] = False
            tracing["done"] = True

    done = False
    for epoch in range(start_epoch, cfg.train.optim.total_epochs):
        t_iter = time.time()
        for i, batch in enumerate(loader.epoch(epoch)):
            trace_tick(state)
            sharded = shard_batch(batch, mesh)
            state, losses = train_step(state, sharded, rng)
            if (i + 1) % log_interval == 0:
                step = int(state.step)
                rec = {"mode": "train", "epoch": epoch + 1, "iter": i + 1,
                       "lr": float(sched(step)),
                       "time": round((time.time() - t_iter) / log_interval,
                                     4)}
                rec.update({k: round(float(v), 4) for k, v in losses.items()})
                logger.log(rec)
                t_iter = time.time()
            if preempted["flag"]:
                if tracing["on"]:
                    jax.profiler.stop_trace()
                    tracing["on"] = False
                save(state)
                logger.log({"mode": "train", "epoch": epoch + 1,
                            "preempted": True, "step": int(state.step)})
                return state
            if max_steps is not None and int(state.step) >= max_steps:
                done = True
                break
        if (epoch + 1) % cfg.train.checkpoint_interval_epochs == 0 or done:
            save(state)
        ei = cfg.train.eval_interval_epochs
        last = (epoch + 1 == cfg.train.optim.total_epochs) or done
        if ei > 0 and ((epoch + 1) % ei == 0 or last):
            run_val(epoch, state)
        if done:
            break
    if tracing["on"]:        # run shorter than the trace window
        jax.profiler.stop_trace()
    return state


def evaluate(cfg: TransCARConfig, params,
             radar_fn: Optional[Callable[[str], np.ndarray]] = None,
             max_samples: Optional[int] = None,
             out_path: Optional[str] = None,
             batch_stats=None,
             batch_size: int = 1,
             fold_bn: bool = True,
             shard_cameras: bool = False,
             aug_test: Optional[Sequence[str]] = None,
             _eval_step=None,
             _dataset=None) -> str:
    """Inference over the val set → nuScenes submission json
    (tools/test.py --format-only analog).  Devkit metrics via
    eval.submission.evaluate_nuscenes when raw data is present.

    ``batch_size`` > 1 batches inference (samples_per_gpu analog,
    tools/test.py:183-189): the index list is padded to a batch multiple
    by repeating the first sample and padded rows are dropped before
    formatting, so outputs are identical to the bs=1 path.

    ``fold_bn`` folds frozen-BN scales into adjacent conv kernels before
    inference (fuse_conv_bn at eval-model build; tools/misc/
    fuse_conv_bn.py:10-24 semantics — disable for bit-exact unfolded
    numerics).

    ``shard_cameras`` enables camera-axis model parallelism for
    low-latency single-process serving: the 6 independent camera streams
    run on separate chips through backbone+FPN and XLA all-gathers the
    FPN features for the head (parallel/mesh.py::camera_mesh).  Data
    parallelism cannot cut batch-1 latency; this can.  Output-identical
    to the unsharded path (per-camera convs are untouched; the gather is
    a concatenation).  Best used with ``batch_size=1``; no-op on a
    single device and unsupported for the LiDAR track.

    ``aug_test`` (e.g. ``("identity", "flip")``) enables test-time
    augmentation: backbone+FPN features averaged over the augmented
    copies, head run once (reference ``aug_test``, detr3d.py:195-219;
    see train/step.py::make_aug_eval_step).

    Multi-host: samples strided across processes, decoded fixed-shape
    outputs allgathered, rank 0 formats and writes (multi_gpu_test +
    collect analog, tools/test.py:218-223).

    ``_eval_step``/``_dataset`` let the in-training eval hook reuse one
    jitted step + dataset across epochs instead of recompiling."""
    pi, pc = maybe_initialize_distributed()
    dataset = _dataset if _dataset is not None else NuScenesInfos(
        os.path.join(cfg.data.data_root, cfg.data.ann_val),
        class_names=cfg.data.class_names, test_mode=True,
        data_root=cfg.data.data_root)
    if _eval_step is not None:
        eval_step = _eval_step
    elif aug_test:
        if cfg.model.lidar_encoder:
            raise ValueError("--aug-test is camera-track only")
        from transcar_tpu.train.step import make_aug_eval_step
        eval_step = make_aug_eval_step(cfg, build_model(cfg),
                                       tuple(aug_test))
    else:
        model = build_model(cfg)
        eval_step = make_eval_step(cfg, model)
    if fold_bn:
        from transcar_tpu.train.fold import fold_bn_into_conv
        params = fold_bn_into_conv(params)
    cam_mesh = None
    if shard_cameras and not cfg.model.lidar_encoder and pc == 1:
        from transcar_tpu.parallel.mesh import camera_mesh, replicated
        mesh = camera_mesh(cfg.model.head.num_cams)
        if mesh.devices.size > 1:
            cam_mesh = mesh
            params = jax.device_put(params, replicated(cam_mesh))
            if batch_stats:
                batch_stats = jax.device_put(batch_stats,
                                             replicated(cam_mesh))
    if cam_mesh is None:
        # Commit HOST-NUMPY leaves to device ONCE.  fold_bn_into_conv
        # (and checkpoint loading) leave host-numpy leaves, and jit
        # re-uploads host-numpy arguments on EVERY call — a silent
        # full-param-tree (~240 MB for R101) host→device transfer per
        # eval step (measured ~4.5 s of the 5.26 s/sample e2e cost;
        # docs/PERF_NOTES.md serving section).  Leaves that are already
        # jax.Arrays stay untouched: under multi-host training they are
        # GLOBAL (non-addressable) arrays a plain device_put rejects
        # (found by tests/test_distributed.py's mid-training eval hook).
        def _commit(tree):
            return jax.tree_util.tree_map(
                lambda l: l if isinstance(l, jax.Array)
                else jnp.asarray(l), tree)

        params = _commit(params)
        if batch_stats:
            batch_stats = _commit(batch_stats)
    n = len(dataset) if max_samples is None else min(max_samples,
                                                     len(dataset))
    my_indices = np.arange(n)[pi::pc]
    n_real = len(my_indices)
    pad = (-n_real) % batch_size if n_real else 0
    padded = (np.concatenate([my_indices, np.repeat(my_indices[:1], pad)])
              if pad else my_indices)
    loader = PrefetchLoader(
        dataset, cfg.data, batch_size=batch_size, training=False,
        indices=padded, radar_fn=radar_fn,
        modality="lidar" if cfg.model.lidar_encoder else "camera")
    local = {"boxes": [], "scores": [], "labels": [], "valid": [],
             "sample_idx": []}

    def _collect(bidx, out):
        # device→host pull happens HERE, one batch behind the dispatch
        out = {k: np.asarray(v) for k, v in out.items()}
        for row in range(batch_size):
            pos = bidx * batch_size + row
            if pos >= n_real:       # padded tail rows
                continue
            local["boxes"].append(out["boxes"][row])
            local["scores"].append(out["scores"][row])
            local["labels"].append(out["labels"][row])
            local["valid"].append(out["valid"][row])
            local["sample_idx"].append(np.int32(my_indices[pos]))

    # Two-deep software pipeline with double-buffered input upload: jax
    # dispatch and host→device transfers are async, so (a) the explicit
    # device_put starts batch i+1's (uint8, ~27 MB/sample) wire transfer
    # while batch i computes instead of serializing it into the next
    # dispatch, and (b) holding TWO dispatched batches before pulling
    # outputs keeps the device busy through the host-side
    # fetch/convert/append of the oldest — steady-state e2e cost is
    # max(wire, step) + decode, not their sum.  The reference's
    # single_gpu_test is fully serial (tools/test.py:214).
    from collections import deque
    pending = deque()
    for bidx, batch in enumerate(loader.epoch(0)):
        if cam_mesh is not None:
            from transcar_tpu.parallel.mesh import shard_batch_cameras
            batch = shard_batch_cameras(batch, cam_mesh)
        elif "images" in batch:
            # double-buffer ONLY the wire-dominant leaf: per-leaf puts
            # cost a round trip each through the relay (~30 ms/leaf,
            # probe_eval_phases), so the small leaves ride the dispatch
            batch = dict(batch)
            batch["images"] = jax.device_put(batch["images"])
        out = eval_step(params, batch, batch_stats)
        pending.append((bidx, out))
        if len(pending) > 2:
            _collect(*pending.popleft())
    while pending:
        _collect(*pending.popleft())
    n_local = len(local["sample_idx"])
    stacked = {k: np.stack(v) if n_local else np.zeros(
        (0,) + _eval_leaf_shape(k, cfg), _eval_leaf_dtype(k))
        for k, v in local.items()}
    gathered, _ = allgather_eval_outputs(stacked, n_local)

    out_path = out_path or os.path.join(cfg.train.work_dir,
                                        "results_nusc.json")
    if pi == 0:
        results: Dict[str, list] = {}
        for row in range(len(gathered["sample_idx"])):
            info = dataset.infos[int(gathered["sample_idx"][row])]
            results[info["token"]] = detections_to_nusc_annos(
                gathered["boxes"][row], gathered["scores"][row],
                gathered["labels"][row], gathered["valid"][row],
                info, cfg.data.class_names)
        write_submission(results, out_path)
    return out_path


def _eval_leaf_shape(key: str, cfg: TransCARConfig):
    k = cfg.model.head.max_detections
    return {"boxes": (k, 9), "scores": (k,), "labels": (k,),
            "valid": (k,), "sample_idx": ()}[key]


def _eval_leaf_dtype(key: str):
    # zero-sample ranks must agree with contributing ranks on dtype or
    # the cross-process allgather programs mismatch
    return {"boxes": np.float32, "scores": np.float32,
            "labels": np.int32, "valid": bool,
            "sample_idx": np.int32}[key]


def _merge_over_template(template, loaded, _prefix="", _filled=None):
    """Overlay a (possibly partial) converted param dict onto a freshly
    initialized template: any leaf/subtree absent from ``loaded`` — e.g.
    fusion/radar/final_* heads when warm-starting TransCAR from a
    camera-only DETR3D checkpoint (README.md:13, tools/train.py:238-252) —
    keeps its template init.  Returns (params, list-of-kept paths)."""
    if _filled is None:
        _filled = []
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            sub = loaded.get(k) if isinstance(loaded, dict) else None
            out[k] = _merge_over_template(v, sub, f"{_prefix}{k}/", _filled)
        return (out, _filled) if _prefix == "" else out
    if loaded is None or (hasattr(loaded, "shape")
                          and tuple(loaded.shape) != tuple(template.shape)):
        _filled.append(_prefix.rstrip("/"))
        return template
    return np.asarray(loaded).astype(template.dtype)


def _load_params(path: str, cfg: TransCARConfig, params_template):
    """Warm start from an orbax dir or a torch .pth checkpoint."""
    if path.endswith((".pth", ".pt")):
        from transcar_tpu.train.convert import (convert_detr3d_checkpoint,
                                                load_torch_state_dict)
        sd = load_torch_state_dict(path)
        params, report = convert_detr3d_checkpoint(
            sd,
            num_decoder_layers=cfg.model.head.num_decoder_layers,
            backbone=cfg.model.backbone.kind,
            with_dcn=cfg.model.backbone.with_dcn,
            with_radar_fusion=cfg.model.head.with_radar_fusion)
        if report["missing"]:
            print(f"[load_from] {len(report['missing'])} missing keys, e.g. "
                  f"{report['missing'][:3]}")
        merged, kept = _merge_over_template(params_template, params)
        if kept:
            print(f"[load_from] {len(kept)} params kept at fresh init "
                  f"(absent from checkpoint), e.g. {kept[:3]}")
        return merged
    return ckpt.load_params_only(path, params_template)
