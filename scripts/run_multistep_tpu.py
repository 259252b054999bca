"""Multi-step REAL-CHIP training runs — VERDICT r4 item 4.

Round 4 hardware-verified single LiDAR train steps (finite loss, no
fault); this runs 40 consecutive steps for (a) the camera flagship in
the reference's production recipe (fusion-only, frozen camera branch,
tools/train.py:238-252) and (b) ObjDGCNN pillar + voxel — asserting finite,
DECREASING loss on a fixed batch (overfit-one-batch) and recording the
per-step wall-time curve.  A wedged optimizer or a NaN at step 7 fails
here, which the single-step bar could not catch.

  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/run_multistep_tpu.py > /tmp/multistep.log 2>&1 \
      < /dev/null & disown
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

STEPS = 40


def _trajectory(step, state, batch_j, n=STEPS):
    losses_hist, times = [], []
    for i in range(n):
        t0 = time.perf_counter()
        state, losses = step(state, batch_j, jax.random.PRNGKey(i))
        total = float(losses["total"])       # scalar pull = hard sync
        times.append(time.perf_counter() - t0)
        losses_hist.append(total)
        if not np.isfinite(total):
            print(f"  NON-FINITE loss at step {i}: {total}", flush=True)
            return losses_hist, times, False
    head = float(np.mean(losses_hist[:5]))
    tail = float(np.mean(losses_hist[-5:]))
    ok = tail < head
    print(f"  loss: step0 {losses_hist[0]:.4f} → step{n - 1} "
          f"{losses_hist[-1]:.4f} (mean first5 {head:.4f} → last5 "
          f"{tail:.4f}, {'DECREASING' if ok else 'NOT decreasing'})",
          flush=True)
    ss = times[3:]
    print(f"  step time: first(+compile) {times[0]:.1f}s, steady "
          f"median {1e3 * float(np.median(ss)):.0f} ms "
          f"(p90 {1e3 * float(np.quantile(ss, 0.9)):.0f} ms)",
          flush=True)
    print("  trajectory:", " ".join(f"{v:.3f}" for v in losses_hist),
          flush=True)
    return losses_hist, times, ok


def camera_fusion_only():
    import dataclasses

    import __graft_entry__ as ge
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.step import init_state, make_train_step

    cfg = ge._tiny_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, optim=dataclasses.replace(
                cfg.train.optim, freeze_camera_branch=True)))
    model = build_model(cfg, training=True)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, 1, 6, 928, 1600,
                           cfg.model.head.num_radar_tokens, max_gt=32)
    state, tx = init_state(cfg, model, batch, total_steps=STEPS,
                           rng=jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, tx)
    batch_j = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray, batch))
    print("camera flagship, fusion-only, bs1, full res:", flush=True)
    return _trajectory(step, jax.device_put(state), batch_j)


def lidar(preset="objdgcnn_pillar"):
    from transcar_tpu.core.config import get_preset
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.step import init_state, make_train_step

    cfg = get_preset(preset)
    rng = np.random.default_rng(0)
    pc = cfg.model.head.pc_range
    n_max = cfg.data.max_points
    pts = np.zeros((1, n_max, 5), np.float32)
    pts[:, :, 0] = rng.uniform(pc[0], pc[3], (1, n_max))
    pts[:, :, 1] = rng.uniform(pc[1], pc[4], (1, n_max))
    pts[:, :, 2] = rng.uniform(pc[2], pc[5], (1, n_max))
    pts[:, :, 3] = rng.uniform(0, 255, (1, n_max))
    pts[:, :, 4] = rng.uniform(0, 0.45, (1, n_max))
    mg = cfg.data.max_gt_boxes
    gt = np.ones((1, mg, 9), np.float32)
    gt[:, :, :2] = rng.uniform(-40, 40, (1, mg, 2))
    gt[:, :, 3:6] = rng.uniform(0.5, 6, (1, mg, 3))
    batch = {"points": pts,
             "num_points": np.full((1,), int(n_max * 0.9), np.int32),
             "gt_boxes": gt,
             "gt_labels": rng.integers(0, 10, (1, mg)).astype(np.int32),
             "num_gt": np.full((1,), 9, np.int32)}
    model = build_model(cfg, training=True)
    state, tx = init_state(cfg, model, batch, total_steps=STEPS,
                           rng=jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, tx)
    batch_j = jax.device_put(batch)
    print(f"{preset}, bs1, full res:", flush=True)
    return _trajectory(step, jax.device_put(state), batch_j)


def main():
    import bench as _bench
    from transcar_tpu.utils.compile_cache import enable_persistent_cache

    _bench._wait_for_backend(max_tries=4, sleep_s=90.0)
    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)
    ok = True
    for name, fn in (
            ("camera", camera_fusion_only),
            ("pillar", lambda: lidar("objdgcnn_pillar")),
            ("voxel", lambda: lidar("objdgcnn_voxel"))):
        try:
            _, _, good = fn()
            ok = ok and good
        except Exception as e:  # noqa: BLE001 — record and continue
            import traceback
            print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()
            ok = False
    print("RESULT:", "PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
