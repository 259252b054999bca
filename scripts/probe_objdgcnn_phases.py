"""ObjDGCNN hotspot attribution: jax.profiler trace → per-op buckets.

Captures a device trace of one pillar/voxel bs1 inference and sums
TensorCore event durations by HLO op class (fusion/gather/sort/conv/
scatter/…) and by top individual ops — locates WHERE the 1.4 s (pillar)
/ 2.6 s (voxel) forward goes (VERDICT r4 item 3).

Run detached after the bench campaign:
  setsid nohup python scripts/probe_objdgcnn_phases.py \
      > /tmp/objdgcnn_phases.log 2>&1 < /dev/null & disown
"""
import glob
import gzip
import json
import os
import tempfile

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


def parse_trace(log_dir, n_iters):
    paths = glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {log_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-lane complete events carry 'dur' (µs); keep TensorCore pids
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    by_op = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = pid_names.get(e.get("pid"), "")
        if "TPU" not in lane and "/device" not in lane.lower():
            continue
        name = e.get("name", "?")
        by_op[name] = by_op.get(name, 0.0) + e["dur"]
    per_iter = {k: v / n_iters / 1e3 for k, v in by_op.items()}  # ms

    def bucket(name):
        n = name.lower()
        for k in ("gather", "scatter", "sort", "convolution", "conv",
                  "dot", "reduce", "dynamic", "copy", "transpose",
                  "broadcast", "iota", "select", "compare"):
            if k in n:
                return k
        if n.startswith(("fusion", "loop_", "input_", "output_")):
            return "fusion(other)"
        return "other"

    buckets = {}
    for k, v in per_iter.items():
        b = bucket(k)
        buckets[b] = buckets.get(b, 0.0) + v
    total = sum(per_iter.values())
    print(f"  device total {total:.1f} ms/iter")
    for b, v in sorted(buckets.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {b:16s} {v:8.1f} ms ({100 * v / max(total, 1e-9):.0f}%)")
    print("  top ops:")
    for k, v in sorted(per_iter.items(), key=lambda kv: -kv[1])[:15]:
        print(f"    {v:8.1f} ms  {k[:110]}")


def run(name):
    cfg = get_preset(name)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    n_max = cfg.data.max_points
    pts, n = make_points(rng, 1, n_max, int(n_max * 0.9),
                         cfg.model.head.pc_range)
    ptsj, nj = jnp.asarray(pts), jnp.asarray(n)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ptsj, nj)
    var = {"params": variables["params"]}
    if variables.get("batch_stats"):
        var["batch_stats"] = variables["batch_stats"]
    var = jax.device_put(var)

    @jax.jit
    def infer(var, p, m):
        return model.apply(var, p, m)

    def sync(o):
        return float(jnp.sum(o["all_bbox_preds"][..., 0]))

    for _ in range(3):
        sync(infer(var, ptsj, nj))
    n_iters = 5
    log_dir = tempfile.mkdtemp(prefix=f"trace_{name}_")
    jax.profiler.start_trace(log_dir)
    for _ in range(n_iters):
        out = infer(var, ptsj, nj)
    sync(out)
    jax.profiler.stop_trace()
    print(f"{name}:", flush=True)
    parse_trace(log_dir, n_iters)


def main():
    # the axon worker can be mid-restart after a crash — probe in a
    # subprocess first (a failed in-process init is cached by jax)
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as _bench
    _bench._wait_for_backend(max_tries=4, sleep_s=90.0)
    enable_persistent_cache()
    print("devices:", jax.devices(), flush=True)
    for name in ("objdgcnn_pillar", "objdgcnn_voxel"):
        try:
            run(name)
        except Exception as e:  # noqa: BLE001
            import traceback
            print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
