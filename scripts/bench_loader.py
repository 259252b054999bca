"""Host input-pipeline throughput: PrefetchLoader samples/s, train mode.

Quantifies the round-3 host-pipeline redesign (docs/PERF_NOTES.md "Host
input pipeline"): photometric distortion moved on device, uint8-direct
decode, branch-free HSV fallback.  The device step is ~110-140 ms/sample,
so the loader must sustain >8 samples/s (with workers) to keep a single
chip fed — the old numpy aug chain managed <0.2.

Synthesizes a 6-cam JPEG dataset on the fly (high-entropy images =
worst-case decode).  CPU-only; run anywhere.

NOTE on this dev container: it has ONE vCPU, so --workers cannot show
parallel speedup here; numbers are the serial per-sample cost.  A real
v5e host (100+ cores) parallelizes the decode (PIL releases the GIL in
its JPEG decoder) across workers.  Measured in this container:
uint8+device-aug ~420-760 ms/sample vs host-fp32-aug ~5,900 — the
redesign's point is that the remaining cost is decode, which scales
with cores, instead of GIL-serialized numpy float math, which doesn't.
"""
import argparse
import os
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--samples", type=int, default=24)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--host-aug", action="store_true",
                    help="normalize_on_device=False: host fp32 aug path")
    args = ap.parse_args()

    from PIL import Image

    from transcar_tpu.core.config import DataConfig
    from transcar_tpu.data.infos import Sample
    from transcar_tpu.data.loader import collate, prepare_sample

    d = tempfile.mkdtemp(prefix="loaderbench_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        img = rng.normal(128, 40, (900, 1600, 3)).clip(0, 255).astype(
            np.uint8)
        p = os.path.join(d, f"cam{i}.jpg")
        Image.fromarray(img).save(p, "JPEG", quality=90)
        paths.append(p)
    sample = Sample(token="t", timestamp=0.0, img_paths=paths,
                    lidar2img=np.eye(4, dtype=np.float32)[None].repeat(6, 0),
                    gt_boxes=np.zeros((0, 9), np.float32),
                    gt_labels=np.zeros((0,), np.int64), gt_names=[])
    cfg = DataConfig(normalize_on_device=not args.host_aug)

    # warm (PIL decoder init, page cache)
    prepare_sample(sample, cfg, training=True, rng=np.random.default_rng(0))

    from concurrent.futures import ThreadPoolExecutor
    t0 = time.perf_counter()
    with ThreadPoolExecutor(args.workers) as ex:
        outs = list(ex.map(
            lambda i: prepare_sample(sample, cfg, training=True,
                                     rng=np.random.default_rng(i)),
            range(args.samples)))
    collate(outs[:2])
    dt = time.perf_counter() - t0
    mode = "host-fp32-aug" if args.host_aug else "uint8+device-aug"
    print(f"{mode}: {args.samples / dt:.2f} samples/s "
          f"({dt / args.samples * 1e3:.0f} ms/sample, "
          f"{args.workers} workers)")


if __name__ == "__main__":
    main()
