"""Publish CLI (tools/model_converters/publish_model.py analog): strip
optimizer state from a training checkpoint, save params-only with a
content-hash suffix."""
from __future__ import annotations

import argparse
import hashlib
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("work_dir", help="training work dir with checkpoints/")
    ap.add_argument("out_prefix", help="output path prefix")
    ap.add_argument("--step", type=int)
    args = ap.parse_args(argv)

    import jax
    import numpy as np
    from transcar_tpu.train import checkpoint as ckpt

    # restore with no template: read the raw pytree
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(args.work_dir, "checkpoints"))
    with ocp.CheckpointManager(path) as mgr:
        step = args.step if args.step is not None else mgr.latest_step()
        restored = mgr.restore(step)
    params = restored["state"]["params"]

    digest = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(params):
        digest.update(np.asarray(leaf).tobytes())
    out = f"{args.out_prefix}-{digest.hexdigest()[:8]}"
    ckpt.save_params_only(out, params)
    print(f"published params-only checkpoint: {out}")


if __name__ == "__main__":
    main()
