"""Bisect the ObjDGCNN-voxel train-step TPU worker fault.

The full voxel train step reproducibly crashes the v5e worker ("kernel
fault", /tmp/objdgcnn_bench5.log); a crash yields no diagnostics, so this
probe compiles + runs each training-path piece fwd+bwd in its OWN
subprocess (a crash poisons the in-process jax backend) and reports which
piece kills the chip.  Pieces:

  vfe     voxelize + HardSimpleVFE mean (no params; fwd only)
  sparse  SparseEncoder fwd+bwd at real shapes (V=90k, grid 41x1024x1024)
  bev     SECOND(5,5)+BNFPN fwd+bwd at the voxel BEV shape [1,128,128,256]
  head    DGCNN3DHead fwd+bwd (chunked XLA encoder attention) at FPN shapes
  full    whole train step (known crash — run last)

Driver mode (no args): runs every piece sequentially, probe-gating the
backend between pieces.  Piece mode (--piece X): runs one piece in this
process.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PIECES = ("vfe", "sparse", "bev", "head", "full")


def run_piece(piece):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from transcar_tpu.core.config import get_preset
    from transcar_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = get_preset("objdgcnn_voxel")
    c = cfg.model.head
    rng = np.random.default_rng(0)
    print(f"[{piece}] devices: {jax.devices()}", flush=True)
    t0 = time.time()

    if piece == "vfe":
        from transcar_tpu.ops.voxelize import hard_voxelize
        pts = np.zeros((1, cfg.data.max_points, 5), np.float32)
        pts[..., 0] = rng.uniform(c.pc_range[0], c.pc_range[3], pts.shape[:2])
        pts[..., 1] = rng.uniform(c.pc_range[1], c.pc_range[4], pts.shape[:2])
        pts[..., 2] = rng.uniform(c.pc_range[2], c.pc_range[5], pts.shape[:2])
        n = jnp.full((1,), int(cfg.data.max_points * 0.9), jnp.int32)

        @jax.jit
        def f(p, n):
            vox, coords, counts, nv = jax.vmap(
                lambda pp, nn: hard_voxelize(
                    pp, nn, cfg.model.voxel_size, c.pc_range,
                    cfg.model.max_points_per_voxel, cfg.model.max_voxels)
            )(p, n)
            denom = jnp.maximum(counts, 1)[..., None].astype(vox.dtype)
            return jnp.sum(jnp.sum(vox, axis=2) / denom)

        out = float(f(jnp.asarray(pts), n))

    elif piece == "sparse":
        from transcar_tpu.models.sparse_encoder import SparseEncoder
        v = cfg.model.max_voxels
        feats = jnp.asarray(rng.normal(size=(1, v, 5)).astype(np.float32))
        gz, gy, gx = cfg.model.sparse_shape
        coords = jnp.stack([
            jnp.asarray(rng.integers(0, g, (1, v)).astype(np.int32))
            for g in (gz, gy, gx)], axis=-1)
        count = jnp.full((1,), int(v * 0.9), jnp.int32)
        mod = SparseEncoder(sparse_shape=tuple(cfg.model.sparse_shape),
                            impl=cfg.model.sparse_impl)
        var = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), feats, coords,
                                       count, train=True))()

        @jax.jit
        def f(p):
            out, _ = mod.apply(
                {"params": p, "batch_stats": var["batch_stats"]},
                feats, coords, count, train=True,
                mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(f))(var["params"])
        out = float(jax.tree.reduce(
            lambda a, l: a + jnp.sum(jnp.abs(l)), g, 0.0))

    elif piece == "bev":
        from transcar_tpu.models.second import BNFPN, SECOND
        import flax.linen as nn

        class BEV(nn.Module):
            @nn.compact
            def __call__(self, x, train):
                f = SECOND(layer_nums=(5, 5), layer_strides=(1, 2),
                           out_channels=(128, 256), name="backbone")(
                    x, train=train)
                f = BNFPN(in_channels=tuple(t.shape[-1] for t in f),
                          num_outs=c.num_levels, name="neck")(f, train=train)
                return f

        x = jnp.asarray(rng.normal(size=(1, 128, 128, 256))
                        .astype(np.float32)).astype(jnp.bfloat16)
        mod = BEV()
        var = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), x, True))()

        @jax.jit
        def f(p):
            fs, _ = mod.apply(
                {"params": p, "batch_stats": var["batch_stats"]}, x, True,
                mutable=["batch_stats"])
            return sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in fs)

        g = jax.jit(jax.grad(f))(var["params"])
        out = float(jax.tree.reduce(
            lambda a, l: a + jnp.sum(jnp.abs(l)), g, 0.0))

    elif piece == "head":
        from transcar_tpu.models.dgcnn import DGCNN3DHead
        base = 128  # voxel-track FPN base level (1024/8)
        feats = []
        for i in range(c.num_levels):
            h = max(base // (2 ** i), 1)
            feats.append(jnp.asarray(
                rng.normal(size=(1, h, h, 256)).astype(np.float32)))
        mod = DGCNN3DHead(c, (base, base))
        var = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), feats,
                                       deterministic=False))()

        @jax.jit
        def f(p):
            out = mod.apply({"params": p}, feats, deterministic=False)
            return (jnp.sum(out["all_cls_scores"].astype(jnp.float32) ** 2)
                    + jnp.sum(out["all_bbox_preds"]
                              .astype(jnp.float32) ** 2))

        g = jax.jit(jax.grad(f))(var["params"])
        out = float(jax.tree.reduce(
            lambda a, l: a + jnp.sum(jnp.abs(l)), g, 0.0))

    elif piece == "full":
        from transcar_tpu.models.detector import build_model
        from transcar_tpu.train.step import init_state, make_train_step
        model = build_model(cfg, training=True)
        n_max = cfg.data.max_points
        pts = np.zeros((1, n_max, 5), np.float32)
        pts[..., 0] = rng.uniform(c.pc_range[0], c.pc_range[3], pts.shape[:2])
        pts[..., 1] = rng.uniform(c.pc_range[1], c.pc_range[4], pts.shape[:2])
        pts[..., 2] = rng.uniform(c.pc_range[2], c.pc_range[5], pts.shape[:2])
        gt = np.ones((1, cfg.data.max_gt_boxes, 9), np.float32)
        batch = {"points": pts,
                 "num_points": np.full((1,), int(n_max * 0.9), np.int32),
                 "gt_boxes": gt,
                 "gt_labels": np.zeros((1, cfg.data.max_gt_boxes), np.int32),
                 "num_gt": np.full((1,), 4, np.int32)}
        state, tx = init_state(cfg, model, batch, total_steps=100,
                               rng=jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx)
        state, losses = step(jax.device_put(state), jax.device_put(batch),
                             jax.random.PRNGKey(1))
        out = float(losses["total"])

    else:
        raise SystemExit(f"unknown piece {piece}")

    print(f"[{piece}] OK: {out:.4f} ({time.time() - t0:.0f}s)", flush=True)


def main():
    if "--piece" in sys.argv:
        run_piece(sys.argv[sys.argv.index("--piece") + 1])
        return
    pieces = PIECES
    if "--pieces" in sys.argv:
        pieces = tuple(
            sys.argv[sys.argv.index("--pieces") + 1].split(","))
    import bench as _bench
    for piece in pieces:
        _bench._wait_for_backend(max_tries=6, sleep_s=120.0)
        print(f"=== piece {piece} ===", flush=True)
        rc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--piece", piece],
            timeout=5400, check=False).returncode
        print(f"=== piece {piece} rc={rc} "
              f"{'WORKER-FAULT?' if rc else 'ok'} ===", flush=True)


if __name__ == "__main__":
    main()
