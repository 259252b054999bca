"""Bisect the ObjDGCNN-pillar train-step TPU worker fault (runtime
kernel fault — compiles fine, chip crashes during execution).

Pieces, each fwd+bwd in its OWN subprocess at REAL pillar shapes
(levels 256/128/64/32, heads 8, d 32, P 4, band 24 = the training
band), probe-gating the backend between pieces:

  fwd24    forward pallas encoder at band 24, bs1 (inference ran band
           16 only) — no grad
  k1       _bwd_taps_pair alone, biggest pair (q0,v0) then (q0,v3)
  k2       _bwd_value_pair alone, same pairs
  encoder  pallas_msdeform_encoder_ad full fwd+grad (all 16 pairs × K1
           + K2 + assembly)
  attn     DGCNNAttn (decoder self-attn, topk edge conv) fwd+bwd —
           the other LiDAR-only training op never run on TPU
  head     DGCNN3DHead fwd+bwd (everything but the point pipeline)
  full     whole pillar train step (known crash — last)
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PIECES = ("fwd24", "k1", "k2", "encoder", "attn", "head", "full")
SHAPES = [(256, 256), (128, 128), (64, 64), (32, 32)]
HEADS, D, P = 8, 32, 4
BAND = 24


def _enc_inputs(rng, b):
    import numpy as np
    import jax.numpy as jnp
    s = sum(h * w for h, w in SHAPES)
    value = rng.normal(size=(b, s, HEADS, D)).astype(np.float32)
    refs = []
    for hl, wl in SHAPES:
        ry = (np.arange(hl) + 0.5) / hl
        rx = (np.arange(wl) + 0.5) / wl
        g = np.stack(np.meshgrid(rx, ry, indexing="xy"), -1)
        refs.append(g.reshape(-1, 2))
    ref = np.concatenate(refs, 0)[None, :, None, None, None, :]
    norm = np.array([[wl, hl] for hl, wl in SHAPES], np.float32)
    off = rng.uniform(-3, 3, (b, s, HEADS, len(SHAPES), P, 2)).astype(
        np.float32)
    loc = ref + off / norm[None, None, None, :, None, :]
    wgt = rng.uniform(0, 1, (b, s, HEADS, len(SHAPES), P)).astype(
        np.float32)
    wgt = wgt / wgt.sum(axis=(-2, -1), keepdims=True)
    return (jnp.asarray(value), jnp.asarray(loc.astype(np.float32)),
            jnp.asarray(wgt))


def run_piece(piece):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from transcar_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    print(f"[{piece}] devices: {jax.devices()}", flush=True)
    t0 = time.time()

    if piece == "fwd24":
        from transcar_tpu.ops.pallas_msdeform import pallas_msdeform_encoder
        value, loc, wgt = _enc_inputs(rng, 1)
        out = jax.jit(lambda v, lo, w: jnp.sum(pallas_msdeform_encoder(
            v, tuple(SHAPES), lo, w, BAND)))(value, loc, wgt)
        out = float(out)

    elif piece in ("k1", "k2"):
        from transcar_tpu.ops.pallas_msdeform import (
            _bwd_taps_pair, _bwd_value_pair, _omp_precompute)
        value, loc, wgt = _enc_inputs(rng, 1)
        c = HEADS * D
        out = 0.0
        for lv in (0, 1, 2, 3):
            hq, wq = SHAPES[0]
            hv, wv = SHAPES[lv]
            bnd = min(BAND, hv)
            starts = 0
            vl = value[:, starts:starts + hv * wv].astype(jnp.bfloat16)
            vl_t = jnp.transpose(vl.reshape(1, hv, wv, c),
                                 (0, 2, 1, 3)).reshape(1, wv, hv * c)
            nl = hq * wq
            omp = _omp_precompute(loc[:, :nl, :, lv], wgt[:, :nl, :, lv],
                                  hq, wq, hv, wv)
            g = jnp.asarray(rng.normal(size=(1, hq, wq, c))
                            .astype(np.float32))
            if piece == "k1":
                fn = jax.jit(lambda vt, o, gg: jnp.sum(_bwd_taps_pair(
                    vt, o, gg, hq, wq, hv, wv, HEADS, D, P, bnd, False)))
                out += float(fn(vl_t, omp, g))
            else:
                fn = jax.jit(lambda o, gg: jnp.sum(_bwd_value_pair(
                    o, gg, hq, wq, hv, wv, HEADS, D, P, bnd, False)))
                out += float(fn(omp, g))
            print(f"[{piece}] pair (0,{lv}) ok", flush=True)

    elif piece == "encoder":
        from transcar_tpu.ops.pallas_msdeform import (
            pallas_msdeform_encoder_ad)
        value, loc, wgt = _enc_inputs(rng, 1)

        def loss(v, lo, w):
            return jnp.sum(pallas_msdeform_encoder_ad(
                v, tuple(SHAPES), lo, w, BAND) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(value, loc, wgt)
        out = sum(float(jnp.sum(jnp.abs(t))) for t in g)

    elif piece == "attn":
        from transcar_tpu.models.dgcnn import DGCNNAttn
        q = jnp.asarray(rng.normal(size=(1, 300, 256)).astype(np.float32))
        qp = jnp.asarray(rng.normal(size=(1, 300, 256)).astype(np.float32))
        mod = DGCNNAttn(256)
        var = mod.init(jax.random.PRNGKey(0), q, qp)

        def loss(p):
            out, _ = mod.apply(
                {"params": p, "batch_stats": var.get("batch_stats", {})},
                q, qp, deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(out ** 2)

        g = jax.jit(jax.grad(loss))(var["params"])
        out = float(jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(jnp.abs(l)), g, 0.0))

    elif piece == "head":
        from transcar_tpu.core.config import get_preset
        from transcar_tpu.models.dgcnn import DGCNN3DHead
        cfg = get_preset("objdgcnn_pillar")
        c = cfg.model.head
        feats = [jnp.asarray(rng.normal(size=(1, h, w, 256))
                             .astype(np.float32)) for h, w in SHAPES]
        mod = DGCNN3DHead(c, (512, 512), encoder_msdeform_impl="pallas",
                          encoder_band=BAND)
        var = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), feats,
                                       deterministic=False))()

        def loss(p):
            out, _ = mod.apply(
                {"params": p, "batch_stats": var.get("batch_stats", {})},
                feats, deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return (jnp.sum(out["all_cls_scores"] ** 2)
                    + jnp.sum(out["all_bbox_preds"] ** 2))

        g = jax.jit(jax.grad(loss))(var["params"])
        out = float(jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(jnp.abs(l)), g, 0.0))

    elif piece == "full":
        from transcar_tpu.core.config import get_preset
        from transcar_tpu.models.detector import build_model
        from transcar_tpu.train.step import init_state, make_train_step
        cfg = get_preset("objdgcnn_pillar")
        model = build_model(cfg, training=True)
        n_max = cfg.data.max_points
        pc = cfg.model.head.pc_range
        pts = np.zeros((1, n_max, 5), np.float32)
        pts[..., 0] = rng.uniform(pc[0], pc[3], pts.shape[:2])
        pts[..., 1] = rng.uniform(pc[1], pc[4], pts.shape[:2])
        pts[..., 2] = rng.uniform(pc[2], pc[5], pts.shape[:2])
        gt = np.ones((1, cfg.data.max_gt_boxes, 9), np.float32)
        batch = {"points": pts,
                 "num_points": np.full((1,), int(n_max * 0.9), np.int32),
                 "gt_boxes": gt,
                 "gt_labels": np.zeros((1, cfg.data.max_gt_boxes),
                                       np.int32),
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
        _bench._wait_for_backend(max_tries=8, sleep_s=120.0)
        print(f"=== piece {piece} ===", flush=True)
        rc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--piece", piece],
            timeout=7200, check=False).returncode
        print(f"=== piece {piece} rc={rc} "
              f"{'WORKER-FAULT?' if rc else 'ok'} ===", flush=True)


if __name__ == "__main__":
    main()
