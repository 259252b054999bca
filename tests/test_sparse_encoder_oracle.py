"""Encoder-level oracle for the sparse middle encoder (N7).

The op-level tests (tests/test_sparse.py) prove subm_conv /
sparse_conv_down against brute-force dict oracles; this test proves the
WHOLE SparseEncoder stack — site-set propagation across stages, masked
batch-norm statistics, z-fold densify, BEV head — against an independent
dense reconstruction: submanifold conv == torch ``conv3d`` over the
densified grid masked to the active sites, strided sparse conv ==
``conv3d(stride=2, pad=1)`` masked to the union-of-contributions site
set (the spconv semantics of mmdet3d's SparseEncoder,
configs/obj_dgcnn/voxel.py:34-43).  No spconv needed: the dense
equivalence IS the definition of those semantics.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from transcar_tpu.models.sparse_encoder import SparseEncoder
from transcar_tpu.ops.sparse import _kernel_offsets

GRID = (8, 12, 12)
V_MAX = 192          # ≥ any stage's possible unique site count (no cap)
CIN = 5


def _w27_to_torch(w27):
    """[27, Cin, Cout] (offset order of _kernel_offsets: dz slowest) →
    torch conv3d weight [Cout, Cin, 3, 3, 3] (cross-correlation)."""
    offs = _kernel_offsets()
    w = np.zeros((w27.shape[2], w27.shape[1], 3, 3, 3), np.float32)
    for k, (dz, dy, dx) in enumerate(offs):
        w[:, :, dz + 1, dy + 1, dx + 1] = w27[k].T
    return torch.from_numpy(w)


def _conv3d(x, w27, stride):
    """x: [B, gz, gy, gx, C] numpy → conv3d(pad=1) → same layout."""
    xt = torch.from_numpy(np.ascontiguousarray(
        x.transpose(0, 4, 1, 2, 3), dtype=np.float32))
    out = torch.nn.functional.conv3d(
        xt, _w27_to_torch(w27), stride=stride, padding=1)
    return out.numpy().transpose(0, 2, 3, 4, 1)


def _masked_bn(x, mask, scale, bias, eps=1e-3):
    """MaskedBN train-mode math: biased stats over real sites of the
    whole batch.  x: [B, ..., C]; mask: x.shape[:-1]."""
    m = mask[..., None].astype(np.float32)
    n = max(mask.sum(), 1.0)
    mean = (x * m).sum(axis=tuple(range(x.ndim - 1))) / n
    var = (m * (x - mean) ** 2).sum(axis=tuple(range(x.ndim - 1))) / n
    return (x - mean) / np.sqrt(var + eps) * scale + bias


@pytest.mark.parametrize("impl", ["gather", "dense"])
def test_sparse_encoder_matches_dense_torch_oracle(impl):
    rng = np.random.default_rng(7)
    b = 2
    counts = [24, 17]
    feats = np.zeros((b, V_MAX, CIN), np.float32)
    coords = np.zeros((b, V_MAX, 3), np.int32)
    dense0 = np.zeros((b,) + GRID + (CIN,), np.float32)
    active0 = np.zeros((b,) + GRID, bool)
    for bi, n in enumerate(counts):
        lin = rng.choice(GRID[0] * GRID[1] * GRID[2], size=n, replace=False)
        co = np.stack([lin // (GRID[1] * GRID[2]),
                       (lin // GRID[2]) % GRID[1],
                       lin % GRID[2]], axis=1).astype(np.int32)
        f = rng.normal(size=(n, CIN)).astype(np.float32)
        feats[bi, :n], coords[bi, :n] = f, co
        dense0[bi, co[:, 0], co[:, 1], co[:, 2]] = f
        active0[bi, co[:, 0], co[:, 1], co[:, 2]] = True

    enc = SparseEncoder(sparse_shape=GRID, impl=impl)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                         jnp.asarray(coords), jnp.asarray(counts),
                         train=True)
    got, _ = enc.apply(variables, jnp.asarray(feats), jnp.asarray(coords),
                       jnp.asarray(counts), train=True,
                       mutable=["batch_stats"])
    got = np.asarray(got)

    # ---- dense reconstruction with the same params -----------------------
    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    def block(x, act, params, down):
        stride = 2 if down else 1
        y = _conv3d(x, params["weight"], stride)
        if down:
            # union-of-contributions site set: o active iff ∃ active
            # input at 2o + t, t ∈ [-1, 1]³ (spconv SparseConv3d)
            act = _conv3d(act[..., None].astype(np.float32),
                          np.ones((27, 1, 1), np.float32), 2)[..., 0] > 0
        y = y * act[..., None]
        y = _masked_bn(y, act, params["bn"]["scale"], params["bn"]["bias"])
        return np.maximum(y, 0.0) * act[..., None], act

    x, act = block(dense0, active0, p["conv_input"], down=False)
    n_stages = len(enc.encoder_channels)
    for si, chans in enumerate(enc.encoder_channels):
        for ci in range(len(chans)):
            down = ci == len(chans) - 1 and si != n_stages - 1
            x, act = block(x, act, p[f"stage{si}_conv{ci}"], down)

    # densify: [B, gz, gy, gx, C] → [B, gy, gx, gz·C] (z-major fold)
    bsz, gz, gy, gx, c = x.shape
    bev = x.transpose(0, 2, 3, 1, 4).reshape(bsz, gy, gx, gz * c)
    bev = bev @ p["out_conv"]["kernel"] + p["out_conv"]["bias"]
    mean = bev.mean(axis=(0, 1, 2))
    var = bev.var(axis=(0, 1, 2))
    bev = ((bev - mean) / np.sqrt(var + 1e-3) * p["out_bn"]["scale"]
           + p["out_bn"]["bias"])
    want = np.maximum(bev, 0.0)

    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    assert np.abs(want).max() > 0.1        # non-vacuous


def test_dense_impl_matches_gather_impl_same_params():
    """The two formulations are the SAME math (gathered zero-rows ≡
    dense zeros; identical site sets when the gather path's out_max cap
    doesn't bind) and share one param tree — checkpoints must be
    interchangeable across ``impl``."""
    rng = np.random.default_rng(11)
    b, n0, n1 = 2, 31, 22
    feats = np.zeros((b, V_MAX, CIN), np.float32)
    coords = np.zeros((b, V_MAX, 3), np.int32)
    for bi, n in enumerate((n0, n1)):
        lin = rng.choice(GRID[0] * GRID[1] * GRID[2], size=n, replace=False)
        coords[bi, :n] = np.stack([lin // (GRID[1] * GRID[2]),
                                   (lin // GRID[2]) % GRID[1],
                                   lin % GRID[2]], axis=1)
        feats[bi, :n] = rng.normal(size=(n, CIN))
    counts = jnp.asarray([n0, n1], jnp.int32)
    fj, cj = jnp.asarray(feats), jnp.asarray(coords)

    enc_g = SparseEncoder(sparse_shape=GRID, impl="gather")
    enc_d = SparseEncoder(sparse_shape=GRID, impl="dense")
    var = enc_g.init(jax.random.PRNGKey(3), fj, cj, counts, train=True)

    # identical param/batch_stats trees (checkpoint interchangeability)
    var_d = enc_d.init(jax.random.PRNGKey(3), fj, cj, counts, train=True)
    tg = jax.tree_util.tree_structure(var)
    td = jax.tree_util.tree_structure(var_d)
    assert tg == td

    # train mode: outputs AND updated batch statistics agree
    out_g, st_g = enc_g.apply(var, fj, cj, counts, train=True,
                              mutable=["batch_stats"])
    out_d, st_d = enc_d.apply(var, fj, cj, counts, train=True,
                              mutable=["batch_stats"])
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5),
        st_g["batch_stats"], st_d["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_d),
                               rtol=1e-4, atol=1e-4)
    assert float(jnp.abs(out_g).max()) > 0.1         # non-vacuous

    # eval mode with the trained running stats (fresh init stats shrink
    # outputs to ~1e-5 across 12 BN layers — a vacuous comparison)
    var_t = {"params": var["params"],
             "batch_stats": st_g["batch_stats"]}
    out_g = enc_g.apply(var_t, fj, cj, counts, train=False)
    out_d = enc_d.apply(var_t, fj, cj, counts, train=False)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_d),
                               rtol=1e-4, atol=1e-4)
    assert float(jnp.abs(out_g).max()) > 0.01        # non-vacuous


def test_dense_impl_bf16_compute_grads():
    """Training regression: grad through the dense encoder with bf16
    conv compute (the model default).  A preferred_element_type=f32
    conv over bf16 operands fails type-checking under grad (its
    transpose feeds the f32 cotangent into a bf16 conv) — hit by the
    first voxel train step on TPU."""
    rng = np.random.default_rng(13)
    n = 25
    feats = np.zeros((1, V_MAX, CIN), np.float32)
    coords = np.zeros((1, V_MAX, 3), np.int32)
    lin = rng.choice(GRID[0] * GRID[1] * GRID[2], size=n, replace=False)
    coords[0, :n] = np.stack([lin // (GRID[1] * GRID[2]),
                              (lin // GRID[2]) % GRID[1],
                              lin % GRID[2]], axis=1)
    feats[0, :n] = rng.normal(size=(n, CIN))
    counts = jnp.asarray([n], jnp.int32)
    fj, cj = jnp.asarray(feats), jnp.asarray(coords)

    enc = SparseEncoder(sparse_shape=GRID, impl="dense",
                        compute_dtype="bfloat16")
    var = enc.init(jax.random.PRNGKey(0), fj, cj, counts, train=True)

    def loss(p):
        out, _ = enc.apply({"params": p,
                            "batch_stats": var["batch_stats"]},
                           fj, cj, counts, train=True,
                           mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(var["params"])
    total = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.sum(jnp.abs(l))), g, 0.0)
    assert np.isfinite(total) and total > 0.0
