"""Fused OSA concat-reduce kernel vs the XLA ConvBN oracle (interpret
mode on CPU), and OSABlock param-tree interchangeability between the two
tail impls."""
import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.models.common import ConvBN
from transcar_tpu.models.vovnet import OSABlock
from transcar_tpu.ops.pallas_osa import osa_reduce


def _oracle(pieces, kernel, bn, relu=True):
    """ConvBN(kernel=1) applied to the concat (models/common.py)."""
    y = jnp.concatenate(pieces, axis=-1)
    y = jax.lax.conv_general_dilated(
        y, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    scale = bn["scale"] * jax.lax.rsqrt(bn["var"] + 1e-5)
    y = y * scale + (bn["bias"] - bn["mean"] * scale)
    return jnp.maximum(y, 0.0) if relu else y


def test_osa_reduce_matches_concat_convbn():
    rng = np.random.default_rng(0)
    n, h, w = 2, 8, 24
    cs = [32, 16, 16, 16]          # mixed piece widths (stage3-style)
    cout = 64
    pieces = [jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
              for c in cs]
    kernel = jnp.asarray(rng.normal(size=(1, 1, sum(cs), cout)) * 0.1,
                         jnp.float32)
    bn = {"scale": jnp.asarray(rng.uniform(0.5, 2.0, cout), jnp.float32),
          "bias": jnp.asarray(rng.normal(size=cout), jnp.float32),
          "mean": jnp.asarray(rng.normal(size=cout), jnp.float32),
          "var": jnp.asarray(rng.uniform(0.5, 2.0, cout), jnp.float32)}

    scale = bn["scale"] * jax.lax.rsqrt(bn["var"] + 1e-5)
    bias = bn["bias"] - bn["mean"] * scale
    w2d = kernel.reshape(sum(cs), cout)
    splits, off = [], 0
    for c in cs:
        splits.append(w2d[off:off + c])
        off += c

    ref = np.asarray(_oracle(pieces, kernel, bn))
    for rows in (2048, 64):        # divisible and non-divisible tiles
        out, sums = osa_reduce(pieces, splits, scale, bias,
                               rows_per_step=rows, interpret=True)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=1e-4)
        # per-image channel sums == GAP numerator (padded rows masked)
        np.testing.assert_allclose(np.asarray(sums),
                                   ref.astype(np.float64).sum((1, 2)),
                                   rtol=1e-3, atol=1e-3)

    # relu=False path
    ref_nr = np.asarray(_oracle(pieces, kernel, bn, relu=False))
    out_nr, _ = osa_reduce(pieces, splits, scale, bias,
                           relu=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out_nr), ref_nr, rtol=1e-4,
                               atol=1e-4)


def test_osa_block_pallas_tail_matches_xla_with_same_params():
    """Both tail impls declare the same 'concat' param tree; identical
    params must give identical block outputs (checkpoint
    interchangeability)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 32)), jnp.float32)

    xla_blk = OSABlock(stage_ch=16, concat_ch=32, layer_per_block=3,
                       identity=True, reduce_impl="xla")
    params = xla_blk.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.random.default_rng(2).normal(
            size=a.shape).astype(a.dtype), params)
    ref = xla_blk.apply(params, x)

    pl_blk = OSABlock(stage_ch=16, concat_ch=32, layer_per_block=3,
                      identity=True, reduce_impl="pallas", interpret=True)
    got = pl_blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # and a fresh pallas init produces the identical tree structure
    p2 = pl_blk.init(jax.random.PRNGKey(0), x)
    t1 = jax.tree_util.tree_structure(params)
    t2 = jax.tree_util.tree_structure(p2)
    assert t1 == t2
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        assert a.shape == b.shape and a.dtype == b.dtype

    # whole-block fused kernel: same params, same outputs, same tree
    for rows in (None, 4):
        fb_blk = OSABlock(stage_ch=16, concat_ch=32, layer_per_block=3,
                          identity=True, reduce_impl="fused",
                          rows_per_chunk=rows, interpret=True)
        got_f = fb_blk.apply(params, x)
        np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
    p3 = fb_blk.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p3) == t1
