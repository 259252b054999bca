"""Fused bottleneck kernel vs the XLA Bottleneck oracle (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.models.resnet import Bottleneck
from transcar_tpu.ops.pallas_bottleneck import bottleneck_fused


def _affine_from_bn(bn, eps=1e-5):
    s = np.asarray(bn["scale"]) / np.sqrt(np.asarray(bn["var"]) + eps)
    return (jnp.asarray(s, jnp.float32),
            jnp.asarray(np.asarray(bn["bias"])
                        - np.asarray(bn["mean"]) * s, jnp.float32))


def _run_case(identity, rows):
    rng = np.random.default_rng(0 if identity else 1)
    n, h, w, planes = 2, 12, 16, 8
    cin = planes * 4 if identity else planes
    x = jnp.asarray(rng.normal(size=(n, h, w, cin)), jnp.float32)

    blk = Bottleneck(planes=planes, stride=1, downsample=not identity)
    params = blk.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * np.random.default_rng(2).normal(
            size=a.shape).astype(a.dtype), params)
    ref = blk.apply(params, x)

    p = params["params"]
    kw = {}
    if not identity:
        kw = dict(wd=p["downsample"]["conv"]["kernel"],
                  affd=_affine_from_bn(p["downsample"]["bn"]))
    out = bottleneck_fused(
        x,
        p["conv1"]["conv"]["kernel"], _affine_from_bn(p["conv1"]["bn"]),
        p["conv2"]["conv"]["kernel"], _affine_from_bn(p["conv2"]["bn"]),
        p["conv3"]["conv"]["kernel"], _affine_from_bn(p["conv3"]["bn"]),
        rows_per_chunk=rows, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4,
                               err_msg=f"id={identity} rows={rows}")


def test_bottleneck_fused_identity():
    for rows in (None, 6, 3):
        _run_case(identity=True, rows=rows)


def test_resnet_fused_blocks_match_xla_model_level():
    """ResNet(block_impl='fused') == plain with identical params; DCN
    stages and stride-2 blocks transparently keep the XLA path."""
    from transcar_tpu.models.resnet import ResNet

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 48, 64, 3)), jnp.float32)
    kw = dict(depth=50, with_dcn=(False, False, False, False),
              out_indices=(2, 3), compute_dtype=None, remat=False)
    ref_mod = ResNet(**kw)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    # mild perturbation: activations grow through 16 blocks and fp32
    # reassociation noise scales with magnitude
    params = jax.tree_util.tree_map(
        lambda a: a + 0.02 * np.random.default_rng(4).normal(
            size=a.shape).astype(a.dtype), params)
    ref = ref_mod.apply(params, x)

    fz = ResNet(block_impl="fused", dcn_interpret=True, **kw)
    got = fz.apply(params, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=5e-3, atol=2e-3)
    assert (jax.tree_util.tree_structure(fz.init(jax.random.PRNGKey(0), x))
            == jax.tree_util.tree_structure(params))


def test_bottleneck_fused_downsample():
    for rows in (None, 4):
        _run_case(identity=False, rows=rows)
