"""Phase-form stem reformulations vs the plain-conv oracles."""
import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.ops.phase_stem import resnet_phase_stem, vovnet_phase_stem


def _conv(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _aff(rng, c):
    return (jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
            jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32))


def test_vovnet_phase_stem_matches_plain():
    rng = np.random.default_rng(0)
    n, h, w = 2, 24, 32
    x = jnp.asarray(rng.normal(size=(n, h, w, 3)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 8)) * 0.2, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.2, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(3, 3, 8, 16)) * 0.2, jnp.float32)
    a1, a2, a3 = _aff(rng, 8), _aff(rng, 8), _aff(rng, 16)

    y = jnp.maximum(_conv(x, w1, 2, 1) * a1[0] + a1[1], 0.0)
    y = jnp.maximum(_conv(y, w2, 1, 1) * a2[0] + a2[1], 0.0)
    ref = jnp.maximum(_conv(y, w3, 2, 1) * a3[0] + a3[1], 0.0)

    out = vovnet_phase_stem(x, w1, a1, w2, a2, w3, a3)
    assert out.shape == (n, h // 4, w // 4, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_vovnet_model_phase_stem_matches_xla():
    """VoVNet(stem_impl='phase') == VoVNet() with identical params (the
    param-holder tree matches ConvBN's, so checkpoints interchange)."""
    from transcar_tpu.models.vovnet import VoVNet

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)), jnp.float32)
    kw = dict(compute_dtype=None)
    ref_mod = VoVNet(**kw)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.03 * np.random.default_rng(3).normal(
            size=a.shape).astype(a.dtype), params)
    ref = ref_mod.apply(params, x)

    ph_mod = VoVNet(stem_impl="phase", **kw)
    got = ph_mod.apply(params, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=1e-3)
    assert (jax.tree_util.tree_structure(
        ph_mod.init(jax.random.PRNGKey(0), x))
        == jax.tree_util.tree_structure(params))


def test_resnet_model_phase_stem_matches_xla():
    from transcar_tpu.models.resnet import ResNet

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 32, 48, 3)), jnp.float32)
    kw = dict(depth=50, with_dcn=(False,) * 4, out_indices=(3,),
              compute_dtype=None, remat=False)
    ref_mod = ResNet(**kw)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.03 * np.random.default_rng(5).normal(
            size=a.shape).astype(a.dtype), params)
    ref = ref_mod.apply(params, x)

    ph_mod = ResNet(stem_impl="phase", **kw)
    got = ph_mod.apply(params, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=1e-3)
    assert (jax.tree_util.tree_structure(
        ph_mod.init(jax.random.PRNGKey(0), x))
        == jax.tree_util.tree_structure(params))


def test_resnet_phase_stem_matches_plain():
    rng = np.random.default_rng(1)
    n, h, w = 2, 32, 40
    x = jnp.asarray(rng.normal(size=(n, h, w, 3)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(7, 7, 3, 8)) * 0.2, jnp.float32)
    a = _aff(rng, 8)

    y = jnp.maximum(_conv(x, wk, 2, 3) * a[0] + a[1], 0.0)
    # maxpool 3x3 s2 pad 1 (mmdet ResNet stem, resnet.py:135)
    from flax import linen as nn
    ref = nn.max_pool(y, (3, 3), strides=(2, 2),
                      padding=[(1, 1), (1, 1)])

    out = resnet_phase_stem(x, wk, a)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
