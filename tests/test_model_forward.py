"""End-to-end model forward smoke tests at tiny shapes: output shapes,
jit-ability, finiteness, and the camera-only vs fusion switch."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transcar_tpu.core.config import (BackboneConfig, HeadConfig, ModelConfig)
from transcar_tpu.models import TransCARDetector

B, N, H, W = 1, 6, 64, 96
Q, T = 36, 40


def _tiny_head(**kw):
    kw.setdefault("num_decoder_layers", 2)
    return HeadConfig(num_query=Q, num_fusion_layers=3, num_radar_tokens=T,
                      **kw)


def _inputs(rng, with_radar=True):
    images = rng.normal(size=(B, N, H, W, 3)).astype(np.float32)
    # valid outward camera ring so sampled image features actually reach
    # the head (tests/geom.py)
    from tests.geom import camera_ring_l2i

    l2i = camera_ring_l2i(N, H, W)[None]
    radar = None
    if with_radar:
        radar = np.full((B, T, 36), 500.0, np.float32)
        radar[0, :20, :] = rng.normal(size=(20, 36)).astype(np.float32)
        radar[0, :20, 0:2] *= 30.0
    return (jnp.asarray(images), jnp.asarray(l2i),
            None if radar is None else jnp.asarray(radar))


@pytest.mark.parametrize("fusion", [False, True])
def test_forward_shapes(fusion):
    rng = np.random.default_rng(0)
    cfg = ModelConfig(
        backbone=BackboneConfig(compute_dtype=None),
        head=_tiny_head(with_radar_fusion=fusion),
        use_grid_mask=False)
    model = TransCARDetector(cfg)
    images, l2i, radar = _inputs(rng, with_radar=fusion)
    params = model.init(jax.random.PRNGKey(0), images, l2i, radar)
    out = jax.jit(lambda p, i, l, r: model.apply(p, i, l, r))(
        params, images, l2i, radar)
    nl = 3 if fusion else 2
    assert out["all_cls_scores"].shape == (nl, B, Q, 10)
    assert out["all_bbox_preds"].shape == (nl, B, Q, 10)
    assert np.isfinite(np.asarray(out["all_cls_scores"])).all()
    assert np.isfinite(np.asarray(out["all_bbox_preds"])).all()


def test_forward_vovnet():
    rng = np.random.default_rng(1)
    cfg = ModelConfig(
        backbone=BackboneConfig(
            kind="vovnet99", compute_dtype=None,
            fpn_in_channels=(256, 512, 768, 1024), fpn_start_level=0),
        head=_tiny_head(with_radar_fusion=False, num_decoder_layers=1),
        use_grid_mask=False)
    model = TransCARDetector(cfg)
    images, l2i, _ = _inputs(rng, with_radar=False)
    params = model.init(jax.random.PRNGKey(0), images, l2i)
    out = model.apply(params, images, l2i)
    assert out["all_cls_scores"].shape == (1, B, Q, 10)
    assert np.isfinite(np.asarray(out["all_bbox_preds"])).all()


def test_train_mode_with_gridmask_and_dropout():
    rng = np.random.default_rng(2)
    cfg = ModelConfig(
        backbone=BackboneConfig(compute_dtype=None),
        head=_tiny_head(with_radar_fusion=True, num_decoder_layers=1),
        use_grid_mask=True)
    model = TransCARDetector(cfg)
    images, l2i, radar = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), images, l2i, radar)
    out = model.apply(
        params, images, l2i, radar, train=True,
        rngs={"gridmask": jax.random.PRNGKey(1),
              "dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out["all_bbox_preds"])).all()


def test_resolve_dcn_impl_routing():
    """auto → exact on CPU meshes / in training; explicit values pass
    through; the detector threads the resolved impl to the backbone."""
    import dataclasses

    import jax

    import __graft_entry__ as ge
    from transcar_tpu.models.detector import build_model, resolve_dcn_impl

    cfg = ge._tiny_cfg()
    assert jax.default_backend() == "cpu"
    assert resolve_dcn_impl(cfg, training=False) == "exact"
    assert resolve_dcn_impl(cfg, training=True) == "exact"

    forced = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, backbone=dataclasses.replace(
                cfg.model.backbone, dcn_impl="pallas")))
    assert resolve_dcn_impl(forced, training=True) == "pallas"
    model = build_model(forced)
    assert model.dcn_impl == "pallas"
    assert build_model(cfg).dcn_impl == "exact"


def test_resolve_dcn_band_widens_for_full_training():
    """The banded kernel's gradient dead zone (|Δy| > R → zero output AND
    zero gradient) must not bound a *trainable* offset branch: full-camera
    training auto-widens the band; the frozen-camera TransCAR recipe
    keeps the configured band (ADVICE r2 medium #2).

    The widening keys on the CONFIG, not the training flag: the
    mid-training val hook and any later eval of a full-train config must
    use the same band the training forward did, or taps the model
    legitimately learned to use would be zeroed only at eval."""
    import dataclasses

    import __graft_entry__ as ge
    from transcar_tpu.models.detector import (FULL_TRAIN_MIN_BAND,
                                              camera_branch_trains,
                                              resolve_dcn_band)

    cfg = ge._tiny_cfg()   # transcar: fusion head + frozen camera branch
    assert not camera_branch_trains(cfg)
    assert resolve_dcn_band(cfg, training=False) == \
        cfg.model.backbone.dcn_band_rows
    assert resolve_dcn_band(cfg, training=True) == \
        cfg.model.backbone.dcn_band_rows

    full = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, optim=dataclasses.replace(
                cfg.train.optim, freeze_camera_branch=False)))
    assert camera_branch_trains(full)
    assert resolve_dcn_band(full, training=True) == FULL_TRAIN_MIN_BAND
    # eval of the SAME config sees the same band (train/eval consistency)
    assert resolve_dcn_band(full, training=False) == FULL_TRAIN_MIN_BAND


def test_backbone_remat_policy():
    """remat="auto" wraps backbone blocks in nn.remat only when a camera
    backward exists (full-backbone training): its checkpoint boundaries
    cost ~20 ms/sample of pure layout copies at inference
    (docs/PERF_NOTES.md remat section).  "on"/"off" force either way."""
    import dataclasses

    import __graft_entry__ as ge
    from transcar_tpu.models.detector import build_model

    cfg = ge._tiny_cfg()   # transcar: fusion head + frozen camera branch
    assert build_model(cfg).backbone_remat is False
    assert build_model(cfg, training=True).backbone_remat is False

    full = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, optim=dataclasses.replace(
                cfg.train.optim, freeze_camera_branch=False)))
    assert build_model(full, training=True).backbone_remat is True
    assert build_model(full).backbone_remat is False   # eval of same cfg

    def with_remat(c, mode):
        return dataclasses.replace(c, model=dataclasses.replace(
            c.model, backbone=dataclasses.replace(
                c.model.backbone, remat=mode)))

    assert build_model(with_remat(full, "off"),
                       training=True).backbone_remat is False
    assert build_model(with_remat(cfg, "on")).backbone_remat is True


def test_vovnet_remat_trains():
    """remat=True VoVNet (full-backbone training HBM control) stays
    differentiable: nn.remat-wrapped OSA blocks produce finite grads."""
    from transcar_tpu.models.vovnet import VoVNet

    vn = VoVNet(compute_dtype=None, remat=True, out_stages=(2,))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 32, 32, 3)).astype(np.float32))
    params = vn.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(vn.apply(p, x)[0].astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # and some stem gradient is non-zero (the chain actually backprops)
    flat = {"/".join(k.key for k in path): v for path, v in
            jax.tree_util.tree_flatten_with_path(g)[0]}
    stem = [v for k, v in flat.items() if "stem1" in k]
    assert stem and any(float(np.abs(np.asarray(v)).max()) > 0
                        for v in stem)


def test_head_input_bf16_storage_close_to_fp32():
    """BackboneConfig.head_input_dtype="bfloat16" (HBM-bandwidth lever:
    the FPN maps are the model's dominant byte streams) only changes the
    STORAGE of the sampled feature maps — outputs stay within bf16
    rounding of the fp32-parity path, and decoder math remains fp32."""
    rng = np.random.default_rng(0)
    images, l2i, radar = _inputs(rng)

    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = ModelConfig(backbone=BackboneConfig(
            kind="resnet50", with_dcn=(False,) * 4,
            fpn_in_channels=(256, 512, 1024, 2048),
            compute_dtype=None, head_input_dtype=dt),
            head=_tiny_head())
        model = TransCARDetector(cfg)
        params = model.init(jax.random.PRNGKey(0), images, l2i, radar)
        outs[dt] = model.apply(params, images, l2i, radar)

    for k in ("all_cls_scores", "all_bbox_preds"):
        a = np.asarray(outs["float32"][k])
        b = np.asarray(outs["bfloat16"][k])
        assert a.dtype == np.float32 and b.dtype == np.float32
        scale = np.abs(a).max()
        assert np.max(np.abs(a - b)) < 0.02 * (1 + scale), k
    # non-vacuous: the bf16 storage actually changed something
    assert not np.array_equal(np.asarray(outs["float32"]["all_cls_scores"]),
                              np.asarray(outs["bfloat16"]["all_cls_scores"]))
