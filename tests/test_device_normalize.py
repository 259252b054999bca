"""uint8 host→device transfer + on-device normalization
(DataConfig.normalize_on_device): bit-exact against the host fp32
pipeline on the eval path, pad region exactly zero, and identical
decoded outputs through the jitted eval step."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.core.config import DataConfig
from transcar_tpu.data import pipeline as pp
from transcar_tpu.train.step import normalize_batch_images


def _host_path(imgs, dc):
    xs = pp.normalize_images([i.copy() for i in imgs], dc.img_mean,
                             dc.img_std, dc.to_rgb)
    xs = pp.pad_to_divisor(xs, dc.pad_divisor)
    return pp.stack_views(xs)


def _device_path(imgs, dc):
    u8 = [np.clip(np.rint(i), 0, 255).astype(np.uint8) for i in imgs]
    shape = np.asarray(u8[0].shape[:2], np.int32)
    u8 = pp.pad_to_divisor(u8, dc.pad_divisor)
    batch = {"images": jnp.asarray(pp.stack_views(u8, np.uint8)[None]),
             "img_shape": jnp.asarray(shape[None])}
    return np.asarray(normalize_batch_images(batch, dc)["images"][0])


def test_device_normalize_bit_exact_vs_host_pipeline():
    rng = np.random.default_rng(0)
    # 30×45 → pads to 32×64: real right/bottom borders to check
    imgs = [rng.integers(0, 256, (30, 45, 3)).astype(np.float32)
            for _ in range(3)]
    for dc in (DataConfig(),                                    # caffe BGR
               DataConfig(img_mean=(123.675, 116.28, 103.53),   # VoVNet-ish
                          img_std=(58.395, 57.12, 57.375), to_rgb=True)):
        want = _host_path(imgs, dc)
        got = _device_path(imgs, dc)
        np.testing.assert_array_equal(got, want)
        # the padded border is exactly zero (normalize-then-pad order)
        assert (got[:, 30:, :, :] == 0).all() and (got[:, :, 45:, :] == 0).all()
        assert np.abs(want[:, :30, :45]).max() > 1.0   # non-vacuous


def test_float_batches_pass_through_untouched():
    dc = DataConfig()
    x = jnp.ones((1, 2, 8, 8, 3), jnp.float32) * 7
    batch = {"images": x}
    out = normalize_batch_images(batch, dc)
    assert out["images"] is x


def test_device_photometric_matches_host_apply():
    """The on-device photometric distortion (fused into
    normalize_batch_images; choices drawn on host) reproduces the host
    fp32 reference path per image.  Params are crafted to exercise every
    branch: both contrast modes, brightness/saturation/hue on, channel
    swap, and an all-identity draw (the reference aug never clips — the
    uint8 wire carries UNDISTORTED pixels and the out-of-range math
    happens on device)."""
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 256, (30, 45, 3)).astype(np.float32)
            for _ in range(3)]
    # dark pixels + negative brightness + identity sat/hue: the HSV
    # round trip is NOT an identity there (V = max ≤ 0 forces S = 0,
    # collapsing the pixel to grey) — the regression a conditional
    # host-side round-trip skip introduced (review finding, measured
    # 17-intensity divergence)
    imgs[1][:8, :8] = rng.integers(0, 12, (8, 8, 3)).astype(np.float32)
    params = np.array([[17.0, 1.0, 1.4, 1.3, 15.0],     # mode-1 contrast
                       [-28.0, 0.0, 0.6, 1.0, 0.0],     # dark + identity
                       [0.0, 0.0, 1.0, 1.0, 0.0]],      # all identity
                      np.float32)
    perms = np.array([[2, 0, 1], [0, 1, 2], [1, 2, 0]], np.int32)
    dc = DataConfig()

    hosted = [pp.apply_photometric(im, params[i], perms[i])
              for i, im in enumerate(imgs)]
    want = _host_path(hosted, dc)
    assert want.min() < -120.0 and want.max() > 180.0   # aug leaves [0,255]

    u8 = [im.astype(np.uint8) for im in imgs]
    u8 = pp.pad_to_divisor(u8, dc.pad_divisor)
    batch = {"images": jnp.asarray(pp.stack_views(u8, np.uint8)[None]),
             "img_shape": jnp.asarray(np.asarray([[30, 45]], np.int32)),
             "photo_params": jnp.asarray(params[None]),
             "photo_perm": jnp.asarray(perms[None])}
    out = normalize_batch_images(batch, dc)
    got = np.asarray(out["images"][0])
    np.testing.assert_allclose(got[:, :30, :45], want[:, :30, :45],
                               atol=2e-2)
    assert (got[:, 30:, :, :] == 0).all() and (got[:, :, 45:, :] == 0).all()
    # consumed: the model never sees the aug params
    assert "photo_params" not in out and "photo_perm" not in out


def test_prepare_sample_wire_dtypes(tmp_path):
    """Loader route selection: uint8 wire always (on-device normalize);
    training with photometric distortion additionally ships the drawn
    aug choices for the fused device-side pixel math."""
    from PIL import Image

    from transcar_tpu.data.infos import Sample
    from transcar_tpu.data.loader import prepare_sample

    paths = []
    rng = np.random.default_rng(3)
    for i in range(2):
        p = str(tmp_path / f"cam{i}.png")
        Image.fromarray(rng.integers(0, 255, (30, 45, 3),
                                     dtype=np.uint8)).save(p)
        paths.append(p)
    sample = Sample(token="t", timestamp=0.0, img_paths=paths,
                    lidar2img=np.eye(4, dtype=np.float32)[None].repeat(2, 0),
                    gt_boxes=np.zeros((0, 9), np.float32),
                    gt_labels=np.zeros((0,), np.int64), gt_names=[])
    dc = DataConfig(max_gt_boxes=4)
    ev = prepare_sample(sample, dc, training=False)
    assert ev["images"].dtype == np.uint8 and "photo_params" not in ev
    out = prepare_sample(sample, dc, training=True,
                         rng=np.random.default_rng(0))
    assert out["images"].dtype == np.uint8
    assert out["photo_params"].shape == (2, 5)
    assert out["photo_perm"].shape == (2, 3)
    # bit-faithful pad-extent record rides along for the device kernel
    assert out["img_shape"].tolist() == [30, 45]


def test_eval_step_identical_for_uint8_and_fp32_batches():
    """End to end through the jitted eval step: the uint8-transferred
    batch decodes to the SAME boxes as the host-normalized fp32 batch."""
    import __graft_entry__ as ge
    from transcar_tpu.models.detector import build_model
    from transcar_tpu.train.step import make_eval_step

    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=16, radar_tokens=16)
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    fb = ge._fake_batch(rng, 1, 6, 64, 96, 16, max_gt=4)

    # raw uint8 content (56×90 → padded 64×96), both routes
    raw = [rng.integers(0, 256, (56, 90, 3)).astype(np.float32)
           for _ in range(6)]
    dc = cfg.data
    fp32_imgs = _host_path(raw, dc)[None]
    u8 = [np.clip(np.rint(i), 0, 255).astype(np.uint8) for i in raw]
    u8p = pp.stack_views(pp.pad_to_divisor(u8, dc.pad_divisor),
                         np.uint8)[None]

    batch_f = dict(fb, images=fp32_imgs)
    batch_u = dict(fb, images=u8p,
                   img_shape=np.asarray([[56, 90]], np.int32))

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(fp32_imgs),
        jnp.asarray(fb["lidar2img"]), jnp.asarray(fb["radar_tokens"]))[
            "params"]
    step = make_eval_step(cfg, model)
    out_f = step(params, {k: jnp.asarray(v) for k, v in batch_f.items()})
    out_u = step(params, {k: jnp.asarray(v) for k, v in batch_u.items()})
    for k in out_f:
        np.testing.assert_array_equal(np.asarray(out_f[k]),
                                      np.asarray(out_u[k]), err_msg=k)
