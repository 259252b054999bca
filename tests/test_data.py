"""Data layer tests: radar 36-dim token layout vs a literal restatement of
the reference featurization (detr3d_head.py:301-536), pipeline ops, GT
padding, GridMask statistics."""
import numpy as np
import jax
import jax.numpy as jnp

from transcar_tpu.core.config import DataConfig
from transcar_tpu.data.gridmask import grid_mask
from transcar_tpu.data.loader import collate, pad_gt
from transcar_tpu.data.pipeline import (_bgr2hsv, _hsv2bgr, normalize_images,
                                        pad_to_divisor,
                                        photometric_distortion)
from transcar_tpu.data.radar import (build_radar_tokens,
                                     featurize_radar_channel, RADAR_CHANNELS)


def _rand_radar(rng, n):
    pts = np.zeros((18, n))
    pts[0:3] = rng.uniform(-60, 60, (3, n))          # xyz
    pts[2] = rng.uniform(-4, 2, n)                   # z in range mostly
    pts[3] = rng.integers(0, 8, n)                   # dyn_prop
    pts[4] = rng.integers(0, 100, n)                 # id
    pts[5] = rng.uniform(-10, 30, n)                 # rcs
    pts[6:10] = rng.uniform(-20, 20, (4, n))         # vx vy vxc vyc
    pts[10] = rng.integers(0, 2, n)
    pts[11] = rng.integers(0, 5, n)                  # ambig
    pts[14] = rng.integers(0, 3, n)
    pts[15] = rng.integers(0, 8, n)                  # pdh0
    times = rng.uniform(0, 0.5, (1, n))
    return pts, times


def _rot(rng):
    a = rng.uniform(0, 2 * np.pi)
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0],
                     [0, 0, 1.0]])


def test_radar_feature_layout_and_values():
    rng = np.random.default_rng(0)
    pts, times = _rand_radar(rng, 50)
    r_rot, ref_rot = _rot(rng), _rot(rng)
    f = featurize_radar_channel(pts, times, r_rot, ref_rot)
    assert f.shape == (50, 36)
    # base columns
    np.testing.assert_allclose(f[:, 0:3], pts[0:3].T)
    np.testing.assert_allclose(f[:, 3], pts[4])      # id
    np.testing.assert_allclose(f[:, 4], pts[5])      # rcs
    np.testing.assert_allclose(f[:, 5], pts[10])
    np.testing.assert_allclose(f[:, 6], pts[14])
    # timestamps: t - max(t), duplicated
    t_rel = times[0] - times.max()
    np.testing.assert_allclose(f[:, 7], t_rel)
    np.testing.assert_allclose(f[:, 8], t_rel)
    # compensated velocity rotation (vstack 0, R_ref.T @ R_radar @ v)
    v3 = np.vstack([pts[8:10], np.zeros(50)])
    v3 = ref_rot.T @ (r_rot @ v3)
    np.testing.assert_allclose(f[:, 11:13], v3[:2].T)
    # offset = v_comp * t_rel
    np.testing.assert_allclose(f[:, 9:11], v3[:2].T * t_rel[:, None])
    # raw velocity
    v3r = np.vstack([pts[6:8], np.zeros(50)])
    v3r = ref_rot.T @ (r_rot @ v3r)
    np.testing.assert_allclose(f[:, 13:15], v3r[:2].T)
    # one-hots
    for i in range(50):
        assert f[i, 15 + int(pts[3, i])] == 1.0 and f[i, 15:23].sum() == 1
        assert f[i, 23 + int(pts[11, i])] == 1.0 and f[i, 23:28].sum() == 1
        assert f[i, 28 + int(pts[15, i])] == 1.0 and f[i, 28:36].sum() == 1


def test_radar_buffer_padding_and_range_filter():
    rng = np.random.default_rng(1)
    per, rots = {}, {}
    ref_rot = _rot(rng)
    for ch in RADAR_CHANNELS:
        per[ch] = _rand_radar(rng, 30)
        rots[ch] = _rot(rng)
    tokens = build_radar_tokens(per, rots, ref_rot, num_tokens=200)
    assert tokens.shape == (200, 36)
    # all real points strictly inside the range
    real = tokens[(tokens[:, 0] != 500.0)]
    assert (np.abs(real[:, 0]) < 51.2).all() and (np.abs(real[:, 1]) < 51.2).all()
    # padding rows are 500 in EVERY column (the :527 whole-buffer sentinel)
    padrows = tokens[np.all(tokens == 500.0, axis=1)]
    assert len(padrows) + len(real) == 200


def test_hsv_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    back = _hsv2bgr(_bgr2hsv(img))
    np.testing.assert_allclose(back, img, rtol=1e-3, atol=1e-2)


def test_hsv_fast_forms_match_textbook_oracles():
    """The shipped branch-free HSV conversions (one shared division /
    the "wheel" formula) equal the textbook sector formulations they
    replaced (cv2 semantics: H degrees, S [0,1], V [0,255])."""
    def bgr2hsv_oracle(img):
        b, g, r = img[..., 0], img[..., 1], img[..., 2]
        maxc = np.maximum(np.maximum(r, g), b)
        minc = np.minimum(np.minimum(r, g), b)
        delta = maxc - minc
        s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
        dz = np.maximum(delta, 1e-12)
        h = np.where(maxc == r, 60.0 * (g - b) / dz,
                     np.where(maxc == g, 120.0 + 60.0 * (b - r) / dz,
                              240.0 + 60.0 * (r - g) / dz))
        h = np.where(delta == 0, 0.0, h)
        h = np.where(h < 0, h + 360.0, h)
        return np.stack([h, s, maxc], axis=-1)

    def hsv2bgr_oracle(img):       # classic p/q/t six-sector table
        h, s, v = img[..., 0], img[..., 1], img[..., 2]
        h60 = (h / 60.0) % 6.0
        i = np.floor(h60)
        f = h60 - i
        p = v * (1 - s)
        q = v * (1 - f * s)
        t = v * (1 - (1 - f) * s)
        i = i.astype(np.int32) % 6
        r = np.choose(i, [v, q, p, p, t, v])
        g = np.choose(i, [t, v, v, q, p, p])
        b = np.choose(i, [p, p, t, v, v, q])
        return np.stack([b, g, r], axis=-1)

    rng = np.random.default_rng(5)
    img = rng.uniform(-40, 430, (32, 24, 3)).astype(np.float32)  # aug range
    np.testing.assert_allclose(_bgr2hsv(img), bgr2hsv_oracle(img),
                               rtol=1e-4, atol=1e-3)
    hsv = _bgr2hsv(np.abs(img))
    np.testing.assert_allclose(_hsv2bgr(hsv), hsv2bgr_oracle(hsv),
                               rtol=1e-4, atol=2e-3)


def test_pipeline_shapes():
    rng = np.random.default_rng(3)
    imgs = [rng.uniform(0, 255, (900, 1600, 3)).astype(np.float32)
            for _ in range(2)]
    imgs = photometric_distortion(imgs, rng)
    imgs = normalize_images(imgs, (103.53, 116.28, 123.675), (1, 1, 1))
    imgs = pad_to_divisor(imgs, 32)
    assert imgs[0].shape == (928, 1600, 3)
    assert np.isfinite(imgs[0]).all()


def test_pad_gt():
    boxes = np.array([[1, 2, 0.0, 2, 4, 2, 0.5, 1, 0]], np.float32)
    labels = np.array([3], np.int32)
    b, l, n = pad_gt(boxes, labels, 8)
    assert b.shape == (8, 9) and n == 1
    assert b[0, 2] == 1.0          # gravity z = 0 + 2/2
    assert (b[1:, 3:6] == 1).all()  # unit dims on padding


def test_gridmask_statistics():
    rng = np.random.default_rng(4)
    x = jnp.ones((2, 64, 96, 3))
    out = grid_mask(x, jax.random.PRNGKey(0), prob=1.0)
    frac = float(jnp.mean(out))
    # mode=1 keeps the stripes: keep fraction ≈ 1-(1-r)^2 = .75, loosely
    assert 0.3 < frac < 0.95
    # prob=0 → identity
    out2 = grid_mask(x, jax.random.PRNGKey(0), prob=0.0)
    assert float(jnp.min(out2)) == 1.0


def test_native_radar_featurizer_matches_numpy():
    from transcar_tpu import native
    rng = np.random.default_rng(9)
    per, rots = {}, {}
    ref_rot = _rot(rng)
    ordered_pts, ordered_rots = [], []
    for ch in RADAR_CHANNELS:
        pts, times = _rand_radar(rng, 40)
        per[ch] = (pts, times)
        rots[ch] = _rot(rng)
        ordered_pts.append((pts.astype(np.float32), times.astype(np.float32)))
        ordered_rots.append(rots[ch])
    ref = build_radar_tokens(per, rots, ref_rot, num_tokens=128)
    out = native.radar_featurize(ordered_pts, ordered_rots, ref_rot,
                                 num_tokens=128)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_gridmask_stripes_match_reference_loop():
    """Our modular-arithmetic stripes vs a numpy restatement of the
    reference's canvas loop (grid_mask.py:93-111, crop :111, rotate=1 is a
    no-op)."""
    from transcar_tpu.data.gridmask import stripe_pattern

    def reference_rows(size, d, st, ratio=0.5):
        canvas = int(1.5 * size)
        l = min(max(int(d * ratio + 0.5), 1), d - 1)
        mask = np.ones(canvas)
        for i in range(canvas // d):
            s = d * i + st
            t = min(s + l, canvas)
            mask[s:t] = 0
        off = (canvas - size) // 2
        return mask[off:off + size] == 0    # True = striped

    rng = np.random.default_rng(11)
    for _ in range(20):
        h, w = int(rng.integers(8, 80)), int(rng.integers(8, 120))
        d = int(rng.integers(2, h))
        st_h, st_w = int(rng.integers(d)), int(rng.integers(d))
        row, col = stripe_pattern(h, w, jnp.int32(d), jnp.int32(st_h),
                                  jnp.int32(st_w))
        np.testing.assert_array_equal(np.asarray(row),
                                      reference_rows(h, d, st_h), err_msg=f"{h},{d},{st_h}")
        np.testing.assert_array_equal(np.asarray(col),
                                      reference_rows(w, d, st_w), err_msg=f"{w},{d},{st_w}")


def test_native_jpeg_stack_matches_pil_route(tmp_path):
    """load_multiview_stack_u8's native libjpeg path is bit-identical to
    the PIL route (same libjpeg-turbo under both), zero-pads the border,
    and PNG inputs exercise the fallback."""
    from PIL import Image

    from transcar_tpu.data.pipeline import (load_multiview_images_u8,
                                            load_multiview_stack_u8,
                                            stack_views)

    rng = np.random.default_rng(7)
    paths = []
    for i in range(2):
        img = rng.normal(128, 40, (30, 45, 3)).clip(0, 255).astype(np.uint8)
        p = str(tmp_path / f"c{i}.jpg")
        Image.fromarray(img).save(p, "JPEG", quality=90)
        paths.append(p)

    stack, shape = load_multiview_stack_u8(paths, pad_divisor=32)
    assert stack.shape == (2, 32, 64, 3) and stack.dtype == np.uint8
    assert shape.tolist() == [30, 45]
    pil = stack_views(pad_to_divisor(load_multiview_images_u8(paths), 32),
                      np.uint8)
    np.testing.assert_array_equal(stack, pil)
    assert (stack[:, 30:, :, :] == 0).all() and (stack[:, :, 45:] == 0).all()

    # PNG → PIL fallback, same contract
    p_png = str(tmp_path / "c0.png")
    Image.fromarray(rng.integers(0, 255, (30, 45, 3), np.uint8)).save(p_png)
    stack2, shape2 = load_multiview_stack_u8([p_png, p_png], pad_divisor=32)
    assert stack2.shape == (2, 32, 64, 3) and shape2.tolist() == [30, 45]
