"""GridMask augmentation as a pure jit-able function (C5 of SURVEY.md §2).

Parity target: projects/mmdet3d_plugin/models/utils/grid_mask.py:84-123 with
the detector's settings (detr3d.py:36): use_h=use_w=True, rotate=1,
offset=False, ratio=0.5, mode=1, prob=0.7.

The reference builds the mask in numpy/PIL and uploads it per step
(grid_mask.py:113); here it's modular arithmetic on device.  Notes:
  * ``rotate=1`` means ``np.random.randint(1) == 0`` — rotation is a no-op
    in the shipped config, so none is implemented.
  * mode=1 inverts the mask: the grid *stripes* survive, the rest is kept —
    final keep-fraction ≈ 1 - (1-ratio)² ≈ 0.75.
  * one mask is shared by the whole 6-camera batch (x.view(-1, h, w) then a
    single expand, :88,116).
  * reference draws the stripe pattern on a 1.5× canvas and center-crops;
    a stripe row i exists only for i < (1.5·size)//d — reproduced exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(images: jnp.ndarray, rng: jax.Array, prob: float = 0.7,
              ratio: float = 0.5) -> jnp.ndarray:
    """Apply GridMask to a stack of images.

    Args:
      images: [..., H, W, C] float images (any leading batch/cam dims).
      rng: PRNG key (one mask per call, like the reference's per-step mask).
    Returns:
      Masked images, same shape.
    """
    h, w = images.shape[-3], images.shape[-2]
    k_apply, k_d, k_sth, k_stw = jax.random.split(rng, 4)

    apply = jax.random.uniform(k_apply) <= prob
    # d ~ randint(2, h) (grid_mask.py:91)
    d = jax.random.randint(k_d, (), 2, h)
    st_h = jax.random.randint(k_sth, (), 0, 1 << 30) % d
    st_w = jax.random.randint(k_stw, (), 0, 1 << 30) % d
    row, col = stripe_pattern(h, w, d, st_h, st_w, ratio)
    zeroed = row[:, None] | col[None, :]
    keep = zeroed  # mode=1: mask = 1 - mask (:114-115)
    mask = keep.astype(images.dtype)[..., :, :, None]
    masked = images * mask
    return jnp.where(apply, masked, images)


def stripe_pattern(h: int, w: int, d, st_h, st_w, ratio: float = 0.5):
    """Deterministic core of the stripe construction, exposed for parity
    testing against the reference's loop (grid_mask.py:93-111):
    position g (in the center-cropped window of the 1.5× canvas) is striped
    iff g ∈ [d·i + st, d·i + st + l) for some 0 ≤ i < (1.5·size)//d."""
    # l = min(max(int(d*ratio + .5), 1), d-1) (:92)
    l = jnp.clip((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32),
                 1, d - 1)

    def striped(size, canvas, st):
        g = jnp.arange(size) + (canvas - size) // 2
        kk = g - st
        i = kk // d
        return (kk >= 0) & (kk % d < l) & (i < canvas // d)

    return (striped(h, int(1.5 * h), st_h),
            striped(w, int(1.5 * w), st_w))
