"""Feature Pyramid Network (mmdet ``FPN`` parity).

Config parity: detr3d_res101_gridmask.py:43-50 — 1×1 laterals from
``start_level``, nearest-neighbor top-down pathway, 3×3 output convs, and
``add_extra_convs='on_output'`` stride-2 extra levels with
``relu_before_extra_convs=True`` (mmdet applies the relu only from the
*second* extra conv on; with num_outs=4 and 3 used levels there is exactly
one extra conv and no relu — reproduced).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FPN(nn.Module):
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    start_level: int = 1
    num_outs: int = 4
    add_extra_convs: str = "on_output"
    relu_before_extra_convs: bool = True

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        used = list(range(self.start_level, len(self.in_channels)))
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=feats[i].dtype,
                    name=f"lateral{rel}")(feats[i])
            for rel, i in enumerate(used)
        ]
        # top-down: nearest upsample to the lower level's size, then add
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[-3:-1]
            up = _nearest_resize(laterals[i], (h, w))
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=laterals[i].dtype, name=f"fpn{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        num_extra = self.num_outs - len(outs)
        for e in range(num_extra):
            src = outs[-1]
            if e > 0 and self.relu_before_extra_convs:
                src = nn.relu(src)
            outs.append(
                nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=src.dtype,
                        name=f"extra{e}")(src))
        return outs


def _nearest_resize(x: jnp.ndarray, hw) -> jnp.ndarray:
    """Nearest-neighbor upsample matching torch ``F.interpolate(mode=
    'nearest')`` index arithmetic (floor of src = dst * scale⁻¹)."""
    h, w = hw
    sh, sw = x.shape[-3], x.shape[-2]
    ry = (jnp.arange(h) * sh // h).astype(jnp.int32)
    rx = (jnp.arange(w) * sw // w).astype(jnp.int32)
    return x[..., ry[:, None], rx[None, :], :]
