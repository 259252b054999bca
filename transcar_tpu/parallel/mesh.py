"""Device mesh + sharding helpers (N10 of SURVEY.md §2.4).

The reference's entire distributed story is PyTorch DDP over NCCL
(tools/train.py:153-160, tools/dist_train.sh) with loss-side
``reduce_mean`` collectives (detr3d_head.py:892,902).  The TPU-native
equivalent is a ``jax.sharding.Mesh`` with the global batch sharded along a
``data`` axis under jit: XLA inserts the gradient all-reduces over ICI, and
global-batch reductions inside the loss subsume ``reduce_mean``.

The mesh reserves room for more axes (the model is ~60M params, so TP/PP
are unnecessary for parity — SURVEY.md §2.5 — but the API accepts any
axis tuple so larger backbones can shard later).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Tuple[str, ...] = ("data",),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh; defaults to all devices on one data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for [global_batch, ...] arrays: leading dim over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def camera_mesh(num_cameras: int = 6,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh for camera-axis model parallelism at serving time.

    Data parallelism cannot cut batch-1 latency; the multi-view model
    can — its 6 camera streams are independent through backbone+FPN
    (detector.py reshapes [B, N, ...] → [B·N, ...] around the backbone,
    the reference's Detr3D does the same, detr3d.py:39-66), so sharding
    the camera axis runs them concurrently on separate chips and XLA
    all-gathers the (small, bf16) FPN outputs over ICI for the head.

    Uses the largest device count that divides ``num_cameras`` so every
    shard holds the same number of cameras (6 cams → 6, 3, 2 or 1
    devices)."""
    devices = list(devices if devices is not None else jax.devices())
    n = max(d for d in range(1, min(len(devices), num_cameras) + 1)
            if num_cameras % d == 0)
    return Mesh(np.asarray(devices[:n]), ("cam",))


def shard_batch_cameras(batch, mesh: Mesh, axis: str = "cam"):
    """device_put an eval batch with images [B, N, H, W, C] sharded along
    the camera dim N; every other leaf (lidar2img, radar tokens, gt
    padding) is tiny and replicated.  jit respects the committed
    shardings, so the plain jitted eval step partitions the backbone
    per-camera with no step-function changes."""
    img = NamedSharding(mesh, P(None, axis))
    rep = NamedSharding(mesh, P())
    return {k: jax.device_put(v, img if k == "images" else rep)
            for k, v in batch.items()}


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Host batch → sharded global arrays along `axis`.

    Single-process: a device_put of the full global batch.  Multi-process
    (jax.distributed initialized): ``batch`` holds only this process's
    rows and the global array is assembled via
    ``jax.make_array_from_process_local_data`` (parallel/distributed.py)."""
    from transcar_tpu.parallel.distributed import make_global_batch

    return make_global_batch(batch, mesh, axis=axis)
