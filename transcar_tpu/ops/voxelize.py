"""Voxelization + pillar scatter (N6/N8 of SURVEY.md §2.4).

The reference uses mmdet3d's CUDA hard voxelizer and PointPillarsScatter
(configs/obj_dgcnn/pillar.py:30-43).  TPU-native version: static-shape,
sort-based grouping entirely in jax — points sort by voxel id, per-point
rank within its voxel comes from a searchsorted against the sorted ids,
and voxel slots from a cumsum of first-occurrence flags.  All outputs are
fixed [max_voxels, max_points, ...] with counts, so the whole thing jits.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_points", "max_voxels", "voxel_size",
                                   "pc_range"))
def hard_voxelize(points: jnp.ndarray,
                  num_points: jnp.ndarray,
                  voxel_size: Tuple[float, float, float],
                  pc_range: Tuple[float, ...],
                  max_points: int = 20,
                  max_voxels: int = 30000):
    """Group points into voxels (pillars when voxel z-extent covers the
    whole range).

    Args:
      points: [N_max, F] padded point cloud (first 3 dims = xyz).
      num_points: scalar int — real points (≤ N_max).
      voxel_size / pc_range: static geometry.
    Returns:
      voxels:     [max_voxels, max_points, F] grouped points (zero padded)
      coords:     [max_voxels, 3] integer (z, y, x) voxel coordinates
      num_per_voxel: [max_voxels] int32 point counts
      num_voxels: scalar int32
    """
    n, f = points.shape
    lo = jnp.asarray(pc_range[:3], points.dtype)
    hi = jnp.asarray(pc_range[3:], points.dtype)
    vs = jnp.asarray(voxel_size, points.dtype)
    grid = jnp.asarray(
        [round((pc_range[3 + i] - pc_range[i]) / voxel_size[i])
         for i in range(3)], jnp.int32)

    idx3 = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    valid = ((jnp.arange(n) < num_points)
             & jnp.all(idx3 >= 0, axis=1)
             & jnp.all(idx3 < grid, axis=1))
    # linear voxel id; invalid points pushed to the end
    lin = (idx3[:, 2] * grid[1] + idx3[:, 1]) * grid[0] + idx3[:, 0]
    big = grid[0] * grid[1] * grid[2] + 1
    lin = jnp.where(valid, lin, big)

    order = jnp.argsort(lin)
    lin_s = lin[order]
    pts_s = points[order]
    valid_s = valid[order]

    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), lin_s[1:] != lin_s[:-1]])
    first = boundary & valid_s
    voxel_slot = jnp.cumsum(first) - 1                   # per point
    # rank of each point inside its voxel: distance to its run start.
    # A cumulative max of boundary positions — one vectorized scan —
    # replaces searchsorted(lin_s, lin_s), whose binary-search while
    # loop costs ~10 ms at 300k points on v5e (trace, PERF_NOTES).
    first_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, jnp.arange(n), -1))
    rank = jnp.arange(n) - first_pos

    keep = valid_s & (rank < max_points) & (voxel_slot < max_voxels)
    slot = jnp.where(keep, voxel_slot, max_voxels)       # overflow row
    rank = jnp.where(keep, rank, 0)

    voxels = jnp.zeros((max_voxels + 1, max_points, f), points.dtype)
    voxels = voxels.at[slot, rank].set(
        jnp.where(keep[:, None], pts_s, 0.0))
    counts = jnp.zeros((max_voxels + 1,), jnp.int32).at[slot].add(
        keep.astype(jnp.int32))

    coords = jnp.zeros((max_voxels + 1, 3), jnp.int32)
    idx3_s = idx3[order]
    zyx = jnp.stack([idx3_s[:, 2], idx3_s[:, 1], idx3_s[:, 0]], axis=1)
    coords = coords.at[slot].set(jnp.where(keep[:, None], zyx, 0))

    num_voxels = jnp.sum(first.astype(jnp.int32))
    num_voxels = jnp.minimum(num_voxels, max_voxels)
    return (voxels[:max_voxels], coords[:max_voxels], counts[:max_voxels],
            num_voxels)


def pillar_scatter(pillar_feats: jnp.ndarray, coords: jnp.ndarray,
                   num_voxels: jnp.ndarray, bev_hw: Tuple[int, int]
                   ) -> jnp.ndarray:
    """PointPillarsScatter: [P, C] pillar features → [H, W, C] BEV canvas.

    coords are (z, y, x); rows ≥ num_voxels are scattered into a scratch
    cell then dropped.
    """
    p, c = pillar_feats.shape
    h, w = bev_hw
    valid = jnp.arange(p) < num_voxels
    lin = jnp.where(valid, coords[:, 1] * w + coords[:, 2], h * w)
    canvas = jnp.zeros((h * w + 1, c), pillar_feats.dtype)
    canvas = canvas.at[lin].set(
        jnp.where(valid[:, None], pillar_feats, 0.0))
    return canvas[: h * w].reshape(h, w, c)
