"""Sparse 3D convolution, TPU-native (N7 of SURVEY.md §2.4).

The reference's voxel-variant ObjDGCNN uses spconv/mmcv CUDA sparse
convolutions inside mmdet3d's ``SparseEncoder``
(configs/obj_dgcnn/voxel.py:34-43).  CUDA sparse conv builds hash-table
"rulebooks"; the TPU-native equivalent here is static-shape sort +
searchsorted:

  * active sites live in fixed [V_max] buffers (features, (z, y, x) coords,
    count) — the output of ops/voxelize.hard_voxelize;
  * neighbor lookup: linearize coords, sort once, then for every kernel
    offset a vectorized ``searchsorted`` finds the neighbor's slot (miss →
    V_max, which indexes a zero row);
  * submanifold conv (SubMConv3d): output sites = input sites; gather the
    K=27 neighbors and contract with the kernel on the MXU;
  * strided sparse conv (SparseConv3d k=3 s=2 p=1): each input contributes
    to up to 2³ downsampled sites (o·2 + t = i, t ∈ [-1, 1]); the output
    site set is their deduplicated union (sort-unique, capped), then a
    gather-contract like the submanifold case.

Everything jits with static shapes; batching via vmap.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MISS = 2 ** 30   # plain int: keep module import backend-free


def _linearize(coords: jnp.ndarray, grid: Tuple[int, int, int],
               valid: jnp.ndarray) -> jnp.ndarray:
    """(z, y, x) int coords → linear ids; invalid → MISS sentinel."""
    gz, gy, gx = grid
    inside = ((coords[:, 0] >= 0) & (coords[:, 0] < gz)
              & (coords[:, 1] >= 0) & (coords[:, 1] < gy)
              & (coords[:, 2] >= 0) & (coords[:, 2] < gx))
    lin = (coords[:, 0] * gy + coords[:, 1]) * gx + coords[:, 2]
    return jnp.where(valid & inside, lin, MISS)


def _kernel_offsets(k: int = 3) -> np.ndarray:
    r = np.arange(k) - k // 2
    return np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)


@partial(jax.jit, static_argnames=("grid",))
def subm_conv(feats: jnp.ndarray, coords: jnp.ndarray,
              num_voxels: jnp.ndarray, weight: jnp.ndarray,
              grid: Tuple[int, int, int]) -> jnp.ndarray:
    """Submanifold 3×3×3 conv: [V, Cin] → [V, Cout] on the same sites.

    weight: [27, Cin, Cout] (kernel offsets in _kernel_offsets order).
    """
    v, cin = feats.shape
    valid = jnp.arange(v) < num_voxels
    lin = _linearize(coords, grid, valid)
    order = jnp.argsort(lin)
    lin_s = lin[order]

    feats_z = jnp.concatenate(
        [feats * valid[:, None], jnp.zeros((1, cin), feats.dtype)], axis=0)

    offsets = jnp.asarray(_kernel_offsets(), jnp.int32)       # [27, 3]
    out = jnp.zeros((v, weight.shape[-1]), jnp.float32)
    for k in range(offsets.shape[0]):
        nb = coords + offsets[k]
        nb_lin = _linearize(nb, grid, valid)
        pos = jnp.searchsorted(lin_s, nb_lin)
        pos = jnp.clip(pos, 0, v - 1)
        hit = (lin_s[pos] == nb_lin) & (nb_lin != MISS)
        src = jnp.where(hit, order[pos], v)                   # v → zero row
        gathered = jnp.take(feats_z, src, axis=0)             # [V, Cin]
        out = out + jax.lax.dot_general(
            gathered, weight[k].astype(gathered.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return (out * valid[:, None]).astype(feats.dtype)


@partial(jax.jit, static_argnames=("grid", "out_max"))
def sparse_conv_down(feats: jnp.ndarray, coords: jnp.ndarray,
                     num_voxels: jnp.ndarray, weight: jnp.ndarray,
                     grid: Tuple[int, int, int], out_max: int):
    """SparseConv3d k=3, stride 2, pad 1: new (halved-grid) site set.

    Returns (out_feats [out_max, Cout], out_coords [out_max, 3],
    out_count).  Output sites: every o with o·2 + t = i for some active i
    and t ∈ [-1, 1]³; per-dim candidates floor((i±1)/2) → ≤8 per input.
    """
    v, cin = feats.shape
    valid = jnp.arange(v) < num_voxels
    out_grid = tuple((g + 1) // 2 for g in grid)

    # candidate output sites: per dim, o with 2o + t = i (t ∈ [-1, 1] and
    # i − t even) → i even: {i/2}; i odd: {(i−1)/2, (i+1)/2}
    parity = coords & 1
    half = jnp.stack([(coords - parity) // 2, (coords + parity) // 2],
                     axis=-1)
    cands = []
    for bz in range(2):
        for by in range(2):
            for bx in range(2):
                cands.append(jnp.stack(
                    [half[:, 0, bz], half[:, 1, by], half[:, 2, bx]],
                    axis=1))
    cand = jnp.concatenate(cands, axis=0)                     # [8V, 3]
    cand_valid = jnp.tile(valid, 8)
    cand_lin = _linearize(cand, out_grid, cand_valid)

    lin_sorted = jnp.sort(cand_lin)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), lin_sorted[1:] != lin_sorted[:-1]])
    first = first & (lin_sorted != MISS)
    slot = jnp.cumsum(first) - 1
    n_out = jnp.minimum(jnp.sum(first), out_max)

    out_lin = jnp.full((out_max + 1,), MISS, jnp.int32)
    write = jnp.where(first & (slot < out_max), slot, out_max)
    out_lin = out_lin.at[write].set(
        jnp.where(first, lin_sorted, MISS))
    out_lin = out_lin[:out_max]
    gy, gx = out_grid[1], out_grid[2]
    oz = out_lin // (gy * gx)
    oy = (out_lin // gx) % gy
    ox = out_lin % gx
    out_coords = jnp.where(
        (out_lin != MISS)[:, None],
        jnp.stack([oz, oy, ox], axis=1).astype(jnp.int32), 0)

    # gather inputs at i = 2o + t for each kernel offset
    in_lin = _linearize(coords, grid, valid)
    order = jnp.argsort(in_lin)
    in_lin_s = in_lin[order]
    feats_z = jnp.concatenate(
        [feats * valid[:, None], jnp.zeros((1, cin), feats.dtype)], axis=0)
    out_valid = out_lin != MISS

    offsets = jnp.asarray(_kernel_offsets(), jnp.int32)
    out = jnp.zeros((out_max, weight.shape[-1]), jnp.float32)
    for k in range(offsets.shape[0]):
        src_coord = out_coords * 2 + offsets[k]
        src_lin = _linearize(src_coord, grid, out_valid)
        pos = jnp.clip(jnp.searchsorted(in_lin_s, src_lin), 0, v - 1)
        hit = (in_lin_s[pos] == src_lin) & (src_lin != MISS)
        src = jnp.where(hit, order[pos], v)
        gathered = jnp.take(feats_z, src, axis=0)
        out = out + jax.lax.dot_general(
            gathered, weight[k].astype(gathered.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out = (out * out_valid[:, None]).astype(feats.dtype)
    return out, out_coords, n_out.astype(jnp.int32)
