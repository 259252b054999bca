"""Tensor-parallel sharding rules (GSPMD style).

The reference scales only by data parallelism (SURVEY.md §2.5) and the
~60M-param model does not *need* TP — but the mesh API reserves a
``model`` axis, and these rules make it real: Megatron-pattern sharding of
the head's matmuls (attention QKV out-dim / output-proj in-dim, FFN
linear1 out-dim / linear2 in-dim).  Params (and their optimizer moments)
get NamedShardings; XLA's sharding propagation inserts the all-reduces —
no hand-written collectives.

Usage::
    mesh = make_mesh((n // 2, 2), ("data", "model"))
    state = shard_state_tp(state, mesh)          # device_put with specs
    batch = shard_batch(batch, mesh)             # leading dim over 'data'
    train_step = jax.jit(step_fn, donate_argnums=(0,))   # shardings inferred
"""
from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

def _spec_for(path_keys) -> P:
    """Megatron pairs — the first GEMM of each pair splits output features,
    the second splits input features (XLA all-reduces its partial sums).
    Matches both nested modules (``ffn/linear1/kernel``) and flat names
    (``fusion0_linear1/kernel``); torch-MHA q/k/v split heads, the output
    projection contracts the split dim."""
    keys = tuple(path_keys)
    leaf = keys[-1]
    parent = keys[-2] if len(keys) > 1 else ""
    if leaf in ("wq", "wk", "wv"):
        return P(None, "model")
    if leaf in ("bq", "bk", "bv"):
        return P("model")
    if leaf == "wo":
        return P("model", None)
    if parent.endswith("linear1"):
        return P(None, "model") if leaf == "kernel" else P("model")
    if parent.endswith("linear2") and leaf == "kernel":
        return P("model", None)
    return P()


def tp_sharding_tree(tree, mesh: Mesh):
    """NamedSharding tree for any pytree whose leaf paths end in param
    names (params and optimizer moments alike)."""

    has_model = "model" in mesh.axis_names

    def leaf_sharding(path, leaf):
        if not has_model:
            return NamedSharding(mesh, P())
        keys = [getattr(p, "key", str(p)) for p in path]
        spec = _spec_for(keys)
        # guard: only shard when the dims divide the axis size
        axis = mesh.shape.get("model", 1)
        for dim, name in enumerate(spec):
            if name == "model" and (
                    getattr(leaf, "ndim", 0) <= dim
                    or leaf.shape[dim] % axis != 0):
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def shard_state_tp(state, mesh: Mesh):
    """device_put a TrainState (params + optimizer) with TP shardings."""
    shardings = tp_sharding_tree(state, mesh)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
