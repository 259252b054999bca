"""Multi-host runtime wiring (SURVEY.md §5 distributed backend).

The reference initializes a NCCL process group per GPU process
(mmcv ``init_dist``, tools/train.py:153-160) and gathers eval results
across ranks (tools/test.py:218-223).  The TPU-native equivalent is one
jax process per host: ``jax.distributed.initialize`` connects them, every
process sees the global device set, the loader feeds each process only
its shard of the global batch, and ``jax.make_array_from_process_local_data``
assembles the sharded global arrays the jitted step consumes — XLA's
collectives then ride ICI within a slice and DCN across hosts.

Env contract (consumed here; exported by tools/dist_train.sh):
  JAX_COORDINATOR_ADDRESS  host:port of process 0
  JAX_NUM_PROCESSES        total processes
  JAX_PROCESS_ID           this process's rank
Under Slurm/TPU-pod metadata jax auto-detects and the variables are
optional (``jax.distributed.initialize()`` with no args).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

_initialized = False


def maybe_initialize_distributed() -> Tuple[int, int]:
    """Initialize jax.distributed from the env if configured.

    Returns (process_index, process_count).  Idempotent; a no-op single
    process setup returns (0, 1) without touching the runtime.
    """
    global _initialized
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    under_slurm = "SLURM_JOB_ID" in os.environ and int(
        os.environ.get("SLURM_NTASKS", "1")) > 1
    if not _initialized and (coord or under_slurm):
        kwargs = {}
        if coord:
            kwargs["coordinator_address"] = coord
        if nproc:
            kwargs["num_processes"] = int(nproc)
        pid = os.environ.get("JAX_PROCESS_ID")
        if pid is not None:
            kwargs["process_id"] = int(pid)
        jax.distributed.initialize(**kwargs)
        _initialized = True
    return jax.process_index(), jax.process_count()


def local_batch_slice(process_index: int, process_count: int,
                      global_batch: int) -> slice:
    """This process's rows of each global batch (loader-side sharding)."""
    if global_batch % process_count:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{process_count} processes")
    per = global_batch // process_count
    return slice(process_index * per, (process_index + 1) * per)


def make_global_batch(local_batch: Dict[str, np.ndarray], mesh,
                      axis: str = "data"):
    """Per-process local batch → global jax.Arrays sharded over `axis`.

    Single-process: a plain device_put with the batch sharding (identical
    to the round-1 shard_batch).  Multi-process: each process contributes
    its local rows via ``jax.make_array_from_process_local_data``; the
    result's global shape is [sum of local batches, ...].
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), local_batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch)


def allgather_eval_outputs(local: Dict[str, np.ndarray],
                           n_local: int,
                           max_local: Optional[int] = None
                           ) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Gather per-process eval outputs to every process (multi_gpu_test
    collect analog, tools/test.py:222-223).

    ``local`` maps name → [n_local, ...] stacked per-sample arrays; sample
    counts may differ across processes, so arrays are padded to the max
    and a validity mask is gathered alongside.

    Returns (gathered dict with leading dim Σ n_local over processes,
    kept-row mask applied — i.e. concatenated real rows in process order).
    """
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return {k: np.asarray(v)[:n_local] for k, v in local.items()}, \
            np.arange(n_local)

    if max_local is None:
        counts = multihost_utils.process_allgather(
            np.asarray([n_local], np.int32))
        max_local = int(np.max(counts))
    out: Dict[str, np.ndarray] = {}
    keep = None
    for k, v in local.items():
        v = np.asarray(v)
        pad = [(0, max_local - v.shape[0])] + [(0, 0)] * (v.ndim - 1)
        g = multihost_utils.process_allgather(np.pad(v, pad))
        g = g.reshape((-1,) + v.shape[1:])          # [P·max_local, ...]
        if keep is None:
            mask = np.zeros((max_local,), bool)
            mask[:n_local] = True
            gm = multihost_utils.process_allgather(mask).reshape(-1)
            keep = np.nonzero(gm)[0]
        out[k] = g[keep]
    return out, keep
