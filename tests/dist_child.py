"""Child process for the 2-process jax.distributed CPU test
(tests/test_distributed.py).  Each process owns 2 virtual CPU devices;
together they form a 4-device 'data' mesh.  Exercises the real multi-host
path: jax.distributed.initialize from env, per-process loader slicing,
make_array_from_process_local_data global batch assembly, a jitted psum
over the global batch, and the unequal-count eval allgather."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from transcar_tpu.parallel.distributed import (
        allgather_eval_outputs, local_batch_slice,
        maybe_initialize_distributed, make_global_batch)
    from transcar_tpu.parallel.mesh import make_mesh

    pi, pc = maybe_initialize_distributed()
    assert pc == 2, pc
    devices = jax.devices()
    assert len(devices) == 4, devices
    mesh = make_mesh((4,), ("data",), devices)

    # global batch 4: process p contributes rows [2p, 2p+1] with
    # recognizable content row_value = global_row * 10
    sl = local_batch_slice(pi, pc, 4)
    rows = np.arange(4)[sl]
    local = {"x": (rows[:, None] * 10.0 + np.arange(3)).astype(np.float32)}
    gbatch = make_global_batch(local, mesh)
    assert gbatch["x"].shape == (4, 3), gbatch["x"].shape

    @jax.jit
    def total(b):
        return jnp.sum(b["x"])

    # Σ over the full global batch: rows 0,10,20,30 each + (0+1+2)
    expect = sum(r * 10 * 3 + 3 for r in range(4))
    got = float(total(gbatch))
    assert got == expect, (got, expect)

    # eval gather with unequal per-process counts (rank0: 2, rank1: 1)
    n_local = 2 - pi
    stacked = {
        "scores": (pi * 100 + np.arange(n_local, dtype=np.float32)),
        "sample_idx": np.asarray([pi * 100 + i for i in range(n_local)],
                                 np.int32),
    }
    gathered, _ = allgather_eval_outputs(stacked, n_local)
    assert list(gathered["sample_idx"]) == [0, 1, 100], gathered
    assert np.allclose(gathered["scores"], [0.0, 1.0, 100.0]), gathered

    print(f"dist child {pi}/{pc} OK", flush=True)


if __name__ == "__main__":
    main()
