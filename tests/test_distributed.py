"""Multi-host wiring tests (SURVEY.md §5 distributed backend;
tools/train.py:153-160, tools/test.py:218-223 analogs).

Fast layer: per-process batch slicing + single-process gather passthrough.
Real layer: two actual OS processes under jax.distributed on CPU backends
(2 virtual devices each → one 4-device global mesh), exercising env-var
initialization, make_array_from_process_local_data, a jitted global-batch
reduction, and the unequal-count eval allgather."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from transcar_tpu.parallel.distributed import (allgather_eval_outputs,
                                               local_batch_slice)


def test_local_batch_slices_partition_the_global_batch():
    got = []
    for pi in range(4):
        s = local_batch_slice(pi, 4, 8)
        got.extend(range(8)[s])
    assert got == list(range(8))
    with pytest.raises(ValueError):
        local_batch_slice(0, 3, 8)


def test_loader_process_slices_are_disjoint_and_cover():
    """Two rank loaders with the same seed reproduce the single-process
    global shuffle, split into disjoint contiguous halves (the reference's
    DistributedSampler contract)."""
    from transcar_tpu.data.loader import PrefetchLoader

    class _Spy(PrefetchLoader):
        def epoch_indices(self, epoch_idx):
            # replicate epoch()'s index math without loading samples
            from transcar_tpu.parallel.distributed import local_batch_slice
            order = self.indices.copy()
            np.random.default_rng(self.seed + epoch_idx).shuffle(order)
            nb = len(order) // self.batch_size
            b = order[: nb * self.batch_size].reshape(nb, self.batch_size)
            if self.process_count > 1:
                b = b[:, local_batch_slice(self.process_index,
                                           self.process_count,
                                           self.batch_size)]
            return b

    class _DS:
        def __len__(self):
            return 19

    kw = dict(cfg=None, batch_size=4, training=True, seed=7, workers=0)
    full = _Spy(_DS(), **kw).epoch_indices(3)
    r0 = _Spy(_DS(), process_index=0, process_count=2, **kw
              ).epoch_indices(3)
    r1 = _Spy(_DS(), process_index=1, process_count=2, **kw
              ).epoch_indices(3)
    assert r0.shape == r1.shape == (4, 2)
    np.testing.assert_array_equal(np.concatenate([r0, r1], axis=1), full)


def test_allgather_eval_outputs_single_process_passthrough():
    stacked = {"scores": np.arange(5, dtype=np.float32),
               "sample_idx": np.arange(5, dtype=np.int32)}
    gathered, keep = allgather_eval_outputs(stacked, 3)
    assert list(gathered["sample_idx"]) == [0, 1, 2]
    assert list(keep) == [0, 1, 2]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_cpu():
    port = _free_port()
    child = os.path.join(os.path.dirname(__file__), "dist_child.py")
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items() if "axon" not in v}
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("TPU_SKIP_MDS_QUERY", None)
        procs.append(subprocess.Popen(
            [sys.executable, child], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"dist child {pid}/2 OK" in out, out


@pytest.mark.slow
def test_two_process_full_train_step(tmp_path):
    """2 OS processes × 2 CPU devices run train() end-to-end: the data
    mesh must span the GLOBAL 4-device set (mesh_shape is a single-host
    knob), each rank loads its slice, rank 0 logs."""
    from tests.test_train_loop_e2e import _make_dataset

    root = str(tmp_path / "data")
    work = str(tmp_path / "work")
    os.makedirs(root)
    _make_dataset(root)

    port = _free_port()
    child = os.path.join(os.path.dirname(__file__), "dist_child.py")
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items() if "axon" not in v}
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            DIST_TEST_MODE="train",
            DIST_DATA_ROOT=root,
            DIST_WORK_DIR=work,
        )
        env.pop("TPU_SKIP_MDS_QUERY", None)
        procs.append(subprocess.Popen(
            [sys.executable, child], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"dist train child {pid}/2 OK" in out, out
