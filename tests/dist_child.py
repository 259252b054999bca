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




def main_train():
    """2-process FULL train(): exercises the pc>1 global-mesh branch,
    per-process loader slicing and rank-0 logging end-to-end."""
    import jax

    from transcar_tpu.core.config import (BackboneConfig, DataConfig,
                                          HeadConfig, ModelConfig,
                                          OptimConfig, TrainConfig,
                                          TransCARConfig)
    from transcar_tpu.parallel.distributed import (
        maybe_initialize_distributed)

    pi, pc = maybe_initialize_distributed()
    assert pc == 2, pc
    assert len(jax.devices()) == 4

    root = os.environ["DIST_DATA_ROOT"]
    work = os.environ["DIST_WORK_DIR"]
    cfg = TransCARConfig(
        name="dist_train_test",
        model=ModelConfig(
            backbone=BackboneConfig(kind="resnet50", compute_dtype=None,
                                    with_dcn=(False,) * 4),
            head=HeadConfig(num_query=8, num_decoder_layers=1,
                            with_radar_fusion=False),
            use_grid_mask=False),
        data=DataConfig(data_root=root, img_hw=(64, 96), max_gt_boxes=8,
                        workers=0, samples_per_device=1),
        train=TrainConfig(
            optim=OptimConfig(total_epochs=1, warmup_iters=1,
                              freeze_camera_branch=False),
            work_dir=work, mesh_shape=(2,)),   # must be OVERRIDDEN by pc>1
    )
    from transcar_tpu.train.loop import train

    state = train(cfg, max_steps=1, log_interval=1)
    assert int(state.step) == 1
    # global mesh spans all 4 devices despite mesh_shape=(2,)
    if pi == 0:
        logs = [f for f in os.listdir(work) if f.endswith(".log.json")]
        assert logs, os.listdir(work)
    print(f"dist train child {pi}/{pc} OK", flush=True)


if __name__ == "__main__":
    if os.environ.get("DIST_TEST_MODE") == "train":
        main_train()
    else:
        main()
