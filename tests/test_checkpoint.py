"""Orbax checkpoint round-trips: full TrainState save/restore, params-only
publish/load, and restore-into-template equality."""
import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from transcar_tpu.models.detector import build_model
from transcar_tpu.train import checkpoint as ckpt
from transcar_tpu.train.step import init_state


def _tiny_state():
    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=8, radar_tokens=16)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, 1, 6, 64, 96, 16, max_gt=4)
    state, _ = init_state(cfg, model, batch, total_steps=10,
                          rng=jax.random.PRNGKey(0))
    return cfg, state


def test_save_restore_roundtrip(tmp_path):
    cfg, state = _tiny_state()
    work = str(tmp_path / "run")
    ckpt.save_checkpoint(work, 7, state, config_dict={"name": cfg.name})
    restored, step = ckpt.restore_checkpoint(work, state)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_only_publish(tmp_path):
    _, state = _tiny_state()
    path = str(tmp_path / "published")
    ckpt.save_params_only(path, state.params)
    loaded = ckpt.load_params_only(path, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
