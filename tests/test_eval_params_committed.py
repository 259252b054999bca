"""evaluate() must commit the param tree to device ONCE before the eval
loop.  fold_bn_into_conv (the eval default) and checkpoint loading both
produce host-numpy leaves, and jit re-uploads host-numpy arguments on
EVERY call — a silent full-param-tree (~240 MB for R101) host→device
transfer per eval step that dominated end-to-end serving cost
(scripts/probe_eval_phases.py; docs/PERF_NOTES.md serving section).
The reference never hits this class of bug because torch modules own
device-resident weights (tools/test.py:197 load_checkpoint → .cuda()).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from transcar_tpu.models.detector import build_model
from transcar_tpu.train.loop import evaluate
from transcar_tpu.train.step import make_eval_step


def test_evaluate_commits_params_to_device(tmp_path):
    from tests.test_train_loop_e2e import _cfg, _make_dataset

    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    _make_dataset(root, n_samples=2)
    cfg = _cfg(root, str(tmp_path / "work"))
    model = build_model(cfg)
    b = ge._fake_batch(np.random.default_rng(0), 1, 6, 64, 96, 32, max_gt=8)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(b["images"]),
        jnp.asarray(b["lidar2img"]))["params"]
    # simulate checkpoint-loaded (host numpy) params
    np_params = jax.tree_util.tree_map(np.asarray, params)

    real_step = make_eval_step(cfg, model)
    seen = {}

    def spy_step(p, batch, batch_stats=None):
        seen.setdefault("leaves", jax.tree_util.tree_leaves(p))
        return real_step(p, batch, batch_stats)

    evaluate(cfg, np_params, out_path=str(tmp_path / "out.json"),
             _eval_step=spy_step)

    assert seen["leaves"], "spy step never called"
    bad = [type(x) for x in seen["leaves"] if not isinstance(x, jax.Array)]
    assert not bad, (
        f"evaluate() passed {len(bad)} host-numpy param leaves to the eval "
        f"step (first type: {bad[0]}); each call re-transfers them")
