"""Sharded training-step tests on the 8-device virtual CPU mesh:
compile + execute, loss decreases on a fixed batch, freeze mask honored."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import __graft_entry__ as ge
from transcar_tpu.models.detector import build_model
from transcar_tpu.parallel.mesh import make_mesh, shard_batch
from transcar_tpu.train.step import init_state, make_train_step


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8, "virtual CPU mesh missing"
    ge.dryrun_multichip(8)


def test_freeze_mask_only_updates_fusion_params():
    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=24, radar_tokens=32)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, 1, 6, 64, 96, 32, max_gt=4)
    state, tx = init_state(cfg, model, batch, total_steps=10,
                           rng=jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, tx)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    params_before = jax.tree_util.tree_map(np.asarray, state.params)
    state2, losses = step(state, batch_j, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))

    def keyof(path):
        return tuple(getattr(k, "key", str(k)) for k in path)

    flat_before = jax.tree_util.tree_flatten_with_path(params_before)[0]
    flat_after = {keyof(p): np.asarray(v)
                  for p, v in jax.tree_util.tree_flatten_with_path(
                      state2.params)[0]}
    changed_frozen, changed_fusion = [], []
    for path, before in flat_before:
        key = keyof(path)
        after = flat_after[key]
        moved = not np.allclose(before, after)
        top = key[0]
        name1 = key[1] if len(key) > 1 else ""
        is_fusion = top == "head" and (
            name1.startswith(("fusion", "final_cls", "final_reg", "radar_")))
        if is_fusion and moved:
            changed_fusion.append(key)
        if not is_fusion and moved:
            changed_frozen.append(key)
    assert not changed_frozen, f"frozen params moved: {changed_frozen[:5]}"
    assert changed_fusion, "no fusion params updated"


@pytest.mark.slow
def test_loss_decreases_on_fixed_batch():
    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=24, radar_tokens=32)
    model = build_model(cfg)
    rng = np.random.default_rng(1)
    batch = ge._fake_batch(rng, 2, 6, 64, 96, 32, max_gt=4)
    mesh = make_mesh(shape=(2,), devices=jax.devices()[:2])
    state, tx = init_state(cfg, model, batch, total_steps=50,
                           rng=jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, tx, mesh=mesh)
    sharded = shard_batch(batch, mesh)
    first = None
    for i in range(8):
        state, losses = step(state, sharded, jax.random.PRNGKey(42))
        if first is None:
            first = float(losses["total"])
    last = float(losses["total"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_param_group_labels_full_training_mode():
    """DETR3D full-training mode: backbone params get the lr-mult group,
    FrozenBN stats stay frozen, head trains (tools/train.py param groups +
    requires_grad semantics)."""
    from transcar_tpu.train.optim import make_labels
    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=8, radar_tokens=16,
                       fusion=False)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, 1, 6, 64, 96, 16, max_gt=4)
    state, _ = init_state(cfg, model, batch, total_steps=10,
                          rng=jax.random.PRNGKey(0))
    labels = make_labels(state.params, freeze_camera=False,
                         backbone_lr_mult=0.1, frozen_stages=1)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    seen = {"backbone": 0, "main": 0, "frozen": 0}
    frozen_stage1 = 0
    for path, lab in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        seen[lab] += 1
        if keys[0] == "backbone":
            if any(k == "bn" or k.startswith("bn") for k in keys[1:]):
                assert lab == "frozen", keys
            elif keys[1].startswith(("stem", "layer1_")):
                # frozen_stages=1: stem + layer1 are requires_grad=False in
                # the reference (mmdet ResNet._freeze_stages)
                assert lab == "frozen", keys
                frozen_stage1 += 1
            else:
                assert lab == "backbone", keys
        else:
            assert lab == "main", keys
    assert seen["backbone"] > 0 and seen["main"] > 0 and seen["frozen"] > 0
    assert frozen_stage1 > 0, "no stem/layer1 conv params found"


def test_warm_start_merges_partial_checkpoint_over_template():
    """Camera-only DETR3D → radar-fusion TransCAR warm start: subtrees
    absent from the converted checkpoint keep their fresh init instead of
    crashing a strict tree_map (tools/train.py --load-from semantics)."""
    from transcar_tpu.train.loop import _merge_over_template

    template = {
        "backbone": {"stem": {"kernel": np.zeros((3, 3), np.float32)}},
        "head": {
            "fusion0_attn": {"wq": np.zeros((4, 4), np.float32)},
            "cls0": {"kernel": np.zeros((2, 2), np.float32)},
        },
    }
    loaded = {   # no head.fusion0_attn at all, and stem in float64
        "backbone": {"stem": {"kernel": np.ones((3, 3), np.float64)}},
        "head": {"cls0": {"kernel": 2 * np.ones((2, 2), np.float32)}},
    }
    merged, kept = _merge_over_template(template, loaded)
    assert np.all(merged["backbone"]["stem"]["kernel"] == 1.0)
    assert merged["backbone"]["stem"]["kernel"].dtype == np.float32
    assert np.all(merged["head"]["cls0"]["kernel"] == 2.0)
    assert np.all(merged["head"]["fusion0_attn"]["wq"] == 0.0)
    assert kept == ["head/fusion0_attn/wq"]


def test_tensor_parallel_sharding_specs():
    """dp×tp mesh: Megatron-pattern specs land on the head matmuls and
    the train step runs (XLA inserts the TP collectives)."""
    from transcar_tpu.parallel.mesh import make_mesh
    from transcar_tpu.parallel.sharding import tp_sharding_tree

    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=8, radar_tokens=16)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = ge._fake_batch(rng, 2, 6, 64, 96, 16, max_gt=4)
    state, _ = init_state(cfg, model, batch, total_steps=10,
                          rng=jax.random.PRNGKey(0))
    mesh = make_mesh((2, 2), ("data", "model"), jax.devices()[:4])
    shardings = tp_sharding_tree(state.params, mesh)
    head = shardings["head"]
    assert head["fusion0_linear1"]["kernel"].spec == (None, "model")
    assert head["fusion0_linear2"]["kernel"].spec == ("model", None)
    assert head["fusion0_attn"]["wq"].spec == (None, "model")
    assert head["fusion0_attn"]["wo"].spec == ("model", None)
    # non-matmul params replicated
    assert head["fusion0_norm2"]["scale"].spec == ()

    ge.dryrun_multichip(4)   # executes one dp2×tp2 step end-to-end


def _flat_params(tree):
    return {tuple(getattr(k, "key", str(k)) for k in p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_tp_train_step_numerically_matches_replicated():
    """TP numeric equality, isolated to the thing that can actually go
    wrong in ``_spec_for``: on the SAME dp2×tp2 mesh with the SAME batch
    sharding, a train step with Megatron-sharded params must produce the
    same loss and the same updated params as one with fully REPLICATED
    params.  The only delta between the two programs is the head-matmul
    partitioning (fp32, Precision.HIGHEST), so tolerances are tight — a
    rule that mis-splits a contraction diverges loudly here.  (Comparing
    against a 1-device run instead would smear bf16-backbone batch-
    partitioning noise through the Hungarian matching's discrete flips
    and test nothing about TP — probed, see git history.)  A rule that
    silently REPLICATES is caught by the post-step sharding asserts."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from transcar_tpu.parallel.mesh import batch_sharding, make_mesh
    from transcar_tpu.parallel.sharding import shard_state_tp

    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=16, radar_tokens=32)
    model = build_model(cfg)
    rng = np.random.default_rng(5)
    batch = ge._fake_batch(rng, 2, 6, 64, 96, 32, max_gt=4)
    mesh = make_mesh((2, 2), ("data", "model"), jax.devices()[:4])

    def run(tp: bool):
        state, tx = init_state(cfg, model, batch, total_steps=10,
                               rng=jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx)
        if tp:
            state = shard_state_tp(state, mesh)
        else:
            state = jax.device_put(state, NamedSharding(mesh, P()))
        b = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
        state2, losses = step(state, b, jax.random.PRNGKey(1))
        return state2, {k: float(v) for k, v in losses.items()}

    rep_state, rep_losses = run(tp=False)
    tp_state, tp_losses = run(tp=True)

    for k in rep_losses:
        np.testing.assert_allclose(tp_losses[k], rep_losses[k],
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"loss[{k}]")
    rep_flat = _flat_params(rep_state.params)
    tp_flat = _flat_params(tp_state.params)
    assert rep_flat.keys() == tp_flat.keys()
    worst = max(rep_flat, key=lambda k: float(
        np.max(np.abs(rep_flat[k] - tp_flat[k]))))
    wdiff = float(np.max(np.abs(rep_flat[worst] - tp_flat[worst])))
    assert wdiff < 1e-4, (worst, wdiff)

    # Megatron leaves must still LIVE sharded over 'model' after the
    # step — a _spec_for rule that silently replicates fails this.
    # (XLA omits trailing None dims from reported specs: P('model',)
    # ≡ P('model', None) — normalize before comparing.)
    def norm(leaf):
        spec = tuple(leaf.sharding.spec)
        return spec + (None,) * (leaf.ndim - len(spec))

    head = tp_state.params["head"]
    assert norm(head["fusion0_linear1"]["kernel"]) == (None, "model")
    assert norm(head["fusion0_linear2"]["kernel"]) == ("model", None)
    assert norm(head["fusion0_attn"]["wq"]) == (None, "model")
    assert norm(head["fusion0_attn"]["wo"]) == ("model", None)
    # and the replicated run must NOT have model-sharded leaves (the
    # comparison would be vacuous if both ran the same partitioning)
    assert norm(rep_state.params["head"]["fusion0_linear1"]["kernel"]) \
        == (None, None)


def test_tp_eval_outputs_match_replicated_same_mesh():
    """TP-sharded params through the PLAIN jitted forward (committed
    input shardings, no step changes): pre-decode outputs match the
    replicated-params run on the same mesh.  Decode is compared via
    sorted scores only — near-tie ordering under different partitioning
    is legitimate fp behavior, not a sharding bug."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from transcar_tpu.parallel.mesh import batch_sharding, make_mesh
    from transcar_tpu.parallel.sharding import tp_sharding_tree
    from transcar_tpu.train.step import apply_model, make_eval_step

    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=24, radar_tokens=32)
    model = build_model(cfg)
    rng = np.random.default_rng(6)
    batch = ge._fake_batch(rng, 2, 6, 64, 96, 32, max_gt=4)
    state, _ = init_state(cfg, model, batch, total_steps=10,
                          rng=jax.random.PRNGKey(0))
    mesh = make_mesh((2, 2), ("data", "model"), jax.devices()[:4])

    fwd = jax.jit(lambda p, b: apply_model(model, p, b, train=False))
    batch_m = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh)), batch)
    params_rep = jax.device_put(state.params, NamedSharding(mesh, P()))
    params_tp = jax.tree_util.tree_map(
        jax.device_put, state.params,
        tp_sharding_tree(state.params, mesh))

    ref = fwd(params_rep, batch_m)
    out = fwd(params_tp, batch_m)
    for k in ("all_cls_scores", "all_bbox_preds"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)

    eval_step = make_eval_step(cfg, model)
    d_ref = eval_step(params_rep, batch_m)
    d_tp = eval_step(params_tp, batch_m)
    np.testing.assert_allclose(
        np.sort(np.asarray(d_tp["scores"]), axis=-1),
        np.sort(np.asarray(d_ref["scores"]), axis=-1),
        rtol=1e-4, atol=1e-4)


def test_eval_step_on_mesh_matches_single_device():
    """make_eval_step over a dp4 mesh: compiles, executes, and produces
    the same decode as the unsharded path (multi_gpu_test analog,
    tools/test.py:218-223)."""
    from transcar_tpu.train.step import make_eval_step

    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=24, radar_tokens=32)
    model = build_model(cfg)
    rng = np.random.default_rng(2)
    batch = ge._fake_batch(rng, 4, 6, 64, 96, 32, max_gt=4)
    state, _ = init_state(cfg, model, batch, total_steps=10,
                          rng=jax.random.PRNGKey(0))

    ref_step = make_eval_step(cfg, model)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    ref = ref_step(state.params, batch_j)

    mesh = make_mesh(shape=(4,), devices=jax.devices()[:4])
    eval_step = make_eval_step(cfg, model, mesh=mesh)
    sharded = shard_batch(batch, mesh)
    out = eval_step(state.params, sharded)

    assert out["boxes"].shape[0] == 4
    for k in ("boxes", "scores", "labels", "valid"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=2e-5, atol=2e-5)


def test_fusion_only_training_builds_no_camera_backward():
    """With freeze_camera training, the grad is cut at the fusion input
    (the reference's requires_grad=False semantics — torch builds no
    camera backward either, tools/train.py:238-252): camera-side grads
    are structurally zero and trainable-param grads are unchanged."""
    from transcar_tpu.train.loss import detr3d_loss
    from transcar_tpu.train.step import apply_model

    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=16, radar_tokens=32)
    model = build_model(cfg)
    rng = np.random.default_rng(3)
    batch = ge._fake_batch(rng, 1, 6, 64, 96, 32, max_gt=4)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    variables = model.init(jax.random.PRNGKey(0), batch_j["images"],
                           batch_j["lidar2img"], batch_j["radar_tokens"])
    params = variables["params"]

    def loss_fn(p, stop):
        preds = apply_model(model, p, batch_j, train=True,
                            rngs={"gridmask": jax.random.PRNGKey(9),
                                  "dropout": jax.random.PRNGKey(10)},
                            stop_camera_grad=stop)
        return detr3d_loss(preds, batch_j["gt_boxes"],
                           batch_j["gt_labels"], batch_j["num_gt"],
                           cfg.model.head)["total"]

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(p, True))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)

    # camera-side grads vanish under the stop
    for sub in ("backbone", "neck"):
        leaves = jax.tree_util.tree_leaves(g1[sub])
        assert all(float(jnp.abs(g).max()) == 0.0 for g in leaves), sub
    # trainable fusion grads are unchanged
    def fusion_leaves(g):
        return {k: v for k, v in g["head"].items()
                if k.startswith(("fusion", "final_cls", "final_reg",
                                 "radar_"))}
    f0 = jax.tree_util.tree_leaves(fusion_leaves(g0))
    f1 = jax.tree_util.tree_leaves(fusion_leaves(g1))
    assert f1
    for a, b in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_no_recompilation_across_steps():
    """SURVEY §4(d): every shape is static, so the jitted train/eval steps
    must trace+compile exactly once — later steps with different data
    (other num_gt, other images) reuse the executable."""
    import logging

    cfg = ge._tiny_cfg(num_decoder_layers=1, num_query=24, radar_tokens=32)
    model = build_model(cfg)
    rng = np.random.default_rng(3)
    batch = ge._fake_batch(rng, 1, 6, 64, 96, 32, max_gt=4)
    state, tx = init_state(cfg, model, batch, total_steps=10,
                           rng=jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, tx)

    records = []
    handler = logging.Handler()
    handler.emit = lambda r: records.append(r.getMessage())
    logger = logging.getLogger("jax")
    logger.addHandler(handler)
    try:
        with jax.log_compiles():
            batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
            state, _ = step(state, batch_j, jax.random.PRNGKey(1))
            jax.block_until_ready(state.params)
            n_first = len([m for m in records if "ompil" in m])
            assert n_first >= 1, "vacuous: log_compiles captured nothing"

            records.clear()
            for seed in (7, 8):          # different data, other num_gt
                nb = ge._fake_batch(np.random.default_rng(seed),
                                    1, 6, 64, 96, 32, max_gt=4)
                nb["num_gt"] = np.minimum(nb["num_gt"], seed - 5)
                state, losses = step(
                    state, jax.tree_util.tree_map(jnp.asarray, nb),
                    jax.random.PRNGKey(seed))
            jax.block_until_ready(state.params)
            again = [m for m in records if "ompil" in m]
            assert not again, f"train step retraced: {again[:3]}"
    finally:
        logger.removeHandler(handler)
