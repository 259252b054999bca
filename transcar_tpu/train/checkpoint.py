"""Orbax checkpointing (SURVEY.md §5 checkpoint/resume).

Replaces the mmcv checkpoint hook stack: epoch checkpoints with
config/step metadata, warm-start ``load_from`` (mandatory for TransCAR —
the camera net comes from a pretrained DETR3D checkpoint,
tools/train.py:238-252), and full-state ``resume_from``.  Also the
``publish_model.py`` analog: ``save_params_only`` strips optimizer state.
"""
from __future__ import annotations

import os
from typing import Optional

def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(work_dir: str, step: int, state, config_dict=None,
                    keep: int = 5) -> str:
    """Save the full TrainState pytree (params + optimizer + step)."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(work_dir, "checkpoints"))
    os.makedirs(path, exist_ok=True)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep),
    ) as mgr:
        items = {"state": ocp.args.StandardSave(state)}
        if config_dict is not None:
            items["config"] = ocp.args.JsonSave(config_dict)
        mgr.save(step, args=ocp.args.Composite(**items))
    return os.path.join(path, str(step))


def restore_checkpoint(work_dir: str, state_template,
                       step: Optional[int] = None):
    """Full-state resume (--resume-from analog).

    Restores to HOST numpy (via a numpy-leaf template): the jitted step's
    in_shardings re-place the state, so a checkpoint saved on one device
    topology resumes on any other — including a multi-host world where
    device-sharded orbax restore would need the original device set."""
    import jax
    import numpy as np

    ocp = _ocp()
    path = os.path.abspath(os.path.join(work_dir, "checkpoints"))
    with ocp.CheckpointManager(path) as mgr:
        step = step if step is not None else mgr.latest_step()
        tmpl = jax.tree_util.tree_map(np.asarray, state_template)
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(tmpl)))
    return restored["state"], step


def _restore_numpy_tree(path: str):
    """Restore an orbax pytree dir to host numpy without a template (and
    without constructing device arrays — multi-host/topology safe)."""
    import jax
    import numpy as np

    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata.tree
    ra = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    return ckptr.restore(path, restore_args=ra)


def save_params_only(path: str, params) -> None:
    """publish_model analog: params without optimizer state."""
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params_only(path: str, params_template=None):
    """Warm-start ``load_from`` analog.

    Accepts either a published params-only dir (save_params_only) or a
    training checkpoint step dir from save_checkpoint (``.../checkpoints/N``
    — the reference's tools/test.py takes a training checkpoint directly,
    so the eval CLI must too); for the latter the params subtree of the
    saved TrainState is extracted.  With ``params_template`` the restored
    tree is validated against the model's structure (clear error instead
    of a late jit failure) and leaves are cast to the template dtypes."""
    path = os.path.abspath(path)
    state_dir = os.path.join(path, "state")
    if os.path.isdir(state_dir):    # CheckpointManager composite step dir
        params = _restore_numpy_tree(state_dir)["params"]
    else:
        params = _restore_numpy_tree(path)
    if params_template is not None:
        import jax

        t_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                   jax.tree_util.tree_flatten_with_path(
                       params_template)[0]}
        p_flat = jax.tree_util.tree_flatten_with_path(params)[0]
        p_paths = {jax.tree_util.keystr(p): v.shape for p, v in p_flat}
        missing = sorted(set(t_paths) - set(p_paths))
        extra = sorted(set(p_paths) - set(t_paths))
        bad_shape = sorted(k for k in t_paths.keys() & p_paths.keys()
                           if tuple(t_paths[k]) != tuple(p_paths[k]))
        if missing or extra or bad_shape:
            raise ValueError(
                f"checkpoint {path!r} does not match the model: "
                f"missing={missing[:5]} extra={extra[:5]} "
                f"shape-mismatch={bad_shape[:5]} "
                f"(counts: {len(missing)}/{len(extra)}/{len(bad_shape)})")
        import numpy as np

        params = jax.tree_util.tree_map(
            lambda t, v: np.asarray(v, dtype=t.dtype), params_template,
            params)
    return params


def load_batch_stats(path: str):
    """Running BN statistics from a training checkpoint step dir (LiDAR
    track); {} when the checkpoint carries none (camera track / published
    params-only dirs)."""
    state_dir = os.path.join(os.path.abspath(path), "state")
    if os.path.isdir(state_dir):
        raw = _restore_numpy_tree(state_dir)
        return raw.get("batch_stats", {}) or {}
    return {}
