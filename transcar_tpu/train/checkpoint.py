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
    """Full-state resume (--resume-from analog)."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(work_dir, "checkpoints"))
    with ocp.CheckpointManager(path) as mgr:
        step = step if step is not None else mgr.latest_step()
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)))
    return restored["state"], step


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
    saved TrainState is extracted."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state_dir = os.path.join(path, "state")
    if os.path.isdir(state_dir):    # CheckpointManager composite step dir
        raw = ckptr.restore(state_dir)
        return raw["params"]
    return ckptr.restore(path, params_template)
