"""Checkpoint save/restore via orbax (replaces torch.save state_dict,
reference train.py:308-327; epoch parsed from checkpoint name :70-74)."""
import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(output_dir, name):
    return os.path.abspath(os.path.join(output_dir, f"{name}.ckpt"))


def save(output_dir, state, name, epoch):
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats)
                       if state.batch_stats is not None else {},
        "opt_state": jax.device_get(state.opt_state),
        "step": int(jax.device_get(state.step)),
        "epoch": int(epoch),
    }
    with ocp.PyTreeCheckpointer() as cp:
        cp.save(_path(output_dir, name), payload, force=True)


def restore(output_dir, state_template, name="latest"):
    """Restore into the template TrainState. Returns (state, epoch) or
    (None, 0) when the checkpoint is absent."""
    path = _path(output_dir, name)
    if not os.path.exists(path):
        return None, 0
    template = {
        "params": jax.device_get(state_template.params),
        "batch_stats": jax.device_get(state_template.batch_stats)
                       if state_template.batch_stats is not None else {},
        "opt_state": jax.device_get(state_template.opt_state),
        "step": 0,
        "epoch": 0,
    }
    with ocp.PyTreeCheckpointer() as cp:
        restored = cp.restore(path, item=template)
    state = state_template.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"] or None,
        opt_state=restored["opt_state"],
        step=np.asarray(restored["step"], np.int32),
    )
    epoch = restored.get("epoch", 0)
    if not epoch:
        m = re.match(r"e(\d+)", name)
        epoch = int(m.group(1)) if m else 0
    return state, epoch


def latest_epoch(output_dir):
    """Highest e{N} checkpoint number in a model dir."""
    best = 0
    for f in os.listdir(output_dir):
        m = re.match(r"e(\d+)\.ckpt", f)
        if m:
            best = max(best, int(m.group(1)))
    return best
