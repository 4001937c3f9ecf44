"""Checkpointing via Orbax.

Replaces the torch .pth conventions of the reference (SURVEY.md 5.4):
RC-Net saves a full dict with train_step + optimizer state
(RCNet/rcnet_model.py:211-257, resume at rcnet_main.py:246-252); SML saves
bare weights with a legacy-tolerant loader (modules/midas/base_model.py).
Here both stages use one step-indexed Orbax layout:

    <dir>/<step>/   - params, batch_stats, opt_state, step

`save_train_state` / `restore_train_state` round-trip the TrainState
pytree; `restore_params` loads weights-only (the SML `.load` analog);
`latest_step` discovers resume points.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: Optional[int] = None
             ) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_train_state(directory: str, state: Any,
                     max_to_keep: Optional[int] = None) -> None:
    """Save a TrainState (or any pytree with a .step leaf) at its step."""
    mgr = _manager(directory, max_to_keep)
    step = int(jax.device_get(state.step))
    mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_train_state(directory: str, template: Any,
                        step: Optional[int] = None) -> Any:
    """Restore a TrainState saved by save_train_state.

    `template` supplies the pytree structure/dtypes (an abstract or
    freshly-initialized state)."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {directory}")
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(jax.device_get(template)))
    mgr.close()
    return restored


def save_params(path: str, params: Any) -> None:
    """Weights-only save (the SML base_model.save analog)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), jax.device_get(params))
    ckpt.wait_until_finished()
    ckpt.close()


def restore_params(path: str, template: Any) -> Any:
    """Weights-only restore, tolerant of a state dict that nests params
    under 'params' (the reference loader strips lightning prefixes and
    {'model': ...} wrappers, base_model.py:5-26)."""
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path),
                            jax.device_get(template))
    ckpt.close()
    return restored
