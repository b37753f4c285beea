"""Orbax checkpointing of the full train state.

Replaces torch.save dict checkpoints (train_advanced.py:1592-1599) and the
distillation checkpoints that additionally persist loss_fn_state /
teacher-IoU cache / unfreeze state (train_distillation_staged.py:1352-1446).
Because TrainState already carries loss EMA + distillation-schedule state as
pytree fields, one orbax save captures everything needed for exact resume.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(directory: str, state, step: int,
                    metadata: Optional[Dict[str, Any]] = None,
                    max_to_keep: int = 3) -> str:
    ocp = _ocp()
    d = Path(directory).absolute()
    d.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(
        d, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        mgr.wait_until_finished()
    if metadata is not None:
        (d / f"metadata_{step}.json").write_text(json.dumps(metadata, indent=2, default=str))
    return str(d / str(step))


def restore_checkpoint(directory: str, abstract_state, step: Optional[int] = None):
    """Restore into the structure of ``abstract_state`` (a concrete or
    jax.eval_shape'd TrainState pytree)."""
    ocp = _ocp()
    d = Path(directory).absolute()
    with ocp.CheckpointManager(d) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {d}")
        restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
    return restored, step


def latest_step(directory: str) -> Optional[int]:
    ocp = _ocp()
    d = Path(directory).absolute()
    if not d.exists():
        return None
    with ocp.CheckpointManager(d) as mgr:
        return mgr.latest_step()
