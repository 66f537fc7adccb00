"""Orbax checkpoint/resume for probe training.

Upgrade over the reference, which only saves a terminal
``{cfg, model, probe}`` blob after training (``train_depth.py:832-844``) with
no optimizer state and no mid-run resume (SURVEY §5): here the full
TrainState (probe + tap-norm params, batch stats, optimizer state, step)
checkpoints every epoch and training resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from midvision_probe_tpu.engine.probe_fit import TrainState


def _manager(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int) -> None:
    # Multi-process: EVERY rank must call (orbax coordinates internally —
    # barriers + primary-host write; a rank-0-only call would deadlock the
    # sync). ckpt_dir is assumed shared across hosts, standard for cluster
    # checkpoint dirs. Reference analog: rank-0 torch.save
    # (train_depth.py:832-844).
    mgr = _manager(ckpt_dir)
    host_state = jax.tree_util.tree_map(np.asarray, state._asdict())
    mgr.save(step, args=ocp.args.StandardSave(host_state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(ckpt_dir: str, state: TrainState) -> tuple[Any, int] | None:
    """Restore the latest checkpoint into the structure of ``state``.

    Returns (state, step) or None if no checkpoint exists."""
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    template = jax.tree_util.tree_map(np.asarray, state._asdict())
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return TrainState(**restored), step
