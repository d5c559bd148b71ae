"""Checkpointing: a strict superset of the reference's.

The reference saves bare ``state_dict`` pickles every 1000 steps and has NO
load/resume path anywhere — optimizer state and the step counter are lost
(reference train.py:84-90; SURVEY.md section 5). Here the full TrainState
(params + optimizer state + step + RNG) round-trips through Orbax, with
retention and resume-from-latest.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from spair_pytorch_tpu.parallel.train_step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, state: TrainState, step: Optional[int] = None):
        step = int(state.step if step is None else step)
        self._mgr.save(step, args=ocp.args.StandardSave(_to_pytree(state)))
        return step

    def restore(self, template: TrainState, step: Optional[int] = None,
                params_only: bool = False) -> Optional[TrainState]:
        """Restore into the shapes/dtypes of ``template``; returns None when
        no checkpoint exists (fresh start).

        ``params_only`` skips the optimizer state (partial restore) — for
        evaluation/export, where the training run may have used a different
        optimizer structure (e.g. gradient clipping wraps opt_state in a
        chain) than the preset default."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if params_only:
            item = {"step": template.step, "params": template.params,
                    "rng": template.rng}
            # explicit per-leaf restore args: without them, restoring a
            # TPU-written checkpoint on a CPU host fails with "sharding
            # ... Got None" (orbax needs a concrete target sharding; the
            # template's arrays carry one).
            restore_args = ocp.checkpoint_utils.construct_restore_args(item)
            restored = self._mgr.restore(
                step, args=ocp.args.PyTreeRestore(
                    item, restore_args=restore_args, partial_restore=True))
            return TrainState(step=restored["step"],
                              params=restored["params"],
                              opt_state=template.opt_state,
                              rng=restored["rng"])
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_to_pytree(template)))
        return _from_pytree(restored)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def _to_pytree(state: TrainState):
    return {"step": state.step, "params": state.params,
            "opt_state": state.opt_state, "rng": state.rng}


def _from_pytree(tree) -> TrainState:
    return TrainState(step=tree["step"], params=tree["params"],
                      opt_state=tree["opt_state"], rng=tree["rng"])
