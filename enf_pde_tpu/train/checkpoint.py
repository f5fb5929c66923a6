"""Orbax checkpointing of the TrainState + config (save every N epochs, keep last K).

Parity with reference ``_base_pde_trainer.py:122-135,192-237`` but with a uniform
resume path for every experiment (the reference wires resume only for IHC).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, log_dir: str, every_n_epochs: int = 50, keep_n: int = 1):
        path = os.path.abspath(os.path.join(log_dir, "checkpoints"))
        os.makedirs(path, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            save_interval_steps=every_n_epochs, max_to_keep=keep_n
        )
        self._mgr = ocp.CheckpointManager(
            directory=path,
            options=options,
            item_handlers={
                "state": ocp.StandardCheckpointHandler(),
                "config": ocp.JsonCheckpointHandler(),
            },
            item_names=["state", "config"],
        )

    def save(self, epoch: int, state, config_dict: dict):
        self._mgr.save(
            step=epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state), config=ocp.args.JsonSave(config_dict)
            ),
        )

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state, epoch: Optional[int] = None):
        """Restore into the structure of ``abstract_state`` (an initialized TrainState)."""
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("No checkpoint found.")
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(target)),
        )
        return restored["state"]

    def restore_config(self, epoch: Optional[int] = None) -> dict:
        """Restore the config saved alongside the state (reference
        ``_base_pde_trainer.py:203-237`` restores both; a resumed run must not
        silently trust the caller's config)."""
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("No checkpoint found.")
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(config=ocp.args.JsonRestore())
        )
        return restored["config"]

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
