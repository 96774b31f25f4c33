"""Training-state checkpointing: orbax for resume, diffusers-format export for
the final artifact.

Mirrors the reference's accelerate.save_state rotation + diffusers subfolder
hooks (scripts/train.py:640-691,1063-1086) with orbax's async array
checkpointing (TPU-idiomatic, works on sharded pytrees directly).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Rotating step checkpoints of an arbitrary pytree (params + opt_state)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, *, wait: bool = False) -> None:
        """Async by default: orbax copies device->host synchronously (safe
        even with donated train-step buffers) and writes to disk in the
        background, overlapping the next train steps; the wait for the
        PREVIOUS save happens here instead of stalling after every save.
        wait=True blocks until durable (final/preemption checkpoints)."""
        self.manager.wait_until_finished()
        self.manager.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self.manager.wait_until_finished()
        return self.manager.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        self.manager.wait_until_finished()
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        if template is not None:
            return self.manager.restore(step, args=ocp.args.StandardRestore(template))
        return self.manager.restore(step)
