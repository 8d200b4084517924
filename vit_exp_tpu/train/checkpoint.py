"""Checkpointing via orbax: params + optimizer state + step in one tree.

Improves on the reference, which saves only the model state_dict as
`CTClip.{steps}.pt` and on resume parses the step from the FILENAME and
drops optimizer state (CTCLIPTrainer.py:797-807, 435-447).  We keep the
step-in-name layout for familiarity (ckpt_{step}/) but store the full train
state; `load_model_only` reproduces the reference's weights-only resume.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, *, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step}")

    def all_steps(self):
        steps = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"ckpt_(\d+)", name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step: int, state: Any, *, wait: bool = False):
        """Async by default: orbax copies the tree to host before returning
        (so donated device buffers may be reused immediately) and writes in
        the background, overlapping disk IO with the next training steps.
        `wait=True` blocks until the write is durable — use for the final /
        preemption save."""
        self._ckptr.wait_until_finished()  # one write in flight at a time
        self._ckptr.save(self._path(step), state, force=True)
        if wait:
            self._ckptr.wait_until_finished()
        if self.max_to_keep:
            # prunes only older completed steps; the in-flight dir is in the
            # kept tail by construction
            for s in self.all_steps()[: -self.max_to_keep]:
                import shutil

                shutil.rmtree(self._path(s), ignore_errors=True)

    def wait_until_finished(self):
        self._ckptr.wait_until_finished()

    def restore(self, step: int, target: Any) -> Any:
        """target: a pytree of like-shaped arrays (e.g. jax.eval_shape out)."""
        self._ckptr.wait_until_finished()
        return self._ckptr.restore(self._path(step), target)

    def load_model_only(self, step: int, params_target: Any) -> Any:
        """Weights-only resume (reference clip.load path, ct_clip.py:760-774)."""
        restored = self.restore(step, params_target)
        return restored
