"""Orbax checkpointing with CLASSES/PALETTE/config metadata.

Parity with the reference checkpoint surface (SURVEY §5): mmcv's
``CheckpointHook`` embeds mmseg version + config text + CLASSES/PALETTE in
``meta`` (``tools/train.py:167-174``) which ``tools/test.py:134-135`` and
``init_segmentor`` read back. Here: orbax saves the train-state pytree and a
JSON metadata blob side by side; ``latest_step``/restore mirror
``--resume-from`` (optimizer + iteration restored) and ``--load-from``
(params only).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from .state import TrainState

__all__ = ["CheckpointManager"]


def _config_to_jsonable(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: _config_to_jsonable(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, dict):
        return {k: _config_to_jsonable(v) for k, v in cfg.items()}
    if isinstance(cfg, (tuple, list)):
        return [_config_to_jsonable(v) for v in cfg]
    return cfg


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: TrainState, metadata: dict | None = None):
        step = int(state.step)
        # every process participates in the orbax save (it coordinates
        # internally); the metadata side-file is written by rank 0 only
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if metadata is not None and jax.process_index() == 0:
            with open(os.path.join(self.directory, f"metadata_{step}.json"), "w") as f:
                json.dump(_config_to_jsonable(metadata), f)
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState, step: int | None = None) -> TrainState:
        """Full resume: params + optimizer + iteration (≙ ``--resume-from``)."""
        step = step if step is not None else self.latest_step()
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def load_params(self, state_template: TrainState, step: int | None = None):
        """Warm start: params (+ batch stats) only (≙ ``--load-from``,
        used to initialise CFFM++ finetune from a CFFM checkpoint).

        strict=False semantics (reference ``load_checkpoint(strict=False)``):
        the checkpoint is restored without a structure template and overlaid
        onto the freshly-initialised params — modules absent from the
        checkpoint (e.g. the finetune head's ``decoder_swin``/``linear_pred3``)
        keep their init values, and the checkpoint's optimizer state is
        ignored entirely.
        """
        step = step if step is not None else self.latest_step()
        raw = self._mgr.restore(step)  # pytree of dicts/arrays, no template

        def merge(dst, src):
            out = dict(dst)
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(out.get(k), dict):
                    out[k] = merge(out[k], v)
                else:
                    out[k] = v
            return out

        params = merge(state_template.params, raw["params"])
        batch_stats = merge(state_template.batch_stats, raw.get("batch_stats") or {})
        return params, batch_stats

    def metadata(self, step: int | None = None) -> dict | None:
        step = step if step is not None else self.latest_step()
        path = os.path.join(self.directory, f"metadata_{step}.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return None
