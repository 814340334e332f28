"""Experiment configuration: dataclasses + Python config files + CLI overrides.

Replaces the mmcv ``Config.fromfile`` machinery (``_base_`` inheritance,
``--options k=v`` DictAction merging — reference ``tools/train.py:67,85-99``)
with something registry-free and typed:

- a config file is a Python module defining ``def config() -> ExperimentConfig``
  (compose by importing and ``dataclasses.replace``-ing other configs — that
  *is* the ``_base_`` mechanism, just explicit);
- CLI overrides are dotted ``key=value`` pairs applied onto the frozen
  dataclass tree with type coercion (``apply_overrides``).
"""

from __future__ import annotations

import dataclasses
import importlib.util
import sys
from typing import Any

from .models.segmentor import SegmentorConfig, build_model_config
from .train.optim import OptimConfig

__all__ = ["DataConfig", "ProtoConfig", "ExperimentConfig", "load_config",
           "apply_overrides"]


@dataclasses.dataclass(frozen=True)
class DataConfig:
    data_root: str = "data/vspw/VSPW_480p"
    crop_size: tuple[int, int] = (480, 480)
    img_scale: tuple[int, int] = (853, 480)
    dilation: tuple[int, ...] = (-9, -6, -3)
    batch_size: int = 8  # global (2 clips/GPU × 4 GPUs in the reference)
    num_workers: int = 4
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class ProtoConfig:
    """CFFM++ phase-A prototype generation (the ``_gene_prototype`` configs,
    reference ``cffm.bX...vspw2_gene_prototype.py`` +
    ``cffm_head.py:161-301``): k-means over fused 1/8 features of
    ``num_frames`` uniformly-sampled frames per video."""

    n_clusters: int = 100
    num_frames: int = 10
    kmeans_iters: int = 10


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: SegmentorConfig = dataclasses.field(default_factory=lambda: build_model_config("b1"))
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    proto: ProtoConfig = dataclasses.field(default_factory=ProtoConfig)
    work_dir: str = "work_dirs/default"
    log_interval: int = 50
    checkpoint_interval: int = 4000
    load_from: str | None = None
    resume_from: str | None = None
    cluster_dir: str = "./cluster_centers"
    seed: int = 0
    bf16: bool = True


def load_config(path: str) -> ExperimentConfig:
    import os

    cfg_dir = os.path.dirname(os.path.abspath(path))
    added = cfg_dir not in sys.path
    if added:
        sys.path.insert(0, cfg_dir)  # let configs import sibling base configs
    try:
        spec = importlib.util.spec_from_file_location("user_config", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["user_config"] = mod
        spec.loader.exec_module(mod)
        cfg = mod.config()
    finally:
        if added:
            sys.path.remove(cfg_dir)
    assert isinstance(cfg, ExperimentConfig)
    return cfg


def _coerce(value: str, current: Any) -> Any:
    if value.lower() in ("none", "null"):
        return None
    if isinstance(current, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(current, int):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, tuple):
        elem0 = next((e for e in current if e is not None), None)
        if "," not in value and (elem0 is None or isinstance(elem0, str)):
            # bare string onto a per-stage impl tuple → applies to all
            # stages (models accept str | tuple)
            return value
        parts = [p.strip() for p in value.strip("()[] ").split(",")]
        if parts and parts[-1] == "" and len(parts) == len(current) + 1:
            # trailing comma ("a,b,c," on a 4-tuple) → trailing None slot
            parts = parts[:-1] + [""]
        parts = [p for p in parts if p != ""] if len(parts) != len(current) \
            else parts
        elem = next((e for e in current if e is not None), None)
        return tuple(None if p == "" else _coerce(p, elem) for p in parts)
    if current is None:
        if "," in value:
            # per-stage impl tuples on a None-valued field (e.g.
            # model.train_block_impl=ffn,ffn,ffn, → ("ffn","ffn","ffn",None))
            return tuple((p.strip() or None)
                         for p in value.strip("()[] ").split(","))
        return value
    return type(current)(value)


def apply_overrides(cfg: Any, overrides: list[str]) -> Any:
    """Apply ``a.b.c=value`` overrides onto a (possibly nested) dataclass."""
    for ov in overrides:
        key, _, value = ov.partition("=")
        cfg = _set_path(cfg, key.strip().split("."), value.strip())
    return cfg


def _set_path(node: Any, path: list[str], value: str) -> Any:
    name = path[0]
    current = getattr(node, name)
    if len(path) == 1:
        return dataclasses.replace(node, **{name: _coerce(value, current)})
    return dataclasses.replace(node, **{name: _set_path(current, path[1:], value)})
