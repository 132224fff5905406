"""YAML config system with provenance snapshot and result write-back.

Rebuilds the Cathode config flow (/root/reference/Cathode/src/header.jl:17-86,
crnn_cathode.jl:44-46): load a YAML into a typed dict, snapshot it into the
results directory for provenance, and append final losses back into the
snapshot when training finishes. Every case config dataclass can also be
round-tripped through YAML via ``config_from_yaml``.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
from typing import Any, Type, TypeVar

import yaml

T = TypeVar("T")


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def config_from_yaml(cls: Type[T], path: str, **overrides: Any) -> T:
    """Build a case-config dataclass from a YAML file; unknown keys error."""
    raw = load_yaml(path) or {}
    raw.update(overrides)
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(raw) - names
    if unknown:
        raise ValueError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    return cls(**raw)


def snapshot_config(config_path: str, results_dir: str) -> str:
    """Copy the config into the results dir (provenance, header.jl:86)."""
    os.makedirs(results_dir, exist_ok=True)
    dst = os.path.join(results_dir, os.path.basename(config_path))
    shutil.copyfile(config_path, dst)
    return dst


def writeback_results(config_path: str, updates: dict) -> None:
    """Append/overwrite result fields in a YAML config snapshot
    (crnn_cathode.jl:44-46: min train/val losses written back)."""
    data = load_yaml(config_path) or {}
    data.update(updates)
    with open(config_path, "w") as f:
        yaml.safe_dump(data, f, sort_keys=False)
