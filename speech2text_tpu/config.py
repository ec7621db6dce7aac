"""YAML config system.

Keeps the reference's config surface (one YAML section per component,
dataclass-validated; see reference build_task.py:30-33, SURVEY §5) while the
`trainer:` section drives our explicit JAX training loop instead of
pl.Trainer.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
from typing import Any, Dict, Type, TypeVar

import yaml

T = TypeVar("T")


def load_config(path: str) -> Dict[str, Any]:
    """Load a YAML config file into a plain dict tree."""
    with open(path, "r") as f:
        return yaml.safe_load(f)


def backup_config(path: str, export_dir: str) -> str:
    """Copy the config into the task export dir (reference build_task.py:68-70)."""
    os.makedirs(export_dir, exist_ok=True)
    dst = os.path.join(export_dir, os.path.basename(path))
    if os.path.abspath(path) != os.path.abspath(dst):
        shutil.copyfile(path, dst)
    return dst


def from_dict(cls: Type[T], cfg: Dict[str, Any] | None) -> T:
    """Build a dataclass from a config dict, erroring on unknown keys.

    Mirrors the reference's `Config(**config["..."])` pattern but with a
    clearer error message for typos.
    """
    cfg = dict(cfg or {})
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(cfg) - names
    if unknown:
        raise ValueError(
            f"{cls.__name__}: unknown config keys {sorted(unknown)}; "
            f"valid keys: {sorted(names)}")
    return cls(**cfg)


def override(cfg: Dict[str, Any], dotted_key: str, value: Any) -> None:
    """In-place override `a.b.c=value` for CLI-style overrides."""
    keys = dotted_key.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = yaml.safe_load(str(value))
