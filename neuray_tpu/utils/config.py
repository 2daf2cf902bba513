"""YAML config system with reference-compatible surface.

The reference merges a flat YAML dict over per-class ``default_cfg``
dicts (reference utils/base_utils.py:316-318 and e.g. renderer.py:55).
We keep the same YAML files/keys (CLI parity) and expose the same
merge helper; typed configs (RenderConfig, TrainConfig) are built from
the merged dicts at construction sites.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import yaml


def load_cfg(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.load(f, Loader=yaml.FullLoader)


def merge_cfg(default_cfg: Dict[str, Any], cfg: Dict[str, Any]) -> Dict[str, Any]:
    return {**default_cfg, **cfg}


def save_cfg(cfg: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
