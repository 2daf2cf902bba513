"""Flat-npz save/load for flax param pytrees.

A minimal, orbax-free format for small self-contained weight files that
get checked into the repo (bench weights, test fixtures): one npz entry
per leaf, keyed by the '/'-joined tree path. Stored f16 by default
(conv/dense weights fit comfortably in f16 range; the round-trip error
is ~1e-4 relative, quantified where it matters by
tools/check_skip_quality.py).
"""
from __future__ import annotations

from typing import Any

import numpy as np
import jax


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_params_npz(path: str, params: Any, dtype=np.float16) -> None:
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    flat = {}
    for kpath, leaf in leaves:
        arr = np.asarray(jax.device_get(leaf))
        if dtype is not None and arr.dtype == np.float32:
            arr = arr.astype(dtype)
        flat[_path_str(kpath)] = arr
    np.savez_compressed(path, **flat)


def load_params_npz(path: str, dtype=np.float32) -> Any:
    """Rebuilds the nested-dict pytree; float arrays cast to ``dtype``."""
    with np.load(path) as z:
        tree: dict = {}
        for key in z.files:
            arr = z[key]
            if dtype is not None and np.issubdtype(arr.dtype, np.floating):
                arr = arr.astype(dtype)
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return tree
