"""Checkpointing — replaces the reference's torch.save dicts (SURVEY.md §5.4).

Flax msgpack serialization + a JSON sidecar for python metadata. Same rolling
flavors as the reference trainers: `unvalidated_<name>`, `best_unval_<name>`,
`validated_<name>`, periodic `epoch_N_<name>` (train_macarons.py:1599-1650).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, tree: Any, metadata: Optional[Dict] = None):
    """Serialize a pytree (params/opt state) to `<path>.msgpack` + `<path>.json`."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree_util.tree_map(np.asarray, tree)
    with open(path + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes(host_tree))
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=float)


def load_checkpoint(path: str, target: Any):
    """Restore a pytree saved by save_checkpoint into `target`'s structure."""
    with open(path + ".msgpack", "rb") as f:
        tree = serialization.from_bytes(target, f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return tree, meta


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(path + ".msgpack")
