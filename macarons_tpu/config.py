"""Config system: JSON configs with the reference's schema.

Mirrors the reference's `Params` loader semantics (reference: macarons/utility/utils.py:44-83):
top-level keys starting with ``_`` are "category" groups whose children are flattened
into a single flat attribute namespace. The exact JSON schema is kept for entry-point
compatibility; like the reference, fields are dynamically typed (no schema validation —
unknown attribute access raises, `get` provides defaults).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Iterator, Mapping


def flatten_dict(d: Mapping[str, Any]) -> Dict[str, Any]:
    """Flatten one level of ``_``-prefixed group keys into a flat dict."""
    out: Dict[str, Any] = {}
    for key, value in d.items():
        if key.startswith("_") and isinstance(value, Mapping):
            for sub_key, sub_value in value.items():
                out[sub_key] = sub_value
        else:
            out[key] = value
    return out


class Params:
    """Flat attribute-access view over a (possibly grouped) JSON config.

    Behaves like the reference Params object: ``params.learning_rate`` etc., plus
    dict-style access, ``in`` tests, and JSON round-tripping. Unknown attributes
    raise AttributeError; ``get`` provides defaulted lookup.
    """

    def __init__(self, data: Mapping[str, Any] | None = None, flatten: bool = True):
        data = dict(data or {})
        if flatten:
            data = flatten_dict(data)
        object.__setattr__(self, "_data", data)

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        data = object.__getattribute__(self, "_data")
        if name in data:
            return data[name]
        raise AttributeError(f"Params has no field {name!r}")

    def __setattr__(self, name: str, value: Any) -> None:
        object.__getattribute__(self, "_data")[name] = value

    # -- mapping protocol ---------------------------------------------------
    def __getitem__(self, name: str) -> Any:
        return object.__getattribute__(self, "_data")[name]

    def __setitem__(self, name: str, value: Any) -> None:
        object.__getattribute__(self, "_data")[name] = value

    def __contains__(self, name: str) -> bool:
        return name in object.__getattribute__(self, "_data")

    def __iter__(self) -> Iterator[str]:
        return iter(object.__getattribute__(self, "_data"))

    def keys(self):
        return object.__getattribute__(self, "_data").keys()

    def get(self, name: str, default: Any = None) -> Any:
        return object.__getattribute__(self, "_data").get(name, default)

    def to_dict(self) -> Dict[str, Any]:
        return dict(object.__getattribute__(self, "_data"))

    def copy(self) -> "Params":
        return Params(self.to_dict(), flatten=False)

    def update(self, other: Mapping[str, Any]) -> None:
        object.__getattribute__(self, "_data").update(other)

    def __repr__(self) -> str:
        return f"Params({object.__getattribute__(self, '_data')!r})"

    # -- io -----------------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=4)


def load_params(path: str, flatten: bool = True) -> Params:
    """Load a JSON config file into a Params namespace."""
    with open(path) as f:
        data = json.load(f)
    return Params(data, flatten=flatten)


def _find_config(base_dir: str, name: str) -> str | None:
    """Locate a training-config file by bare name under configs/ (the
    reference resolves ``params_name`` against its own configs dir,
    reference testers/scene.py:632-634)."""
    import os

    for root, _dirs, files in os.walk(os.path.join(base_dir, "configs")):
        if name in files:
            return os.path.join(root, name)
    return None


def normalize_test_config(params: Params, base_dir: str) -> Params:
    """Accept the REFERENCE's test-config schema verbatim.

    The reference test configs (reference configs/test/*.json, consumed by
    testers/scene.py:621-652 and testers/test_shapenet.py:235-255) use
    ``params_name`` / ``model_name`` / ``results_json_name`` /
    ``compute_collision`` / ``scone_*_model_name`` / ``test_number`` /
    ``numGPU``. This maps them onto the tpu port's keys
    (``training_config`` / ``weights_path`` / ``results_name`` /
    ``use_collision`` / ``*_weights_path`` / ``max_meshes``) so a reference
    JSON runs unmodified. Existing tpu-native keys always win.
    """
    import os

    p = params.copy()

    def fill(key, value):
        if value is not None and p.get(key) is None:
            p[key] = value

    def weights_name(name, subdir):
        if name is None:
            return None
        stem = name[:-4] if name.endswith(".pth") else name
        return os.path.join("weights", subdir, stem)

    if p.get("params_name") is not None and p.get("training_config") is None:
        # The reference's shipped shapenet test config names a file that no
        # longer exists in its own tree (scone_vis_pretraining_config.json,
        # reference configs/test/test_on_shapenet_*.json vs
        # configs/scone/coverage_gain/) — alias the stale name so the
        # verbatim JSON still runs here.
        aliases = {"scone_vis_pretraining_config.json":
                   "coverage_gain_pretraining_config.json"}
        name = p["params_name"]
        found = (_find_config(base_dir, name)
                 or (_find_config(base_dir, aliases[name])
                     if name in aliases else None))
        if found is not None:
            p["training_config"] = os.path.relpath(found, base_dir)
    fill("weights_path", weights_name(p.get("model_name"), "macarons"))
    fill("occ_weights_path",
         weights_name(p.get("scone_occ_model_name"), "scone/occupancy"))
    fill("vis_weights_path",
         weights_name(p.get("scone_vis_model_name"), "scone/coverage_gain"))
    fill("results_name", p.get("results_json_name"))
    fill("use_collision", p.get("compute_collision"))
    fill("use_perfect_depth", p.get("use_perfect_depth_map"))
    tn = p.get("test_number")
    if tn is not None and p.get("max_meshes") is None and tn > 0:
        p["max_meshes"] = tn
    # numGPU picks the per-process memory dir in the reference (:640); the
    # tpu port is single-process per host, keep the same dir convention.
    if p.get("numGPU") is not None and p.get("memory_dir_name") is None:
        p["memory_dir_name"] = f"test_memory_{p['numGPU']}"
    return p
