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
