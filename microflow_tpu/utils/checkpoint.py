"""Checkpoint / resume for trained parameter pytrees.

New capability with no reference counterpart (the reference's trained
weights live only in RAM and are printed at exit,
``examples/sine_train.rs:86-90``; SURVEY.md 5 "Checkpoint / resume:
none").  Plain ``.npz`` keeps the artifact dependency-free; the arrays
are exact (int8/int32/f32), so save -> load -> predict is bit-identical.
"""

from __future__ import annotations

import numpy as np


def _flatten(tree: dict, prefix: str = "") -> dict:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key + "/"))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(path: str, params: dict) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str) -> dict:
    import jax.numpy as jnp

    with np.load(path) as data:
        flat = {k: jnp.asarray(data[k]) for k in data.files}
    return _unflatten(flat)
