"""Checkpoint / resume for training states.

The reference relies on Lightning checkpoints plus per-system
`on_load_checkpoint` hooks that rebuild the geometry at the saved point count
(reference system/gaussian_splatting.py:214-223, SURVEY.md section 5).  Here
the Gaussian field already has static capacity, so a checkpoint is just the
state pytree -- resume shapes are always identical and no rebuild dance is
needed.  Format: npz of flattened leaves + a pickled treedef sidecar."""

from __future__ import annotations

import os
import pickle
from typing import Any, Tuple

import jax
import numpy as np


def save_checkpoint(path: str, state: Any, step: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(jax.device_get(state))
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__step__"] = np.asarray(step)
    np.savez(path, **arrays)
    with open(path + ".treedef", "wb") as f:
        pickle.dump(treedef, f)


def load_checkpoint(path: str, template: Any = None) -> Tuple[Any, int]:
    data = np.load(path, allow_pickle=False)
    with open(path + ".treedef", "rb") as f:
        treedef = pickle.load(f)
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    step = int(data["__step__"])
    return state, step
