"""Model weight I/O.

Weights live as flat ``.npz`` files of the flax param/batch-stats pytree
(path-joined keys), independent of pickle.  ``load_or_init`` gives every
entry point deterministic weights when no converted pack is present, so the
whole framework runs end-to-end hermetically; dropping converted buffalo_l
weights into ``FRE_WEIGHTS_DIR`` upgrades it to reference-parity embeddings
without code changes (tools/convert_onnx.py produces them when onnx is
available — it is not in this image).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

SEP = "/"


def flatten_tree(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}{SEP}"))
    else:
        out[prefix.rstrip(SEP)] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict) -> dict:
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def save_variables(path: str, variables: dict) -> None:
    np.savez(path, **flatten_tree(variables))


def load_variables(path: str) -> dict:
    with np.load(path) as z:
        return unflatten_tree({k: z[k] for k in z.files})


def weights_dir() -> str:
    return os.environ.get("FRE_WEIGHTS_DIR", os.path.join(os.path.dirname(__file__), "_weights"))


def load_or_init(name: str, module, example_input, seed: int = 0) -> dict:
    """Load ``<weights_dir>/<name>.npz`` if present, else deterministic init."""
    path = os.path.join(weights_dir(), f"{name}.npz")
    if os.path.exists(path):
        return load_variables(path)
    rng = jax.random.PRNGKey(seed)
    return module.init(rng, example_input)
