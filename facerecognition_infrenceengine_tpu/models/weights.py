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
import zlib
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


def _synthetic_leaf(path: str, shape, dtype, seed: int) -> np.ndarray:
    """Deterministic numpy init for one param leaf, keyed by its tree path.

    Distributions follow the usual conv/dense conventions (fan-in-scaled
    normal for kernels, zeros for biases/means, ones for scales/vars) so
    forward activations stay well-conditioned without ever *running* the
    model to initialize it.
    """
    leaf = path.rsplit(SEP, 1)[-1]
    npdtype = np.dtype(jnp.dtype(dtype).name if hasattr(dtype, "name") else dtype)
    # Module-declared non-default initializers that eval_shape cannot see:
    # SCRFD's classification bias prior (scrfd.py bias_init=-4.595, i.e.
    # sigmoid ~= 0.01 — without it every anchor scores ~0.5 and hermetic
    # runs detect max_faces phantom faces per frame) and the per-level
    # bbox scales (ones init).
    if path.endswith("head/cls/bias"):
        return np.full(shape, -4.595, npdtype)
    if leaf.startswith("bbox_scale"):
        return np.ones(shape, npdtype)
    if leaf in ("bias", "mean"):
        return np.zeros(shape, npdtype)
    if leaf in ("scale", "var"):
        return np.ones(shape, npdtype)
    digest = zlib.crc32(f"{path}:{seed}".encode())  # stable across processes
    rng = np.random.default_rng(digest)
    fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else max(1, int(shape[0] if shape else 1))
    std = float(np.sqrt(2.0 / max(1, fan_in)))
    return rng.normal(0.0, std, size=shape).astype(npdtype)


def load_or_init(name: str, module, example_input, seed: int = 0) -> dict:
    """Load ``<weights_dir>/<name>.npz`` if present, else deterministic init.

    Synthetic init never executes the model: ``jax.eval_shape`` derives the
    variable tree abstractly (flax ``init`` would run the whole forward
    pass — over a tunneled TPU that is minutes of round-trips, and even the
    one-shot CPU compile of a 640x640 detector init program takes minutes).
    Leaves are filled with deterministic numpy values keyed by (path, seed).
    """
    path = os.path.join(weights_dir(), f"{name}.npz")
    if os.path.exists(path):
        return load_variables(path)
    rng = jax.random.PRNGKey(seed)
    shapes = jax.eval_shape(module.init, rng, example_input)
    flat = flatten_shapes(shapes)
    return unflatten_tree({
        k: _synthetic_leaf(k, v.shape, v.dtype, seed) for k, v in flat.items()
    })


def flatten_shapes(tree: Any, prefix: str = "") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_shapes(v, f"{prefix}{k}{SEP}"))
    else:
        out[prefix.rstrip(SEP)] = tree
    return out
