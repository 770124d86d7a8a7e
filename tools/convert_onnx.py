#!/usr/bin/env python
"""Convert insightface buffalo_l ONNX weights to this framework's .npz packs.

The reference serves the buffalo_l model pack through ONNX Runtime
(reference infrenceServer.py:412-416): det_10g.onnx (SCRFD detector) and
w600k_r50.onnx (ArcFace IResNet-50 recognizer).  This tool maps those ONNX
initializers onto the flax modules in
``facerecognition_infrenceengine_tpu.models`` and writes
``scrfd_det_10g.npz`` / ``arcface_r50.npz`` into the weights directory, so
``models.weights.load_or_init`` picks them up and the engine serves
reference-parity embeddings (BASELINE.md: <=1e-3 cosine) against galleries
enrolled by the reference.

Requires the ``onnx`` package (NOT installed in the build image — this tool
runs wherever the model pack lives, e.g. a dev box with insightface).  Only
``onnx`` itself is needed, not onnxruntime: weights come from initializers.

Usage:
  python tools/convert_onnx.py --pack ~/.insightface/models/buffalo_l \
      --out facerecognition_infrenceengine_tpu/models/_weights

Layout conventions handled:
  * ONNX Conv kernels are OIHW; flax nn.Conv wants HWIO  -> transpose(2,3,1,0).
  * ONNX Gemm/MatMul weights are [out, in] (Gemm transB=1) -> transpose.
  * BatchNorm: onnx (scale, B, mean, var) -> flax params (scale, bias) +
    batch_stats (mean, var).
  * PReLU slopes [C,1,1] -> [C].

The mapping is by topological order within each tower (flax names are
deterministic: Conv_0, BatchNorm_0, ...), verified by shape at every step —
a mismatch aborts loudly rather than writing a silently-wrong pack.

After converting, run the parity harness:
  python tools/parity_check.py --pack ~/.insightface/models/buffalo_l
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def load_onnx_initializers(path: str) -> dict:
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError as e:
        raise SystemExit(
            "the 'onnx' package is required for conversion; run this tool "
            f"in an environment that has it ({e})")
    model = onnx.load(path)
    inits = {t.name: numpy_helper.to_array(t) for t in model.graph.initializer}
    # Node order gives the topological visit we map against.
    order = [(n.op_type, list(n.input), list(n.output))
             for n in model.graph.node]
    return inits, order


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def iter_onnx_layers(inits: dict, order: list):
    """Yield (op_type, param_arrays) following graph topology."""
    for op_type, ins, _outs in order:
        params = [inits[name] for name in ins if name in inits]
        if params:
            yield op_type, params


def assign_by_structure(flat_flax: dict, onnx_layers) -> dict:
    """Map onnx layer params onto the flax flat tree by (kind, order, shape).

    flat_flax: {path: np.ndarray} template (synthetic init) — defines the
    expected structure and shapes.  Returns a new dict with the same keys.
    """
    # Group flax keys per layer instance, ordered by appearance in the tree.
    convs = sorted(k for k in flat_flax if "/Conv_" in k and k.endswith("kernel"))
    conv_biases = {k[:-6] + "bias" for k in convs}
    denses = sorted(k for k in flat_flax if "/Dense_" in k and k.endswith("kernel"))
    bns = sorted({k.rsplit("/", 1)[0] for k in flat_flax if "/BatchNorm_" in k})
    prelus = sorted(k for k in flat_flax if "PReLU" in k or "negative_slope" in k)

    out = dict(flat_flax)
    ci = di = bi = pi = 0
    for op_type, params in onnx_layers:
        if op_type == "Conv":
            if ci >= len(convs):
                raise ValueError("more ONNX Convs than flax Convs")
            key = convs[ci]
            w = _conv_to_flax(params[0])
            if out[key].shape != w.shape:
                raise ValueError(f"{key}: flax {out[key].shape} vs onnx {w.shape}")
            out[key] = w
            bias_key = key[:-6] + "bias"
            if len(params) > 1 and bias_key in conv_biases:
                out[bias_key] = params[1]
            ci += 1
        elif op_type in ("Gemm", "MatMul"):
            if di >= len(denses):
                continue  # heads may fold matmuls we don't map
            key = denses[di]
            w = params[0]
            if w.shape[::-1] == out[key].shape:
                w = w.T
            if out[key].shape != w.shape:
                raise ValueError(f"{key}: flax {out[key].shape} vs onnx {w.shape}")
            out[key] = w
            bias_key = key[:-6] + "bias"
            if len(params) > 1 and bias_key in out:
                out[bias_key] = params[1]
            di += 1
        elif op_type == "BatchNormalization":
            if bi >= len(bns):
                raise ValueError("more ONNX BNs than flax BNs")
            base = bns[bi]
            scale, bias, mean, var = params[:4]
            for suffix, val in (("scale", scale), ("bias", bias),
                                ("mean", mean), ("var", var)):
                key = f"{base}/{suffix}"
                if key in out:
                    if out[key].shape != val.shape:
                        raise ValueError(
                            f"{key}: flax {out[key].shape} vs onnx {val.shape}")
                    out[key] = val
            bi += 1
        elif op_type == "PRelu":
            if pi < len(prelus):
                key = prelus[pi]
                out[key] = params[0].reshape(out[key].shape)
                pi += 1
    if ci != len(convs):
        raise ValueError(f"mapped {ci}/{len(convs)} convs — structure mismatch")
    return out


def convert(pack_dir: str, out_dir: str) -> None:
    from facerecognition_infrenceengine_tpu.models import arcface, scrfd
    from facerecognition_infrenceengine_tpu.models.weights import (
        flatten_tree, load_or_init, save_variables, unflatten_tree)

    os.makedirs(out_dir, exist_ok=True)
    jobs = [
        ("det_10g.onnx", "scrfd_det_10g",
         scrfd.SCRFD(scrfd.CONFIGS["det_10g"]), (1, 640, 640, 3)),
        ("w600k_r50.onnx", "arcface_r50",
         arcface.iresnet50(), (1, 112, 112, 3)),
    ]
    for onnx_name, npz_name, module, shape in jobs:
        src = os.path.join(pack_dir, onnx_name)
        if not os.path.exists(src):
            print(f"skip {onnx_name}: not found in {pack_dir}")
            continue
        inits, order = load_onnx_initializers(src)
        template = load_or_init(npz_name + "__template__", module,
                                jnp.zeros(shape, jnp.float32))
        flat = flatten_tree(template)
        mapped = assign_by_structure(flat, iter_onnx_layers(inits, order))
        dst = os.path.join(out_dir, f"{npz_name}.npz")
        save_variables(dst, unflatten_tree(mapped))
        print(f"wrote {dst} ({len(mapped)} tensors)")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--pack", required=True,
                    help="buffalo_l directory containing the .onnx files")
    ap.add_argument("--out", default=None,
                    help="weights dir (default: models/_weights in the package)")
    args = ap.parse_args()
    out = args.out
    if out is None:
        from facerecognition_infrenceengine_tpu.models.weights import weights_dir
        out = weights_dir()
    convert(args.pack, out)


if __name__ == "__main__":
    main()
