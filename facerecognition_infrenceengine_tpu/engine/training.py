"""ArcFace fine-tuning step, sharded over the device mesh.

The reference has no model training anywhere ("trainingServer" is an
enrollment worker, reference trainingServer.py — see SURVEY.md §0), but a
production face platform needs to adapt its embedder to its own population.
This module provides the missing capability TPU-first:

- batch data-parallel over the ``data`` mesh axis,
- the ArcFace classifier matrix ``W [num_ids, D]`` sharded over the
  ``gallery`` axis (class/vocab-parallel: the same layout the serving
  gallery uses), with XLA inserting the softmax collectives from sharding
  annotations — no hand-written NCCL-style code,
- additive-angular-margin softmax loss (ArcFace, Deng et al. 2019).

The multi-chip dry-run entry (``__graft_entry__.dryrun_multichip``) jits one
full step of this over an n-device mesh.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.matching import l2_normalize
from ..parallel.sharding import AXIS_DATA, AXIS_GALLERY


def arcface_logits(embeddings, weight, labels, margin: float = 0.5, scale: float = 64.0):
    """Additive angular margin logits.

    embeddings: [B, D] (unnormalized), weight: [C, D], labels: [B] int32.
    Returns [B, C] scaled logits with the margin applied on the target class.
    """
    emb_n = l2_normalize(embeddings)
    w_n = l2_normalize(weight)
    cos = jax.lax.dot_general(
        emb_n, w_n, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, C]
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    onehot = jax.nn.one_hot(labels, weight.shape[0], dtype=cos.dtype)
    cos_margin = jnp.cos(theta + margin)
    return scale * (onehot * cos_margin + (1.0 - onehot) * cos)


def make_train_state(model, num_classes: int, example_input, seed: int = 0,
                     learning_rate: float = 1e-3):
    """Init (variables, classifier W, optimizer state) for fine-tuning."""
    rng = jax.random.PRNGKey(seed)
    variables = model.init(rng, example_input, train=True)
    w = jax.random.normal(jax.random.PRNGKey(seed + 1),
                          (num_classes, 512), jnp.float32) * 0.01
    tx = optax.sgd(learning_rate, momentum=0.9)
    params = {"model": variables["params"], "w": w}
    opt_state = tx.init(params)
    state = {
        "params": params,
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": opt_state,
    }
    return state, tx


def make_train_step(model, tx, mesh: Mesh | None = None,
                    margin: float = 0.5, scale: float = 64.0) -> Callable:
    """Build a jitted full training step.

    With a mesh: images/labels shard over 'data', the classifier W over
    'gallery'; the [B, C] logits carry a (data, gallery) sharding constraint
    so XLA lowers the softmax reductions to psums along 'gallery'.
    """

    def loss_fn(params, batch_stats, images, labels):
        variables = {"params": params["model"], "batch_stats": batch_stats}
        emb, updates = model.apply(
            variables, images, train=True, mutable=["batch_stats"]
        )
        logits = arcface_logits(emb, params["w"], labels, margin, scale)
        if mesh is not None:
            logits = jax.lax.with_sharding_constraint(
                logits, NamedSharding(mesh, P(AXIS_DATA, AXIS_GALLERY))
            )
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        return loss, updates["batch_stats"]

    def step(state, images, labels):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], state["batch_stats"], images, labels
        )
        updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return {
            "params": new_params,
            "batch_stats": new_bs,
            "opt_state": new_opt,
        }, loss

    if mesh is None:
        return jax.jit(step)

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(AXIS_DATA))
    img_sh = NamedSharding(mesh, P(AXIS_DATA, None, None, None))
    w_sh = NamedSharding(mesh, P(AXIS_GALLERY, None))

    def shard_state(state):
        """Place the state: W class-sharded, everything else replicated.

        The optimizer's momentum for W is left replicated here; inside the
        jitted step XLA re-propagates the sharding, so the first step
        redistributes it once.
        """
        state = jax.device_put(state, repl)
        state["params"]["w"] = jax.device_put(state["params"]["w"], w_sh)
        return state

    step_jit = jax.jit(step)

    def sharded_step(state, images, labels):
        images = jax.device_put(images, img_sh)
        labels = jax.device_put(labels, data_sh)
        return step_jit(state, images, labels)

    sharded_step.shard_state = shard_state  # type: ignore[attr-defined]
    return sharded_step


# --------------------------------------------------------------- fine-tune loop
def save_checkpoint(ckpt_dir: str, state: dict, step: int) -> str:
    """Persist a training state with orbax (atomic, versioned by step).

    The reference has no checkpointing anywhere (SURVEY.md §5.4 — models
    are inference-only); this is the resume story for the fine-tuning
    capability this module adds.
    """
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()  # StandardCheckpointer saves asynchronously
    return path


def restore_checkpoint(ckpt_dir: str, target: dict | None = None
                       ) -> tuple[dict, int] | None:
    """Load the latest checkpoint under ``ckpt_dir`` (None when absent).

    ``target`` (a live state of the same structure, e.g. fresh from
    ``make_train_state``) restores typed pytree nodes — optax optimizer
    states are NamedTuples that a bare restore would flatten to dicts.
    Arrays come back on the default device; pass the result through
    ``step.shard_state`` when resuming a mesh run.
    """
    import os
    import re as _re

    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        (int(m.group(1)), name)
        for name in os.listdir(ckpt_dir)
        if (m := _re.fullmatch(r"step_(\d{8})", name))
    )
    if not steps:
        return None
    step, name = steps[-1]
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        state = ckptr.restore(path, jax.device_get(target))
    else:
        state = ckptr.restore(path)
    return state, step


def fit(step_fn: Callable, state: dict, batches, *,
        ckpt_dir: str | None = None, ckpt_every: int = 100,
        log_every: int = 10, logger: Callable[[str], None] = print,
        start_step: int = 0):
    """Drive ``step_fn`` over an iterable of (images, labels) batches.

    Resumable: with ``ckpt_dir`` set, checkpoints land every ``ckpt_every``
    steps and once more at the end; ``restore_checkpoint`` + ``start_step``
    continue a run.  Returns (state, losses).
    """
    losses = []
    step_no = start_step
    for images, labels in batches:
        state, loss = step_fn(state, images, labels)
        step_no += 1
        losses.append(float(loss))
        if log_every and step_no % log_every == 0:
            logger(f"step {step_no}: loss {losses[-1]:.4f}")
        if ckpt_dir and step_no % ckpt_every == 0:
            save_checkpoint(ckpt_dir, jax.device_get(state), step_no)
    if ckpt_dir and step_no > start_step and step_no % ckpt_every != 0:
        save_checkpoint(ckpt_dir, jax.device_get(state), step_no)
    return state, losses
