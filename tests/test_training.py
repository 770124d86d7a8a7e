"""ArcFace fine-tuning loop: convergence + checkpoint/resume (CPU).

The reference has no model training (SURVEY.md §0 — its "trainingServer"
is an enrollment worker); engine/training.py adds the capability. These
tests prove the loop actually learns (loss falls on a separable toy
problem) and that orbax checkpoints resume bit-exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from facerecognition_infrenceengine_tpu.engine import training


class TinyEmbedder(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), strides=2, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(512)(x)


N_CLASSES = 4
IMG = 8


def _batches(n_steps, batch=16, seed=0):
    rng = np.random.default_rng(seed)
    protos = rng.normal(size=(N_CLASSES, IMG, IMG, 3)).astype(np.float32)
    for _ in range(n_steps):
        labels = rng.integers(0, N_CLASSES, size=batch)
        images = protos[labels] + 0.05 * rng.normal(
            size=(batch, IMG, IMG, 3)).astype(np.float32)
        yield jnp.asarray(images), jnp.asarray(labels)


@pytest.fixture(scope="module")
def setup():
    model = TinyEmbedder()
    state, tx = training.make_train_state(
        model, N_CLASSES, jnp.zeros((1, IMG, IMG, 3)), learning_rate=0.1)
    step = training.make_train_step(model, tx, mesh=None)
    return step, state


def test_loss_converges_on_separable_toy(setup):
    step, state0 = setup
    state, losses = training.fit(step, state0, _batches(40), log_every=0)
    assert losses[0] > 0
    tail = np.mean(losses[-5:])
    head = np.mean(losses[:5])
    assert tail < 0.5 * head, (head, tail)


def test_checkpoint_resume_is_bit_exact(setup, tmp_path):
    step, state0 = setup
    ckpt = str(tmp_path / "ckpt")

    # uninterrupted 12-step run
    ref_state, ref_losses = training.fit(step, state0, _batches(12, seed=7),
                                         log_every=0)

    # same 12 steps, checkpointing at 6, then resuming from disk
    batches = list(_batches(12, seed=7))
    mid_state, _ = training.fit(step, state0, batches[:6],
                                ckpt_dir=ckpt, log_every=0)
    restored, at_step = training.restore_checkpoint(ckpt, target=state0)
    assert at_step == 6
    # restored tree matches the in-memory mid state exactly
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(mid_state)),
            jax.tree_util.tree_leaves_with_path(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))

    res_state, res_losses = training.fit(step, restored, batches[6:],
                                         ckpt_dir=ckpt, log_every=0,
                                         start_step=at_step)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(ref_state)),
                    jax.tree_util.tree_leaves(jax.device_get(res_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a final checkpoint landed for the tail segment too
    assert training.restore_checkpoint(ckpt)[1] == 12
