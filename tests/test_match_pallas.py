"""Interpret-mode tests for the fused gallery top-1 Pallas kernels.

The kernels (ops/match_pallas.py) are TPU-only in production
(match_pallas.supported gates on the backend); here they run under the
Pallas interpreter on CPU and are checked against the XLA golden path
(ops/matching.cosine_topk), mirroring the warp kernel's test strategy
(tests/test_ops_warp_pallas.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.ops.match_pallas import (
    gallery_top1, gallery_top1_int8, quantize_gallery)
from facerecognition_infrenceengine_tpu.ops.matching import (
    cosine_topk, l2_normalize)


def _gallery(rng, n, d=512):
    return np.asarray(l2_normalize(
        jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))))


@pytest.mark.parametrize("n,nv,b", [
    (1024, 1000, 64),   # padding tail
    (4096, 4096, 3),    # tiny batch (padded to sublanes), multi-tile
    (2048, 1, 8),       # single valid row
    (8, 5, 1),          # gallery smaller than one tile
])
def test_top1_matches_xla(n, nv, b):
    rng = np.random.default_rng(0)
    g = jnp.asarray(_gallery(rng, n))
    q = l2_normalize(jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32)))
    v_ref, i_ref = cosine_topk(q, g, jnp.arange(n) < nv, k=1)
    v, i = gallery_top1(q, g, nv, interpret=True)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref)[:, 0],
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref)[:, 0])


def test_top1_bf16_same_ids():
    rng = np.random.default_rng(1)
    n, b = 2048, 16
    g32 = _gallery(rng, n)
    # Well-separated queries (near copies of gallery rows) so bf16
    # rounding cannot flip the winner.
    q = jnp.asarray(g32[:b] + rng.normal(size=(b, 512)).astype(np.float32) * 1e-3)
    q = l2_normalize(q)
    v_ref, i_ref = cosine_topk(q, jnp.asarray(g32), jnp.ones(n, bool), k=1)
    v, i = gallery_top1(q.astype(jnp.bfloat16),
                        jnp.asarray(g32, jnp.bfloat16), n, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref)[:, 0])
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref)[:, 0],
                               atol=2e-2)


def test_top1_tie_breaks_to_lowest_index_like_topk():
    n = 64
    g = np.zeros((n, 512), np.float32)
    g[10, 0] = 1.0
    g[37, 0] = 1.0  # exact duplicate identity
    q = jnp.asarray(np.eye(1, 512, dtype=np.float32))
    v_ref, i_ref = cosine_topk(q, jnp.asarray(g), jnp.ones(n, bool), k=1)
    v, i = gallery_top1(q, jnp.asarray(g), n, interpret=True)
    assert int(i[0]) == int(i_ref[0, 0]) == 10


def test_top1_all_padding_returns_neg_inf():
    rng = np.random.default_rng(2)
    g = jnp.asarray(_gallery(rng, 128))
    q = l2_normalize(jnp.asarray(rng.normal(size=(4, 512)).astype(np.float32)))
    v, _ = gallery_top1(q, g, 0, interpret=True)
    assert np.all(np.asarray(v) == -np.inf)


def test_int8_top1_score_error_within_budget():
    rng = np.random.default_rng(3)
    n, nv, b = 4096, 4000, 48
    g = _gallery(rng, n)
    q = l2_normalize(jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32)))
    gq, gs = quantize_gallery(g)
    v, i = gallery_top1_int8(q, jnp.asarray(gq), gs, nv, interpret=True)
    v_ref, i_ref = cosine_topk(q, jnp.asarray(g), jnp.arange(n) < nv, k=1)
    # Documented budget: ~1.6e-3 absolute score error; near-tie ids may
    # flip, but on random data agreement should be near-total.
    assert np.abs(np.asarray(v) - np.asarray(v_ref)[:, 0]).max() < 5e-3
    agree = (np.asarray(i) == np.asarray(i_ref)[:, 0]).mean()
    assert agree >= 0.9


def test_int8_separated_identities_match_exactly():
    rng = np.random.default_rng(4)
    n, b = 1024, 8
    g = _gallery(rng, n)
    q = l2_normalize(jnp.asarray(
        g[:b] + rng.normal(size=(b, 512)).astype(np.float32) * 1e-2))
    gq, gs = quantize_gallery(g)
    v, i = gallery_top1_int8(q, jnp.asarray(gq), gs, n, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.arange(b))
    assert np.all(np.asarray(v) > 0.9)


def test_int8_empty_gallery():
    rng = np.random.default_rng(5)
    g = _gallery(rng, 64)
    gq, gs = quantize_gallery(g)
    q = l2_normalize(jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32)))
    v, _ = gallery_top1_int8(q, jnp.asarray(gq), gs, 0, interpret=True)
    assert np.all(np.asarray(v) == -np.inf)
