"""Unit tests for the segment reductions against numpy references."""

import numpy as np
import jax.numpy as jnp

from prtp_tpu.ops import (
    segment_max,
    segment_mean,
    segment_softmax_sum,
    segment_weighted_softmax_sum,
)


def _groups(ids, num_segments):
    return [np.where(ids == s)[0] for s in range(num_segments)]


def test_segment_mean_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(20, 5)).astype(np.float32)
    ids = rng.integers(0, 6, size=20)
    out = np.array(segment_mean(jnp.asarray(data), jnp.asarray(ids), 7))
    for s, idx in enumerate(_groups(ids, 7)):
        expect = data[idx].mean(axis=0) if len(idx) else np.zeros(5)
        np.testing.assert_allclose(out[s], expect, rtol=1e-5, atol=1e-6)


def test_segment_max_empty_is_zero():
    data = jnp.ones((3, 2))
    ids = jnp.array([0, 0, 2])
    out = np.array(segment_max(data, ids, 4))
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[3], 0.0)
    np.testing.assert_allclose(out[0], 1.0)


def test_segment_softmax_sum_matches_reference_reduce():
    """Matches cell_msg_reduce (src/model.py:113-116): elementwise softmax
    over the mailbox dimension, then weighted sum."""
    rng = np.random.default_rng(1)
    data = rng.normal(size=(30, 4)).astype(np.float32) * 3
    ids = rng.integers(0, 5, size=30)
    out = np.array(segment_softmax_sum(jnp.asarray(data), jnp.asarray(ids), 6))
    for s, idx in enumerate(_groups(ids, 6)):
        if len(idx) == 0:
            np.testing.assert_allclose(out[s], 0.0, atol=1e-6)
            continue
        m = data[idx]
        e = np.exp(m - m.max(axis=0))
        w = e / e.sum(axis=0)
        np.testing.assert_allclose(out[s], (m * w).sum(axis=0),
                                   rtol=1e-4, atol=1e-5)


def test_segment_weighted_softmax_sum():
    rng = np.random.default_rng(2)
    data = rng.normal(size=(25, 3)).astype(np.float32)
    scores = rng.normal(size=(25,)).astype(np.float32)
    ids = rng.integers(0, 4, size=25)
    out = np.array(segment_weighted_softmax_sum(
        jnp.asarray(data), jnp.asarray(scores), jnp.asarray(ids), 5))
    for s, idx in enumerate(_groups(ids, 5)):
        if len(idx) == 0:
            np.testing.assert_allclose(out[s], 0.0, atol=1e-6)
            continue
        e = np.exp(scores[idx] - scores[idx].max())
        a = e / e.sum()
        np.testing.assert_allclose(out[s], (a[:, None] * data[idx]).sum(0),
                                   rtol=1e-4, atol=1e-5)


def test_padding_edges_do_not_pollute_real_segments():
    data = jnp.array([[1.0], [2.0], [100.0]])
    ids = jnp.array([0, 0, 2])  # segment 2 is the dummy slot
    out = np.array(segment_mean(data, ids, 3))
    np.testing.assert_allclose(out[0], 1.5)
    np.testing.assert_allclose(out[1], 0.0)
