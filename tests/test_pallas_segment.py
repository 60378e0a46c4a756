"""Pallas fused segment kernels vs the XLA reference ops (interpret mode
on CPU; the same code compiles for TPU via Mosaic)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prtp_tpu.ops.segment import segment_mean, segment_softmax_sum
from prtp_tpu.ops.pallas_segment import (
    segment_mean_pallas,
    segment_softmax_sum_pallas,
)


def _sorted_case(rng, e=64, n=12, d=8, scale=1.0):
    ids = np.sort(rng.integers(0, n - 1, size=e)).astype(np.int32)
    # padded tail pointing at the dummy slot n-1
    ids[-5:] = n - 1
    msg = (rng.normal(size=(e, d)) * scale).astype(np.float32)
    return jnp.asarray(msg), jnp.asarray(ids)


def test_softmax_sum_matches_xla():
    rng = np.random.default_rng(0)
    msg, ids = _sorted_case(rng, scale=3.0)
    n = 12
    ref = segment_softmax_sum(msg, ids, n)
    got = segment_softmax_sum_pallas(msg, ids, n, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_softmax_sum_empty_segments_zero():
    rng = np.random.default_rng(1)
    msg, ids = _sorted_case(rng)
    # leave segments 3..5 empty
    ids = jnp.where((ids >= 3) & (ids <= 5), 6, ids)
    ids = jnp.sort(ids)
    n = 12
    got = np.asarray(segment_softmax_sum_pallas(msg, ids, n, True))
    for s in (3, 4, 5):
        np.testing.assert_allclose(got[s], 0.0, atol=1e-7)


def test_softmax_sum_grad_matches_xla():
    rng = np.random.default_rng(2)
    msg, ids = _sorted_case(rng, e=40, n=9, d=4)
    n = 9

    def loss_ref(m):
        return jnp.sum(segment_softmax_sum(m, ids, n) ** 2)

    def loss_pl(m):
        return jnp.sum(segment_softmax_sum_pallas(m, ids, n, True) ** 2)

    g_ref = jax.grad(loss_ref)(msg)
    g_pl = jax.grad(loss_pl)(msg)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_mean_matches_xla():
    rng = np.random.default_rng(3)
    msg, ids = _sorted_case(rng, e=50, n=10, d=16)
    n = 10
    ref = segment_mean(msg, ids, n)
    got = segment_mean_pallas(msg, ids, n, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_mean_grad_matches_xla():
    rng = np.random.default_rng(4)
    msg, ids = _sorted_case(rng, e=30, n=8, d=4)
    n = 8

    def loss_ref(m):
        return jnp.sum(segment_mean(m, ids, n) ** 3)

    def loss_pl(m):
        return jnp.sum(segment_mean_pallas(m, ids, n, True) ** 3)

    g_ref = jax.grad(loss_ref)(msg)
    g_pl = jax.grad(loss_pl)(msg)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_timegnn_pallas_matches_xla_path():
    """Full TimeGNN with use_pallas (interpret) == XLA segment path."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_random_leveled_graph
    from prtp_tpu.graph import pack_leveled_graph
    from prtp_tpu.models import TimeGNN

    rng = np.random.default_rng(9)
    g = make_random_leveled_graph(rng, level_sizes=(5, 8, 6, 9, 4, 7))
    lg, node_row, _ = pack_leveled_graph(g, align=8)
    m_xla = TimeGNN(out_dim=16, hidden_dim=32, reduce_mode="segment")
    m_pl = TimeGNN(out_dim=16, hidden_dim=32, reduce_mode="pallas",
                   pallas_interpret=True)
    params = m_xla.init(jax.random.PRNGKey(0), lg)
    h1 = np.asarray(m_xla.apply(params, lg))
    h2 = np.asarray(m_pl.apply(params, lg))
    np.testing.assert_allclose(h2[node_row], h1[node_row],
                               rtol=1e-4, atol=1e-5)


def test_fused_softmax_sum_matches_plain():
    from prtp_tpu.ops.segment import segment_softmax_sum_fused
    rng = np.random.default_rng(11)
    msg, ids = _sorted_case(rng, scale=2.0)
    n = 12
    ref = segment_softmax_sum(msg, ids, n)
    got = segment_softmax_sum_fused(msg, ids, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
