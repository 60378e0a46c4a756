"""TimeGNN level-scan vs a direct per-node numpy implementation of the
reference PathConv semantics (src/model.py:158-213)."""

import numpy as np
import jax
import jax.numpy as jnp

from prtp_tpu.graph import pack_leveled_graph
from prtp_tpu.models import TimeGNN

from helpers import make_random_leveled_graph, naive_timegnn_forward


def _pack(g, align=8):
    """Returns (LeveledGraph, node_row) for the level-contiguous layout."""
    lg, node_row, _num_rows = pack_leveled_graph(g, align=align)
    return lg, node_row


def test_timegnn_matches_naive_reference():
    rng = np.random.default_rng(42)
    g = make_random_leveled_graph(rng, level_sizes=(5, 8, 6, 9, 4, 7))
    lg, node_row = _pack(g)
    model = TimeGNN(out_dim=16, hidden_dim=32)
    params = model.init(jax.random.PRNGKey(0), lg)
    h = np.array(model.apply(params, lg))

    h_ref = naive_timegnn_forward(params, g, out_dim=16)
    np.testing.assert_allclose(h[node_row], h_ref, rtol=1e-4, atol=1e-4)


def test_timegnn_odd_level_count():
    rng = np.random.default_rng(7)
    g = make_random_leveled_graph(rng, level_sizes=(3, 4, 5))
    lg, node_row = _pack(g)
    model = TimeGNN(out_dim=8, hidden_dim=16)
    params = model.init(jax.random.PRNGKey(1), lg)
    h = np.array(model.apply(params, lg))
    h_ref = naive_timegnn_forward(params, g, out_dim=8)
    np.testing.assert_allclose(h[node_row], h_ref, rtol=1e-4, atol=1e-4)


def test_timegnn_jit_and_grad():
    rng = np.random.default_rng(3)
    g = make_random_leveled_graph(rng, level_sizes=(4, 5, 4, 5))
    lg, node_row = _pack(g)
    model = TimeGNN(out_dim=8, hidden_dim=16)
    params = model.init(jax.random.PRNGKey(2), lg)

    @jax.jit
    def loss_fn(p):
        h = model.apply(p, lg)
        return jnp.sum(h[jnp.asarray(node_row)] ** 2)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.array(x))) for x in flat)
    # gradient must reach every parameter that feeds the forward
    total = sum(float(np.abs(np.array(x)).sum()) for x in flat)
    assert total > 0


def test_timegnn_attention_variant_runs():
    rng = np.random.default_rng(5)
    g = make_random_leveled_graph(rng, level_sizes=(4, 5, 4, 5))
    lg, _node_row = _pack(g)
    model = TimeGNN(out_dim=8, hidden_dim=16, flag_attn=True)
    params = model.init(jax.random.PRNGKey(3), lg)
    h = np.array(model.apply(params, lg))
    assert np.all(np.isfinite(h))


def test_exact_levels_matches_padded():
    """Exact-shape unrolled packing == padded scan packing (same params)."""
    from prtp_tpu.graph import pack_leveled_graph_exact
    rng = np.random.default_rng(17)
    g = make_random_leveled_graph(rng, level_sizes=(5, 8, 6, 9, 4, 7))
    lg_pad, row_pad = _pack(g)
    lg_ex, row_ex, _nr = pack_leveled_graph_exact(g)
    model = TimeGNN(out_dim=16, hidden_dim=32)
    params = model.init(jax.random.PRNGKey(0), lg_pad)
    h_pad = np.array(model.apply(params, lg_pad))
    h_ex = np.array(model.apply(params, lg_ex))
    np.testing.assert_allclose(h_ex[row_ex], h_pad[row_pad],
                               rtol=1e-4, atol=1e-5)
    # grads flow in exact mode
    def loss(p):
        return jnp.sum(model.apply(p, lg_ex)[jnp.asarray(row_ex)] ** 2)
    grads = jax.grad(loss)(params)
    total = sum(float(np.abs(np.asarray(x)).sum())
                for x in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_timegnn_multihead_attention():
    """Multi-head attention: mailbox vs segment reduce agree; H=1 via a
    (D,1) score kernel equals the same kernel tiled per-head only when
    heads share scores — here we check cross-reduce-mode parity and
    gradient flow for H=4."""
    rng = np.random.default_rng(11)
    g = make_random_leveled_graph(rng, level_sizes=(5, 8, 6, 9, 4, 7))
    lg, node_row = _pack(g)
    m_mail = TimeGNN(out_dim=16, hidden_dim=32, flag_attn=True,
                     num_heads=4, reduce_mode="mailbox")
    m_seg = TimeGNN(out_dim=16, hidden_dim=32, flag_attn=True,
                    num_heads=4, reduce_mode="segment")
    params = m_mail.init(jax.random.PRNGKey(9), lg)
    h_mail = np.array(m_mail.apply(params, lg))
    h_seg = np.array(m_seg.apply(params, lg))
    np.testing.assert_allclose(h_mail[node_row], h_seg[node_row],
                               rtol=1e-4, atol=1e-5)
    # attn kernel has one column per head
    k = params["params"]["pair_step"]["fc_attn2"]["kernel"]
    assert k.shape == (16, 4)

    def loss(p):
        return jnp.sum(m_mail.apply(p, lg)[jnp.asarray(node_row)] ** 2)
    grads = jax.grad(loss)(params)
    total = sum(float(np.abs(np.asarray(x)).sum())
                for x in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_timegnn_multihead_heads_differ():
    """With distinct per-head score columns the heads produce different
    mixtures than single-head (sanity that H actually matters)."""
    rng = np.random.default_rng(13)
    g = make_random_leveled_graph(rng, level_sizes=(4, 6, 5, 7))
    lg, node_row = _pack(g)
    m4 = TimeGNN(out_dim=16, hidden_dim=32, flag_attn=True, num_heads=4)
    p4 = m4.init(jax.random.PRNGKey(21), lg)
    h4 = np.array(m4.apply(p4, lg))
    # collapse all head score columns to column 0 -> all heads share
    # scores == single-head semantics; outputs must then differ from
    # the distinct-column version somewhere
    import copy
    p1 = copy.deepcopy(jax.tree_util.tree_map(np.asarray, p4))
    k = p1["params"]["pair_step"]["fc_attn2"]["kernel"]
    p1["params"]["pair_step"]["fc_attn2"]["kernel"] = np.tile(
        k[:, :1], (1, 4))
    h1 = np.array(m4.apply(p1, lg))
    assert np.all(np.isfinite(h4)) and np.all(np.isfinite(h1))
    assert not np.allclose(h4[node_row], h1[node_row])


def test_exact_levels_attention_fallback():
    """exact-levels + attention takes the autodiff fallback (fused VJP
    covers the mailbox no-attn path only) and still runs fwd + grad."""
    from prtp_tpu.graph import pack_leveled_graph_exact
    rng = np.random.default_rng(5)
    g = make_random_leveled_graph(rng, level_sizes=(5, 9, 7, 11, 6, 8))
    lg, node_row, _nr = pack_leveled_graph_exact(g)
    m = TimeGNN(out_dim=16, hidden_dim=32, flag_attn=True, num_heads=4)
    v = m.init(jax.random.PRNGKey(0), lg)
    h = np.asarray(m.apply(v, lg))
    assert np.all(np.isfinite(h[node_row]))
    grads = jax.grad(lambda p: jnp.sum(m.apply(p, lg) ** 2))(v)
    tot = sum(float(np.abs(np.asarray(x)).sum())
              for x in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(tot) and tot > 0
