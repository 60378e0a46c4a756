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


def test_grouped_scan_matches_padded():
    """Grouped-scan packing (G contiguous pair groups, per-group padding)
    == the single padded scan and the naive reference, same params, both
    reduce modes; grads flow and match the padded scan's."""
    from prtp_tpu.graph import pack_leveled_graph_grouped
    rng = np.random.default_rng(23)
    # front-loaded profile (the case grouped packing exists for)
    g = make_random_leveled_graph(rng, level_sizes=(40, 30, 24, 18, 6, 5,
                                                    4, 4, 3, 3))
    lg_pad, row_pad = _pack(g)
    lg_gr, row_gr, _nr = pack_leveled_graph_grouped(g, num_groups=3,
                                                    align=8)
    assert len(lg_gr.groups) > 1, "partition must actually split"
    for reduce_mode in ("mailbox", "segment"):
        model = TimeGNN(out_dim=16, hidden_dim=32, reduce_mode=reduce_mode)
        params = model.init(jax.random.PRNGKey(0), lg_pad)
        h_pad = np.array(model.apply(params, lg_pad))
        h_gr = np.array(model.apply(params, lg_gr))
        np.testing.assert_allclose(h_gr[row_gr], h_pad[row_pad],
                                   rtol=1e-4, atol=1e-5)

        def loss(p, lg, row):
            return jnp.sum(model.apply(p, lg)[jnp.asarray(row)] ** 2)

        g_pad = jax.grad(loss)(params, lg_pad, row_pad)
        g_gr = jax.grad(loss)(params, lg_gr, row_gr)
        for a, b in zip(jax.tree_util.tree_leaves(g_pad),
                        jax.tree_util.tree_leaves(g_gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)


def test_choose_pair_groups_partition():
    from prtp_tpu.graph import choose_pair_groups
    cell = [100, 80, 10, 8, 6, 4]
    net = [90, 70, 9, 7, 5, 3]
    bounds = choose_pair_groups(cell, net, 3)
    # contiguous cover of [0, 6)
    assert bounds[0][0] == 0 and bounds[-1][1] == 6
    assert all(a[1] == b[0] for a, b in zip(bounds, bounds[1:]))
    # padded compute must beat the single-group (full scan) cost
    one = choose_pair_groups(cell, net, 1)
    def cost(bs):
        return sum((j - i) * (max(cell[i:j]) + max(net[i:j]))
                   for i, j in bs)
    assert cost(bounds) < cost(one)
    # degenerate cases
    assert choose_pair_groups([5], [4], 4) == [(0, 1)]


def test_sorted_level_tables_invariants():
    """Unit test of the shared per-level packer kernel: dst-sorted
    edges, dense mailbox fill, and transpose tables that exactly invert
    the mailbox placement."""
    from prtp_tpu.graph import _sorted_level_tables
    rng = np.random.default_rng(0)
    pn, md, num_rows, e = 7, 3, 100, 13
    slot0 = np.repeat(np.arange(pn), rng.multinomial(e, np.ones(pn) / pn))
    rng.shuffle(slot0)
    src0 = rng.integers(0, 50, size=len(slot0))
    md = max(1, int(np.bincount(slot0, minlength=pn).max()))
    e_src, slot, mail, rev_pos, rev_rows = _sorted_level_tables(
        src0, slot0, pn, md, num_rows)
    # sorted by destination slot; same multiset of (src, slot) pairs
    assert np.all(np.diff(slot) >= 0)
    assert sorted(zip(src0, slot0)) == sorted(zip(e_src, slot))
    # mailbox holds each slot's sources in its first deg slots
    for s in range(pn):
        want = sorted(src0[slot0 == s])
        deg = len(want)
        assert sorted(mail[s, :deg]) == want
        assert np.all(mail[s, deg:] == num_rows)
    # transpose tables: flat positions invert the mailbox placement and
    # are sorted by source row
    assert np.all(np.diff(rev_rows) >= 0)
    assert np.array_equal(np.sort(rev_rows), np.sort(e_src))
    flat_mail = mail.reshape(-1)
    assert np.array_equal(flat_mail[rev_pos], rev_rows)


def test_auto_scan_groups():
    """--scan_groups 0 = auto: front-loaded profiles split (padded
    compute within 15% of exact), uniform profiles stay at 1."""
    from prtp_tpu.graph import auto_scan_groups, choose_pair_groups

    # front-loaded: a single scan pads every pair to the first level
    cell = [120, 40, 12, 6, 4, 3]
    net = [100, 30, 10, 5, 3, 2]
    g = auto_scan_groups(cell, net)
    assert g > 1
    bounds = choose_pair_groups(cell, net, g)
    cost = sum((j - i) * (max(cell[i:j]) + max(net[i:j]))
               for i, j in bounds)
    assert cost <= 1.15 * (sum(cell) + sum(net))

    # uniform: the single scan is already within 15% of exact
    assert auto_scan_groups([16] * 8, [16] * 8) == 1
    # degenerate
    assert auto_scan_groups([5], [4]) == 1
    # sub-align front-loaded profile: alignment round-up makes every
    # grouping cost the same, so splitting buys nothing -> stay at 1
    assert auto_scan_groups(cell, net, align=128) == 1
    assert auto_scan_groups([c * 10 for c in cell],
                            [n * 10 for n in net], align=128) > 1


def test_pack_design_auto_groups_matches_padded():
    """pack_design(scan_groups=0) resolves the group count and the
    resulting forward matches the single padded scan."""
    from prtp_tpu.graph import pack_design
    from prtp_tpu.models import PathModel
    rng = np.random.default_rng(31)
    from helpers import make_random_leveled_graph as _mk
    g = _mk(rng, level_sizes=(48, 36, 24, 16, 5, 4, 3, 3))
    n = g["num_nodes"]
    endpoints = np.asarray(g["levels"][-1][0], dtype=np.int64)
    parsed = dict(
        g,
        arrival_time=rng.normal(size=n).astype(np.float32),
        required_time=rng.normal(size=n).astype(np.float32),
        is_critical=np.zeros(n, np.int32),
        path_endpoint=endpoints,
        path_level=np.full(len(endpoints), len(g["levels"]) - 1,
                           np.float32),
        mask_coo=np.zeros((2, 0), np.int64),
        num_paths=len(endpoints),
        cnn_input=rng.normal(size=(2, 64, 64)).astype(np.float32),
    )
    d_auto = pack_design(parsed, map_size=16, scan_groups=0, align=8)
    d_pad = pack_design(parsed, map_size=16, scan_groups=1, align=8)
    assert hasattr(d_auto.graph, "groups"), "auto must pick G>1 here"
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8,
                      map_size=16, global_dim=8)
    ids = jnp.arange(parsed["num_paths"], dtype=jnp.int32)
    v = model.init(jax.random.PRNGKey(0), d_pad, ids)
    np.testing.assert_allclose(
        np.asarray(model.apply(v, d_auto, ids)),
        np.asarray(model.apply(v, d_pad, ids)), rtol=1e-4, atol=1e-5)
