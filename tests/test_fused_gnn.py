"""fused_exact_gnn must match the autodiff exact-levels path exactly:
same forward, same param gradients, same h0 cotangent."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prtp_tpu.graph import pack_design
from prtp_tpu.models.gnn import TimeGNN

from helpers import make_random_leveled_graph


def _design(rng, level_sizes=(5, 9, 7, 11, 6, 8)):
    g = make_random_leveled_graph(rng, level_sizes=level_sizes,
                                  cell_feat_dim=10, net_feat_dim=3)
    n = g["num_nodes"]
    endpoints = np.asarray(g["levels"][-1][0], dtype=np.int64)
    num_paths = len(endpoints)
    return dict(
        g,
        arrival_time=rng.normal(size=n).astype(np.float32),
        required_time=rng.normal(size=n).astype(np.float32),
        is_critical=np.zeros(n, np.int32),
        path_endpoint=endpoints,
        path_level=np.full(num_paths, len(g["levels"]) - 1, np.float32),
        mask_coo=np.zeros((2, 0), np.int64),
        num_paths=num_paths,
        cnn_input=rng.normal(size=(2, 16, 16)).astype(np.float32),
    )


@pytest.mark.parametrize("dgl_parity", [True, False])
def test_fused_matches_autodiff(dgl_parity):
    """The per-level fused form (the measured winner; the cross-level
    batched form was measured at f32-regression/bf16-parity and
    deleted in r5 — ops/fused_gnn._unpack_config)."""
    rng = np.random.default_rng(3)
    parsed = _design(rng)
    design = pack_design(parsed, map_size=16, exact_levels=True)
    g = design.graph

    def build(fused):
        return TimeGNN(out_dim=16, hidden_dim=32, dgl_parity=dgl_parity,
                       fused_vjp=fused)

    v = build(False).init(jax.random.PRNGKey(0), g)
    # jitter so biases are nonzero (discriminating gradients)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    v = jax.tree_util.tree_unflatten(
        treedef, [l + 0.1 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])

    # forward equality
    h_ref = np.asarray(build(False).apply(v, g))
    h_fused = np.asarray(build(True).apply(v, g))
    np.testing.assert_allclose(h_fused, h_ref, rtol=1e-5, atol=1e-5)

    # gradient equality through a realistic readout: weighted endpoint
    # loss so the cotangent at h is sparse, like the fusion head's
    ep = design.path_endpoint
    tgt = design.arrival_time[ep]

    def loss(variables, fused):
        h = build(fused).apply(variables, g)
        return ((h[ep].sum(axis=1) - tgt) ** 2).mean()

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, False))(v)
    l_fused, g_fused = jax.value_and_grad(lambda p: loss(p, True))(v)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-6)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, a), b in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("num_heads", [1, 2])
def test_fused_attn_matches_autodiff(num_heads):
    """--attn on the exact path runs through the fused VJP too (r4):
    forward + param grads — including fc_attn2's score projection —
    must match autodiff exactly."""
    rng = np.random.default_rng(13)
    parsed = _design(rng)
    design = pack_design(parsed, map_size=16, exact_levels=True)
    g = design.graph

    def build(fused):
        return TimeGNN(out_dim=16, hidden_dim=32, flag_attn=True,
                       num_heads=num_heads, fused_vjp=fused)

    v = build(False).init(jax.random.PRNGKey(0), g)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    v = jax.tree_util.tree_unflatten(
        treedef, [l + 0.1 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])

    h_ref = np.asarray(build(False).apply(v, g))
    h_fused = np.asarray(build(True).apply(v, g))
    np.testing.assert_allclose(h_fused, h_ref, rtol=1e-5, atol=1e-5)

    ep = design.path_endpoint
    tgt = design.arrival_time[ep]

    def loss(variables, fused):
        h = build(fused).apply(variables, g)
        return ((h[ep].sum(axis=1) - tgt) ** 2).mean()

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, False))(v)
    l_fused, g_fused = jax.value_and_grad(lambda p: loss(p, True))(v)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-6)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    assert len(flat_ref) == len(flat_fused)
    for (path, a), b in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}")


def test_fused_h0_cotangent():
    rng = np.random.default_rng(7)
    parsed = _design(rng, level_sizes=(4, 6, 5, 7))
    design = pack_design(parsed, map_size=16, exact_levels=True)
    g = design.graph
    n1 = g.num_rows + 1

    def build(fused):
        return TimeGNN(out_dim=8, hidden_dim=16, fused_vjp=fused)

    v = build(False).init(jax.random.PRNGKey(1), g)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    v = jax.tree_util.tree_unflatten(
        treedef, [l + 0.1 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (n1, 8))

    def loss(h0, fused):
        h = build(fused).apply(v, g, h0)
        return (h ** 2).sum()

    d_ref = jax.grad(lambda x: loss(x, False))(h0)
    d_fused = jax.grad(lambda x: loss(x, True))(h0)
    np.testing.assert_allclose(np.asarray(d_fused), np.asarray(d_ref),
                               rtol=2e-4, atol=1e-5)


def test_fused_bf16_compute_path():
    """--compute_dtype bfloat16 through the fused exact path (bf16-packed
    feature tables AND mlp_dtype=bf16, the train-CLI combination): the
    node-state carry stays f32, the forward matches the all-f32 fused
    forward at bf16 tolerance, and param grads track the f32 grads —
    pinning f32 ACCUMULATION (bf16 carries/cotangents would drift far
    past these tolerances over 3 level pairs of compounding)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    parsed = _design(rng, level_sizes=(5, 8, 6, 9, 4, 7))
    d32 = pack_design(parsed, map_size=16, exact_levels=True)
    d16 = pack_design(parsed, map_size=16, exact_levels=True,
                      compute_dtype=jnp.bfloat16)
    model32 = TimeGNN(out_dim=16, hidden_dim=32, fused_vjp=True)
    model16 = TimeGNN(out_dim=16, hidden_dim=32, fused_vjp=True,
                      mlp_dtype=jnp.bfloat16)
    v = model32.init(jax.random.PRNGKey(0), d32.graph)
    h32 = np.asarray(model32.apply(v, d32.graph), np.float32)
    h16 = np.asarray(model16.apply(v, d16.graph), np.float32)
    assert h16.dtype == np.float32 and np.all(np.isfinite(h16))
    np.testing.assert_allclose(h16, h32, rtol=0.1, atol=0.15)

    ep = d16.path_endpoint

    def loss(p, model, design):
        return (model.apply(p, design.graph)[ep] ** 2).mean()

    g32 = jax.grad(lambda p: loss(p, model32, d32))(v)
    g16 = jax.grad(lambda p: loss(p, model16, d16))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g32),
                    jax.tree_util.tree_leaves(g16)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.all(np.isfinite(b))
        scale = max(float(np.abs(a).max()), 1e-3)
        np.testing.assert_allclose(b, a, rtol=0.15, atol=0.05 * scale)
