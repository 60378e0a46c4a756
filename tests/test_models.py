"""Shape/behavior tests for the CNN branches and the fusion head."""

import numpy as np
import jax
import jax.numpy as jnp

from prtp_tpu.graph import pack_design
from prtp_tpu.models import LayoutNet, UNet, PathModel

from helpers import make_random_leveled_graph


def _tiny_parsed_design(rng, map_size=16, cnn_hw=64, cnn_ch=2):
    g = make_random_leveled_graph(rng, level_sizes=(4, 6, 5, 7),
                                  cell_feat_dim=10, net_feat_dim=3)
    n = g["num_nodes"]
    # endpoints: the last level's nodes
    endpoints = np.asarray(g["levels"][-1][0], dtype=np.int64)
    num_paths = len(endpoints)
    arrival = rng.normal(size=n).astype(np.float32)
    required = arrival + rng.normal(size=n).astype(np.float32)
    critical = (required - arrival < 0).astype(np.int32)
    coo_rows = np.repeat(np.arange(num_paths), 3)
    coo_cols = rng.integers(0, map_size * map_size, size=3 * num_paths)
    return dict(
        g,
        arrival_time=arrival,
        required_time=required,
        is_critical=critical,
        path_endpoint=endpoints,
        path_level=np.full(num_paths, len(g["levels"]) - 1, np.float32),
        mask_coo=np.stack([coo_rows, coo_cols]),
        num_paths=num_paths,
        cnn_input=rng.normal(size=(cnn_ch, cnn_hw, cnn_hw)).astype(np.float32),
    )


def test_layoutnet_shape_512_to_128():
    x = jnp.zeros((1, 512, 512, 2))
    model = LayoutNet(pooling="max")
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 128, 128, 1)


def test_layoutnet_avg_pooling():
    x = jnp.ones((1, 64, 64, 2))
    model = LayoutNet(pooling="avg")
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 16, 16, 1)


def test_unet_shape_256_to_128():
    x = jnp.zeros((1, 256, 256, 3))
    model = UNet(pooling="max")
    vars_ = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(vars_, x)
    assert y.shape == (1, 128, 128, 1)
    # train mode mutates batch stats
    y2, updates = model.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert y2.shape == (1, 128, 128, 1)
    assert "batch_stats" in updates


def test_pathmodel_forward_and_grad():
    rng = np.random.default_rng(11)
    parsed = _tiny_parsed_design(rng)
    design = pack_design(parsed, map_size=16, align=8)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8, unet=False)
    path_ids = jnp.arange(design.num_paths, dtype=jnp.int32)
    vars_ = model.init(jax.random.PRNGKey(0), design, path_ids)
    out = model.apply(vars_, design, path_ids)
    assert out.shape == (design.num_paths,)
    assert np.all(np.isfinite(np.array(out)))

    def loss_fn(v):
        pred = model.apply(v, design, path_ids)
        return jnp.mean((pred - design.arrival_time[design.path_endpoint]) ** 2)

    g = jax.grad(loss_fn)(vars_)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.array(x))) for x in leaves)
    assert sum(float(np.abs(np.array(x)).sum()) for x in leaves) > 0


def test_pathmodel_gnn_only_and_cnn_only():
    rng = np.random.default_rng(12)
    parsed = _tiny_parsed_design(rng)
    design = pack_design(parsed, map_size=16, align=8)
    path_ids = jnp.arange(design.num_paths, dtype=jnp.int32)
    for kw in ({"use_cnn": False}, {"use_gnn": False}):
        model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8,
                          map_size=16, global_dim=8, **kw)
        vars_ = model.init(jax.random.PRNGKey(0), design, path_ids)
        out = model.apply(vars_, design, path_ids)
        assert out.shape == (design.num_paths,)


def test_pathmodel_cls_task_logits():
    rng = np.random.default_rng(13)
    parsed = _tiny_parsed_design(rng)
    design = pack_design(parsed, map_size=16, align=8)
    path_ids = jnp.arange(design.num_paths, dtype=jnp.int32)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8, nlabels=2)
    vars_ = model.init(jax.random.PRNGKey(0), design, path_ids)
    out = model.apply(vars_, design, path_ids)
    assert out.shape == (design.num_paths, 2)


def test_layoutnet_static_patches_matches_conv():
    """The pack-time im2col fast path (DesignData.cnn_patches) is the
    same math as the first conv: forward AND gradients must agree, and
    the param tree / init values must be identical to the plain-conv
    structure (checkpoint compatibility)."""
    from prtp_tpu.graph import make_cnn_patches
    from prtp_tpu.models.layoutnet import LayoutNet

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 2)), jnp.float32)
    net = LayoutNet()
    v = net.init(jax.random.PRNGKey(3), x)
    pat = make_cnn_patches(x, k=9)  # f32 by default since r4: exact
    y_conv = net.apply(v, x)
    y_pat = net.apply(v, x, patches=pat)
    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_pat),
                               rtol=1e-4, atol=1e-4)
    # the bf16 table (what --compute_dtype bfloat16 packs) carries bf16
    # input rounding (~0.4% relative)
    y_bf16 = net.apply(v, x, patches=make_cnn_patches(
        x, k=9, dtype=jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_bf16),
                               rtol=2e-2, atol=2e-2)

    def loss(v, use_pat):
        out = net.apply(v, x, patches=pat if use_pat else None)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss)(v, False)
    g2 = jax.grad(loss)(v, True)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        denom = max(1.0, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(np.asarray(a) / denom,
                                   np.asarray(b) / denom,
                                   rtol=1e-4, atol=1e-4)


def test_pathmodel_without_patches_matches_with():
    """pack_design(cnn_patches=False) must produce the same predictions
    as the default patch-table packing."""
    rng = np.random.default_rng(22)
    parsed = _tiny_parsed_design(rng)
    d_pat = pack_design(parsed, map_size=16, align=8)
    d_conv = pack_design(parsed, map_size=16, align=8, cnn_patches=False)
    assert d_pat.cnn_patches is not None and d_conv.cnn_patches is None
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    path_ids = jnp.arange(d_pat.num_paths, dtype=jnp.int32)
    v = model.init(jax.random.PRNGKey(0), d_pat, path_ids)
    out1 = model.apply(v, d_pat, path_ids)
    out2 = model.apply(v, d_conv, path_ids)
    # f32 patch table (the default) is the exact conv math
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-4, atol=1e-4)


def test_pathmodel_scan_groups_matches_default():
    """pack_design(scan_groups=N) predictions == the default scan packing
    (same parsed design, same params)."""
    rng = np.random.default_rng(29)
    parsed = _tiny_parsed_design(rng)
    d_plain = pack_design(parsed, map_size=16, align=8, cnn_patches=False)
    d_group = pack_design(parsed, map_size=16, align=8, cnn_patches=False,
                          scan_groups=2)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    path_ids = jnp.arange(d_plain.num_paths, dtype=jnp.int32)
    v = model.init(jax.random.PRNGKey(0), d_group, path_ids)
    out1 = model.apply(v, d_plain, path_ids)
    out2 = model.apply(v, d_group, path_ids)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-4, atol=1e-5)


def test_pathmodel_bf16_compute_close_to_f32():
    """compute_dtype=bfloat16 (mixed precision: f32 params, bf16
    matmul/conv compute) must track the f32 forward within bf16
    tolerance, return f32 outputs, and keep params f32 under a train
    step."""
    from prtp_tpu.trainer import init_state, make_optimizer, make_train_step, pad_batch
    rng = np.random.default_rng(33)
    parsed = _tiny_parsed_design(rng)
    design = pack_design(parsed, map_size=16, align=8)
    kw = dict(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
              global_dim=8)
    model32 = PathModel(**kw)
    model16 = PathModel(compute_dtype=jnp.bfloat16, **kw)
    path_ids = jnp.arange(design.num_paths, dtype=jnp.int32)
    v = model32.init(jax.random.PRNGKey(0), design, path_ids)
    out32 = np.asarray(model32.apply(v, design, path_ids))
    o16 = model16.apply(v, design, path_ids)
    assert o16.dtype == jnp.float32  # loss/metrics stay f32
    out16 = np.asarray(o16)
    scale = max(1.0, float(np.abs(out32).max()))
    assert np.max(np.abs(out32 - out16)) / scale < 0.03, \
        "bf16 compute diverges from f32 beyond bf16 tolerance"

    tx = make_optimizer(1e-3)
    state = init_state(model16, tx, design, jax.random.PRNGKey(0))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32  # master weights stay f32
    ids, mask = pad_batch(np.arange(design.num_paths), 8)
    step = make_train_step(model16, tx, donate=False)
    state2, mets = step(state, design, ids, mask)
    assert np.isfinite(float(mets["loss"]))
    for leaf in jax.tree_util.tree_leaves(state2.params):
        assert leaf.dtype == jnp.float32
