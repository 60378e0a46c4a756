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
