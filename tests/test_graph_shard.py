"""Edge-parallel (graph-dimension) sharding on a 2-D (dp, gp) mesh:
the sharded step must match the single-chip step numerically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prtp_tpu.graph import pack_design
from prtp_tpu.models import PathModel
from prtp_tpu.parallel.graph_shard import (
    make_2d_mesh,
    make_graph_sharded_train_step,
    shard_design,
)
from prtp_tpu.trainer import init_state, make_optimizer, make_train_step, pad_batch

from test_models import _tiny_parsed_design


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(31)
    parsed = _tiny_parsed_design(rng)
    design = pack_design(parsed, map_size=16, align=8)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8, gnn_reduce="segment")
    tx = make_optimizer(1e-3)
    state = init_state(model, tx, design, jax.random.PRNGKey(0))
    n = design.num_paths
    pad_to = ((n + 3) // 4) * 4
    ids, mask = pad_batch(np.arange(n), pad_to)
    return model, tx, state, design, ids, mask


def test_2d_mesh_shapes():
    mesh = make_2d_mesh(4, 2)
    assert mesh.shape == {"dp": 4, "gp": 2}


def test_graph_sharded_step_matches_single(setup):
    model, tx, state, design, ids, mask = setup
    mesh = make_2d_mesh(4, 2)

    single = make_train_step(model, tx, donate=False)
    s1, m1 = single(state, design, ids, mask)

    sharded_design = shard_design(mesh, design)
    step = make_graph_sharded_train_step(model, tx, mesh, donate=False)
    s2, m2 = step(state, sharded_design, ids, mask)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["r2"]), float(m2["r2"]), rtol=1e-3)
    assert float(m1["tp"]) == float(m2["tp"])

    # trains over several steps
    s = s2
    losses = []
    for _ in range(5):
        s, m = step(s, sharded_design, ids, mask)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_gp_only_mesh(setup):
    """Pure graph sharding (no batch axis) on an 8-way gp mesh."""
    model, tx, state, design, ids, mask = setup
    mesh = make_2d_mesh(1, 8)
    sharded_design = shard_design(mesh, design)
    step = make_graph_sharded_train_step(model, tx, mesh, batch_axis=None,
                                         donate=False)
    s, m = step(state, sharded_design, ids, mask)
    single = make_train_step(model, tx, donate=False)
    _s1, m1 = single(state, design, ids, mask)
    np.testing.assert_allclose(float(m["loss"]), float(m1["loss"]),
                               rtol=1e-4)


def test_grouped_scan_sharded_step_matches_single(setup):
    """Grouped-scan packing composes with the (dp, gp) edge-parallel
    sharding: per-group edge tables shard on gp, statics preserved."""
    model, tx, state, _design, ids, mask = setup
    rng = np.random.default_rng(31)
    parsed = _tiny_parsed_design(rng)
    design = pack_design(parsed, map_size=16, align=8, scan_groups=2)
    from prtp_tpu.graph import LeveledGraphGrouped
    assert isinstance(design.graph, LeveledGraphGrouped)
    state = init_state(model, tx, design, jax.random.PRNGKey(0))

    single = make_train_step(model, tx, donate=False)
    _s1, m1 = single(state, design, ids, mask)

    mesh = make_2d_mesh(4, 2)
    sharded = shard_design(mesh, design)
    step = make_graph_sharded_train_step(model, tx, mesh, donate=False,
                                         graph=design.graph)
    _s2, m2 = step(state, sharded, ids, mask)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["r2"]), float(m2["r2"]), rtol=1e-3)


def test_merged_designs_on_2d_mesh():
    """Flagship scale-out composition: K merged designs' grouped path
    batch (K, B) sharded on dp, the merged super-graph's edge tables
    sharded on gp — must match the single-device merged step."""
    from prtp_tpu.graph import merge_parsed_designs
    rng = np.random.default_rng(5)
    parsed_list = [_tiny_parsed_design(rng) for _ in range(4)]
    merged = merge_parsed_designs(parsed_list)
    design = pack_design(merged, map_size=16, align=8)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8, gnn_reduce="segment")
    tx = make_optimizer(1e-3)
    state = init_state(model, tx, design, jax.random.PRNGKey(0))
    b = 8
    k = len(parsed_list)
    ids = np.zeros((k, b), np.int32)
    mask = np.zeros((k, b), np.float32)
    for i, uni in enumerate(merged["path_ids_per_design"]):
        uni = np.asarray(uni)[:b]
        ids[i, : len(uni)] = uni
        mask[i, : len(uni)] = 1.0
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    single = make_train_step(model, tx, donate=False)
    _s1, m1 = single(state, design, ids, mask)

    mesh = make_2d_mesh(4, 2)  # K=4 designs sharded across dp=4
    sharded = shard_design(mesh, design)
    step = make_graph_sharded_train_step(model, tx, mesh, donate=False)
    _s2, m2 = step(state, sharded, ids, mask)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["r2"]), float(m2["r2"]), rtol=1e-3)
