"""Multi-design batched training: bucket padding correctness (padded
design == unpadded design forward), stacking, vmapped step, and
design-axis sharding on the 8-way mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prtp_tpu.graph import bucket_shape, pack_design, stack_designs
from prtp_tpu.models import PathModel
from prtp_tpu.parallel import make_mesh
from prtp_tpu.parallel.multi import (
    make_multidesign_eval_step,
    make_multidesign_train_step,
)
from prtp_tpu.trainer import init_state, make_optimizer, make_train_step

from test_models import _tiny_parsed_design


@pytest.fixture(scope="module")
def designs():
    rng = np.random.default_rng(5)
    parsed = [_tiny_parsed_design(rng) for _ in range(4)]
    # different random sizes: vary level sizes via fresh rng draws
    return parsed


def test_padded_forward_matches_unpadded(designs):
    parsed = designs[0]
    bucket = bucket_shape(designs, align=8)
    d_plain = pack_design(parsed, map_size=16, align=8)
    d_padded = pack_design(parsed, map_size=16, align=8, pad_to=bucket)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    ids = jnp.arange(parsed["num_paths"], dtype=jnp.int32)
    v = model.init(jax.random.PRNGKey(0), d_plain, ids)
    out1 = np.asarray(model.apply(v, d_plain, ids))
    out2 = np.asarray(model.apply(v, d_padded, ids))
    np.testing.assert_allclose(out2, out1, rtol=1e-4, atol=1e-5)


def test_stacked_vmapped_step(designs):
    bucket = bucket_shape(designs, align=8)
    packs = [pack_design(p, map_size=16, align=8, pad_to=bucket)
             for p in designs]
    stacked = stack_designs(packs)
    assert stacked.path_masks.shape[0] == 4

    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    tx = make_optimizer(1e-3)
    state = init_state(model, tx, packs[0], jax.random.PRNGKey(0))

    k, b = 4, 8
    ids = np.zeros((k, b), np.int32)
    mask = np.zeros((k, b), np.float32)
    for i, p in enumerate(designs):
        npths = min(b, p["num_paths"])
        ids[i, :npths] = np.arange(npths)
        mask[i, :npths] = 1.0
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    step = make_multidesign_train_step(model, tx, donate=False)
    losses = []
    s = state
    for _ in range(10):
        s, mets = step(s, stacked, ids, mask)
        losses.append(float(mets["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()

    ev = make_multidesign_eval_step(model)
    preds, mets = ev(s, stacked, ids, mask)
    assert preds.shape == (k, b)


def test_multidesign_matches_singles(designs):
    """vmapped multi-design loss == mean of per-design masked losses."""
    bucket = bucket_shape(designs, align=8)
    packs = [pack_design(p, map_size=16, align=8, pad_to=bucket)
             for p in designs]
    stacked = stack_designs(packs)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    tx = make_optimizer(1e-3)
    state = init_state(model, tx, packs[0], jax.random.PRNGKey(1))

    k, b = 4, 8
    ids = np.zeros((k, b), np.int32)
    mask = np.zeros((k, b), np.float32)
    for i, p in enumerate(designs):
        npths = min(b, p["num_paths"])
        ids[i, :npths] = np.arange(npths)
        mask[i, :npths] = 1.0

    ev = make_multidesign_eval_step(model)
    _preds, mets = ev(state, stacked, jnp.asarray(ids), jnp.asarray(mask))

    # per-design reference
    from prtp_tpu.trainer import make_eval_step
    evs = make_eval_step(model)
    total_se, total_n = 0.0, 0.0
    for i, pk in enumerate(packs):
        preds_i, m_i = evs(state, pk, jnp.asarray(ids[i]),
                           jnp.asarray(mask[i]))
        total_se += float(m_i["loss"]) * mask[i].sum()
        total_n += mask[i].sum()
    np.testing.assert_allclose(float(mets["loss"]), total_se / total_n,
                               rtol=1e-5)


def test_design_axis_sharding(designs):
    bucket = bucket_shape(designs, align=8)
    packs = [pack_design(p, map_size=16, align=8, pad_to=bucket)
             for p in designs]
    # 8 designs for an 8-way mesh
    packs = packs + packs
    stacked = stack_designs(packs)
    mesh = make_mesh(8)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    tx = make_optimizer(1e-3)
    state = init_state(model, tx, packs[0], jax.random.PRNGKey(0))

    k, b = 8, 8
    ids = np.zeros((k, b), np.int32)
    mask = np.ones((k, b), np.float32)
    step = make_multidesign_train_step(model, tx, mesh=mesh, donate=False)
    s, mets = step(state, stacked, jnp.asarray(ids), jnp.asarray(mask))
    assert np.isfinite(float(mets["loss"]))

    # matches unsharded execution
    step0 = make_multidesign_train_step(model, tx, donate=False)
    s0, mets0 = step0(state, stacked, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(float(mets["loss"]), float(mets0["loss"]),
                               rtol=1e-5)
