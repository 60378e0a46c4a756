"""Flat Adam (--flat_adam): one fused update over the concatenated
parameter vector must be the SAME math as the per-leaf optax Adam the
reference's torch.optim.Adam maps to (src/train.py:430-443) — flat is a
kernel-launch optimization, never a numerics change."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from prtp_tpu.graph import pack_design
from prtp_tpu.models import PathModel
from prtp_tpu.trainer import (init_state, init_state_abstract,
                              make_flat_adam, make_multi_train_step,
                              make_optimizer)
from prtp_tpu.utils import checkpoint as ckpt

from test_models import _tiny_parsed_design


def _random_tree(rng):
    return {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(7, 5)),
                                        jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(5,)), jnp.float32)},
        "conv": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 2, 4)),
                                       jnp.float32)},
        "scale": jnp.asarray(rng.normal(size=()), jnp.float32),
    }


@pytest.mark.parametrize("weight_decay", [0.0, 1e-2])
def test_flat_adam_matches_per_leaf_adam(weight_decay):
    rng = np.random.default_rng(0)
    params_ref = _random_tree(rng)
    params_flat = jax.tree_util.tree_map(lambda x: x, params_ref)

    if weight_decay:
        tx_ref = optax.chain(optax.add_decayed_weights(weight_decay),
                             optax.adam(1e-2))
    else:
        tx_ref = optax.adam(1e-2)
    tx_flat = make_flat_adam(1e-2, weight_decay)
    s_ref = tx_ref.init(params_ref)
    s_flat = tx_flat.init(params_flat)

    for i in range(5):
        g = _random_tree(np.random.default_rng(100 + i))
        u_ref, s_ref = tx_ref.update(g, s_ref, params_ref)
        params_ref = optax.apply_updates(params_ref, u_ref)
        u_flat, s_flat = tx_flat.update(g, s_flat, params_flat)
        params_flat = optax.apply_updates(params_flat, u_flat)

    for a, b in zip(jax.tree_util.tree_leaves(params_ref),
                    jax.tree_util.tree_leaves(params_flat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_flat_adam_train_step_equivalence():
    """The full jitted train step under flat vs per-leaf Adam."""
    rng = np.random.default_rng(3)
    parsed = _tiny_parsed_design(rng)
    design = pack_design(parsed, map_size=16, align=8)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    ids = jnp.arange(design.num_paths, dtype=jnp.int32)
    mask = jnp.ones(design.num_paths, jnp.float32)

    results = {}
    for name, flat in (("leaf", False), ("flat", True)):
        tx = make_optimizer(1e-3, flat=flat)
        state = init_state(model, tx, design, jax.random.PRNGKey(0))
        step = make_multi_train_step(model, tx, 3, donate=False)
        state, mets = step(state, design, ids, mask)
        results[name] = (float(mets["loss"]), state.params)

    assert results["leaf"][0] == pytest.approx(results["flat"][0],
                                               rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(results["leaf"][1]),
                    jax.tree_util.tree_leaves(results["flat"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-6)


def test_preflag_checkpoint_resumes_per_leaf(tmp_path):
    """A checkpoint whose config.json predates --flat_adam (key absent)
    was per-leaf Adam by construction: resuming it — even with
    --flat_adam on the CLI — must rebuild the per-leaf opt-state
    template (train.py/test.py treat missing as False), not crash on a
    structure mismatch."""
    rng = np.random.default_rng(6)
    parsed = _tiny_parsed_design(rng)
    design = pack_design(parsed, map_size=16, align=8)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    tx = make_optimizer(1e-3, flat=False)
    state = init_state(model, tx, design, jax.random.PRNGKey(0))
    ckpt.save_checkpoint(str(tmp_path), state, {"learning_rate": 1e-3})

    saved = ckpt.load_config(str(tmp_path))
    assert "flat_adam" not in saved
    flat = bool(saved.get("flat_adam", False))  # the drivers' read
    assert flat is False
    tx2 = make_optimizer(1e-3, flat=flat)
    template = init_state_abstract(model, tx2, design, jax.random.PRNGKey(1))
    restored, _ = ckpt.load_checkpoint(str(tmp_path), template)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flat_adam_checkpoint_resume_honors_saved_flag(tmp_path):
    """A checkpoint written under --flat_adam restores into a template
    built from load_config's flat_adam (the train/test drivers' resume
    path) even when the resuming CLI omits the flag."""
    rng = np.random.default_rng(4)
    parsed = _tiny_parsed_design(rng)
    design = pack_design(parsed, map_size=16, align=8)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    tx = make_optimizer(1e-3, flat=True)
    state = init_state(model, tx, design, jax.random.PRNGKey(0))
    ckpt.save_checkpoint(str(tmp_path), state, {"flat_adam": True,
                                                "learning_rate": 1e-3})

    saved = ckpt.load_config(str(tmp_path))
    assert saved["flat_adam"] is True
    tx2 = make_optimizer(1e-3, flat=bool(saved["flat_adam"]))
    template = init_state_abstract(model, tx2, design, jax.random.PRNGKey(1))
    restored, _ = ckpt.load_checkpoint(str(tmp_path), template)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
