"""Merged super-graph multi-design batching.

merge_parsed_designs concatenates K designs into one disjoint DAG whose
level L is the union of every design's level L; one shared level scan
propagates all designs at once (contiguous writes preserved — no
vmap-induced scatters) and the K CNN rasters run as one batched conv,
which also gives UNet BatchNorm a well-defined batch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prtp_tpu.graph import merge_parsed_designs, pack_design
from prtp_tpu.models import PathModel
from prtp_tpu.trainer import (init_state, iterate_grouped_batches,
                              make_optimizer, make_train_step)

from test_models import _tiny_parsed_design

MODEL_KW = dict(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                global_dim=8)


@pytest.fixture(scope="module")
def parsed_list():
    rng = np.random.default_rng(11)
    return [_tiny_parsed_design(rng) for _ in range(3)]


def _grouped_ids(parsed_list, pad_to):
    k = len(parsed_list)
    off = np.cumsum([0] + [p["num_paths"] for p in parsed_list])
    ids = np.zeros((k, pad_to), np.int32)
    mask = np.zeros((k, pad_to), np.float32)
    for i, p in enumerate(parsed_list):
        n = p["num_paths"]
        ids[i, :n] = np.arange(n) + off[i]
        mask[i, :n] = 1.0
    return jnp.asarray(ids), jnp.asarray(mask)


@pytest.mark.parametrize("exact,groups", [(False, 1), (True, 1), (False, 2)])
def test_merged_forward_matches_per_design(parsed_list, exact, groups):
    merged = merge_parsed_designs(parsed_list)
    d_merged = pack_design(merged, map_size=16, align=8, exact_levels=exact,
                           scan_groups=groups)
    model = PathModel(**MODEL_KW)

    b = max(p["num_paths"] for p in parsed_list)
    gids, gmask = _grouped_ids(parsed_list, b)
    v = model.init(jax.random.PRNGKey(0), d_merged, gids)
    out_merged = np.asarray(model.apply(v, d_merged, gids))
    assert out_merged.shape == (len(parsed_list), b)

    for i, p in enumerate(parsed_list):
        d = pack_design(p, map_size=16, align=8)
        ids = jnp.arange(p["num_paths"], dtype=jnp.int32)
        out_one = np.asarray(model.apply(v, d, ids))
        np.testing.assert_allclose(
            out_merged[i, : p["num_paths"]], out_one,
            rtol=1e-4, atol=1e-5,
            err_msg=f"design {i} diverges between merged and solo")


def test_merged_unet_train_step():
    # the K rasters form a normal batch for UNet's BatchNorm. UNet halves
    # the raster once (vs LayoutNet's quarter), so map_size 16 needs
    # 32^2 inputs (SURVEY: 256^2 -> 128^2 at full scale).
    rng = np.random.default_rng(13)
    parsed_list = [_tiny_parsed_design(rng, cnn_hw=32) for _ in range(3)]
    merged = merge_parsed_designs(parsed_list)
    d = pack_design(merged, map_size=16, align=8)
    model = PathModel(unet=True, **MODEL_KW)
    tx = make_optimizer(1e-3)
    gids, gmask = _grouped_ids(parsed_list, 8)
    state = init_state(model, tx, d, jax.random.PRNGKey(0))
    assert state.batch_stats, "UNet must carry BatchNorm state"
    step = make_train_step(model, tx, donate=False)
    state2, mets = step(state, d, gids, gmask)
    assert np.isfinite(float(mets["loss"]))
    # running stats must actually update
    ra0 = jax.tree_util.tree_leaves(state.batch_stats)[0]
    ra1 = jax.tree_util.tree_leaves(state2.batch_stats)[0]
    assert not np.allclose(np.asarray(ra0), np.asarray(ra1))


def test_vmapped_multidesign_rejects_unet():
    from prtp_tpu.parallel.multi import make_multidesign_train_step

    model = PathModel(unet=True, **MODEL_KW)
    with pytest.raises(NotImplementedError, match="unet"):
        make_multidesign_train_step(model, make_optimizer(1e-3))


def test_iterate_grouped_batches(parsed_list):
    merged = merge_parsed_designs(parsed_list)
    rng = np.random.default_rng(0)
    universes = merged["path_ids_per_design"]
    rounds = list(iterate_grouped_batches(universes, 4, rng))
    k = len(universes)
    seen = [set() for _ in range(k)]
    for ids, mask in rounds:
        assert ids.shape == (k, 4) and mask.shape == (k, 4)
        for i in range(k):
            real = np.asarray(ids[i])[np.asarray(mask[i]) > 0]
            assert set(real) <= set(np.asarray(universes[i]).tolist())
            seen[i].update(real.tolist())
    for i in range(k):
        assert seen[i] == set(np.asarray(universes[i]).tolist()), \
            f"design {i}: grouped batching must cover its whole universe"
