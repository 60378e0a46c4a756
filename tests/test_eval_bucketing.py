"""One eval executable must serve every design of a corpus.

The exact/grouped TRAIN packings have per-design shapes, so evaluation
through them would pay one XLA compile per design per process (minutes
each at real sizes). `prtp_tpu.test.test` and `train.validate` therefore
always evaluate on the bucketed padded-scan packing (`bucket_shape` +
`pad_to`), whatever the train packing — this pins that a mixed-size
corpus evaluates through a SINGLE compiled executable (VERDICT r3 #7),
using the same padding recipe as `validate()`.
"""

import numpy as np
import jax

from prtp_tpu.data.random_design import make_random_design
from prtp_tpu.graph import bucket_shape, pack_design
from prtp_tpu.models import PathModel
from prtp_tpu.trainer import (init_state, make_eval_step, make_optimizer,
                              pad_batch)


def _corpus():
    # three designs with deliberately different level profiles, level
    # counts, and path counts
    profiles = [[12, 20, 16, 8], [30, 44, 20, 12, 8, 8], [6, 10, 8, 4]]
    return [make_random_design(p, cell_feat_dim=12, net_feat_dim=3,
                               map_size=16, cnn_hw=64, seed=40 + i)
            for i, p in enumerate(profiles)]


def test_bucketed_eval_compiles_once():
    parsed_list = _corpus()
    bucket = bucket_shape(parsed_list, map_size=16)
    packs = [pack_design(p, map_size=16, pad_to=bucket)
             for p in parsed_list]
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    state = init_state(model, make_optimizer(1e-3), packs[0],
                       jax.random.PRNGKey(0))
    ev = make_eval_step(model, "reg")
    for parsed, pack in zip(parsed_list, packs):
        ids = np.arange(parsed["num_paths"], dtype=np.int64)
        # validate()'s padding: bucketed capacity covers every design
        pids, mask = pad_batch(ids, max(pack.num_paths, len(ids), 1))
        _preds, mets = ev(state, pack, pids, mask)
        assert np.isfinite(float(mets["loss"]))
    assert ev._cache_size() == 1, (
        f"eval specialized {ev._cache_size()} times; the bucket must "
        "make every design share ONE executable")


def test_bucketed_eval_compiles_once_at_14_designs():
    """The reference corpus is 14 designs (top_map,
    src/generate_data.py:7-23); the single-compile property must hold
    at that corpus scale with heterogeneous level profiles."""
    rng = np.random.default_rng(7)
    profiles = [list(rng.integers(4, 40, size=int(rng.integers(3, 9))))
                for _ in range(14)]
    parsed_list = [make_random_design(p, cell_feat_dim=12, net_feat_dim=3,
                                      map_size=16, cnn_hw=64, seed=60 + i)
                   for i, p in enumerate(profiles)]
    bucket = bucket_shape(parsed_list, map_size=16)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    pack0 = pack_design(parsed_list[0], map_size=16, pad_to=bucket)
    state = init_state(model, make_optimizer(1e-3), pack0,
                       jax.random.PRNGKey(0))
    ev = make_eval_step(model, "reg")
    for parsed in parsed_list:
        pack = pack_design(parsed, map_size=16, pad_to=bucket)
        ids = np.arange(parsed["num_paths"], dtype=np.int64)
        pids, mask = pad_batch(ids, max(pack.num_paths, len(ids), 1))
        _preds, mets = ev(state, pack, pids, mask)
        assert np.isfinite(float(mets["loss"]))
    assert ev._cache_size() == 1, (
        f"eval specialized {ev._cache_size()} times over the 14-design "
        "corpus; the bucket must make every design share ONE executable")


def test_bucketed_eval_matches_exact_packing():
    """The bucketed eval numbers are the exact-packing numbers: same
    params, same paths, packing changes only padding."""
    parsed_list = _corpus()
    bucket = bucket_shape(parsed_list, map_size=16)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8, map_size=16,
                      global_dim=8)
    pack0 = pack_design(parsed_list[0], map_size=16, pad_to=bucket)
    state = init_state(model, make_optimizer(1e-3), pack0,
                       jax.random.PRNGKey(0))
    ev = make_eval_step(model, "reg")
    for parsed in parsed_list:
        ids = np.arange(parsed["num_paths"], dtype=np.int64)
        pb = pack_design(parsed, map_size=16, pad_to=bucket)
        pe = pack_design(parsed, map_size=16, exact_levels=True)
        ids_b, m_b = pad_batch(ids, max(pb.num_paths, len(ids), 1))
        ids_e, m_e = pad_batch(ids, max(pe.num_paths, len(ids), 1))
        preds_b, mets_b = ev(state, pb, ids_b, m_b)
        preds_e, mets_e = ev(state, pe, ids_e, m_e)
        np.testing.assert_allclose(
            np.asarray(preds_b)[:len(ids)], np.asarray(preds_e)[:len(ids)],
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(mets_b["loss"]),
                                   float(mets_e["loss"]), rtol=1e-4)
