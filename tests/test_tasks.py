"""Task-variant coverage: classification task, UNet branch (BatchNorm
state), attention GNN, and normalization — end-to-end through the
trainer on the synthetic corpus."""

import numpy as np
import jax
import pytest

from prtp_tpu.data import synthetic
from prtp_tpu.data import generate as gen
from prtp_tpu.data.dataset import load_single_design
from prtp_tpu.graph import pack_design
from prtp_tpu.models.fusion import model_from_options
from prtp_tpu.options import get_options
from prtp_tpu.trainer import (
    init_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    pad_batch,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    raw = str(tmp_path_factory.mktemp("raw"))
    data = str(tmp_path_factory.mktemp("data"))
    # 3-channel 128px rasters -> UNet outputs 64x64 -> map_size 64
    synthetic.generate_corpus(raw, designs=("syn_a",), num_paths=8,
                              depth=4, cnn_channels=3, cnn_hw=128)
    gen.main(["--rawdata_path", raw, "--data_save_path", data,
              "--map_size", "64"])
    return data


def _opts(extra):
    base = ["--map_size", "64", "--cnn_outdim", "8", "--out_dim", "16",
            "--hidden_dim", "32"]
    o = get_options(base + extra)
    o.cell_feat_dim -= o.feat_reduce[0]
    o.net_feat_dim -= o.feat_reduce[1]
    return o


def _run_steps(options, data_dir, n_steps=5):
    parsed = load_single_design("train", data_dir, "syn_a",
                                feat_reduce=options.feat_reduce,
                                if_norm=options.norm)
    design = pack_design(parsed, map_size=options.map_size)
    model = model_from_options(options)
    tx = make_optimizer(1e-3)
    state = init_state(model, tx, design, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, options.task, donate=False)
    ids, mask = pad_batch(np.asarray(parsed["path_ids"]),
                          len(parsed["path_ids"]))
    losses = []
    for _ in range(n_steps):
        state, mets = step(state, design, ids, mask)
        losses.append(float(mets["loss"]))
    eval_step = make_eval_step(model, options.task)
    preds, mets = eval_step(state, design, ids, mask)
    return losses, np.asarray(preds), mets, state


def test_cls_task_trains(data_dir):
    # --unet: the fixture's 3-channel 128px rasters give a 64x64 map
    # through UNet, matching the map_size-64 masks
    options = _opts(["--task", "cls", "--nlabels", "2", "--unet"])
    losses, preds, mets, _ = _run_steps(options, data_dir, n_steps=20)
    assert preds.shape[-1] == 2
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_unet_branch_with_batchnorm(data_dir):
    options = _opts(["--unet"])
    losses, preds, mets, state = _run_steps(options, data_dir, n_steps=5)
    assert np.isfinite(losses).all()
    # BatchNorm running stats must exist and be updated by training
    stats = jax.tree_util.tree_leaves(state.batch_stats)
    assert len(stats) > 0
    assert any(float(np.abs(np.asarray(s)).sum()) > 0 for s in stats)


def test_unet_batchnorm_momentum_torch_parity():
    """BN running stats must update at torch BatchNorm2d's default rate
    (torch momentum=0.1 weights the NEW batch == flax momentum 0.9).
    Applying the SAME input twice from zero-init stats gives
    ra1 = 0.1*mu and ra2 = 0.9*ra1 + 0.1*mu = 0.19*mu, so the ratio
    ra2/ra1 is exactly 1.9 — flax's 0.99 default would give 1.99
    (10x slower adaptation; the reference's eval-mode stats would lag
    far behind, src/Unet.py:17,20)."""
    from prtp_tpu.models.unet import DoubleConv

    rng = np.random.default_rng(5)
    x = np.asarray(rng.standard_normal((1, 8, 8, 3)), np.float32)
    m = DoubleConv(4)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    _, upd1 = m.apply(v, x, train=True, mutable=["batch_stats"])
    v2 = {"params": v["params"], "batch_stats": upd1["batch_stats"]}
    _, upd2 = m.apply(v2, x, train=True, mutable=["batch_stats"])
    def means(tree):  # 'var' leaves init at 1.0, not 0 — means only
        return np.concatenate(
            [np.asarray(leaf).ravel()
             for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
             if "mean" in jax.tree_util.keystr(path)])

    ra1, ra2 = means(upd1["batch_stats"]), means(upd2["batch_stats"])
    sel = np.abs(ra1) > 1e-5 * np.abs(ra1).max()
    np.testing.assert_allclose(ra2[sel] / ra1[sel], 1.9, rtol=1e-3)


def test_unet_avg_pooling(data_dir):
    options = _opts(["--unet", "--pooling", "avg"])
    losses, _p, _m, _s = _run_steps(options, data_dir, n_steps=2)
    assert np.isfinite(losses).all()


def test_attention_gnn_trains(data_dir):
    options = _opts(["--attn", "--no_cnn"])
    losses, _p, _m, _s = _run_steps(options, data_dir, n_steps=10)
    assert losses[-1] < losses[0]


def test_norm_flag(data_dir):
    options = _opts(["--norm", "--no_cnn"])
    losses, _p, _m, _s = _run_steps(options, data_dir, n_steps=3)
    assert np.isfinite(losses).all()


def test_gnn_unroll_equivalence(data_dir):
    """unroll=True must compute the same forward as the rolled scan."""
    options = _opts(["--no_cnn"])
    parsed = load_single_design("train", data_dir, "syn_a",
                                feat_reduce=options.feat_reduce)
    design = pack_design(parsed, map_size=options.map_size)
    from prtp_tpu.models import PathModel
    m1 = PathModel(out_dim=16, hidden_dim=32, use_cnn=False, global_dim=8)
    m2 = PathModel(out_dim=16, hidden_dim=32, use_cnn=False, global_dim=8,
                   gnn_unroll=True)
    ids = np.arange(parsed["num_paths"], dtype=np.int32)
    v = m1.init(jax.random.PRNGKey(0), design, ids)
    out1 = m1.apply(v, design, ids)
    out2 = m2.apply(v, design, ids)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6)
