"""End-to-end CLI flow: synthetic corpus -> generate -> train -> test.

Runs small (64x64 CNN rasters -> 16x16 feature maps) on the CPU mesh.
"""

import os

import numpy as np
import pytest

from prtp_tpu.data import synthetic
from prtp_tpu.data import generate as gen


MAP_ARGS = ["--map_size", "16", "--cnn_outdim", "8", "--out_dim", "16",
            "--hidden_dim", "32", "--batch_size", "4",
            "--cell_feat_dim", "13", "--net_feat_dim", "3"]


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    raw = str(tmp_path_factory.mktemp("raw"))
    data = str(tmp_path_factory.mktemp("data"))
    mdl = str(tmp_path_factory.mktemp("mdl"))
    synthetic.generate_corpus(raw, designs=("syn_a", "syn_b"),
                              num_paths=6, depth=4,
                              cnn_channels=2, cnn_hw=64)
    gen.main(["--rawdata_path", raw, "--data_save_path", data,
              "--map_size", "16"])
    return raw, data, mdl


def test_generate_skips_existing(pipeline_dirs, capsys):
    raw, data, _ = pipeline_dirs
    gen.main(["--rawdata_path", raw, "--data_save_path", data,
              "--map_size", "16"])
    out = capsys.readouterr().out
    assert "already parsed! Skip" in out
    assert os.path.exists(os.path.join(data, "traindata_list.txt"))
    assert os.path.exists(os.path.join(data, "testdata_list.txt"))


def test_train_and_eval_cli(pipeline_dirs):
    from prtp_tpu import train as train_mod
    from prtp_tpu import test as test_mod

    _raw, data, mdl = pipeline_dirs
    args = (["--data_save_path", data, "--model_saving_dir", mdl,
             "--num_epoch", "1", "--max_steps", "3", "--val_interval", "2"]
            + MAP_ARGS)
    train_mod.main(args)
    assert os.path.exists(os.path.join(mdl, "model.msgpack"))
    assert os.path.exists(os.path.join(mdl, "config.json"))
    assert os.path.exists(os.path.join(mdl, "stdout.log"))
    with open(os.path.join(mdl, "stdout.log")) as f:
        log = f.read()
    assert "Start training" in log
    assert "e0,syn_a,b0/" in log  # reference-format per-batch line

    # resume path: second run loads the checkpoint
    train_mod.main(args)
    with open(os.path.join(mdl, "seed.txt")) as f:
        assert len(f.read()) > 4  # two seeds appended

    # eval CLI
    test_mod.main(["--data_save_path", data, "--model_saving_dir", mdl]
                  + MAP_ARGS)
    assert os.path.exists(os.path.join(mdl, "predict.txt"))
    with open(os.path.join(mdl, "predict.txt")) as f:
        row = f.read().strip().split()
    assert len(row) == 6  # loss r2 acc recall precision f1


def test_train_loss_decreases(pipeline_dirs):
    """GNN-only regression on one design: loss after 30 steps < start."""
    import jax
    from prtp_tpu.options import get_options
    from prtp_tpu.models.fusion import model_from_options
    from prtp_tpu.data.dataset import load_single_design
    from prtp_tpu.graph import pack_design
    from prtp_tpu.trainer import (init_state, make_optimizer,
                                  make_train_step, pad_batch)

    _raw, data, _m = pipeline_dirs
    options = get_options(["--no_cnn", "--out_dim", "16",
                           "--hidden_dim", "32", "--map_size", "16"])
    options.cell_feat_dim -= options.feat_reduce[0]
    options.net_feat_dim -= options.feat_reduce[1]
    parsed = load_single_design("train", data, "syn_a")
    pack = pack_design(parsed, map_size=16)
    model = model_from_options(options)
    tx = make_optimizer(1e-3)
    state = init_state(model, tx, pack, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, "reg")
    ids, mask = pad_batch(np.asarray(parsed["path_ids"]),
                          len(parsed["path_ids"]))
    first = None
    for _ in range(30):
        state, mets = step(state, pack, ids, mask)
        if first is None:
            first = float(mets["loss"])
    last = float(mets["loss"])
    assert last < first * 0.5, (first, last)


def test_model_learns_synthetic_timing(pipeline_dirs):
    """End-to-end learnability: the fusion model must fit the synthetic
    arrival times (deterministic in depth) to high R^2."""
    import jax
    from prtp_tpu.options import get_options
    from prtp_tpu.models.fusion import model_from_options
    from prtp_tpu.data.dataset import load_single_design
    from prtp_tpu.graph import pack_design
    from prtp_tpu.trainer import (init_state, make_optimizer,
                                  make_multi_train_step, pad_batch)

    _raw, data, _m = pipeline_dirs
    options = get_options(["--no_cnn", "--out_dim", "16",
                           "--hidden_dim", "32", "--map_size", "16"])
    options.cell_feat_dim -= options.feat_reduce[0]
    options.net_feat_dim -= options.feat_reduce[1]
    parsed = load_single_design("train", data, "syn_a")
    pack = pack_design(parsed, map_size=16)
    model = model_from_options(options)
    tx = make_optimizer(3e-3)
    state = init_state(model, tx, pack, jax.random.PRNGKey(0))
    step = make_multi_train_step(model, tx, 50, "reg", donate=False)
    ids, mask = pad_batch(np.asarray(parsed["path_ids"]),
                          len(parsed["path_ids"]))
    r2 = -1.0
    for _ in range(6):  # up to 300 steps
        state, mets = step(state, pack, ids, mask)
        r2 = float(mets["r2"])
        if r2 > 0.95:
            break
    assert r2 > 0.9, f"model failed to fit synthetic timing: r2={r2}"


def test_train_merged_designs_cli(pipeline_dirs, tmp_path):
    """--merge_designs: one super-graph over all train designs, grouped
    batches, per-design validation unchanged."""
    from prtp_tpu import train as train_mod

    _raw, data, _ = pipeline_dirs
    mdl = str(tmp_path / "mdl_merged")
    args = (["--data_save_path", data, "--model_saving_dir", mdl,
             "--num_epoch", "1", "--max_steps", "3", "--val_interval", "2",
             "--merge_designs"] + MAP_ARGS)
    train_mod.main(args)
    with open(os.path.join(mdl, "stdout.log")) as f:
        log = f.read()
    assert "e0,syn_a+syn_b,b0/" in log  # merged pseudo-design line
    assert "validate:" in log           # per-design validation still runs


def test_train_merged_exact_levels_cli(pipeline_dirs, tmp_path):
    from prtp_tpu import train as train_mod

    _raw, data, _ = pipeline_dirs
    mdl = str(tmp_path / "mdl_merged_exact")
    args = (["--data_save_path", data, "--model_saving_dir", mdl,
             "--num_epoch", "1", "--max_steps", "2",
             "--merge_designs", "--exact_levels"] + MAP_ARGS)
    train_mod.main(args)
    with open(os.path.join(mdl, "stdout.log")) as f:
        log = f.read()
    assert "e0,syn_a+syn_b,b0/" in log


def test_train_loss_decreases_bf16():
    """--compute_dtype bfloat16 (bf16-packed feature tables and matmul
    operands; f32 params and — on the exact path — f32 node-state
    carries): training still converges on a small random design."""
    import jax
    import jax.numpy as jnp
    from prtp_tpu.data.random_design import make_random_design
    from prtp_tpu.graph import pack_design
    from prtp_tpu.models import PathModel
    from prtp_tpu.trainer import (init_state, make_optimizer,
                                  make_train_step, pad_batch)

    parsed = make_random_design([12, 18, 14, 16, 10, 12], map_size=16,
                                cnn_hw=64, seed=3)
    pack = pack_design(parsed, map_size=16, exact_levels=True,
                       compute_dtype=jnp.bfloat16)
    model = PathModel(out_dim=16, hidden_dim=32, cnn_outdim=8,
                      map_size=16, global_dim=8)
    tx = make_optimizer(1e-2)
    state = init_state(model, tx, pack, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, "reg", donate=False)
    ids, mask = pad_batch(np.arange(pack.num_paths), pack.num_paths)
    first = None
    for _ in range(40):
        state, mets = step(state, pack, ids, mask)
        if first is None:
            first = float(mets["loss"])
    last = float(mets["loss"])
    assert np.isfinite(last) and last < first * 0.5, (first, last)


def test_train_scan_groups_cli(pipeline_dirs, tmp_path):
    """--scan_groups N: grouped-scan packing through the full train CLI
    (per-design shapes, no bucketing) and the eval CLI."""
    from prtp_tpu import train as train_mod
    from prtp_tpu import test as test_mod

    _raw, data, _ = pipeline_dirs
    mdl = str(tmp_path / "mdl_groups")
    args = (["--data_save_path", data, "--model_saving_dir", mdl,
             "--num_epoch", "1", "--max_steps", "3", "--val_interval", "2",
             "--scan_groups", "2"] + MAP_ARGS)
    train_mod.main(args)
    assert os.path.exists(os.path.join(mdl, "model.msgpack"))
    test_mod.main(["--data_save_path", data, "--model_saving_dir", mdl,
                   "--scan_groups", "2"] + MAP_ARGS)
    assert os.path.exists(os.path.join(mdl, "predict.txt"))
