"""Preprocessing must be byte-stable across interpreter hash seeds.

Node ids, every packed array, and the per-level tables derive from topo
level order; any PYTHONHASHSEED-dependent set iteration there would make
`{design}.npz` differ between runs and between spawn workers. Two fresh
subprocesses with different hash seeds must produce identical arrays.
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GEN = """
import sys
sys.path.insert(0, {repo!r})
from prtp_tpu.data import synthetic, generate
synthetic.main(["--out", sys.argv[1], "--designs", "syn_a",
                "--cnn_hw", "64"])
generate.main(["--rawdata_path", sys.argv[1],
               "--data_save_path", sys.argv[2]])
"""


def _gen(tmp_path, tag, hashseed):
    raw = str(tmp_path / f"raw_{tag}")
    out = str(tmp_path / f"ds_{tag}")
    env = dict(os.environ, PYTHONHASHSEED=str(hashseed))
    subprocess.run(
        [sys.executable, "-c", _GEN.format(repo=REPO), raw, out],
        env=env, check=True, capture_output=True, text=True, timeout=300)
    return os.path.join(out, "syn_a.npz")


def test_npz_identical_across_hash_seeds(tmp_path):
    a = _gen(tmp_path, "a", 0)
    b = _gen(tmp_path, "b", 12345)
    za, zb = np.load(a), np.load(b)
    assert sorted(za.files) == sorted(zb.files)
    for key in za.files:
        xa, xb = za[key], zb[key]
        assert xa.dtype == xb.dtype and xa.shape == xb.shape, key
        assert xa.tobytes() == xb.tobytes(), f"array {key} differs"
