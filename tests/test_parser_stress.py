"""Scale + robustness stress of the host parsing pipeline (VERDICT r2
#6): hierarchical (3-level) netlist TEXT with wide buses, escaped
identifiers, transitive assign chains and multiple SRAMs, parsed
end-to-end through NetlistBuilder + feature extraction.

The quick test runs a small instance of the same generator shape so the
fidelity paths (io2arg tracing through two module boundaries, alias
chains, escaped ids, SRAM timing_tabs gating) are covered on every run;
the 100k-cell instance is `-m slow` (scripts/stress_parse.py runs it and
records wall-clock in STATUS.md).
"""

import os
import time

import numpy as np
import pytest

from prtp_tpu.data.features import extract_features
from prtp_tpu.data.generate import load_libs, resolve_top_module
from prtp_tpu.data.netlist import NetlistBuilder
from prtp_tpu.data.synthetic import generate_big_design, write_libs


def _parse_big(tmp_path, num_paths, stages, grps):
    raw = str(tmp_path / "raw")
    write_libs(raw)
    ddir = os.path.join(raw, "big_a")
    generate_big_design(ddir, num_paths=num_paths, stages=stages,
                        grps=grps)
    cell_info_map, cell_info_map2, early_lib, ctype2id = load_libs(raw)
    builder = NetlistBuilder(
        resolve_top_module(raw, "big_a"), "critical",
        cell_info_map=cell_info_map2, cell_lib=early_lib, map_size=128)
    t0 = time.time()
    result = builder.parse(ddir)
    parse_s = time.time() - t0
    out = extract_features(result, cell_info_map, ctype2id)
    return out, parse_s


def _check_invariants(out, num_paths, stages, grps):
    R, S, B = num_paths, stages, grps
    # every chain NAND + side INV + 2 DFFs/path + escaped INV + 4 SRAMs
    # contribute pin nodes; spot-check scale and exact path count
    assert out["num_paths"] == R
    n = out["num_nodes"]
    # chain pins: R*B*S*(3 NAND + 2 INV); DFF pins 3*2*R; plus PIs/SRAM
    assert n >= R * B * S * 5 + 6 * R
    # levelization: every node in exactly one level
    seen = np.zeros(n, bool)
    for nodes, _t, _p in out["levels"]:
        assert not seen[nodes].any(), "node appears in two levels"
        seen[nodes] = True
    # all edges go to a strictly deeper level
    node_level = np.full(n, -1)
    for li, (nodes, _t, _p) in enumerate(out["levels"]):
        node_level[nodes] = li
    for et in ("cell_edges", "net_edges"):
        src, dst = out[et]
        ok = node_level[dst] > node_level[src]
        assert ok.all(), f"{et}: {np.count_nonzero(~ok)} edges not forward"
    # each path's endpoint exists and criticality matches the i%3==2 rule
    crit = out["is_critical"][out["path_endpoint"]]
    want = (np.arange(R) % 3) == 2
    np.testing.assert_array_equal(crit.astype(bool), want)
    # arrival = 0.1 + n_arcs*0.2 + 0.05 (post-route jitter):
    # n_arcs = 1 (launch) + B*S chain stages
    want_arr = np.round(0.1 + (1 + B * S) * 0.2 + 0.05, 4)
    np.testing.assert_allclose(out["arrival_time"][out["path_endpoint"]],
                               want_arr, rtol=1e-6)


def test_big_design_small_instance(tmp_path):
    out, parse_s = _parse_big(tmp_path, num_paths=8, stages=4, grps=2)
    _check_invariants(out, 8, 4, 2)


@pytest.mark.slow
def test_big_design_100k_cells(tmp_path):
    R, S, B = 2048, 8, 3
    out, parse_s = _parse_big(tmp_path, num_paths=R, stages=S, grps=B)
    _check_invariants(out, R, S, B)
    cells = R * S * B * 2 + 2 * R + 1 + 4
    assert cells >= 100_000
    print(f"\n100k-cell stress: {out['num_nodes']} pin nodes, "
          f"{len(out['levels'])} levels, parse {parse_s:.1f}s")
