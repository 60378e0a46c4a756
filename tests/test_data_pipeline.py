"""End-to-end host pipeline tests: synthetic raw corpus -> verilog/report
parsers -> graph builder -> features -> npz -> loader, with structural
property checks mirroring the reference's invariants."""

import json
import os

import numpy as np
import pytest

from prtp_tpu.data import synthetic
from prtp_tpu.data.generate import generate_one, load_libs, resolve_top_module
from prtp_tpu.data.dataset import (
    load_design_npz,
    load_single_design,
    min_max_norm,
    split_dataset,
)
from prtp_tpu.data.netlist import NetlistBuilder, abstract_cell_type, pin2bin
from prtp_tpu.data.timing_report import (
    ReportDB,
    parse_postopt_report,
    parse_preopt_report,
)
from prtp_tpu.data.verilog import parse_verilog, Id, Index, Concat


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    raw = tmp_path_factory.mktemp("rawdata")
    synthetic.generate_corpus(str(raw), designs=("syn_a", "syn_b"),
                              num_paths=6, depth=4,
                              cnn_channels=2, cnn_hw=64)
    return str(raw)


@pytest.fixture(scope="module")
def parsed_design(corpus, tmp_path_factory):
    save = tmp_path_factory.mktemp("datasets")
    out = generate_one(corpus, "syn_a", str(save))
    return load_design_npz(out), str(save)


# ------------------------------------------------------------- verilog

def test_verilog_parser_basics():
    text = """
    // comment
    module top ( a, b, y );
      input [3:0] a;
      input b;
      output y;
      wire [1:0] w;
      assign y = w[0];
      INVx1 u0 ( .A(a[2]), .Y(w[0]) );
      SUB s ( .p({a[1:0], b, 1'b0}) );
    endmodule
    module SUB ( p );
      input [3:0] p;
    endmodule
    """
    mods = parse_verilog(text)
    assert set(mods) == {"top", "SUB"}
    top = mods["top"]
    assert [d.name for d in top.decls] == ["a", "b", "y", "w"]
    assert top.decls[0].msb == 3 and top.decls[0].lsb == 0
    assert len(top.assigns) == 1
    inv = top.instances[0]
    assert inv.module == "INVx1" and inv.name == "u0"
    assert isinstance(inv.conns[0][1], Index)
    sub = top.instances[1]
    assert isinstance(sub.conns[0][1], Concat)
    assert len(sub.conns[0][1].parts) == 3


def test_verilog_escaped_identifiers():
    text = r"""
    module top ( a );
      input a;
      wire \w[0].x ;
      INVx1 \u0$ ( .A(a), .Y(\w[0].x ) );
    endmodule
    """
    mods = parse_verilog(text)
    inst = mods["top"].instances[0]
    assert inst.name == "\\u0$"
    assert isinstance(inst.conns[1][1], Id)


# ------------------------------------------------------------- reports

def test_report_parser_states_and_paths(corpus):
    with open(os.path.join(corpus, "syn_a/post-route/path.tarpt")) as f:
        post = f.read()
    db = ReportDB()
    all_paths, criticals = parse_postopt_report(post, db)
    assert len(all_paths) == 6
    # every third path is VIOLATED in the synthetic corpus
    assert criticals == [2, 5]
    with open(os.path.join(corpus, "syn_a/post-place/path.tarpt")) as f:
        pre = f.read()
    timing_paths, _, _ = parse_preopt_report(pre, db)
    assert len(timing_paths) == 6
    for tp in timing_paths:
        assert tp.start is not None and tp.path
        assert tp.path[0].endswith("/QN")
        assert tp.path[-1].endswith("/D")
        # critical => negative slack (post-route numbers)
        if tp.is_critical:
            assert tp.required_time - tp.arrival_time < 0
    # pre-route trans values overwrite post-route ones (parse order)
    some_pin = timing_paths[0].path[2]
    assert db.pin2trans[some_pin] == pytest.approx(0.02)


def test_top_txt_overrides_top_map(tmp_path):
    """A design dir's own top.txt names THIS netlist's top module and
    must win over the name-keyed reference TOP_MAP (a synthetic corpus
    may reuse a reference design name, e.g. 'arm9', whose TOP_MAP entry
    'arm9_compatiable_code' does not exist in the synthetic Verilog).
    Dirs without top.txt keep the reference mapping."""
    d = tmp_path / "arm9"
    d.mkdir()
    (d / "top.txt").write_text("top\n")
    assert resolve_top_module(str(tmp_path), "arm9") == "top"
    assert (resolve_top_module(str(tmp_path), "jpeg")
            == "jpeg_top")  # TOP_MAP fallback (no top.txt)
    assert resolve_top_module(str(tmp_path), "mystery") == "mystery"


# --------------------------------------------------------- graph build

def test_netlist_builder_structure(corpus, capsys):
    cell_info_map, cell_info_map2, early_lib, ctype2id = load_libs(corpus)
    b = NetlistBuilder(resolve_top_module(corpus, "syn_a"), "critical",
                       cell_info_map2, early_lib)
    result = b.parse(os.path.join(corpus, "syn_a"))
    # per-stage preprocess wall-clock logs (the reference's observability
    # surface, verilog_parser_asap7.py:1222-1224,1262-1264)
    out = capsys.readouterr().out
    assert "Graph successfully built" in out
    assert "num topological level" in out
    levels = result["topo_levels"]
    # level 0 = PIs only
    assert set(levels[0][0]) == set(result["PIs"])
    # each node appears in exactly one level
    seen = {}
    for li, (nodes, _t, _p) in enumerate(levels):
        for nd in nodes:
            assert nd not in seen, f"{nd} in levels {seen[nd]} and {li}"
            seen[nd] = li
    # levels alternate: even = cell/PI pins (drive or PI), odd = sink pins
    for li, (nodes, _t, _p) in enumerate(levels):
        for nd in nodes:
            attrs = result["node_attrs"][nd]
            if li == 0:
                assert attrs["cell_type"] == "PI"
            elif li % 2 == 1:
                assert attrs["pin_type"] == "sink", (li, nd)
            else:
                assert attrs["pin_type"] == "drive", (li, nd)
    # endpoints land in levels with their path ids
    all_path_ids = [p for (_n, _t, pids) in levels for p in pids]
    assert sorted(all_path_ids) == list(range(result["num_paths"]))
    # SRAM macro pins exist per bus bit with timing_tabs-gated edges
    assert "mem0/O[1]" in result["node_attrs"]
    cell_edges = set((u, v) for u, v, t in result["edges"] if t == "cell")
    assert ("mem0/CLK", "mem0/O[0]") in cell_edges
    assert ("mem0/A[0]", "mem0/O[0]") not in cell_edges
    # hierarchy: sub-module pins exist with traced global nets
    assert "s0/g1/A" in result["node_attrs"]
    assert result["node_attrs"]["s0/g1/A"]["net"] == "q0"
    # assign alias merged: path 1's first cell input is driven by q1
    assert ("L1/QN", "c1_0/A", "net") in result["edges"]
    # masks: one row set per path
    coo = result["mask_coo"]
    assert set(np.unique(coo[0])) == set(range(result["num_paths"]))
    assert coo[1].min() >= 0 and coo[1].max() < 128 * 128


def test_abstract_cell_type():
    assert abstract_cell_type("NAND2x1_ASAP7_75t_R") == "NAND2"
    assert abstract_cell_type("CKINVDCx6p67_ASAP7_75t_SL") == "INVDC"
    assert abstract_cell_type("BUFx12_ASAP7_75t_R") == "BUF"


def test_pin2bin_clamps():
    assert pin2bin(0, 0, 4, 4) == (0, 0)
    assert pin2bin(511.9, 511.9, 4, 4) == (127, 127)
    assert pin2bin(9999, -5, 4, 4) == (127, 0)


def test_sibling_masking_not_provided(corpus):
    _, cim2, early, _ = load_libs(corpus)
    with pytest.raises(NotImplementedError):
        NetlistBuilder("top", "sibling", cim2, early)
    with pytest.raises(ValueError):
        NetlistBuilder("top", "bogus", cim2, early)


# ------------------------------------------------------------ features

def test_features_and_labels(parsed_design):
    parsed, _save = parsed_design
    n = parsed["num_nodes"]
    num_ctypes = parsed["num_ctypes"]
    assert num_ctypes == 5  # BUF, DFFHQN, INV, NAND, SRAM (native)
    assert parsed["cell_feat"].shape == (n, num_ctypes + 8)
    assert parsed["net_feat"].shape == (n, 3)
    # cell features only on drive pins: one-hot sums to 1 there
    onehot = parsed["cell_feat"][:, :num_ctypes].sum(axis=1)
    assert set(np.unique(onehot)) <= {0.0, 1.0}
    # endpoints have labels
    ep = parsed["path_endpoint"]
    assert np.all(parsed["is_end"][ep] == 1)
    assert np.all(parsed["arrival_time"][ep] > 0)
    # criticals have negative slack
    crit_ep = ep[parsed["is_critical"][ep] == 1]
    slack = parsed["required_time"][crit_ep] - parsed["arrival_time"][crit_ep]
    assert np.all(slack < 0)
    assert len(parsed["critical_paths"]) == 2
    # net features: sink pins of nets have positive pin capacitance
    net_dst = parsed["net_edges"][1]
    assert np.all(parsed["net_feat"][net_dst, 2] > 0)


def test_num_ctypes_value(corpus):
    # BUF, DFFHQN, INV, NAND, SRAM — SRAM is native here, and the loader
    # must not append a duplicate
    with open(os.path.join(corpus, "ctype2id.json")) as f:
        c2i = json.load(f)
    assert len(c2i) == 5
    assert "SRAM" in c2i


# -------------------------------------------------------------- loader

def test_loader_splits_and_oversampling(parsed_design):
    parsed, save = parsed_design
    train = load_single_design("train", save, "syn_a", os_rate=2,
                               feat_reduce=[6, 1])
    # feat_reduce truncates trailing columns
    assert train["cell_feat"].shape[1] == parsed["cell_feat"].shape[1] - 6
    assert train["net_feat"].shape[1] == 2
    # oversampling: 4 neg vs 2 pos => ratio 1.0, not > 1 => no oversample
    assert len(train["path_ids"]) == parsed["num_paths"]

    test = load_single_design("test", save, "syn_a")
    assert os.path.exists(os.path.join(save, "syn_a_split.json"))
    test2 = load_single_design("test", save, "syn_a")
    assert test["path_ids"] == test2["path_ids"]  # persistent split
    assert set(test["path_ids"]) <= set(range(parsed["num_paths"]))


def test_min_max_norm():
    x = np.array([[1.0, 0.0], [1.0, 5.0], [1.0, 10.0]], np.float32)
    out = min_max_norm(x, 1)
    np.testing.assert_allclose(out[:, 1], [0, 0.5, 1.0])
    np.testing.assert_allclose(out[:, 0], 1.0)  # untouched before start
    out2 = min_max_norm(x, 0)
    np.testing.assert_allclose(out2[:, 0], 0.0)  # constant column -> 0


def test_split_dataset_proportions():
    import random
    rng = random.Random(0)
    paths = list(range(100))
    crit = list(range(20))
    val, test = split_dataset(paths, crit, rng)
    assert len(val) == 4 + 16
    assert len(val) + len(test) == 100
    assert set(val) | set(test) == set(paths)


# ------------------------------------------------------- npz roundtrip

def test_npz_roundtrip(parsed_design, corpus):
    parsed, save = parsed_design
    again = load_design_npz(os.path.join(save, "syn_a.npz"))
    np.testing.assert_array_equal(parsed["cell_feat"], again["cell_feat"])
    assert len(parsed["levels"]) == len(again["levels"])
    for (a, b) in zip(parsed["levels"], again["levels"]):
        np.testing.assert_array_equal(np.sort(a[0]), np.sort(b[0]))
    assert again["cnn_input"].shape == (2, 64, 64)


def test_shapes_loader_matches_full_loader_bucket(parsed_design):
    """load_design_shapes (the cheap startup bucket pass) must yield the
    SAME bucket_shape as the full npz load it replaces in train.py."""
    from prtp_tpu.data.dataset import load_design_shapes
    from prtp_tpu.graph import bucket_shape
    parsed, save = parsed_design
    path = os.path.join(save, "syn_a.npz")
    full = load_design_npz(path)
    slim = load_design_shapes(path)
    assert bucket_shape([slim], align=8) == bucket_shape([full], align=8)


def test_pipeline_scales_to_10k_cells(tmp_path):
    """Medium-scale host pipeline smoke: ~20k pins end-to-end quickly."""
    import time
    from prtp_tpu.data.generate import generate_one
    raw = str(tmp_path / "raw")
    synthetic.write_libs(raw)
    synthetic.generate_design(os.path.join(raw, "mid"), num_paths=300,
                              depth=12, seed=1, cnn_channels=2, cnn_hw=64)
    t0 = time.time()
    out = generate_one(raw, "mid", str(tmp_path), map_size=16)
    dt = time.time() - t0
    parsed = load_design_npz(out)
    assert parsed["num_nodes"] > 10000
    assert dt < 60, f"host pipeline too slow: {dt:.1f}s"


# ------------------------------------------- vectorized host-path units

def test_parse_pin_locations_format(tmp_path):
    """Whole-file tokenized parse: === headers skipped, escapes stripped
    (reference drops every backslash), coords kept as python floats,
    bins truncated-toward-zero then clamped."""
    from prtp_tpu.data.netlist import parse_pin_locations
    p = tmp_path / "pin_bin.txt"
    p.write_text("=== pin locations ===\n"
                 "u0/A 1.0 2.0\n"
                 "\\esc[3].x/Y 511.9 -5.0\n"
                 "u0/A 9.0 9.0\n")  # duplicate: last wins (dict semantics)
    res = parse_pin_locations(str(p), map_size=128, canvas=512.0)
    assert set(res) == {"u0/A", "esc[3].x/Y"}
    x, y, bx, by = res["esc[3].x/Y"]
    assert (x, y) == (511.9, -5.0) and (bx, by) == (127, 0)
    x, y, bx, by = res["u0/A"]
    assert isinstance(x, float) and isinstance(bx, int)
    assert (x, y, bx, by) == (9.0, 9.0, 2, 2)


def test_topo_levels_deepest_and_prune():
    """The numpy levelization must keep the reference semantics: a node
    lands in its DEEPEST BFS frontier (longest path from the PI set),
    per-level name order is sorted, and nodes unreachable from PIs are
    pruned from node_attrs along with their edges."""
    from prtp_tpu.data.netlist import NetlistBuilder
    b = NetlistBuilder("top", "critical", cell_info_map={}, cell_lib={})
    # p1, p2 PIs; p2 is ALSO a successor of p1 -> reassigned to level 1,
    # which pushes c (a successor of p2) to level 2 and d to level 3 —
    # longest-path-from-PI levels, exactly the reference's BFS dedup.
    # q is unreachable and must be pruned with its edge q->c.
    edges = [("p1", "p2", "net"), ("p1", "c", "cell"), ("p2", "c", "net"),
             ("p1", "d", "net"), ("c", "d", "cell"), ("q", "c", "cell")]
    b.edges = list(edges)
    b.node_attrs = {nd: {} for nd in "p1 p2 c d q".split()}
    succs = {}
    for u, v, _t in edges:
        succs.setdefault(u, []).append(v)
    pos = {"d"}
    rev = b._topo_levels(succs, {"p1", "p2"}, pos, {"d": 7})
    got = [lvl for lvl, _t, _p in rev]
    assert got == [["p1"], ["p2"], ["c"], ["d"]]
    targets = [t for _l, t, _p in rev]
    path_ids = [p for _l, _t, p in rev]
    assert targets == [[], [], [], ["d"]] and path_ids == [[], [], [], [7]]
    assert "q" not in b.node_attrs and len(b.node_attrs) == 4
    assert ("q", "c", "cell") not in b.edges and len(b.edges) == 5
