"""SRAM macro-cell handling (reference parse_RAM,
src/verilog_parser_asap7.py:741-829): per-bus-bit pin nodes, CLK/CE ->
output edges gated on timing_tabs, default sink capacitance, and the
46.08 max-capacitance feature default."""

import numpy as np
import pytest

from prtp_tpu.data.features import extract_features
from prtp_tpu.data.netlist import NetlistBuilder
from prtp_tpu.data.timing_report import TimingPath

SRAM_CELL = {
    "type": "SRAM", "load": 3.0, "area": 100.0, "width": 20.0,
    "height": 5.0,
    "pin_info": {
        "CLK": {"capacitance": "2.0", "max_capacitance": "",
                "direction": "input"},
        "CE": {"capacitance": "1.5", "max_capacitance": "",
               "direction": "input"},
        "A": {"capacitance": "", "max_capacitance": "",
              "direction": "input"},
        "O": {"capacitance": "", "max_capacitance": "",
              "direction": "output"},
    },
}

DFF_CELL = {
    "type": "DFFHQN", "load": 2.0, "area": 2.4, "width": 1.6,
    "height": 0.27,
    "pin_info": {
        "D": {"capacitance": "0.9", "max_capacitance": "",
              "direction": "input"},
        "CLK": {"capacitance": "1.1", "max_capacitance": "",
                "direction": "input"},
        "QN": {"capacitance": "", "max_capacitance": "26.0",
               "direction": "output"},
    },
}

NETLIST = """
module top ( clk, ce, a0, a1 );
  input clk;
  input ce;
  input a0;
  input a1;
  wire [1:0] dout;
  wire q0;
  SRAM2RW16x16 m0 ( .CLK(clk), .CE(ce), .A({a1, a0}), .O(dout) );
  DFFHQNx1 r0 ( .D(dout[1]), .CLK(clk), .QN(q0) );
endmodule
"""


@pytest.fixture()
def built():
    cell_info_map = {"SRAM2RW16x16": SRAM_CELL, "DFFHQNx1": DFF_CELL}
    cell_lib = {
        "SRAM2RW16x16": {"pin_info": {
            "CLK": {"direction": "input"},
            "CE": {"direction": "input"},
            "A": {"direction": "input"},
            # output timing tables list CLK and CE as related pins
            "O": {"direction": "output",
                  "timing_tabs": {"CLK": {}, "CE": {}}},
        }},
        "DFFHQNx1": {"pin_info": {
            "D": {"direction": "input"},
            "CLK": {"direction": "input"},
            "QN": {"direction": "output", "timing_tabs": {"CLK": {}}},
        }},
    }
    b = NetlistBuilder("top", "critical", cell_info_map, cell_lib,
                       map_size=16)
    pins = ["m0/CLK", "m0/CE", "m0/A[0]", "m0/A[1]", "m0/O[0]", "m0/O[1]",
            "r0/D", "r0/CLK", "r0/QN",
            "clk/clk", "ce/ce", "a0/a0", "a1/a1"]
    b.pin_loc_map = {p: (float(i), float(i), i % 16, i % 16)
                     for i, p in enumerate(pins)}
    path = TimingPath(start="r0/CLK", end="r0/D",
                      path=["m0/O[1]", "r0/D"],
                      nets=set(), required_time=5.0, arrival_time=1.0)
    b.db.pin2trans["m0/O[1]"] = 0.1
    b.db.pin2delay["m0/O[1]"] = 0.2
    result = b.build(NETLIST, [path])
    return b, result, cell_info_map


def test_sram_bus_pins_and_edges(built):
    b, result, _cim = built
    # one node per bus bit
    for p in ("m0/O[0]", "m0/O[1]", "m0/A[0]", "m0/A[1]", "m0/CLK",
              "m0/CE"):
        assert p in result["node_attrs"], p
    # CLK and CE drive both output bits; A does not (timing_tabs gate)
    edges = set((u, v) for u, v, t in result["edges"] if t == "cell")
    for o in ("m0/O[0]", "m0/O[1]"):
        assert ("m0/CLK", o) in edges
        assert ("m0/CE", o) in edges
        assert ("m0/A[0]", o) not in edges
        assert ("m0/A[1]", o) not in edges


def test_sram_default_sink_cap(built):
    b, _result, _cim = built
    # A pins have empty capacitance -> 13.06 default each (ref :806)
    # A[1] maps to a1's net, A[0] to a0's net
    assert b.nets["a0"].total_output_cap == pytest.approx(13.06)
    assert b.nets["a1"].total_output_cap == pytest.approx(13.06)
    # CLK cap 2.0 accumulates on the clk net alongside r0/CLK's 1.1
    assert b.nets["clk"].total_output_cap == pytest.approx(2.0 + 1.1)


def test_sram_feature_defaults(built):
    _b, result, cim = built
    ctype2id = {"DFFHQN": 0, "SRAM": 1}
    feats = extract_features(result, cim, ctype2id)
    n2i = feats["node2id"]
    num_ctypes = feats["num_ctypes"]
    o1 = feats["cell_feat"][n2i["m0/O[1]"]]
    # SRAM one-hot set; empty max_capacitance -> 46.08 default
    assert o1[ctype2id["SRAM"]] == 1.0
    assert o1[num_ctypes + 1] == pytest.approx(46.08)
    # pin2trans present for O[1]
    assert o1[num_ctypes + 2] == pytest.approx(0.1)
    assert o1[num_ctypes + 3] == pytest.approx(0.2)
    # O[0] has no report trans -> per-cell minimum fallback (from O[1])
    o0 = feats["cell_feat"][n2i["m0/O[0]"]]
    assert o0[num_ctypes + 2] == pytest.approx(0.1)


def test_icg_feature_special_case():
    """ICG cells get trans=4/delay=0 regardless of report values
    (reference dataset.py:227-229)."""
    icg_cell = {
        "type": "ICG", "load": 1.8, "area": 2.0, "width": 1.2,
        "height": 0.27,
        "pin_info": {
            "CLK": {"capacitance": "1.0", "max_capacitance": "",
                    "direction": "input"},
            "EN": {"capacitance": "0.8", "max_capacitance": "",
                   "direction": "input"},
            "GCLK": {"capacitance": "", "max_capacitance": "20.0",
                     "direction": "output"},
        },
    }
    cim = {"ICGx1_ASAP7_75t_R": icg_cell, "DFFHQNx1": DFF_CELL}
    lib = {
        "ICGx1_ASAP7_75t_R": {"pin_info": {
            "CLK": {"direction": "input"},
            "EN": {"direction": "input"},
            "GCLK": {"direction": "output", "timing_tabs": {"CLK": {}}},
        }},
        "DFFHQNx1": {"pin_info": {
            "D": {"direction": "input"},
            "CLK": {"direction": "input"},
            "QN": {"direction": "output", "timing_tabs": {"CLK": {}}},
        }},
    }
    netlist = """
    module top ( clk, en );
      input clk;
      input en;
      wire gclk;
      wire q0;
      ICGx1_ASAP7_75t_R icg0 ( .CLK(clk), .EN(en), .GCLK(gclk) );
      DFFHQNx1 r0 ( .D(en), .CLK(gclk), .QN(q0) );
    endmodule
    """
    from prtp_tpu.data.netlist import NetlistBuilder
    from prtp_tpu.data.timing_report import TimingPath
    b = NetlistBuilder("top", "critical", cim, lib, map_size=16)
    pins = ["icg0/CLK", "icg0/EN", "icg0/GCLK", "r0/D", "r0/CLK", "r0/QN",
            "clk/clk", "en/en"]
    b.pin_loc_map = {p: (float(i), float(i), i % 16, i % 16)
                     for i, p in enumerate(pins)}
    path = TimingPath(start="r0/CLK", end="r0/D",
                      path=["icg0/GCLK", "r0/CLK"],
                      nets=set(), required_time=5.0, arrival_time=1.0)
    # give the report a trans value that must be IGNORED for ICG
    b.db.pin2trans["icg0/GCLK"] = 0.7
    b.db.pin2delay["icg0/GCLK"] = 0.9
    # r0/CLK -> ... path check needs GCLK->r0/CLK net edge; is_register(ICG)
    # means only clk->GCLK cell edge exists
    result = b.build(netlist, [path])
    edges = set((u, v) for u, v, t in result["edges"] if t == "cell")
    assert ("icg0/CLK", "icg0/GCLK") in edges
    assert ("icg0/EN", "icg0/GCLK") not in edges  # ICG is a register type
    feats = extract_features(result, cim, {"DFFHQN": 0, "ICG": 1})
    n2i = feats["node2id"]
    nc = feats["num_ctypes"]
    gclk = feats["cell_feat"][n2i["icg0/GCLK"]]
    assert gclk[nc + 2] == pytest.approx(4.0)   # trans forced to 4
    assert gclk[nc + 3] == pytest.approx(0.0)   # delay forced to 0
