"""Device-side graph containers and the host->device packer.

TPU-first re-design of the reference's DGL heterograph + python
``topo_levels`` lists (``src/dataset.py:274-287``, ``src/train.py:490``):

The pin DAG alternates strictly between *cell* levels (even: output pins
/ PIs, aggregated over ``cell`` edges) and *net* levels (odd: input
pins, aggregated over ``net`` edges) — see ``src/model.py:180-204``.  We
exploit that static schedule: levels are packed into **pairs**
(cell-level 2k, net-level 2k+1) of padded index tables with one shared
shape per edge type, so the whole propagation is a single
``jax.lax.scan`` with no data-dependent control flow.  Padded node slots
point at a dummy node row ``N``; padded edges point at a dummy segment
slot, so padding never contaminates real state.

Each node belongs to exactly one level (reverse de-dup,
``src/verilog_parser_asap7.py:1492-1511``) and is therefore written
exactly once during the scan — which makes a single full-graph scan per
training step semantically identical to the reference's per-batch level
loop (``src/train.py:490-503``): the batch only selects which endpoints
contribute to the loss.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


def _round_up(x: int, m: int) -> int:
    return ((max(int(x), 1) + m - 1) // m) * m


@struct.dataclass
class LeveledGraph:
    """Padded per-level-pair index tables + node features.

    Shapes (all static): N+1 node rows (row N is the zero dummy),
    P level-pairs, Pn_c/Pe_c cell-side paddings, Pn_n/Pe_n net-side.
    """

    cell_feat: jnp.ndarray  # (N+1, Fc) float
    net_feat: jnp.ndarray   # (N+1, Fn) float
    # cell half of each pair (levels 0, 2, 4, ...):
    cell_nodes: jnp.ndarray     # (P, Pn_c) int32, pad = N
    cell_src: jnp.ndarray       # (P, Pe_c) int32, pad = N
    cell_dst_slot: jnp.ndarray  # (P, Pe_c) int32, pad = Pn_c
    # net half of each pair (levels 1, 3, 5, ...):
    net_nodes: jnp.ndarray      # (P, Pn_n) int32, pad = N
    net_src: jnp.ndarray        # (P, Pe_n) int32, pad = N
    net_dst_slot: jnp.ndarray   # (P, Pe_n) int32, pad = Pn_n

    @property
    def num_nodes(self) -> int:
        return self.cell_feat.shape[0] - 1

    @property
    def num_pairs(self) -> int:
        return self.cell_nodes.shape[0]


@struct.dataclass
class DesignData:
    """One design, fully device-resident."""

    graph: LeveledGraph
    arrival_time: jnp.ndarray    # (N+1,) float
    required_time: jnp.ndarray   # (N+1,) float
    is_critical: jnp.ndarray     # (N+1,) int32
    path_endpoint: jnp.ndarray   # (num_paths,) int32 node id
    path_level: jnp.ndarray      # (num_paths,) float32 topo level of path
    path_masks: jnp.ndarray      # (num_paths, map_size^2) uint8
    cnn_input: jnp.ndarray       # (1, H, W, C) float — NHWC, TPU layout

    @property
    def num_paths(self) -> int:
        return self.path_endpoint.shape[0]


def build_level_tables(levels, edges_by_type, num_nodes, align=128):
    """Build padded per-pair numpy tables from host-side level lists.

    Args:
      levels: list of (node_ids, target_ids, path_ids) numpy int arrays,
        alternating cell (even) / net (odd) levels — the reference's
        ``dgl_topo_levels`` (src/dataset.py:124-129).
      edges_by_type: {'cell': (src, dst), 'net': (src, dst)} numpy int
        arrays of the full edge lists.
      num_nodes: N (dummy row is N).
      align: pad node/edge table widths to this multiple (TPU lanes).

    Returns: dict of numpy arrays matching LeveledGraph's table fields.
    """
    n_levels = len(levels)
    n_pairs = (n_levels + 1) // 2

    # node -> level lookup
    node_level = np.full(num_nodes, -1, dtype=np.int64)
    for li, lvl in enumerate(levels):
        node_level[np.asarray(lvl[0], dtype=np.int64)] = li

    # group in-edges by destination level, per edge type
    def edges_for(parity, etype):
        src, dst = edges_by_type[etype]
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        lev = node_level[dst]
        per_level = {}
        sel_all = (lev >= 0) & (lev % 2 == parity)
        for li in np.unique(lev[sel_all]):
            sel = lev == li
            per_level[int(li)] = (src[sel], dst[sel])
        return per_level

    cell_edges = edges_for(0, "cell")
    net_edges = edges_for(1, "net")

    def half_tables(parity, per_level_edges):
        lvl_ids = list(range(parity, n_levels, 2))
        pn = _round_up(max((len(levels[li][0]) for li in lvl_ids), default=1),
                       align)
        pe = _round_up(max((len(per_level_edges.get(li, ((), ()))[0])
                            for li in lvl_ids), default=1), align)
        nodes = np.full((n_pairs, pn), num_nodes, dtype=np.int32)
        srcs = np.full((n_pairs, pe), num_nodes, dtype=np.int32)
        dsts = np.full((n_pairs, pe), pn, dtype=np.int32)
        for k, li in enumerate(lvl_ids):
            lvl_nodes = np.asarray(levels[li][0], dtype=np.int32)
            nodes[k, : len(lvl_nodes)] = lvl_nodes
            slot_of = {int(n): s for s, n in enumerate(lvl_nodes)}
            e_src, e_dst = per_level_edges.get(li, (np.zeros(0), np.zeros(0)))
            e_src = np.asarray(e_src, dtype=np.int32)
            slot = np.asarray([slot_of[int(d)] for d in e_dst],
                              dtype=np.int32)
            # sort edges by destination slot: contiguous segments enable
            # the fused Pallas streaming reduces and improve scatter
            # locality for the XLA path (padding slots sort last)
            order = np.argsort(slot, kind="stable")
            srcs[k, : len(e_src)] = e_src[order]
            dsts[k, : len(slot)] = slot[order]
        return nodes, srcs, dsts

    cn, cs, cd = half_tables(0, cell_edges)
    nn_, ns, nd = half_tables(1, net_edges)
    return {
        "cell_nodes": cn, "cell_src": cs, "cell_dst_slot": cd,
        "net_nodes": nn_, "net_src": ns, "net_dst_slot": nd,
    }


def _with_dummy_row(feat, dtype=np.float32):
    feat = np.asarray(feat, dtype=dtype)
    return np.concatenate([feat, np.zeros((1,) + feat.shape[1:], dtype=dtype)])


def pack_design(parsed, map_size=128, align=128, compute_dtype=jnp.float32):
    """Pack a host-side parsed design (dict of numpy arrays) into DesignData.

    ``parsed`` keys (see prtp_tpu.data.dataset.ParsedDesign):
      num_nodes, cell_feat (N,Fc), net_feat (N,Fn), levels,
      cell_edges (2,Ec), net_edges (2,En), arrival_time (N,),
      required_time (N,), is_critical (N,), path_endpoint (num_paths,),
      path_level (num_paths,), mask_coo (2, nnz), num_paths,
      cnn_input (C,H,W).
    """
    n = int(parsed["num_nodes"])
    tables = build_level_tables(
        parsed["levels"],
        {"cell": tuple(parsed["cell_edges"]), "net": tuple(parsed["net_edges"])},
        n, align=align,
    )
    graph = LeveledGraph(
        cell_feat=jnp.asarray(_with_dummy_row(parsed["cell_feat"]),
                              dtype=compute_dtype),
        net_feat=jnp.asarray(_with_dummy_row(parsed["net_feat"]),
                             dtype=compute_dtype),
        **{k: jnp.asarray(v) for k, v in tables.items()},
    )
    num_paths = int(parsed["num_paths"])
    masks = np.zeros((num_paths, map_size * map_size), dtype=np.uint8)
    coo = np.asarray(parsed["mask_coo"], dtype=np.int64)
    if coo.size:
        masks[coo[0], coo[1]] = 1
    cnn_input = np.asarray(parsed["cnn_input"], dtype=np.float32)
    cnn_nhwc = np.transpose(cnn_input, (1, 2, 0))[None]  # (1, H, W, C)
    return DesignData(
        graph=graph,
        arrival_time=jnp.asarray(
            _with_dummy_row(parsed["arrival_time"].reshape(-1, 1)).reshape(-1)),
        required_time=jnp.asarray(
            _with_dummy_row(parsed["required_time"].reshape(-1, 1)).reshape(-1)),
        is_critical=jnp.asarray(
            _with_dummy_row(parsed["is_critical"].reshape(-1, 1),
                            dtype=np.int32).reshape(-1)),
        path_endpoint=jnp.asarray(parsed["path_endpoint"], dtype=jnp.int32),
        path_level=jnp.asarray(parsed["path_level"], dtype=jnp.float32),
        path_masks=jnp.asarray(masks),
        cnn_input=jnp.asarray(cnn_nhwc, dtype=compute_dtype),
    )
