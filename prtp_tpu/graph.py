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


def bucket_shape(parsed_list, map_size=128, align=128):
    """Common padded shapes covering every design in the list — used to
    stack multiple designs into one batched DesignData."""
    shapes = dict(num_nodes=0, num_pairs=0, pn_c=1, pe_c=1, pn_n=1, pe_n=1,
                  num_paths=0)
    for parsed in parsed_list:
        n = int(parsed["num_nodes"])
        levels = parsed["levels"]
        n_levels = len(levels)
        shapes["num_nodes"] = max(shapes["num_nodes"], n)
        shapes["num_pairs"] = max(shapes["num_pairs"], (n_levels + 1) // 2)
        shapes["num_paths"] = max(shapes["num_paths"],
                                  int(parsed["num_paths"]))
        node_level = np.full(n, -1, dtype=np.int64)
        for li, lvl in enumerate(levels):
            node_level[np.asarray(lvl[0], dtype=np.int64)] = li
        for parity, etype, pn_key, pe_key in ((0, "cell_edges", "pn_c", "pe_c"),
                                              (1, "net_edges", "pn_n", "pe_n")):
            sizes = [len(levels[li][0])
                     for li in range(parity, n_levels, 2)]
            shapes[pn_key] = max(shapes[pn_key],
                                 _round_up(max(sizes, default=1), align))
            dst = np.asarray(parsed[etype][1], dtype=np.int64)
            lev = node_level[dst]
            counts = [int((lev == li).sum())
                      for li in range(parity, n_levels, 2)]
            shapes[pe_key] = max(shapes[pe_key],
                                 _round_up(max(counts, default=1), align))
    return shapes


def build_level_tables(levels, edges_by_type, num_nodes, align=128,
                       pad_to=None, pad_node=None):
    """Build padded per-pair numpy tables from host-side level lists.

    Args:
      levels: list of (node_ids, target_ids, path_ids) numpy int arrays,
        alternating cell (even) / net (odd) levels — the reference's
        ``dgl_topo_levels`` (src/dataset.py:124-129).
      edges_by_type: {'cell': (src, dst), 'net': (src, dst)} numpy int
        arrays of the full edge lists.
      num_nodes: N (dummy row is N unless ``pad_node`` overrides).
      align: pad node/edge table widths to this multiple (TPU lanes).
      pad_to: optional dict from :func:`bucket_shape` fixing the table
        shapes (multi-design stacking).
      pad_node: dummy node index for padded slots (default num_nodes).

    Returns: dict of numpy arrays matching LeveledGraph's table fields.
    """
    n_levels = len(levels)
    n_pairs = (n_levels + 1) // 2
    if pad_to is not None:
        n_pairs = max(n_pairs, pad_to["num_pairs"])
    if pad_node is None:
        pad_node = num_nodes

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
        if pad_to is not None:
            pn = max(pn, pad_to["pn_c" if parity == 0 else "pn_n"])
            pe = max(pe, pad_to["pe_c" if parity == 0 else "pe_n"])
        nodes = np.full((n_pairs, pn), pad_node, dtype=np.int32)
        srcs = np.full((n_pairs, pe), pad_node, dtype=np.int32)
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


def _pad_rows(feat, n_rows, dtype=np.float32):
    """Pad a (N, ...) array with zero rows up to n_rows."""
    feat = np.asarray(feat, dtype=dtype)
    extra = n_rows - feat.shape[0]
    return np.concatenate(
        [feat, np.zeros((extra,) + feat.shape[1:], dtype=dtype)])


def pack_design(parsed, map_size=128, align=128, compute_dtype=jnp.float32,
                pad_to=None):
    """Pack a host-side parsed design (dict of numpy arrays) into DesignData.

    ``parsed`` keys (see prtp_tpu.data.dataset.ParsedDesign):
      num_nodes, cell_feat (N,Fc), net_feat (N,Fn), levels,
      cell_edges (2,Ec), net_edges (2,En), arrival_time (N,),
      required_time (N,), is_critical (N,), path_endpoint (num_paths,),
      path_level (num_paths,), mask_coo (2, nnz), num_paths,
      cnn_input (C,H,W).

    ``pad_to`` (from :func:`bucket_shape`) pads every dimension to a
    common bucket so multiple designs can be stacked (multi-design
    batching / design-axis data parallelism); the dummy node row then
    sits at ``pad_to['num_nodes']``.
    """
    n = int(parsed["num_nodes"])
    n_pad = n if pad_to is None else max(n, pad_to["num_nodes"])
    tables = build_level_tables(
        parsed["levels"],
        {"cell": tuple(parsed["cell_edges"]), "net": tuple(parsed["net_edges"])},
        n, align=align, pad_to=pad_to, pad_node=n_pad,
    )
    graph = LeveledGraph(
        cell_feat=jnp.asarray(_pad_rows(parsed["cell_feat"], n_pad + 1),
                              dtype=compute_dtype),
        net_feat=jnp.asarray(_pad_rows(parsed["net_feat"], n_pad + 1),
                             dtype=compute_dtype),
        **{k: jnp.asarray(v) for k, v in tables.items()},
    )
    num_paths = int(parsed["num_paths"])
    p_pad = num_paths if pad_to is None else max(num_paths,
                                                 pad_to["num_paths"])
    masks = np.zeros((p_pad, map_size * map_size), dtype=np.uint8)
    coo = np.asarray(parsed["mask_coo"], dtype=np.int64)
    if coo.size:
        masks[coo[0], coo[1]] = 1
    path_endpoint = np.full(p_pad, n_pad, dtype=np.int32)  # pad -> dummy
    path_endpoint[:num_paths] = parsed["path_endpoint"]
    path_level = np.zeros(p_pad, dtype=np.float32)
    path_level[:num_paths] = parsed["path_level"]
    cnn_input = np.asarray(parsed["cnn_input"], dtype=np.float32)
    cnn_nhwc = np.transpose(cnn_input, (1, 2, 0))[None]  # (1, H, W, C)
    return DesignData(
        graph=graph,
        arrival_time=jnp.asarray(_pad_rows(
            parsed["arrival_time"].reshape(-1, 1), n_pad + 1).reshape(-1)),
        required_time=jnp.asarray(_pad_rows(
            parsed["required_time"].reshape(-1, 1), n_pad + 1).reshape(-1)),
        is_critical=jnp.asarray(_pad_rows(
            parsed["is_critical"].reshape(-1, 1), n_pad + 1,
            dtype=np.int32).reshape(-1)),
        path_endpoint=jnp.asarray(path_endpoint),
        path_level=jnp.asarray(path_level),
        path_masks=jnp.asarray(masks),
        cnn_input=jnp.asarray(cnn_nhwc, dtype=compute_dtype),
    )


def stack_designs(designs):
    """Stack same-bucket DesignData pytrees along a new leading axis.

    Every design must have been packed with the same ``pad_to`` bucket
    (and the same CNN raster shape). The result feeds vmapped /
    design-sharded training (prtp_tpu.parallel.multi).
    """
    import jax
    shapes = {jax.tree_util.tree_structure(d) for d in designs}
    assert len(shapes) == 1, "designs must share a treedef"
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *designs)
