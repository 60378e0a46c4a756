"""Device-side graph containers and the host->device packer.

TPU-first re-design of the reference's DGL heterograph + python
``topo_levels`` lists (``src/dataset.py:274-287``, ``src/train.py:490``):

The pin DAG alternates strictly between *cell* levels (even: output pins
/ PIs, aggregated over ``cell`` edges) and *net* levels (odd: input
pins, aggregated over ``net`` edges) — see ``src/model.py:180-204``.  We
exploit that static schedule: levels are packed into **pairs**
(cell-level 2k, net-level 2k+1) of padded index tables with one shared
shape per edge type, so the whole propagation is a single
``jax.lax.scan`` with no data-dependent control flow.

Node-state layout (v2, scatter-free writes): nodes are *renumbered
level-contiguously* — pair k's cell slots occupy state rows
``[k*(Pn_c+Pn_n), k*(Pn_c+Pn_n)+Pn_c)`` and its net slots the following
``Pn_n`` rows. Each level's update is then one
``lax.dynamic_update_slice`` instead of a row scatter (TPU scatters are
the measured bottleneck), per-level features ride the scan as
contiguous blocks (no feature gathers), net in-degree counts are
precomputed (mean needs a single segment-sum), and edges are sorted by
destination slot. Only the message gather ``h[src]`` and the segment
reductions remain irregular.

Each node belongs to exactly one level (reverse de-dup,
``src/verilog_parser_asap7.py:1492-1511``) and is therefore written
exactly once during the scan — which makes a single full-graph scan per
training step semantically identical to the reference's per-batch level
loop (``src/train.py:490-503``): the batch only selects which endpoints
contribute to the loss.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def _round_up(x: int, m: int) -> int:
    return ((max(int(x), 1) + m - 1) // m) * m


@struct.dataclass
class LeveledGraph:
    """Padded per-level-pair tables + per-level feature blocks.

    Shapes (static): P level-pairs; Pn_c/Pe_c cell-side paddings,
    Pn_n/Pe_n net-side. The node-state array has
    ``num_rows + 1 = P*(Pn_c+Pn_n) + 1`` rows (last row = gather dummy
    for padded edge sources).
    """

    # per-level feature blocks (scan xs — no gathers needed)
    cell_feat_lvl: jnp.ndarray  # (P, Pn_c, Fc) float
    net_feat_lvl: jnp.ndarray   # (P, Pn_n, Fn) float
    # cell half of each pair (levels 0, 2, 4, ...):
    cell_src: jnp.ndarray       # (P, Pe_c) int32 state-row ids, pad=num_rows
    cell_dst_slot: jnp.ndarray  # (P, Pe_c) int32 in [0, Pn_c], pad = Pn_c
    # net half of each pair (levels 1, 3, 5, ...):
    net_src: jnp.ndarray        # (P, Pe_n) int32, pad = num_rows
    net_dst_slot: jnp.ndarray   # (P, Pe_n) int32 in [0, Pn_n], pad = Pn_n
    net_cnt: jnp.ndarray        # (P, Pn_n) float in-degree counts (>=1)
    # dense mailbox tables (scatter-free reduce path): per destination
    # slot, its padded list of source state rows (pad = num_rows).
    # Viable because cell in-degree <= the cell's fanin count (~5) and
    # net in-degree is ~1 (one driver per net).
    cell_mail: jnp.ndarray      # (P, Pn_c, md_c) int32, pad = num_rows
    net_mail: jnp.ndarray       # (P, Pn_n, md_n) int32, pad = num_rows
    # transpose tables for the mailbox-gather backward (sorted by src):
    cell_rev_pos: jnp.ndarray   # (P, Pe_c) int32 flat (Pn_c*md_c) positions
    cell_rev_rows: jnp.ndarray  # (P, Pe_c) int32 src rows asc, pad=num_rows
    net_rev_pos: jnp.ndarray    # (P, Pe_n) int32
    net_rev_rows: jnp.ndarray   # (P, Pe_n) int32

    @property
    def num_pairs(self) -> int:
        return self.cell_feat_lvl.shape[0]

    @property
    def pn_c(self) -> int:
        return self.cell_feat_lvl.shape[1]

    @property
    def pn_n(self) -> int:
        return self.net_feat_lvl.shape[1]

    @property
    def num_rows(self) -> int:
        return self.num_pairs * (self.pn_c + self.pn_n)


@struct.dataclass
class DesignData:
    """One design, fully device-resident. Node-indexed arrays use the
    level-contiguous state-row numbering of :class:`LeveledGraph`."""

    graph: LeveledGraph
    arrival_time: jnp.ndarray    # (num_rows+1,) float
    required_time: jnp.ndarray   # (num_rows+1,) float
    is_critical: jnp.ndarray     # (num_rows+1,) int32
    path_endpoint: jnp.ndarray   # (num_paths,) int32 state row of endpoint
    path_level: jnp.ndarray      # (num_paths,) float32 topo level of path
    path_masks: jnp.ndarray      # (num_paths, map_size^2) uint8
    cnn_input: jnp.ndarray       # (1, H, W, C) float — NHWC, TPU layout
    # (K, H*W, 9*9*C) im2col patches of cnn_input, or None. The layout
    # raster is STATIC per design, so the first LayoutNet conv is a
    # LINEAR map of its kernel: fwd = patches @ kernel.reshape(-1, 32)
    # and wgrad = patches^T @ grad — two MXU matmuls instead of the
    # tiny-channel conv HLOs that profiled at 1.8-8 TFLOP/s (2.2 ms of
    # a 15 ms step). Computed once on device at pack time.
    cnn_patches: jnp.ndarray | None = None

    @property
    def num_paths(self) -> int:
        return self.path_endpoint.shape[0]


def make_cnn_patches(x_nhwc, k: int = 9, dtype=jnp.float32):
    """Device-side im2col for a SAME-padded k x k / stride-1 conv.

    (K, H, W, C) -> (K, H*W, k*k*C) in ``dtype``, patch index ordered
    (ky, kx, ci) to match an HWIO kernel's ``reshape(k*k*C, feat)``.
    Runs once at pack time (jitted); the result is design-constant
    across train steps. Stored in the run's compute dtype: bf16 under
    ``--compute_dtype bfloat16`` (no per-step f32->bf16 convert of the
    170 MB table — 0.77 ms/step when stored f32), f32 otherwise so the
    default path bit-matches the exact f32 conv (round-3 advisor
    finding: an unconditional bf16 table rounded the conv INPUT ~0.4%
    even in full-f32 runs).
    """
    return _cnn_patches_impl(x_nhwc, k, jnp.dtype(dtype).name)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _cnn_patches_impl(x, k, dtype_name):
    # module-level jit: one compile per (shape, k, dtype), shared across
    # all designs packed in the process (a per-call closure would
    # re-trace the identical program once per design)
    n, h, w, c = x.shape
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(k) for dx in range(k)]
    pat = jnp.stack(cols, axis=3)           # (K, H, W, k*k, C)
    return pat.reshape(n, h * w, k * k * c).astype(dtype_name)


def bucket_shape(parsed_list, map_size=128, align=128):
    """Common padded shapes covering every design in the list — used to
    stack multiple designs into one batched DesignData."""
    shapes = dict(num_pairs=0, pn_c=1, pe_c=1, pn_n=1, pe_n=1, num_paths=0,
                  md_c=1, md_n=1)
    for parsed in parsed_list:
        n = int(parsed["num_nodes"])
        levels = parsed["levels"]
        n_levels = len(levels)
        shapes["num_pairs"] = max(shapes["num_pairs"], (n_levels + 1) // 2)
        shapes["num_paths"] = max(shapes["num_paths"],
                                  int(parsed["num_paths"]))
        node_level = np.full(n, -1, dtype=np.int64)
        for li, lvl in enumerate(levels):
            node_level[np.asarray(lvl[0], dtype=np.int64)] = li
        for parity, etype, pn_key, pe_key, md_key in (
                (0, "cell_edges", "pn_c", "pe_c", "md_c"),
                (1, "net_edges", "pn_n", "pe_n", "md_n")):
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
            if len(dst):
                _, deg = np.unique(dst, return_counts=True)
                shapes[md_key] = max(shapes[md_key], int(deg.max()))
    return shapes


def _level_layout(levels, num_nodes, align, pad_to):
    """Compute padded table shapes + the old-id -> state-row permutation."""
    n_levels = len(levels)
    n_pairs = (n_levels + 1) // 2
    pn = {}
    for parity, key in ((0, "pn_c"), (1, "pn_n")):
        sizes = [len(levels[li][0]) for li in range(parity, n_levels, 2)]
        pn[key] = _round_up(max(sizes, default=1), align)
    if pad_to is not None:
        n_pairs = max(n_pairs, pad_to["num_pairs"])
        pn["pn_c"] = max(pn["pn_c"], pad_to["pn_c"])
        pn["pn_n"] = max(pn["pn_n"], pad_to["pn_n"])
    stride = pn["pn_c"] + pn["pn_n"]
    num_rows = n_pairs * stride
    node_row = np.full(num_nodes, num_rows, dtype=np.int64)
    node_level = np.full(num_nodes, -1, dtype=np.int64)
    for li, lvl in enumerate(levels):
        ids = np.asarray(lvl[0], dtype=np.int64)
        pair, parity = divmod(li, 2)
        base = pair * stride + (0 if parity == 0 else pn["pn_c"])
        node_row[ids] = base + np.arange(len(ids))
        node_level[ids] = li
    return n_pairs, pn["pn_c"], pn["pn_n"], stride, num_rows, \
        node_row, node_level


def _sorted_level_tables(e_src, slot, pn, md, num_rows):
    """dst-sorted edge tables for ONE level — the shared kernel of all
    three packers (padded scan / grouped scan / exact unroll).

    Sorts the level's edges by destination slot, fills the dense
    mailbox (``pos`` = index within each destination's segment), and
    builds the transpose tables the mailbox backward consumes (flat
    mailbox positions + source rows, sorted by source row ascending).

    Returns ``(e_src, slot, mail, rev_pos, rev_rows)``: e_src/slot
    int32 sorted by slot; mail (pn, md) int32 with ``num_rows`` as the
    gather dummy; rev_pos/rev_rows (E,) int32.
    """
    order = np.argsort(slot, kind="stable")
    e_src = np.asarray(e_src)[order].astype(np.int32)
    slot = np.asarray(slot)[order].astype(np.int32)
    mail = np.full((pn, md), num_rows, np.int32)
    pos = np.arange(len(slot)) - np.searchsorted(slot, slot)
    mail[slot, pos] = e_src
    flat = (slot.astype(np.int64) * md + pos).astype(np.int32)
    order2 = np.argsort(e_src, kind="stable")
    return e_src, slot, mail, flat[order2], e_src[order2]


def pack_leveled_graph(parsed, align=128, pad_to=None,
                       compute_dtype=jnp.float32):
    """Build the LeveledGraph (+ node_row permutation) from a parsed
    design dict. Returns (graph, node_row, num_rows)."""
    levels = parsed["levels"]
    n = int(parsed["num_nodes"])
    (n_pairs, pn_c, pn_n, stride, num_rows,
     node_row, node_level) = _level_layout(levels, n, align, pad_to)

    fc = parsed["cell_feat"].shape[1]
    fn = parsed["net_feat"].shape[1]
    cell_feat_lvl = np.zeros((n_pairs, pn_c, fc), np.float32)
    net_feat_lvl = np.zeros((n_pairs, pn_n, fn), np.float32)
    for li, lvl in enumerate(levels):
        ids = np.asarray(lvl[0], dtype=np.int64)
        pair, parity = divmod(li, 2)
        if parity == 0:
            cell_feat_lvl[pair, : len(ids)] = parsed["cell_feat"][ids]
        else:
            net_feat_lvl[pair, : len(ids)] = parsed["net_feat"][ids]

    def edge_tables(parity, edges, pn, pe_key, md_key):
        src, dst = (np.asarray(edges[0], np.int64),
                    np.asarray(edges[1], np.int64))
        lev = node_level[dst]
        pe = 1
        md = 4
        groups = {}
        for li in range(parity, len(levels), 2):
            sel = lev == li
            cnt = int(sel.sum())
            pe = max(pe, cnt)
            groups[li] = sel
        md = 1
        if len(dst):
            _, deg = np.unique(dst, return_counts=True)
            md = max(md, int(deg.max()))
        pe = _round_up(pe, align)
        if pad_to is not None:
            pe = max(pe, pad_to[pe_key])
            md = max(md, pad_to[md_key])
        srcs = np.full((n_pairs, pe), num_rows, dtype=np.int32)
        dsts = np.full((n_pairs, pe), pn, dtype=np.int32)
        mail = np.full((n_pairs, pn, md), num_rows, dtype=np.int32)
        rev_pos = np.zeros((n_pairs, pe), dtype=np.int32)
        rev_rows = np.full((n_pairs, pe), num_rows, dtype=np.int32)
        for li, sel in groups.items():
            pair = li // 2
            base = (pair * stride + (0 if parity == 0 else pn_c))
            e_src, slot, mail_k, rp, rr = _sorted_level_tables(
                node_row[src[sel]], node_row[dst[sel]] - base,
                pn, md, num_rows)
            srcs[pair, : len(e_src)] = e_src
            dsts[pair, : len(slot)] = slot
            mail[pair] = mail_k
            rev_pos[pair, : len(rp)] = rp
            rev_rows[pair, : len(rr)] = rr
        return srcs, dsts, mail, rev_pos, rev_rows

    (cell_src, cell_dst, cell_mail,
     cell_rev_pos, cell_rev_rows) = edge_tables(
        0, parsed["cell_edges"], pn_c, "pe_c", "md_c")
    (net_src, net_dst, net_mail,
     net_rev_pos, net_rev_rows) = edge_tables(
        1, parsed["net_edges"], pn_n, "pe_n", "md_n")

    # precomputed net in-degree counts per slot (>=1 to avoid div0)
    net_cnt = np.zeros((n_pairs, pn_n + 1), np.float32)
    for pair in range(n_pairs):
        np.add.at(net_cnt[pair], net_dst[pair], 1.0)
    net_cnt = np.maximum(net_cnt[:, :pn_n], 1.0)

    graph = LeveledGraph(
        cell_feat_lvl=jnp.asarray(cell_feat_lvl, dtype=compute_dtype),
        net_feat_lvl=jnp.asarray(net_feat_lvl, dtype=compute_dtype),
        cell_src=jnp.asarray(cell_src),
        cell_dst_slot=jnp.asarray(cell_dst),
        net_src=jnp.asarray(net_src),
        net_dst_slot=jnp.asarray(net_dst),
        net_cnt=jnp.asarray(net_cnt),
        cell_mail=jnp.asarray(cell_mail),
        net_mail=jnp.asarray(net_mail),
        cell_rev_pos=jnp.asarray(cell_rev_pos),
        cell_rev_rows=jnp.asarray(cell_rev_rows),
        net_rev_pos=jnp.asarray(net_rev_pos),
        net_rev_rows=jnp.asarray(net_rev_rows),
    )
    return graph, node_row, num_rows


@struct.dataclass
class LeveledGraphGrouped:
    """Grouped-scan packing: level pairs partitioned into contiguous
    GROUPS, each padded to its own group maxima and run as one
    ``lax.scan`` — the middle ground between the single padded scan
    (1 compiled body, up to ~5x padded compute on front-loaded real
    netlists) and the exact unroll (zero padding, one compiled region
    set per level — a 300k-node/26-level program whose multi-minute XLA
    compile this container's TPU tunnel repeatedly kills). With G~4
    groups chosen by :func:`choose_pair_groups` the padded compute
    overhead is typically <1.4x while compile cost stays at G scan
    bodies (seconds).

    Row layout is level-contiguous like the other containers, but the
    stride varies per group; absolute per-pair row offsets ride the
    scans as data. Padded index tables use ``num_rows`` as the gather
    dummy (global, NOT the per-group row count).
    """

    groups: tuple          # of LeveledGraph (per-group padded tables)
    group_pair_idx: tuple  # of (Pg,) int32 GLOBAL pair indices
    group_cell_off: tuple  # of (Pg,) int32 absolute cell-block row offsets
    group_net_off: tuple   # of (Pg,) int32 absolute net-block row offsets
    num_rows_static: int = struct.field(pytree_node=False, default=0)

    @property
    def num_pairs(self) -> int:
        return sum(g.num_pairs for g in self.groups)

    @property
    def num_rows(self) -> int:
        return self.num_rows_static


def choose_pair_groups(cell_sizes, net_sizes, num_groups):
    """Contiguous partition of level pairs into <= ``num_groups`` groups
    minimizing the padded compute sum_g P_g * (max_cell_g + max_net_g)
    (exact DP — P is tens of pairs, cost is negligible)."""
    p = len(cell_sizes)
    assert p >= 1
    num_groups = max(1, min(int(num_groups), p))
    cost = {}

    def seg_cost(i, j):  # pairs [i, j)
        if (i, j) not in cost:
            cost[(i, j)] = (j - i) * (max(cell_sizes[i:j])
                                      + max(net_sizes[i:j]))
        return cost[(i, j)]

    inf = float("inf")
    dp = [[inf] * (p + 1) for _ in range(num_groups + 1)]
    back = [[0] * (p + 1) for _ in range(num_groups + 1)]
    dp[0][0] = 0.0
    for k in range(1, num_groups + 1):
        for j in range(1, p + 1):
            for i in range(k - 1, j):
                if dp[k - 1][i] is inf:
                    continue
                c = dp[k - 1][i] + seg_cost(i, j)
                if c < dp[k][j]:
                    dp[k][j], back[k][j] = c, i
    k_best = min(range(1, num_groups + 1), key=lambda k: (dp[k][p], k))
    bounds, j, k = [], p, k_best
    while k:
        i = back[k][j]
        bounds.append((i, j))
        j, k = i, k - 1
    return list(reversed(bounds))


def auto_scan_groups(cell_sizes, net_sizes, max_groups=8, overhead=1.15,
                     align=1):
    """Smallest group count whose padded compute is within ``overhead``
    of the best any aligned grouping can achieve — `--scan_groups 0`
    resolves through this, so users get near-exact compute with a
    handful of compiled scan bodies without hand-tuning G. Level sizes
    are rounded up to ``align`` first (the packers pad group maxima to
    the alignment, so sub-align differences cannot be recovered by
    splitting — without this a front-loaded but sub-align profile would
    pay G compiled bodies for zero compute saving). Uniform profiles
    return 1 (the single scan already fits)."""
    cell_sizes = [_round_up(c, align) for c in cell_sizes]
    net_sizes = [_round_up(n, align) for n in net_sizes]
    p = len(cell_sizes)
    # the best achievable with aligned per-group padding: every pair in
    # its own group
    ideal = float(sum(cell_sizes) + sum(net_sizes))
    if ideal <= 0 or p <= 1:
        return 1
    for g in range(1, min(max_groups, p) + 1):
        bounds = choose_pair_groups(cell_sizes, net_sizes, g)
        cost = sum((j - i) * (max(cell_sizes[i:j]) + max(net_sizes[i:j]))
                   for i, j in bounds)
        if cost <= overhead * ideal:
            return g
    return min(max_groups, p)


def pack_leveled_graph_grouped(parsed, num_groups=4, align=128,
                               compute_dtype=jnp.float32):
    """Grouped-scan packer. Returns (graph, node_row, num_rows)."""
    levels = parsed["levels"]
    n = int(parsed["num_nodes"])
    n_levels = len(levels)
    n_pairs = (n_levels + 1) // 2

    def lvl_ids(li):
        return (np.asarray(levels[li][0], dtype=np.int64)
                if li < n_levels else np.zeros(0, np.int64))

    cell_sizes = [len(lvl_ids(2 * k)) for k in range(n_pairs)]
    net_sizes = [len(lvl_ids(2 * k + 1)) for k in range(n_pairs)]
    # partition on ALIGN-ROUNDED sizes — the group maxima are rounded up
    # to `align` below, so this is the true padded cost, and it makes
    # the partition identical to the one auto_scan_groups validated its
    # <=overhead bound on (same rounding, same DP)
    bounds = choose_pair_groups([_round_up(c, align) for c in cell_sizes],
                                [_round_up(s, align) for s in net_sizes],
                                num_groups)

    # per-group padded dims + global row layout
    g_pn = []
    for k0, k1 in bounds:
        g_pn.append((_round_up(max(cell_sizes[k0:k1]), align),
                     _round_up(max(net_sizes[k0:k1]), align)))
    cell_off = np.zeros(n_pairs, np.int64)
    net_off = np.zeros(n_pairs, np.int64)
    base = 0
    for (k0, k1), (pn_c, pn_n) in zip(bounds, g_pn):
        for k in range(k0, k1):
            cell_off[k] = base
            net_off[k] = base + pn_c
            base += pn_c + pn_n
    num_rows = int(base)

    node_row = np.full(n, num_rows, dtype=np.int64)
    node_level = np.full(n, -1, dtype=np.int64)
    for li in range(min(2 * n_pairs, n_levels)):
        ids = lvl_ids(li)
        k = li // 2
        off = cell_off[k] if li % 2 == 0 else net_off[k]
        node_row[ids] = off + np.arange(len(ids))
        node_level[ids] = li

    fc = parsed["cell_feat"].shape[1]
    fn = parsed["net_feat"].shape[1]
    src_c, dst_c = (np.asarray(parsed["cell_edges"][0], np.int64),
                    np.asarray(parsed["cell_edges"][1], np.int64))
    src_n, dst_n = (np.asarray(parsed["net_edges"][0], np.int64),
                    np.asarray(parsed["net_edges"][1], np.int64))
    lev_c, lev_n = node_level[dst_c], node_level[dst_n]

    groups, g_pair_idx, g_cell_off, g_net_off = [], [], [], []
    for (k0, k1), (pn_c, pn_n) in zip(bounds, g_pn):
        pg = k1 - k0
        cf = np.zeros((pg, pn_c, fc), np.float32)
        nf = np.zeros((pg, pn_n, fn), np.float32)
        for k in range(k0, k1):
            ids_c, ids_n = lvl_ids(2 * k), lvl_ids(2 * k + 1)
            cf[k - k0, : len(ids_c)] = parsed["cell_feat"][ids_c]
            nf[k - k0, : len(ids_n)] = parsed["net_feat"][ids_n]

        def edge_tables(parity, src, dst, lev, pn, offs):
            pe = 1
            sel_by_pair = {}
            for k in range(k0, k1):
                sel = lev == (2 * k + parity)
                sel_by_pair[k] = sel
                pe = max(pe, int(sel.sum()))
            pe = _round_up(pe, align)
            md = 1
            for k, sel in sel_by_pair.items():
                if sel.any():
                    _, deg = np.unique(dst[sel], return_counts=True)
                    md = max(md, int(deg.max()))
            srcs = np.full((pg, pe), num_rows, np.int32)
            dsts = np.full((pg, pe), pn, np.int32)
            mail = np.full((pg, pn, md), num_rows, np.int32)
            rev_pos = np.zeros((pg, pe), np.int32)
            rev_rows = np.full((pg, pe), num_rows, np.int32)
            for k, sel in sel_by_pair.items():
                e_src, slot, mail_k, rp, rr = _sorted_level_tables(
                    node_row[src[sel]], node_row[dst[sel]] - offs[k],
                    pn, md, num_rows)
                i = k - k0
                srcs[i, : len(e_src)] = e_src
                dsts[i, : len(slot)] = slot
                mail[i] = mail_k
                rev_pos[i, : len(rp)] = rp
                rev_rows[i, : len(rr)] = rr
            return srcs, dsts, mail, rev_pos, rev_rows

        (c_src, c_dst, c_mail, c_rpos, c_rrows) = edge_tables(
            0, src_c, dst_c, lev_c, pn_c, cell_off)
        (n_src, n_dst, n_mail, n_rpos, n_rrows) = edge_tables(
            1, src_n, dst_n, lev_n, pn_n, net_off)
        net_cnt = np.zeros((pg, pn_n + 1), np.float32)
        for i in range(pg):
            np.add.at(net_cnt[i], n_dst[i], 1.0)
        net_cnt = np.maximum(net_cnt[:, :pn_n], 1.0)

        groups.append(LeveledGraph(
            cell_feat_lvl=jnp.asarray(cf, dtype=compute_dtype),
            net_feat_lvl=jnp.asarray(nf, dtype=compute_dtype),
            cell_src=jnp.asarray(c_src),
            cell_dst_slot=jnp.asarray(c_dst),
            net_src=jnp.asarray(n_src),
            net_dst_slot=jnp.asarray(n_dst),
            net_cnt=jnp.asarray(net_cnt),
            cell_mail=jnp.asarray(c_mail),
            net_mail=jnp.asarray(n_mail),
            cell_rev_pos=jnp.asarray(c_rpos),
            cell_rev_rows=jnp.asarray(c_rrows),
            net_rev_pos=jnp.asarray(n_rpos),
            net_rev_rows=jnp.asarray(n_rrows),
        ))
        g_pair_idx.append(jnp.arange(k0, k1, dtype=jnp.int32))
        g_cell_off.append(jnp.asarray(cell_off[k0:k1], jnp.int32))
        g_net_off.append(jnp.asarray(net_off[k0:k1], jnp.int32))

    graph = LeveledGraphGrouped(
        groups=tuple(groups),
        group_pair_idx=tuple(g_pair_idx),
        group_cell_off=tuple(g_cell_off),
        group_net_off=tuple(g_net_off),
        num_rows_static=num_rows,
    )
    return graph, node_row, num_rows


@struct.dataclass
class LeveledGraphExact:
    """Exact-shape variant: per-pair tables as tuples of arrays with the
    TRUE level sizes (no shared padding) — the GNN unrolls a python loop
    over pairs, so XLA specializes every level and no compute is spent
    on padding. Strictly better than the padded scan when level sizes
    vary widely (real netlists: huge early levels, thin tails); costs
    one compiled region set per level instead of one shared body.

    Row layout matches LeveledGraph (level-contiguous, exact strides).
    """

    cell_feat_lvl: tuple  # P x (n_c_k, Fc)
    net_feat_lvl: tuple   # P x (n_n_k, Fn)
    cell_mail: tuple      # P x (n_c_k, md_c_k) int32, pad = num_rows
    net_mail: tuple       # P x (n_n_k, md_n_k) int32
    cell_rev_pos: tuple   # P x (e_c_k,) int32
    cell_rev_rows: tuple  # P x (e_c_k,) int32 sorted asc
    net_rev_pos: tuple    # P x (e_n_k,)
    net_rev_rows: tuple   # P x (e_n_k,)
    # fused-VJP tables (ops.fused_gnn): per pair, the PRIOR-row
    # contributions of BOTH halves merged into one sorted unique-row
    # scatter, plus the net edges whose source is inside the pair's own
    # cell block (they feed the cell half's backward, not the carry).
    merged_pos: tuple = ()   # P x (E_k,) int32 flat pos into [cell|net] cat
    merged_seg: tuple = ()   # P x (E_k,) int32 segment id into unique rows
    merged_rows: tuple = ()  # P x (U_k,) int32 unique prior rows, sorted
    intra_pos: tuple = ()    # P x (I_k,) int32 flat pos into net mailbox
    intra_slot: tuple = ()   # P x (I_k,) int32 local cell-block slot
    # merged-forward tables (ops.fused_gnn): ONE global gather per pair
    # serves both halves — gather_rows = [cell_mail.flat | net prior-row
    # sources]; the net mailbox is then assembled by a LOCAL gather into
    # buf = [new_cell (pn_c) | gathered prior (n_prior) | zero dummy]
    # via net_local_idx. Intra-pair net sources (driver written by this
    # pair's own cell half — the common case in real netlists) never
    # touch HBM again.
    gather_rows: tuple = ()    # P x (pn_c*md_c + n_prior,) int32
    net_local_idx: tuple = ()  # P x (pn_n, md_n) int32 into buf
    cell_off: tuple = struct.field(pytree_node=False, default=())
    net_off: tuple = struct.field(pytree_node=False, default=())
    num_rows_static: int = struct.field(pytree_node=False, default=0)

    @property
    def num_pairs(self) -> int:
        return len(self.cell_feat_lvl)

    @property
    def num_rows(self) -> int:
        return self.num_rows_static


def pack_leveled_graph_exact(parsed, compute_dtype=jnp.float32):
    """Exact-shape packer: level-contiguous rows with TRUE level sizes."""
    levels = parsed["levels"]
    n = int(parsed["num_nodes"])
    n_levels = len(levels)
    n_pairs = (n_levels + 1) // 2

    # exact row layout
    node_row = np.full(n, -1, dtype=np.int64)
    node_level = np.full(n, -1, dtype=np.int64)
    cell_off, net_off = [], []
    off = 0
    sizes = []
    for li in range(2 * n_pairs):
        ids = (np.asarray(levels[li][0], dtype=np.int64)
               if li < n_levels else np.zeros(0, np.int64))
        if li % 2 == 0:
            cell_off.append(off)
        else:
            net_off.append(off)
        node_row[ids] = off + np.arange(len(ids))
        node_level[ids] = li
        sizes.append(max(len(ids), 1))
        off += max(len(ids), 1)
    num_rows = off

    fc = parsed["cell_feat"].shape[1]
    fn = parsed["net_feat"].shape[1]
    cell_feat_l, net_feat_l = [], []
    for li in range(2 * n_pairs):
        ids = (np.asarray(levels[li][0], dtype=np.int64)
               if li < n_levels else np.zeros(0, np.int64))
        feat_key = "cell_feat" if li % 2 == 0 else "net_feat"
        width = fc if li % 2 == 0 else fn
        block = np.zeros((max(len(ids), 1), width), np.float32)
        if len(ids):
            block[: len(ids)] = parsed[feat_key][ids]
        (cell_feat_l if li % 2 == 0 else net_feat_l).append(block)

    def per_level_tables(parity, edges):
        src, dst = (np.asarray(edges[0], np.int64),
                    np.asarray(edges[1], np.int64))
        lev = node_level[dst]
        mails, rposs, rrows = [], [], []
        offsets = cell_off if parity == 0 else net_off
        blocks = cell_feat_l if parity == 0 else net_feat_l
        for k in range(n_pairs):
            li = 2 * k + parity
            sel = lev == li
            slot0 = node_row[dst[sel]] - offsets[k]
            pn = blocks[k].shape[0]
            md = max(1, int(np.bincount(slot0).max())) if len(slot0) else 1
            _src, _slot, mail, rp, rr = _sorted_level_tables(
                node_row[src[sel]], slot0, pn, md, num_rows)
            mails.append(mail)
            rposs.append(rp)
            rrows.append(rr)
        return mails, rposs, rrows

    cm, crp, crr = per_level_tables(0, parsed["cell_edges"])
    nm, nrp, nrr = per_level_tables(1, parsed["net_edges"])

    # fused-VJP backward tables (ops.fused_gnn): per pair, merge the
    # prior-row cotangent contributions of the cell AND net halves into
    # one sorted unique-row scatter; net edges sourced inside the pair's
    # own cell block are kept separate (they feed the cell half's
    # backward chain).
    m_pos, m_seg, m_rows, i_pos, i_slot = [], [], [], [], []
    g_rows, n_local = [], []
    for k in range(n_pairs):
        pn_c, md_c = cm[k].shape
        flat_c, src_c = crp[k].astype(np.int64), crr[k].astype(np.int64)
        flat_n, src_n = nrp[k].astype(np.int64), nrr[k].astype(np.int64)
        c0 = cell_off[k]
        assert (src_c < c0).all(), "cell-edge source inside/after its level"
        assert (src_n < net_off[k]).all(), "net-edge source at/after its level"
        prior = src_n < c0
        intra = ~prior
        cat_pos = np.concatenate([flat_c, pn_c * md_c + flat_n[prior]])
        rows = np.concatenate([src_c, src_n[prior]])
        order = np.argsort(rows, kind="stable")
        cat_pos, rows = cat_pos[order], rows[order]
        uniq, seg = np.unique(rows, return_inverse=True)
        m_pos.append(cat_pos.astype(np.int32))
        m_seg.append(seg.astype(np.int32))
        m_rows.append(uniq.astype(np.int32))
        fi, si = flat_n[intra], (src_n[intra] - c0)
        o2 = np.argsort(si, kind="stable")
        i_pos.append(fi[o2].astype(np.int32))
        i_slot.append(si[o2].astype(np.int32))
        # merged-forward tables: one global gather for both halves
        flat_nm = nm[k].reshape(-1).astype(np.int64)
        validm = flat_nm != num_rows
        prior_m = validm & (flat_nm < c0)
        intra_m = validm & ~(flat_nm < c0)
        n_prior = int(prior_m.sum())
        local = np.full(flat_nm.shape, pn_c + n_prior, np.int64)  # dummy
        local[intra_m] = flat_nm[intra_m] - c0
        local[prior_m] = pn_c + np.arange(n_prior)
        g_rows.append(np.concatenate(
            [cm[k].reshape(-1).astype(np.int32),
             flat_nm[prior_m].astype(np.int32)]))
        n_local.append(local.reshape(nm[k].shape).astype(np.int32))

    graph = LeveledGraphExact(
        merged_pos=tuple(jnp.asarray(a) for a in m_pos),
        merged_seg=tuple(jnp.asarray(a) for a in m_seg),
        merged_rows=tuple(jnp.asarray(a) for a in m_rows),
        intra_pos=tuple(jnp.asarray(a) for a in i_pos),
        intra_slot=tuple(jnp.asarray(a) for a in i_slot),
        gather_rows=tuple(jnp.asarray(a) for a in g_rows),
        net_local_idx=tuple(jnp.asarray(a) for a in n_local),
        cell_feat_lvl=tuple(jnp.asarray(b, dtype=compute_dtype)
                            for b in cell_feat_l),
        net_feat_lvl=tuple(jnp.asarray(b, dtype=compute_dtype)
                           for b in net_feat_l),
        cell_mail=tuple(jnp.asarray(m) for m in cm),
        net_mail=tuple(jnp.asarray(m) for m in nm),
        cell_rev_pos=tuple(jnp.asarray(r) for r in crp),
        cell_rev_rows=tuple(jnp.asarray(r) for r in crr),
        net_rev_pos=tuple(jnp.asarray(r) for r in nrp),
        net_rev_rows=tuple(jnp.asarray(r) for r in nrr),
        cell_off=tuple(cell_off),
        net_off=tuple(net_off),
        num_rows_static=num_rows,
    )
    return graph, node_row, num_rows


def pack_design(parsed, map_size=128, align=128, compute_dtype=jnp.float32,
                pad_to=None, exact_levels=False, cnn_patches=True,
                scan_groups=1):
    """Pack a host-side parsed design (dict of numpy arrays) into DesignData.

    ``parsed`` keys (see prtp_tpu.data.dataset.ParsedDesign):
      num_nodes, cell_feat (N,Fc), net_feat (N,Fn), levels,
      cell_edges (2,Ec), net_edges (2,En), arrival_time (N,),
      required_time (N,), is_critical (N,), path_endpoint (num_paths,),
      path_level (num_paths,), mask_coo (2, nnz), num_paths,
      cnn_input (C,H,W).

    ``pad_to`` (from :func:`bucket_shape`) pads every dimension to a
    common bucket so multiple designs can be stacked (multi-design
    batching / design-axis data parallelism).
    """
    assert not parsed.get("shapes_only"), \
        ("pack_design got a load_design_shapes() dict — those carry "
         "None placeholders and serve bucket_shape only; load the full "
         "design with load_design_npz/load_single_design")
    if scan_groups == 0 and not exact_levels:
        # --scan_groups 0 = auto: smallest G within 15% of exact compute
        levels = parsed["levels"]
        n_pairs = (len(levels) + 1) // 2
        cs = [len(levels[2 * k][0]) for k in range(n_pairs)]
        ns = [len(levels[2 * k + 1][0]) if 2 * k + 1 < len(levels) else 0
              for k in range(n_pairs)]
        scan_groups = auto_scan_groups(cs, ns, align=align)
    if exact_levels:
        assert pad_to is None, \
            "exact_levels has true per-level shapes; bucketing unsupported"
        graph, node_row, num_rows = pack_leveled_graph_exact(
            parsed, compute_dtype=compute_dtype)
    elif scan_groups and scan_groups > 1:
        assert pad_to is None, \
            "grouped scan has per-group shapes; bucketing unsupported"
        graph, node_row, num_rows = pack_leveled_graph_grouped(
            parsed, num_groups=scan_groups, align=align,
            compute_dtype=compute_dtype)
    else:
        graph, node_row, num_rows = pack_leveled_graph(
            parsed, align=align, pad_to=pad_to, compute_dtype=compute_dtype)

    def remap(key, dtype=np.float32):
        vals = np.asarray(parsed[key], dtype=dtype).reshape(-1)
        out = np.zeros(num_rows + 1, dtype=dtype)
        valid = node_row < num_rows
        out[node_row[valid]] = vals[: len(node_row)][valid]
        return out

    num_paths = int(parsed["num_paths"])
    p_pad = num_paths if pad_to is None else max(num_paths,
                                                 pad_to["num_paths"])
    masks = np.zeros((p_pad, map_size * map_size), dtype=np.uint8)
    coo = np.asarray(parsed["mask_coo"], dtype=np.int64)
    if coo.size:
        masks[coo[0], coo[1]] = 1
    path_endpoint = np.full(p_pad, num_rows, dtype=np.int32)  # pad -> dummy
    path_endpoint[:num_paths] = node_row[
        np.asarray(parsed["path_endpoint"], np.int64)]
    path_level = np.zeros(p_pad, dtype=np.float32)
    path_level[:num_paths] = parsed["path_level"]
    cnn_input = np.asarray(parsed["cnn_input"], dtype=np.float32)
    if cnn_input.ndim == 3:  # (C, H, W) single design
        cnn_nhwc = np.transpose(cnn_input, (1, 2, 0))[None]  # (1, H, W, C)
    else:  # (K, C, H, W) merged super-graph (merge_parsed_designs)
        cnn_nhwc = np.transpose(cnn_input, (0, 2, 3, 1))
    cnn_dev = jnp.asarray(cnn_nhwc, dtype=compute_dtype)
    return DesignData(
        graph=graph,
        arrival_time=jnp.asarray(remap("arrival_time")),
        required_time=jnp.asarray(remap("required_time")),
        is_critical=jnp.asarray(remap("is_critical", np.int32)),
        path_endpoint=jnp.asarray(path_endpoint),
        path_level=jnp.asarray(path_level),
        path_masks=jnp.asarray(masks),
        cnn_input=cnn_dev,
        # pass cnn_patches=False for the UNet branch / --no_cnn (unused
        # there; the table costs H*W*81*C floats of HBM per raster)
        cnn_patches=(make_cnn_patches(cnn_dev, dtype=compute_dtype)
                     if cnn_patches else None),
    )


def merge_parsed_designs(parsed_list):
    """Concatenate K parsed designs into ONE super-graph parsed dict.

    TPU-first multi-design batching: instead of vmapping the step over a
    stacked design axis (which lowers the per-level
    ``dynamic_update_slice`` writes to scatters — measured slower than
    single-design on v5e), the designs are merged host-side into a
    single disjoint DAG whose level ℓ is the union of every design's
    level ℓ. One shared level scan then propagates all designs at once:
    the dense MLPs see K× wider level blocks (better MXU utilization)
    and the contiguous-row writes are preserved.

    CNN inputs are stacked on a leading axis (all rasters must share a
    shape) and per-design feature maps are consumed by the grouped
    forward (``PathModel`` with ``path_ids`` of shape ``(K, Bk)`` — row
    k holds only design-k path ids, see ``path_ids_per_design``).

    Returns a parsed dict with the extra keys ``path_design`` (path ->
    design index) and ``path_ids_per_design`` (per-design sampling
    universes, already offset).
    """
    assert len(parsed_list) >= 1
    num_ctypes = {int(p["num_ctypes"]) for p in parsed_list
                  if "num_ctypes" in p}
    assert len(num_ctypes) <= 1, "designs must share the cell-type library"
    node_off = np.cumsum([0] + [int(p["num_nodes"]) for p in parsed_list])
    path_off = np.cumsum([0] + [int(p["num_paths"]) for p in parsed_list])

    def get_arr(p, key):
        if key in p:
            return np.asarray(p[key])
        if key in ("is_start", "is_end"):  # optional in minimal dicts
            return np.zeros(int(p["num_nodes"]), np.int64)
        if key == "path2level":
            return np.asarray(p["path_level"], np.int64)
        if key == "critical_paths":
            return np.zeros(0, np.int64)
        raise KeyError(key)

    def cat_rows(key, off=None):
        parts = []
        for k, p in enumerate(parsed_list):
            a = get_arr(p, key)
            parts.append(a if off is None else a + off[k])
        return np.concatenate(parts, axis=0)

    def cat_edges(key):
        src = np.concatenate([np.asarray(p[key][0], np.int64) + node_off[k]
                              for k, p in enumerate(parsed_list)])
        dst = np.concatenate([np.asarray(p[key][1], np.int64) + node_off[k]
                              for k, p in enumerate(parsed_list)])
        return (src, dst)

    n_levels = max(len(p["levels"]) for p in parsed_list)
    levels = []
    for li in range(n_levels):
        nodes, targets, pids = [], [], []
        for k, p in enumerate(parsed_list):
            if li >= len(p["levels"]):
                continue
            lvl = p["levels"][li]
            nodes.append(np.asarray(lvl[0], np.int64) + node_off[k])
            targets.append(np.asarray(lvl[1], np.int64) + node_off[k])
            pids.append(np.asarray(lvl[2], np.int64) + path_off[k])
        levels.append((np.concatenate(nodes) if nodes else np.zeros(0, np.int64),
                       np.concatenate(targets) if targets else np.zeros(0, np.int64),
                       np.concatenate(pids) if pids else np.zeros(0, np.int64)))

    coo = np.concatenate(
        [np.stack([np.asarray(p["mask_coo"][0], np.int64) + path_off[k],
                   np.asarray(p["mask_coo"][1], np.int64)])
         for k, p in enumerate(parsed_list)], axis=1)

    cnn_shapes = {np.asarray(p["cnn_input"]).shape for p in parsed_list}
    assert len(cnn_shapes) == 1, \
        f"designs must share a CNN raster shape, got {cnn_shapes}"
    cnn_input = np.stack([np.asarray(p["cnn_input"], np.float32)
                          for p in parsed_list])  # (K, C, H, W)

    path_design = np.concatenate(
        [np.full(int(p["num_paths"]), k, np.int32)
         for k, p in enumerate(parsed_list)])
    per_design_ids = [
        np.asarray(p.get("path_ids", np.arange(int(p["num_paths"]))),
                   np.int64) + path_off[k]
        for k, p in enumerate(parsed_list)]

    merged = {
        "num_nodes": int(node_off[-1]),
        "num_paths": int(path_off[-1]),
        "cell_feat": cat_rows("cell_feat"),
        "net_feat": cat_rows("net_feat"),
        "is_start": cat_rows("is_start"),
        "is_end": cat_rows("is_end"),
        "is_critical": cat_rows("is_critical"),
        "arrival_time": cat_rows("arrival_time"),
        "required_time": cat_rows("required_time"),
        "cell_edges": cat_edges("cell_edges"),
        "net_edges": cat_edges("net_edges"),
        "levels": levels,
        "path2level": cat_rows("path2level"),
        "path_level": cat_rows("path_level"),
        "path_endpoint": cat_rows("path_endpoint", off=node_off),
        "critical_paths": np.concatenate(
            [np.asarray(get_arr(p, "critical_paths"), np.int64) + path_off[k]
             for k, p in enumerate(parsed_list)]),
        "mask_coo": coo,
        "cnn_input": cnn_input,
        "path_design": path_design,
        "path_ids_per_design": per_design_ids,
    }
    if num_ctypes:
        merged["num_ctypes"] = num_ctypes.pop()
    return merged


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
