"""Shared test utilities: tiny random leveled pin-DAGs."""

from __future__ import annotations

import numpy as np


def make_random_leveled_graph(rng, level_sizes=(4, 6, 5, 7, 3),
                              cell_feat_dim=12, net_feat_dim=3,
                              max_in=3):
    """Build a random host-side graph with the reference's level structure.

    Even levels are cell levels (in-edges of etype 'cell'), odd levels
    are net levels (in-edges of etype 'net'). Every non-level-0 node
    gets 1..max_in in-edges from nodes at any strictly lower level.

    Returns a dict in the ParsedDesign array layout (subset).
    """
    levels = []
    node_ids = []
    n = 0
    for size in level_sizes:
        ids = np.arange(n, n + size, dtype=np.int64)
        node_ids.append(ids)
        n += size
    cell_src, cell_dst = [], []
    net_src, net_dst = [], []
    for li, ids in enumerate(node_ids):
        if li == 0:
            levels.append((ids, np.zeros(0, np.int64), np.zeros(0, np.int64)))
            continue
        lower = np.concatenate(node_ids[:li])
        for v in ids:
            k = rng.integers(1, max_in + 1)
            srcs = rng.choice(lower, size=min(k, len(lower)), replace=False)
            for u in srcs:
                if li % 2 == 1:
                    net_src.append(u)
                    net_dst.append(v)
                else:
                    cell_src.append(u)
                    cell_dst.append(v)
        levels.append((ids, np.zeros(0, np.int64), np.zeros(0, np.int64)))
    cell_feat = rng.normal(size=(n, cell_feat_dim)).astype(np.float32)
    net_feat = rng.normal(size=(n, net_feat_dim)).astype(np.float32)
    return {
        "num_nodes": n,
        "levels": levels,
        "cell_edges": (np.array(cell_src, np.int64), np.array(cell_dst, np.int64)),
        "net_edges": (np.array(net_src, np.int64), np.array(net_dst, np.int64)),
        "cell_feat": cell_feat,
        "net_feat": net_feat,
    }


def dense_apply(p, x):
    out = x @ np.asarray(p["kernel"])
    if "bias" in p:
        out = out + np.asarray(p["bias"])
    return out


def mlp_apply(p, x):
    """Numpy forward of prtp_tpu.models.MLP params (relu between layers)."""
    keys = sorted(p.keys())
    for i, k in enumerate(keys):
        x = dense_apply(p[k], x)
        if i < len(keys) - 1:
            x = np.maximum(x, 0.0)
    return x


def naive_timegnn_forward(params, g, out_dim, dgl_parity=True):
    """Direct per-level numpy implementation of the reference PathConv
    semantics (src/model.py:158-213) for comparison against the scan.

    ``dgl_parity`` mirrors the model flag: DGL ``graph.pull`` skips
    nodes whose mailbox is empty (no in-edges of the level's etype), so
    those keep their carried state (ReLU'd, per the post-pull in-place
    activation over all level nodes, src/model.py:208).
    """
    pp = params["params"]["gnn"]["pair_step"] if "gnn" in params["params"] \
        else params["params"]["pair_step"]
    n = g["num_nodes"]
    h = np.zeros((n, out_dim), dtype=np.float64)
    cell_in = {}
    for u, v in zip(*g["cell_edges"]):
        cell_in.setdefault(int(v), []).append(int(u))
    net_in = {}
    for u, v in zip(*g["net_edges"]):
        net_in.setdefault(int(v), []).append(int(u))
    for li, (nodes, _t, _p) in enumerate(g["levels"]):
        for v in nodes:
            v = int(v)
            ins = (net_in if li % 2 == 1 else cell_in).get(v, [])
            if dgl_parity and not ins:
                h[v] = np.maximum(h[v], 0.0)
                continue
            if li % 2 == 1:  # net level
                neigh = h[ins].mean(axis=0) if ins else np.zeros(out_dim)
                val = mlp_apply(pp["fc_net_self"], g["net_feat"][v]) + neigh
            elif li == 0:
                val = mlp_apply(pp["fc_cell_self"], g["cell_feat"][v])
            else:
                if ins:
                    m = h[ins]  # (k, D)
                    mx = m.max(axis=0)
                    e = np.exp(m - mx)
                    w = e / e.sum(axis=0)
                    agg = (m * w).sum(axis=0)
                else:
                    agg = np.zeros(out_dim)
                val = (mlp_apply(pp["fc_cell_self"], g["cell_feat"][v])
                       + mlp_apply(pp["fc_cell_neigh"], agg))
            h[v] = np.maximum(val, 0.0)
    return h
