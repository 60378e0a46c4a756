"""TimeGNN — the levelized message-passing GNN (reference ``PathConv``).

Reference semantics (``src/model.py:27-213``), per topological level:

- net levels (odd):  ``h[v] = ReLU(fc_net_self(net_feat[v]) +
  mean_{u->v, net} h[u])``
- cell levels (even>0): mailbox softmax-weighted sum of incoming ``h``
  then ``h[v] = ReLU(fc_cell_self(cell_feat[v]) + fc_cell_neigh(agg))``
- level 0 (PIs): ``h[v] = ReLU(fc_cell_self(cell_feat[v]))``

TPU re-design: instead of a Python loop of ``graph.pull`` calls mutating
``ndata['h']`` in place, the propagation is one ``nn.scan`` over
level *pairs* (cell half then net half — the schedule is static because
pin-DAG levels alternate strictly), carrying the node-state matrix
``h`` of shape ``(N+1, out_dim)``. Each half-step is
gather(h[src]) -> segment-reduce -> dense MLPs -> scatter, all with
static padded shapes so XLA compiles a single fused loop body.

Deliberate deviations from the reference (documented in MODEL_NOTES.md):
``fc_net_drive`` (declared but unused in the reference forward,
src/model.py:52) is omitted; ``--attn`` uses per-edge scores from
``fc_attn2`` with a per-destination segment softmax (the reference's
attn path reads an unset ``ndata['key']`` and cannot run as shipped).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..graph import LeveledGraph
from ..ops.segment import (
    segment_mean,
    segment_softmax_sum,
    segment_weighted_softmax_sum,
)
from .mlp import MLP


class _PairStep(nn.Module):
    """One (cell level, net level) pair of the level scan."""

    out_dim: int
    hidden_dim: int = 256
    flag_attn: bool = False
    use_pallas: bool = False
    pallas_interpret: bool = False

    def setup(self):
        # widths mirror src/model.py:48-54 (256-wide single hidden layer)
        self.fc_cell_neigh = MLP((self.hidden_dim, self.out_dim))
        self.fc_cell_self = MLP((self.hidden_dim, self.out_dim))
        self.fc_net_self = MLP((self.hidden_dim, self.out_dim))
        if self.flag_attn:
            self.fc_attn2 = nn.Dense(1, use_bias=False)

    def _softmax_reduce(self, msg, dst_slot, num_segments):
        if self.use_pallas:
            from ..ops.pallas_segment import segment_softmax_sum_pallas
            return segment_softmax_sum_pallas(
                msg, dst_slot, num_segments, self.pallas_interpret)
        return segment_softmax_sum(msg, dst_slot, num_segments)

    def _mean_reduce(self, msg, dst_slot, num_segments):
        if self.use_pallas:
            from ..ops.pallas_segment import segment_mean_pallas
            return segment_mean_pallas(
                msg, dst_slot, num_segments, self.pallas_interpret)
        return segment_mean(msg, dst_slot, num_segments)

    def __call__(self, h, feats, xs):
        cell_feat, net_feat = feats
        pn_c = xs["cell_nodes"].shape[0]
        pn_n = xs["net_nodes"].shape[0]

        # ---- cell half (even level) ----
        msg = h[xs["cell_src"]]
        if self.flag_attn:
            scores = self.fc_attn2(msg)
            neigh = segment_weighted_softmax_sum(
                msg, scores, xs["cell_dst_slot"], pn_c + 1)[:pn_c]
        else:
            neigh = self._softmax_reduce(
                msg, xs["cell_dst_slot"], pn_c + 1)[:pn_c]
        h_self = self.fc_cell_self(cell_feat[xs["cell_nodes"]])
        # level 0 drops the neighbor term (apply_cell_func_level0,
        # src/model.py:148-153); its mailboxes are empty anyway.
        gate = jnp.where(xs["pair_idx"] == 0, 0.0, 1.0).astype(h.dtype)
        h_new = jax.nn.relu(h_self + gate * self.fc_cell_neigh(neigh))
        h = h.at[xs["cell_nodes"]].set(h_new)

        # ---- net half (odd level) ----
        msg_n = h[xs["net_src"]]
        neigh_n = self._mean_reduce(
            msg_n, xs["net_dst_slot"], pn_n + 1)[:pn_n]
        h_new_n = jax.nn.relu(
            self.fc_net_self(net_feat[xs["net_nodes"]]) + neigh_n)
        h = h.at[xs["net_nodes"]].set(h_new_n)
        return h, None


class TimeGNN(nn.Module):
    """Full levelized propagation; returns h for all nodes, (N+1, out_dim).

    Row N is the dummy padding row (contents unspecified — padded edges
    only ever reduce into dummy segments).
    """

    out_dim: int = 128
    hidden_dim: int = 256
    flag_attn: bool = False
    num_heads: int = 1  # parity flag; single-head semantics (reference default)
    unroll: int | bool = 1  # lax.scan unroll factor over level pairs
    use_pallas: bool = False  # fused streaming segment reduces
    pallas_interpret: bool = False  # interpreter mode (CPU testing)

    @nn.compact
    def __call__(self, g: LeveledGraph, h0=None):
        n1 = g.cell_feat.shape[0]
        h = (h0 if h0 is not None
             else jnp.zeros((n1, self.out_dim), dtype=g.cell_feat.dtype))
        xs = {
            "pair_idx": jnp.arange(g.num_pairs, dtype=jnp.int32),
            "cell_nodes": g.cell_nodes,
            "cell_src": g.cell_src,
            "cell_dst_slot": g.cell_dst_slot,
            "net_nodes": g.net_nodes,
            "net_src": g.net_src,
            "net_dst_slot": g.net_dst_slot,
        }
        scan = nn.scan(
            _PairStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            unroll=self.unroll,
        )
        h, _ = scan(
            out_dim=self.out_dim,
            hidden_dim=self.hidden_dim,
            flag_attn=self.flag_attn,
            use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret,
            name="pair_step",
        )(h, (g.cell_feat, g.net_feat), xs)
        return h
