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
``h`` of shape ``(num_rows+1, out_dim)`` in the level-contiguous layout
of :class:`prtp_tpu.graph.LeveledGraph`. Per half-step:

  gather h[src] -> segment-reduce -> dense MLPs on the level's feature
  block -> ``lax.dynamic_update_slice`` into the level's contiguous rows

Measured on TPU v5e, row *scatters* dominated the v1 design; v2 removes
them entirely (contiguous writes), ships per-level features as scan
blocks (no feature gathers), precomputes net in-degree counts (mean =
one segment-sum), and fuses the two softmax segment-sums into one.

Deliberate deviations from the reference (documented in MODEL_NOTES.md):
``fc_net_drive`` (declared but unused in the reference forward,
src/model.py:52) is omitted; ``--attn`` uses per-edge scores from
``fc_attn2`` with a per-destination segment softmax (the reference's
attn path reads an unset ``ndata['key']`` and cannot run as shipped).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..graph import LeveledGraph
from ..ops.mailbox import mailbox_gather
from ..ops.segment import (
    segment_softmax_sum_fused,
    segment_sum,
    segment_weighted_softmax_sum,
)
from .mlp import MLP


class _PairStep(nn.Module):
    """One (cell level, net level) pair of the level scan.

    ``reduce_mode``:
      - 'mailbox' (default): dense (Pn, max_deg, D) mailbox gather +
        masked elementwise softmax/mean — zero scatters in the forward
        (cell in-degree <= cell fanin; net in-degree ~1).
      - 'segment': XLA segment reductions over the flat edge tables
        (used by the edge-parallel 'gp' sharding, which partitions the
        edge axis).

    A Pallas streaming-reduce mode existed through round 1 and was
    retired after measurement: its per-edge sequential loop ran 2.7x
    slower than XLA's fused segment ops on the bench workload and could
    not scale past VMEM (MODEL_NOTES.md, "rejected after measurement").
    """

    out_dim: int
    num_rows: int
    hidden_dim: int = 256
    flag_attn: bool = False
    num_heads: int = 1
    reduce_mode: str = "mailbox"
    # flax compute dtype for the three MLPs (params stay f32; bf16 runs
    # the MXU at full rate). Attention scores stay f32 (exp/-inf).
    mlp_dtype: Any = None
    # DGL graph.pull does NOT update a pulled node whose mailbox is
    # empty (no in-edges of the level's etype) — not even the apply
    # function runs. With dgl_parity the update is masked by in-degree,
    # so e.g. level-0 PIs (no cell in-edges) keep h = 0 exactly as the
    # reference does; apply_cell_func_level0 (src/model.py:148-153)
    # only ever fires for level-0 nodes that DO have cell in-edges.
    dgl_parity: bool = True

    def setup(self):
        # widths mirror src/model.py:48-54 (256-wide single hidden layer)
        self.fc_cell_neigh = MLP((self.hidden_dim, self.out_dim),
                                 dtype=self.mlp_dtype)
        self.fc_cell_self = MLP((self.hidden_dim, self.out_dim),
                                dtype=self.mlp_dtype)
        self.fc_net_self = MLP((self.hidden_dim, self.out_dim),
                               dtype=self.mlp_dtype)
        if self.flag_attn:
            # one score column per head; num_heads=1 keeps the exact
            # single-head parameter shape (kernel (D, 1))
            assert self.out_dim % self.num_heads == 0, \
                "out_dim must be divisible by num_heads"
            self.fc_attn2 = nn.Dense(self.num_heads, use_bias=False)

    def _softmax_reduce(self, msg, dst_slot, num_segments):
        return segment_softmax_sum_fused(msg, dst_slot, num_segments)

    def _cell_neigh_mailbox(self, h, mail, rev_pos, rev_rows):
        """Masked elementwise mailbox softmax (cell_msg_reduce,
        src/model.py:113-116) over the dense (Pn, md, D) mailbox."""
        m = mailbox_gather(h, mail, rev_pos, rev_rows, self.num_rows)
        valid = (mail != self.num_rows)[..., None]  # (Pn, md, 1)
        neg = jnp.full_like(m, -jnp.inf)
        mx = jnp.max(jnp.where(valid, m, neg), axis=1, keepdims=True)
        mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        ex = jnp.where(valid, jnp.exp(m - mx), 0.0)
        denom = jnp.maximum(ex.sum(axis=1), 1e-12)
        return (ex * m).sum(axis=1) / denom

    def _cell_neigh_mailbox_attn(self, h, mail, rev_pos, rev_rows):
        """(Multi-head) attention reduce on the dense mailbox: per-edge
        per-head scores from fc_attn2, per-head softmax over the mailbox,
        heads read disjoint out_dim/num_heads value slices (GAT-style
        concat). num_heads=1 reduces exactly to single-head attention."""
        nh = self.num_heads
        m = mailbox_gather(h, mail, rev_pos, rev_rows, self.num_rows)
        pn, md, d = m.shape
        valid = (mail != self.num_rows)[..., None]     # (Pn, md, 1)
        scores = self.fc_attn2(m)                      # (Pn, md, H)
        scores = jnp.where(valid, scores, -jnp.inf)
        mx = jnp.max(scores, axis=1, keepdims=True)
        mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        ex = jnp.where(valid, jnp.exp(scores - mx), 0.0)
        alpha = ex / jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-12)
        if nh == 1:
            return (alpha * m).sum(axis=1)
        mh = m.reshape(pn, md, nh, d // nh)            # (Pn, md, H, Dh)
        out = (alpha[..., None] * mh).sum(axis=1)      # (Pn, H, Dh)
        return out.reshape(pn, d)

    def _net_neigh_mailbox(self, h, mail, rev_pos, rev_rows):
        m = mailbox_gather(h, mail, rev_pos, rev_rows, self.num_rows)
        valid = (mail != self.num_rows)[..., None]
        s = jnp.where(valid, m, 0.0).sum(axis=1)
        cnt = jnp.maximum(valid.sum(axis=1).astype(m.dtype), 1.0)
        return s / cnt

    def _has_in(self, xs, half, pn):
        """(pn,) bool — does each level node have >= 1 in-edge of the
        half's etype? (the DGL pull update mask)"""
        if self.reduce_mode == "mailbox":
            return (xs[f"{half}_mail"] != self.num_rows).any(axis=1)
        ones = jnp.ones((xs[f"{half}_dst_slot"].shape[0], 1), jnp.float32)
        cnt = segment_sum(ones, xs[f"{half}_dst_slot"], pn + 1)[:pn, 0]
        return cnt > 0

    def _masked_update(self, h, h_new, off, has_in):
        """DGL-parity write: updated rows take h_new; empty-mailbox rows
        keep their carried value, passed through the same post-pull ReLU
        the reference applies to ALL level nodes (src/model.py:208)."""
        if self.dgl_parity:
            old = jax.lax.dynamic_slice(
                h, (off, 0), (h_new.shape[0], h.shape[1]))
            h_new = jnp.where(has_in[:, None], h_new, jax.nn.relu(old))
        return jax.lax.dynamic_update_slice(h, h_new.astype(h.dtype),
                                            (off, 0))

    def __call__(self, h, xs):
        pn_c = xs["cell_feat"].shape[0]
        pn_n = xs["net_feat"].shape[0]
        mailbox = self.reduce_mode == "mailbox"

        # ---- cell half (even level) ----
        if mailbox:
            if self.flag_attn:
                neigh = self._cell_neigh_mailbox_attn(
                    h, xs["cell_mail"], xs["cell_rev_pos"],
                    xs["cell_rev_rows"])
            else:
                neigh = self._cell_neigh_mailbox(
                    h, xs["cell_mail"], xs["cell_rev_pos"],
                    xs["cell_rev_rows"])
        elif self.flag_attn:
            msg = h[xs["cell_src"]]
            scores = self.fc_attn2(msg)
            neigh = segment_weighted_softmax_sum(
                msg, scores, xs["cell_dst_slot"], pn_c + 1)[:pn_c]
        else:
            msg = h[xs["cell_src"]]
            neigh = self._softmax_reduce(
                msg, xs["cell_dst_slot"], pn_c + 1)[:pn_c]
        h_self = self.fc_cell_self(xs["cell_feat"])
        # level 0 drops the neighbor term (apply_cell_func_level0,
        # src/model.py:148-153); its mailboxes are empty anyway.
        gate = jnp.where(xs["pair_idx"] == 0, 0.0, 1.0).astype(h.dtype)
        h_new = jax.nn.relu(h_self + gate * self.fc_cell_neigh(neigh))
        h = self._masked_update(h, h_new, xs["cell_off"],
                                self._has_in(xs, "cell", pn_c))

        # ---- net half (odd level) ----
        if mailbox:
            neigh_n = self._net_neigh_mailbox(
                h, xs["net_mail"], xs["net_rev_pos"], xs["net_rev_rows"])
        else:
            msg_n = h[xs["net_src"]]
            sums = segment_sum(msg_n, xs["net_dst_slot"], pn_n + 1)[:pn_n]
            neigh_n = sums / xs["net_cnt"][:, None]
        h_new_n = jax.nn.relu(self.fc_net_self(xs["net_feat"]) + neigh_n)
        h = self._masked_update(h, h_new_n, xs["net_off"],
                                self._has_in(xs, "net", pn_n))
        return h, None


class TimeGNN(nn.Module):
    """Full levelized propagation; returns h for all state rows,
    ``(num_rows+1, out_dim)`` in the level-contiguous layout. The last
    row is the gather dummy for padded edge sources."""

    out_dim: int = 128
    hidden_dim: int = 256
    flag_attn: bool = False
    num_heads: int = 1  # attention heads (GAT-style concat; 1 = reference default)
    unroll: int | bool = 1  # lax.scan unroll factor over level pairs
    reduce_mode: str = "mailbox"  # 'mailbox' | 'segment'
    dgl_parity: bool = True  # exact DGL pull semantics (see _PairStep)
    fused_vjp: bool = True  # hand-written backward on the exact path
    # compute dtype for the MLP matmuls on every path: flax Dense dtype
    # on the scan/grouped paths, and bf16-operand/f32-accumulate matmuls
    # inside the exact path's fused VJP (ops/fused_gnn._mm).
    mlp_dtype: Any = None

    @nn.compact
    def __call__(self, g, h0=None):
        from ..graph import LeveledGraphExact, LeveledGraphGrouped
        if isinstance(g, LeveledGraphExact):
            return self._call_exact(g, h0)
        grouped = isinstance(g, LeveledGraphGrouped)
        num_rows = g.num_rows
        # f32 node-state carry on EVERY path (scan/grouped here, exact in
        # _call_exact): mixed precision means bf16-packed feature tables
        # and bf16 matmul operands (mlp_dtype via Dense dtype), never
        # bf16 carries — a bf16 carry compounds rounding per level pair
        # in both the forward state and the backward cotangents.
        h = (h0 if h0 is not None
             else jnp.zeros((num_rows + 1, self.out_dim),
                            dtype=jnp.float32))
        scan_mod = nn.scan(
            _PairStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            unroll=self.unroll,
        )(
            out_dim=self.out_dim,
            num_rows=num_rows,
            hidden_dim=self.hidden_dim,
            flag_attn=self.flag_attn,
            num_heads=self.num_heads,
            reduce_mode=self.reduce_mode,
            dgl_parity=self.dgl_parity,
            mlp_dtype=self.mlp_dtype,
            name="pair_step",
        )

        def group_xs(sub, pair_idx, cell_off, net_off):
            xs = {
                "pair_idx": pair_idx,
                "cell_off": cell_off,
                "net_off": net_off,
                "cell_feat": sub.cell_feat_lvl,
                "net_feat": sub.net_feat_lvl,
            }
            if self.reduce_mode == "mailbox":
                xs.update(cell_mail=sub.cell_mail, net_mail=sub.net_mail,
                          cell_rev_pos=sub.cell_rev_pos,
                          cell_rev_rows=sub.cell_rev_rows,
                          net_rev_pos=sub.net_rev_pos,
                          net_rev_rows=sub.net_rev_rows)
            else:
                xs.update(cell_src=sub.cell_src,
                          cell_dst_slot=sub.cell_dst_slot,
                          net_src=sub.net_src,
                          net_dst_slot=sub.net_dst_slot,
                          net_cnt=sub.net_cnt)
            return xs

        if grouped:
            # python loop over groups, one lax.scan per group; the SAME
            # bound module is called each time (shared params). Compile
            # cost = G scan bodies; padded compute bounded by the
            # choose_pair_groups partition.
            for gi, sub in enumerate(g.groups):
                h, _ = scan_mod(h, group_xs(
                    sub, g.group_pair_idx[gi], g.group_cell_off[gi],
                    g.group_net_off[gi]))
            return h
        pair_idx = jnp.arange(g.num_pairs, dtype=jnp.int32)
        stride = g.pn_c + g.pn_n
        h, _ = scan_mod(h, group_xs(g, pair_idx, pair_idx * stride,
                                    pair_idx * stride + g.pn_c))
        return h

    def _call_exact(self, g, h0=None):
        """Exact-shape path: python loop over pairs, one shared-param
        _PairStep applied per pair with that pair's true shapes (no
        padded compute). Mailbox reduce only.

        With ``fused_vjp`` (default), the loop runs through
        :func:`prtp_tpu.ops.fused_gnn.fused_exact_gnn` — identical
        forward math, hand-written backward that carries one cotangent
        buffer and merges each pair's two mailbox backscatters into a
        single sorted scatter-add (the measured backward bottleneck).
        Covers both the default softmax reduce and the ``--attn``
        multi-head attention reduce (ops/fused_gnn._attn_sum/_attn_bwd).
        Falls back to autodiff during init (params don't exist yet)."""
        assert self.reduce_mode == "mailbox", \
            "exact-levels mode supports the mailbox reduce"
        num_rows = g.num_rows
        # The node-state carry (and with it the backward's dh cotangent
        # accumulation across every level pair) stays f32 even when the
        # packed feature tables are bf16 — mixed precision here means
        # bf16 matmul OPERANDS with f32 accumulation (ops/fused_gnn._mm),
        # never bf16 carries.
        h = (h0 if h0 is not None
             else jnp.zeros((num_rows + 1, self.out_dim),
                            dtype=jnp.float32))
        if (self.fused_vjp
                and len(g.merged_pos) == g.num_pairs
                and len(g.gather_rows) == g.num_pairs
                and not self.is_initializing()):
            from ..ops.fused_gnn import fused_exact_gnn
            pp = self.variables["params"]["pair_step"]
            keys = ["fc_cell_self", "fc_cell_neigh", "fc_net_self"]
            if self.flag_attn:
                keys.append("fc_attn2")
            params = {k: pp[k] for k in keys}
            # 5th slot: bf16 MXU matmuls with f32 accumulation inside
            # the fused VJP (ops/fused_gnn._mm); carries/reduces stay
            # f32. 6th: attention head count (0 = softmax reduce).
            # (A 7th cross-level-batched slot was measured — f32
            # regression r2, bf16 parity r5 — and deleted; see
            # ops/fused_gnn._unpack_config.)
            config = (num_rows, self.dgl_parity,
                      tuple(g.cell_off), tuple(g.net_off),
                      (jnp.dtype(self.mlp_dtype).name
                       if self.mlp_dtype is not None else None),
                      self.num_heads if self.flag_attn else 0)
            blocks = tuple(
                dict(cell_feat=g.cell_feat_lvl[k],
                     net_feat=g.net_feat_lvl[k],
                     cell_mail=g.cell_mail[k], net_mail=g.net_mail[k],
                     merged_pos=g.merged_pos[k],
                     merged_seg=g.merged_seg[k],
                     merged_rows=g.merged_rows[k],
                     intra_pos=g.intra_pos[k],
                     intra_slot=g.intra_slot[k],
                     gather_rows=g.gather_rows[k],
                     net_local_idx=g.net_local_idx[k])
                for k in range(g.num_pairs))
            return fused_exact_gnn(config, params, h, blocks)
        step = _PairStep(
            out_dim=self.out_dim,
            num_rows=num_rows,
            hidden_dim=self.hidden_dim,
            flag_attn=self.flag_attn,
            num_heads=self.num_heads,
            reduce_mode="mailbox",
            dgl_parity=self.dgl_parity,
            mlp_dtype=self.mlp_dtype,
            name="pair_step",
        )
        for k in range(g.num_pairs):
            xs = {
                "pair_idx": jnp.asarray(k, jnp.int32),
                "cell_off": g.cell_off[k],
                "net_off": g.net_off[k],
                "cell_feat": g.cell_feat_lvl[k],
                "net_feat": g.net_feat_lvl[k],
                "cell_mail": g.cell_mail[k],
                "net_mail": g.net_mail[k],
                "cell_rev_pos": g.cell_rev_pos[k],
                "cell_rev_rows": g.cell_rev_rows[k],
                "net_rev_pos": g.net_rev_pos[k],
                "net_rev_rows": g.net_rev_rows[k],
            }
            h, _ = step(h, xs)
        return h
