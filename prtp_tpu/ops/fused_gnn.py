"""Whole-propagation custom VJP for the exact-levels GNN.

Autodiff of the level loop spends the backward in per-half-level
irregular ops: each ``mailbox_gather`` VJP emits a gather + a
full-height segment-sum, and the cotangent accumulation materializes a
``(num_rows, D)`` add per half-level. On the target chip step time is
dominated by the *count* of sequential fused regions (MODEL_NOTES.md),
so this module implements the backward by hand:

- ONE cotangent buffer ``dh`` is carried across the reverse level walk
  (no per-half full-height materializations);
- each pair's two mailbox backscatters are MERGED into a single
  sorted-unique-row ``scatter-add`` via pack-time tables
  (``LeveledGraphExact.merged_*``); net edges sourced inside the pair's
  own cell block are routed into the cell half's backward separately
  (``intra_*``);
- mailboxes are RE-GATHERED from the final ``h`` instead of being saved:
  every source row is final by the time its level reads it (levels are
  deduped — each node is written exactly once, at its own level), so
  ``h_final[mail] == h_carried[mail]`` for every level.

Semantics mirror ``models.gnn._PairStep`` (mailbox reduce, with or
without the ``--attn`` multi-head attention variant) including
``dgl_parity`` masking; equivalence with autodiff is asserted by
tests/test_fused_gnn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _mm(x, w, mm_dtype):
    """Matmul in ``mm_dtype`` (bf16: full-rate MXU) with f32
    accumulation/output; plain f32 matmul when mm_dtype is None."""
    if mm_dtype is None:
        return x @ w
    return jnp.matmul(x.astype(mm_dtype), w.astype(mm_dtype),
                      preferred_element_type=jnp.float32)


def _mlp(p, x, mm_dtype=None):
    """MLP forward matching models.mlp.MLP((hidden, out)):
    Dense -> LeakyReLU(0) == ReLU -> Dense."""
    a = _mm(x, p["fc0"]["kernel"], mm_dtype) + p["fc0"]["bias"]
    return (_mm(jax.nn.relu(a), p["fc1"]["kernel"], mm_dtype)
            + p["fc1"]["bias"])


def _mlp_grads(p, x, d_out, mm_dtype=None, need_dx=True):
    """Param grads + input cotangent for _mlp; recomputes the hidden.

    ``need_dx=False`` skips the input-cotangent matmul — the self-MLPs'
    inputs are static feature tables (data, not functions of params),
    so their dx is never consumed."""
    a = _mm(x, p["fc0"]["kernel"], mm_dtype) + p["fc0"]["bias"]
    r = jax.nn.relu(a)
    d_r = _mm(d_out, p["fc1"]["kernel"].T, mm_dtype)
    d_a = d_r * (a > 0)
    dp = {
        "fc0": {"kernel": _mm(x.T, d_a, mm_dtype), "bias": d_a.sum(0)},
        "fc1": {"kernel": _mm(r.T, d_out, mm_dtype),
                "bias": d_out.sum(0)},
    }
    d_x = _mm(d_a, p["fc0"]["kernel"].T, mm_dtype) if need_dx else None
    return dp, d_x


def _softmax_sum(m, valid):
    """Masked elementwise mailbox softmax-weighted sum over axis 1
    (matches _PairStep._cell_neigh_mailbox). Returns (f, w)."""
    neg = jnp.full_like(m, -jnp.inf)
    mx = jnp.max(jnp.where(valid, m, neg), axis=1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.where(valid, jnp.exp(m - mx), 0.0)
    denom = jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-12)
    w = ex / denom
    return (w * m).sum(axis=1), w


def _mean_sum(m, valid):
    s = jnp.where(valid, m, 0.0).sum(axis=1)                   # (pn, d)
    cnt = jnp.maximum(valid.sum(axis=1).astype(m.dtype), 1.0)  # (pn, 1)
    return s / cnt, cnt


def _attn_sum(m, valid, w, nh):
    """(Multi-head) attention reduce matching
    ``models.gnn._PairStep._cell_neigh_mailbox_attn``: per-edge
    per-head scores ``m @ w``, masked per-head softmax over the mailbox
    axis, heads reading disjoint out_dim/nh value slices (GAT-style
    concat). Scores/weights stay f32 (exp/-inf). Returns (out, alpha)."""
    pn, md, d = m.shape
    scores = jnp.einsum("pmd,dh->pmh", m, w)
    scores = jnp.where(valid, scores, -jnp.inf)
    mx = jnp.max(scores, axis=1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.where(valid, jnp.exp(scores - mx), 0.0)
    alpha = ex / jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-12)
    if nh == 1:
        out = (alpha * m).sum(axis=1)
    else:
        mh = m.reshape(pn, md, nh, d // nh)
        out = (alpha[..., None] * mh).sum(axis=1).reshape(pn, d)
    return out, alpha


def _attn_bwd(m, valid, w, nh, d_out, alpha):
    """VJP of :func:`_attn_sum` w.r.t. (w, m) given ``d_out`` (pn, d)
    and the forward's ``alpha`` (so the score matmul + masked softmax
    are not recomputed): value-path grad ``alpha * d_out`` plus the
    per-head softmax backward ``alpha * (d_alpha - <alpha, d_alpha>)``
    routed through the score projection. Invalid mailbox slots carry
    exactly zero."""
    pn, md, d = m.shape
    dh = d // nh
    mh = m.reshape(pn, md, nh, dh)
    d_oh = d_out.reshape(pn, nh, dh)
    d_alpha = jnp.einsum("pmhd,phd->pmh", mh, d_oh)
    d_m = (alpha[..., None] * d_oh[:, None]).reshape(pn, md, d)
    d_scores = alpha * (d_alpha
                        - (alpha * d_alpha).sum(axis=1, keepdims=True))
    d_scores = jnp.where(valid, d_scores, 0.0)
    d_w = jnp.einsum("pmd,pmh->dh", m, d_scores)
    d_m = d_m + jnp.einsum("pmh,dh->pmd", d_scores, w)
    return d_w, d_m


def _unpack_config(config):
    """(num_rows, dgl_parity, cell_off, net_off[, mm_dtype_str,
    num_heads]) — the optional 5th element ('bfloat16') selects
    bf16 MXU matmuls with f32 accumulation for every _mlp/_mlp_grads
    product (everything else — softmax, attention, means, scatters, the
    h/dh carries — stays f32); the optional 6th element selects the
    attention cell reduce with that head count (0/absent = mailbox
    softmax reduce).

    A 7th element once selected a CROSS-LEVEL BATCHED form (hoisted
    self-MLPs, one backward mailbox gather, deferred wgrads). It was
    measured slower in f32 (r2: 58.8 vs 63.1 steps/s, MODEL_NOTES
    'cross-level matmul batching — REJECTED') and at parity in bf16
    (r5: 80.46 vs 78.7-80.4 steps/s across windows), so per the r4
    verdict's promote-or-delete rule it was DELETED in round 5 (git
    history has it: commit 312aac7)."""
    num_rows, dgl_parity, cell_off, net_off = config[:4]
    mm = jnp.bfloat16 if len(config) > 4 and config[4] == "bfloat16" \
        else None
    nh = config[5] if len(config) > 5 else 0
    return num_rows, dgl_parity, cell_off, net_off, mm, nh


def _forward_impl(config, params, h0, blocks):
    """Merged-gather forward: ONE global (HBM) row gather per pair —
    ``h[gather_rows]`` serves the cell mailbox AND the net half's
    prior-row sources; the net mailbox is then assembled by a LOCAL
    gather from ``[new_cell | gathered prior | 0]`` (intra-pair net
    sources — the common case, the driver was just written by this
    pair's cell half — never touch HBM again). Pair 0 skips the gather
    entirely: PIs have no in-edges, its mailbox is all-dummy."""
    (num_rows, dgl_parity, cell_off, net_off, mm,
     nh) = _unpack_config(config)
    h = h0
    d = h.shape[1]
    for k, b in enumerate(blocks):
        pn_c, md_c = b["cell_mail"].shape
        # ---- one global gather for both halves ----
        if k > 0 or b["gather_rows"].shape[0] > pn_c * md_c:
            gat = h[b["gather_rows"]]  # (pn_c*md_c + n_prior, D)
        else:
            gat = None
        # ---- cell half (even level 2k) ----
        valid = (b["cell_mail"] != num_rows)[..., None]
        pre = _mlp(params["fc_cell_self"], b["cell_feat"], mm)
        if k > 0:  # level 0 drops the neighbor term
            m_c = gat[: pn_c * md_c].reshape(pn_c, md_c, d)
            if nh:
                neigh, _a = _attn_sum(m_c, valid,
                                      params["fc_attn2"]["kernel"], nh)
            else:
                neigh, _w = _softmax_sum(m_c, valid)
            pre = pre + _mlp(params["fc_cell_neigh"], neigh, mm)
        new = jax.nn.relu(pre)
        if dgl_parity:
            has = valid.any(axis=1)
            old = jax.lax.dynamic_slice(
                h, (cell_off[k], 0), (new.shape[0], d))
            new = jnp.where(has, new, jax.nn.relu(old))
        new = new.astype(h.dtype)
        h = jax.lax.dynamic_update_slice(h, new, (cell_off[k], 0))
        # ---- net half (odd level 2k+1): local-gather mailbox ----
        validn = (b["net_mail"] != num_rows)[..., None]
        prior = (gat[pn_c * md_c:] if gat is not None
                 else jnp.zeros((0, d), h.dtype))
        buf = jnp.concatenate(
            [new, prior, jnp.zeros((1, d), h.dtype)], axis=0)
        m_n = buf[b["net_local_idx"]]  # (pn_n, md_n, D) local gather
        neigh_n, _cnt = _mean_sum(m_n, validn)
        pre_n = _mlp(params["fc_net_self"], b["net_feat"], mm) + neigh_n
        new_n = jax.nn.relu(pre_n)
        if dgl_parity:
            hasn = validn.any(axis=1)
            oldn = jax.lax.dynamic_slice(
                h, (net_off[k], 0), (new_n.shape[0], d))
            new_n = jnp.where(hasn, new_n, jax.nn.relu(oldn))
        h = jax.lax.dynamic_update_slice(h, new_n.astype(h.dtype),
                                         (net_off[k], 0))
    return h


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_exact_gnn(config, params, h0, blocks):
    """h_final = exact-levels propagation with the hand-written backward.

    config: hashable (num_rows, dgl_parity, cell_off tuple, net_off
    tuple). params: the pair_step param tree {fc_cell_self,
    fc_cell_neigh, fc_net_self}. blocks: per-pair dict tuple (see
    LeveledGraphExact)."""
    return _forward_impl(config, params, h0, blocks)


def _fwd(config, params, h0, blocks):
    hf = _forward_impl(config, params, h0, blocks)
    return hf, (params, h0, blocks, hf)


def _bwd(config, res, g):
    (num_rows, dgl_parity, cell_off, net_off, mm,
     nh) = _unpack_config(config)
    params, h0, blocks, hf = res
    d = hf.shape[1]
    dh = g
    dparams = jax.tree_util.tree_map(jnp.zeros_like, params)

    def acc(tree, key, dp):
        tree[key] = jax.tree_util.tree_map(jnp.add, tree[key], dp)

    for k in reversed(range(len(blocks))):
        b = blocks[k]
        pn_c = b["cell_feat"].shape[0]
        pn_n = b["net_feat"].shape[0]

        # ---- net half backward ----
        g_n = jax.lax.dynamic_slice(dh, (net_off[k], 0), (pn_n, d))
        hf_n = jax.lax.dynamic_slice(hf, (net_off[k], 0), (pn_n, d))
        posn = (hf_n > 0).astype(g_n.dtype)
        validn = (b["net_mail"] != num_rows)[..., None]
        if dgl_parity:
            hasn = validn.any(axis=1).astype(g_n.dtype)
            d_pre_n = g_n * posn * hasn
            d_old_n = g_n * posn * (1.0 - hasn)
        else:
            d_pre_n = g_n * posn
            d_old_n = jnp.zeros_like(g_n)
        dp_net, _dx = _mlp_grads(params["fc_net_self"],
                                 b["net_feat"], d_pre_n, mm,
                                 need_dx=False)
        acc(dparams, "fc_net_self", dp_net)
        cnt = jnp.maximum(validn.sum(axis=1).astype(g_n.dtype), 1.0)
        d_mail_n = jnp.where(validn, (d_pre_n / cnt)[:, None, :], 0.0)

        # ---- intra-pair net->cell-block contributions ----
        intra = d_mail_n.reshape(-1, d)[b["intra_pos"]]
        intra_add = jax.ops.segment_sum(
            intra, b["intra_slot"], num_segments=pn_c,
            indices_are_sorted=True)

        # ---- cell half backward ----
        g_c = (jax.lax.dynamic_slice(dh, (cell_off[k], 0), (pn_c, d))
               + intra_add)
        hf_c = jax.lax.dynamic_slice(hf, (cell_off[k], 0), (pn_c, d))
        posc = (hf_c > 0).astype(g_c.dtype)
        validc = (b["cell_mail"] != num_rows)[..., None]
        if dgl_parity:
            hasc = validc.any(axis=1).astype(g_c.dtype)
            d_pre_c = g_c * posc * hasc
            d_old_c = g_c * posc * (1.0 - hasc)
        else:
            d_pre_c = g_c * posc
            d_old_c = jnp.zeros_like(g_c)
        dp_self, _dx = _mlp_grads(params["fc_cell_self"],
                                  b["cell_feat"], d_pre_c, mm,
                                  need_dx=False)
        acc(dparams, "fc_cell_self", dp_self)
        if k > 0:
            m = hf[b["cell_mail"]]
            if nh:
                w_attn = params["fc_attn2"]["kernel"]
                f, alpha_c = _attn_sum(m, validc, w_attn, nh)
            else:
                f, w = _softmax_sum(m, validc)
            dp_neigh, d_f = _mlp_grads(params["fc_cell_neigh"], f,
                                       d_pre_c, mm)
            acc(dparams, "fc_cell_neigh", dp_neigh)
            if nh:
                d_w, d_mail_c = _attn_bwd(m, validc, w_attn, nh, d_f,
                                          alpha_c)
                acc(dparams, "fc_attn2", {"kernel": d_w})
            else:
                # d f/d m_j = w_j (1 + m_j - f) elementwise per channel
                d_mail_c = d_f[:, None, :] * w * (1.0 + m - f[:, None, :])
        else:
            md_c = b["cell_mail"].shape[1]
            d_mail_c = jnp.zeros((pn_c, md_c, d), g_c.dtype)

        # ---- merged prior-row scatter (both halves, one scatter) ----
        cat = jnp.concatenate(
            [d_mail_c.reshape(-1, d), d_mail_n.reshape(-1, d)], axis=0)
        contrib = cat[b["merged_pos"]]
        uniq = jax.ops.segment_sum(
            contrib, b["merged_seg"],
            num_segments=b["merged_rows"].shape[0],
            indices_are_sorted=True)
        dh = jax.lax.dynamic_update_slice(dh, d_old_n, (net_off[k], 0))
        dh = jax.lax.dynamic_update_slice(dh, d_old_c, (cell_off[k], 0))
        if b["merged_rows"].shape[0]:
            dh = dh.at[b["merged_rows"]].add(
                uniq.astype(dh.dtype),
                indices_are_sorted=True, unique_indices=True)

    return dparams, dh, None


fused_exact_gnn.defvjp(_fwd, _bwd)
