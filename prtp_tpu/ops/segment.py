"""Segment reductions — the TPU form of DGL mailbox reduces.

The reference's hot kernel is ``graph.pull`` with per-level reduce
functions (``src/model.py:186-204``):

- net levels:   ``fn.mean('m','h_neigh1')``
- cell levels:  elementwise mailbox softmax-weighted sum
  (``cell_msg_reduce``, ``src/model.py:113-116``)
- level 0:      ``fn.max('m','h_neigh1')``
- attention:    softmax over per-edge scalar scores
  (``cell_msg_reduce_attn``, ``src/model.py:125-129``)

On TPU these become static-shape gathers + segment reductions over
padded edge tables. Conventions used throughout:

- ``segment_ids`` index destination *slots* ``[0, num_segments)``;
  padded edges carry ``segment_ids == num_segments - 1`` (a dummy slot)
  and source data gathered from a zeroed dummy node row, so padding
  never pollutes real segments.
- ``num_segments`` is static (required for XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data, segment_ids, num_segments):
    """Max-reduce; empty segments yield 0 (not -inf).

    DGL's ``fn.max`` yields 0 for empty mailboxes on pulled nodes; the
    reference only uses max at level 0 where mailboxes are all empty.
    """
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isneginf(out), 0.0, out)


def segment_mean(data, segment_ids, num_segments):
    """Mean-reduce with empty segments yielding 0."""
    sums = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    ones = jnp.ones((data.shape[0],), dtype=data.dtype)
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    return sums / jnp.maximum(counts, 1.0)[:, None]


def segment_softmax_sum_fused(data, segment_ids, num_segments):
    """Mailbox softmax-weighted sum with the two segment-sums fused into
    one scatter over concatenated features (TPU scatter count is the
    measured cost driver, not bytes)."""
    seg_max = jax.ops.segment_max(data, segment_ids,
                                  num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(data - seg_max[segment_ids])
    d = data.shape[1]
    both = jax.ops.segment_sum(
        jnp.concatenate([ex, ex * data], axis=1), segment_ids,
        num_segments=num_segments)
    return both[:, d:] / jnp.maximum(both[:, :d], 1e-12)


def segment_softmax_sum(data, segment_ids, num_segments):
    """Elementwise mailbox softmax-weighted sum.

    For each segment s and feature d:
        out[s, d] = sum_e softmax_{e in s}(data[e, d]) * data[e, d]

    Parity with reference ``cell_msg_reduce`` (src/model.py:113-116):
    ``weight = softmax(msg, dim=1); (msg * weight).sum(1)`` where dim=1
    is the mailbox (incoming-edge) dimension. Numerically stabilized by
    per-segment max subtraction.
    """
    seg_max = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = data - seg_max[segment_ids]
    ex = jnp.exp(shifted)
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    numer = jax.ops.segment_sum(ex * data, segment_ids, num_segments=num_segments)
    return numer / jnp.maximum(denom, 1e-12)


def segment_weighted_softmax_sum(data, scores, segment_ids, num_segments):
    """Attention-style reduce: per-edge (per-head) scores -> segment
    softmax weights -> weighted sum of ``data``.

    ``scores`` is ``(E,)``/``(E, 1)`` for single-head, or ``(E, H)``
    multi-head, in which case each head softmax-weights its own
    ``D/H``-wide value slice of ``data`` (GAT-style concat).

    For each segment s (per head):
        alpha_e = softmax_{e in s}(scores[e]);  out[s] = sum_e alpha_e * data[e]

    This is the working semantics of the reference's attention reduce
    (``cell_msg_reduce_attn``, src/model.py:125-129, with per-edge scores
    from ``fc_attn2`` — the reference's ``--attn`` path itself references
    an unset ndata['key'] and cannot run; see MODEL_NOTES.md).
    """
    if scores.ndim == 2 and scores.shape[1] > 1:
        e, d = data.shape
        nh = scores.shape[1]
        assert d % nh == 0, "data dim must be divisible by num_heads"
        seg_max = jax.ops.segment_max(scores, segment_ids,
                                      num_segments=num_segments)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        ex = jnp.exp(scores - seg_max[segment_ids])          # (E, H)
        denom = jax.ops.segment_sum(ex, segment_ids,
                                    num_segments=num_segments)  # (S, H)
        weighted = (ex[:, :, None]
                    * data.reshape(e, nh, d // nh)).reshape(e, d)
        numer = jax.ops.segment_sum(weighted, segment_ids,
                                    num_segments=num_segments)
        out = (numer.reshape(num_segments, nh, d // nh)
               / jnp.maximum(denom, 1e-12)[:, :, None])
        return out.reshape(num_segments, d)
    scores = scores.reshape(-1)
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(scores - seg_max[segment_ids])
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    numer = jax.ops.segment_sum(
        ex[:, None] * data, segment_ids, num_segments=num_segments
    )
    return numer / jnp.maximum(denom, 1e-12)[:, None]
