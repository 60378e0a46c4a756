"""Dense-mailbox gather with a sorted-transpose backward.

Forward: ``m = h[mail]`` — a plain (Pn, md, D) row gather. The naive
VJP scatter-adds Pn*md rows into grad_h (the measured backward
bottleneck). This custom VJP instead routes the cotangent through
precomputed transpose tables: only the *real* edges (Pe of them, not
Pn*md mailbox slots) contribute, gathered from the flat cotangent and
segment-summed by *sorted* source row — letting XLA use the
sorted-indices scatter path and cutting the row count to the true edge
count.
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def mailbox_gather(h, mail, rev_pos, rev_rows, num_rows):
    """h: (num_rows+1, D); mail: (Pn, md) int32 state rows (pad =
    num_rows); rev_pos: (Pe,) flat indices into (Pn*md) of the real
    edges, sorted by their source row; rev_rows: (Pe,) the matching
    source rows, ascending (pad = num_rows). Returns (Pn, md, D)."""
    return h[mail]


def _mg_fwd(h, mail, rev_pos, rev_rows, num_rows):
    return h[mail], (h.shape[0], mail, rev_pos, rev_rows)


def _mg_bwd(num_rows, res, g):
    n1, mail, rev_pos, rev_rows = res
    d = g.shape[-1]
    contrib = g.reshape(-1, d)[rev_pos]  # (Pe, D) gather — cheap
    grad_h = jax.ops.segment_sum(contrib, rev_rows, num_segments=n1,
                                 indices_are_sorted=True)
    return grad_h, None, None, None


mailbox_gather.defvjp(_mg_fwd, _mg_bwd)
