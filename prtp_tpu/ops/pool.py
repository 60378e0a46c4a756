"""Reshape-based 2x2/stride-2 pooling.

``flax.linen.max_pool`` lowers to ``lax.reduce_window``, whose VJP is a
``select-and-scatter`` HLO. Profiling the full train step on TPU v5e
(round 3) showed the two LayoutNet maxpool backwards costing 2.25 ms per
step — ~14% of the whole multimodal step — at ~48 GB/s effective, plus
~1 ms of layout copies XLA inserts around the select-and-scatter's
special {3,0,2,1:T(1,128)} layout.

For the non-overlapping 2x2/stride-2 window (the only pooling the
reference uses, src/model.py:221-226, src/Unet.py) the same math is a
reshape + axis reduction, whose VJP is plain broadcast/compare/select
elementwise work that XLA fuses at full HBM bandwidth. Forward values
are bit-identical; the only semantic difference is gradient routing on
EXACT float ties inside a window (select-and-scatter picks the first
max, the reduce VJP splits among ties) — measure-zero on real data.
"""

from __future__ import annotations

import flax.linen as nn


def pool_2x2(x, pooling: str, what: str = "pool"):
    """2x2/stride-2 max or avg pool on NHWC ``x``."""
    if pooling not in ("max", "avg"):
        raise ValueError(f"wrong pooling type for {what}: {pooling}")
    n, h, w, c = x.shape
    if h % 2 or w % 2:  # odd extent: the generic windowed fallback
        if pooling == "max":
            return nn.max_pool(x, (2, 2), strides=(2, 2))
        return nn.avg_pool(x, (2, 2), strides=(2, 2))
    x4 = x.reshape(n, h // 2, 2, w // 2, 2, c)
    if pooling == "max":
        return x4.max(axis=(2, 4))
    return x4.mean(axis=(2, 4))
