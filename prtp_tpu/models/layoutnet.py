"""LayoutNet — the small 4-conv layout CNN (reference src/model.py:216-247).

NHWC layout (TPU-native). 2 input channels, 512x512 input ->
128x128 single-channel output (two stride-2 pools).
"""

from __future__ import annotations

import jax
import flax.linen as nn

from ..ops.pool import pool_2x2


def _pool(x, pooling: str):
    return pool_2x2(x, pooling, what="layoutnet")


class LayoutNet(nn.Module):
    pooling: str = "max"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Conv2d(2,32,9,1,4) -> ReLU -> pool/2
        x = nn.Conv(32, (9, 9), padding="SAME")(x)
        x = jax.nn.relu(x)
        x = _pool(x, self.pooling)
        # Conv2d(32,64,7,1,3) -> ReLU -> pool/2
        x = nn.Conv(64, (7, 7), padding="SAME")(x)
        x = jax.nn.relu(x)
        x = _pool(x, self.pooling)
        # Conv2d(64,32,9,1,4) -> ReLU
        x = nn.Conv(32, (9, 9), padding="SAME")(x)
        x = jax.nn.relu(x)
        # Conv2d(32,1,7,1,3) -> LeakyReLU(0.1)
        x = nn.Conv(1, (7, 7), padding="SAME")(x)
        x = jax.nn.leaky_relu(x, negative_slope=0.1)
        return x
