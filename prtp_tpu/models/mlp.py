"""Variadic MLP block.

Capability parity with the reference ``MLP`` (``src/model.py:10-24``):
a stack of Linear layers with LeakyReLU (default negative_slope=0, i.e.
ReLU) between hidden layers, plus optional dropout / batchnorm.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import flax.linen as nn


class MLP(nn.Module):
    """Linear stack; ``features`` are the per-layer output sizes.

    The input size is inferred (flax). Activation is applied between
    layers but not after the last, matching src/model.py:14-20.

    ``dtype`` is the flax COMPUTE dtype: params stay float32 and are
    cast (with the inputs) to ``dtype`` for the matmuls — bfloat16 here
    runs the MXU at full rate instead of the f32 3-pass lowering.
    """

    features: Sequence[int]
    negative_slope: float = 0.0
    dropout: float = 0.0
    batchnorm: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"fc{i}", dtype=self.dtype)(x)
            if i < n - 1:
                x = jax.nn.leaky_relu(x, negative_slope=self.negative_slope)
                if self.dropout > 0:
                    x = nn.Dropout(rate=self.dropout)(
                        x, deterministic=deterministic)
                if self.batchnorm:
                    x = nn.BatchNorm(use_running_average=deterministic)(x)
        return x
