"""U-Net layout branch (reference ``src/Unet.py``), NHWC / Flax.

Blocks mirror Unet.py:8-82 (DoubleConv / Down / Up / OutConv); the
network mirrors Unet.py:85-119: 3-channel input, 16/32/64/128 encoder,
3 decoder ups with skip connections, and an OutConv with an extra pool,
so the output map is input/2 per side (256^2 input -> 128^2 map).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pool import pool_2x2


def _pool(x, pooling: str):
    return pool_2x2(x, pooling, what="unet")


class DoubleConv(nn.Module):
    """(Conv3x3 no-bias => BN => ReLU) * 2"""

    out_channels: int
    mid_channels: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # momentum 0.9 = torch BatchNorm2d's default (its momentum=0.1
        # weights the NEW batch; flax weights the running average) —
        # flax's 0.99 default adapts running stats 10x slower than the
        # reference's nn.BatchNorm2d (src/Unet.py:17,20), which left
        # eval-mode stats lagging far behind train stats on small
        # corpora.
        mid = self.mid_channels or self.out_channels
        x = nn.Conv(mid, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        return x


class Down(nn.Module):
    """Downscale: pool then DoubleConv."""

    out_channels: int
    pooling: str = "max"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return DoubleConv(self.out_channels, dtype=self.dtype)(
            _pool(x, self.pooling), train=train)


class Up(nn.Module):
    """Upscale (transposed conv, reference bilinear=False default) then
    pad-to-match, skip-concat, DoubleConv."""

    out_channels: int
    up_channels: int  # in_channels // 2 of the reference ConvTranspose
    dtype: Any = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = nn.ConvTranspose(self.up_channels, (2, 2), strides=(2, 2),
                              dtype=self.dtype)(x1)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                              (dw // 2, dw - dw // 2), (0, 0)))
        x = jnp.concatenate([x2.astype(x1.dtype), x1], axis=-1)
        return DoubleConv(self.out_channels, dtype=self.dtype)(
            x, train=train)


class OutConv(nn.Module):
    out_channels: int
    pooling: str = "max"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        x = _pool(x, self.pooling)
        return jax.nn.relu(x)


class UNet(nn.Module):
    pooling: str = "max"
    dtype: Any = None  # compute dtype for every conv (params stay f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x1 = DoubleConv(16, dtype=d)(x, train=train)
        x2 = Down(32, self.pooling, dtype=d)(x1, train=train)
        x3 = Down(64, self.pooling, dtype=d)(x2, train=train)
        x4 = Down(128, self.pooling, dtype=d)(x3, train=train)
        x = Up(64, 64, dtype=d)(x4, x3, train=train)
        x = Up(32, 32, dtype=d)(x, x2, train=train)
        x = Up(16, 16, dtype=d)(x, x1, train=train)
        return OutConv(1, self.pooling, dtype=d)(x, train=train)
