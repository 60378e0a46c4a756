"""LayoutNet — the small 4-conv layout CNN (reference src/model.py:216-247).

NHWC layout (TPU-native). 2 input channels, 512x512 input ->
128x128 single-channel output (two stride-2 pools).

The first conv runs as an im2col matmul against the pack-time patch
table when the caller provides one (``DesignData.cnn_patches``): the
layout raster is STATIC per design, so Conv_0 is a linear map of its
kernel — ``patches @ kernel.reshape(-1, 32)`` forward and (via
autodiff) ``patches^T @ grad`` weight-gradient are plain MXU matmuls.
XLA's native weight-gradient conv for this tiny-channel layer profiled
at 1.8 TFLOP/s (1.47 ms/step on v5e); the raster needs no
input-gradient at all. The patch table is stored in the run's compute
dtype (``pack_design(compute_dtype=...)``): bf16 under
``--compute_dtype bfloat16`` so no per-step f32->bf16 convert of the
170 MB table is materialized (0.77 ms/step when stored f32), f32
otherwise so the default path matches the exact f32 conv.

Measured A/B (80k-node headline step, v5e): plain convs 62.9 steps/s;
im2col fwd 65.0; a custom-vjp variant that kept the conv forward and
routed only wgrad through im2col regressed to 59.0 (XLA materialized
2.2 ms of layout copies around the backward-built patch tensor) and
was reverted.
"""

from __future__ import annotations

from typing import Any

import jax
import flax.linen as nn

from ..ops.pool import pool_2x2


def _pool(x, pooling: str):
    return pool_2x2(x, pooling, what="layoutnet")


class StaticInputConv(nn.Module):
    """k x k SAME conv whose input may come pre-im2col'ed.

    Param tree (`kernel` HWIO, `bias`) and init functions match
    ``nn.Conv`` exactly, so checkpoints and init rng streams are
    unchanged; instances are explicitly named ``Conv_0``. ``dtype`` is
    the flax-style compute dtype (params stay f32).
    """

    features: int
    kernel_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, patches=None):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (k, k, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
            x = x.astype(self.dtype)
            if patches is not None:
                patches = patches.astype(self.dtype)
        if patches is not None:
            n, h, w, _ = x.shape
            out = patches @ kernel.reshape(k * k * cin, self.features)
            return out.reshape(n, h, w, self.features) + bias
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1, 1),
            padding="SAME", dimension_numbers=dn)
        return out + bias


class LayoutNet(nn.Module):
    pooling: str = "max"
    dtype: Any = None  # compute dtype for every conv (params stay f32)

    @nn.compact
    def __call__(self, x, train: bool = False, patches=None):
        # Conv2d(2,32,9,1,4) -> ReLU -> pool/2
        x = StaticInputConv(32, 9, name="Conv_0", dtype=self.dtype)(
            x, patches)
        x = jax.nn.relu(x)
        x = _pool(x, self.pooling)
        # Conv2d(32,64,7,1,3) -> ReLU -> pool/2
        x = nn.Conv(64, (7, 7), padding="SAME", name="Conv_1",
                    dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        x = _pool(x, self.pooling)
        # Conv2d(64,32,9,1,4) -> ReLU
        x = nn.Conv(32, (9, 9), padding="SAME", name="Conv_2",
                    dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        # Conv2d(32,1,7,1,3) -> LeakyReLU(0.1)
        x = nn.Conv(1, (7, 7), padding="SAME", name="Conv_3",
                    dtype=self.dtype)(x)
        x = jax.nn.leaky_relu(x, negative_slope=0.1)
        return x
