"""Image / init feature encoders (ResUNet-style, channels-last Flax).

Behavioral parity targets: reference network/ops.py:150-319
(``ResUNetLight`` — the per-reference-view image encoder producing 32-ch
features at 1/4 input resolution — and ``ResEncoder`` — the 12-channel
input encoder used by the depth init net).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from neuray_tpu.models.blocks import (
    InstanceNorm, ReflectConv, BasicBlock, ConvELU, UpConv)


def _skip_pad_concat(x_up, x_skip):
    """Pad the SKIP map to the upsampled map's spatial size, then concat
    [upsampled, skip] on channels.

    Parity with reference skipconnect (ops.py:290-302), which is called
    as skipconnect(x_skip, x_up): it pads its FIRST arg (the encoder
    skip) to the second's size and cats [x_up, x_skip] — both the pad
    target and the channel order matter for weight-converted parity.
    """
    dy = x_up.shape[1] - x_skip.shape[1]
    dx = x_up.shape[2] - x_skip.shape[2]
    if dy or dx:
        x_skip = jnp.pad(
            x_skip,
            ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)))
    return jnp.concatenate([x_up, x_skip], axis=-1)


class _ResLayer(nn.Module):
    """A stack of BasicBlocks; the first may stride/downsample."""
    planes: int
    blocks: int
    stride: int = 1
    in_planes: int = 0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        needs_down = self.stride != 1 or self.in_planes != self.planes
        x = BasicBlock(self.planes, self.stride, needs_down,
                       dtype=self.dtype, name="block0")(x)
        for i in range(1, self.blocks):
            x = BasicBlock(self.planes, 1, False, dtype=self.dtype,
                           name=f"block{i}")(x)
        return x


class ResUNetLight(nn.Module):
    """ResNet encoder + light upconv decoder; output at 1/4 input res.

    The renderer's image encoder uses layers=(1,2,6,4), out_dim=32,
    inplanes=16 (reference renderer.py:58); the cost-volume init net uses
    the (2,3,6,3)/inplanes=32 default (reference init_net.py:224).
    """
    in_dim: int = 3
    layers: Sequence[int] = (2, 3, 6, 3)
    out_dim: int = 32
    inplanes: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = ReflectConv(self.inplanes, (7, 7), (2, 2), padding=3, dtype=dt,
                        name="conv1")(x)
        x = InstanceNorm(self.inplanes, name="bn1")(x)
        x = nn.relu(x)

        x1 = _ResLayer(32, self.layers[0], 2, self.inplanes, dt,
                       name="layer1")(x)
        x2 = _ResLayer(64, self.layers[1], 2, 32, dt, name="layer2")(x1)
        x3 = _ResLayer(128, self.layers[2], 2, 64, dt, name="layer3")(x2)

        y = UpConv(64, 3, dtype=dt, name="upconv3")(x3)
        y = _skip_pad_concat(y, x2)
        y = ConvELU(64, 3, 1, dtype=dt, name="iconv3")(y)

        y = UpConv(32, 3, dtype=dt, name="upconv2")(y)
        y = _skip_pad_concat(y, x1)
        y = ConvELU(32, 3, 1, dtype=dt, name="iconv2")(y)

        return nn.Conv(self.out_dim, (1, 1), padding="VALID", use_bias=True,
                       dtype=dt, name="out_conv")(y)


class ResEncoder(nn.Module):
    """12-channel input encoder for the depth init net.

    Parity: reference ops.py:232-319 (conv1 is 8x8 stride 2 pad 2, filters
    (32, 64, 128), layers (2,2,2), 32-ch output at 1/4 input resolution).
    """
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = ReflectConv(32, (8, 8), (2, 2), padding=2, dtype=dt,
                        name="conv1")(x)
        x = InstanceNorm(32, name="bn1")(x)
        x = nn.relu(x)

        x1 = _ResLayer(32, 2, 2, 32, dt, name="layer1")(x)
        x2 = _ResLayer(64, 2, 2, 32, dt, name="layer2")(x1)
        x3 = _ResLayer(128, 2, 2, 64, dt, name="layer3")(x2)

        y = UpConv(64, 3, dtype=dt, name="upconv3")(x3)
        y = _skip_pad_concat(y, x2)
        y = ConvELU(64, 3, 1, dtype=dt, name="iconv3")(y)

        y = UpConv(32, 3, dtype=dt, name="upconv2")(y)
        y = _skip_pad_concat(y, x1)
        y = ConvELU(32, 3, 1, dtype=dt, name="iconv2")(y)

        return nn.Conv(32, (1, 1), padding="VALID", use_bias=True, dtype=dt,
                       name="out_conv")(y)
