"""Flax building blocks shared by all neuray_tpu CNN components.

Channels-last (NHWC) everywhere — the TPU-native conv layout. Behavioral
parity targets live in reference network/ops.py (conv3x3 reflect padding,
InstanceNorm(affine, no running stats), BasicBlock, ResidualBlock,
conv/upconv with align_corners=True bilinear upsampling).

Convs run in bf16 on the MXU when ``dtype=jnp.bfloat16`` is threaded
through; normalization statistics are always computed in f32.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True, track_running_stats=False) parity.

    Normalizes each (sample, channel) plane over H, W. eps matches the
    torch default (1e-5). Stats in f32 regardless of activation dtype.
    """
    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(x.dtype)


class ReflectConv(nn.Module):
    """Conv2D with reflect padding (parity with padding_mode='reflect')."""
    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: int | tuple[int, int] | None = None  # default: (k-1)//2
    use_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        if self.padding is None:
            ph, pw = (kh - 1) // 2, (kw - 1) // 2
        elif isinstance(self.padding, int):
            ph = pw = self.padding
        else:
            ph, pw = self.padding
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                        mode="reflect")
        return nn.Conv(self.features, self.kernel_size, self.strides,
                       padding="VALID", use_bias=self.use_bias,
                       dtype=self.dtype)(x)


class BasicBlock(nn.Module):
    """ResNet BasicBlock with InstanceNorm (reference ops.py:86-123)."""
    planes: int
    stride: int = 1
    use_downsample: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = ReflectConv(self.planes, (3, 3), (self.stride, self.stride),
                          dtype=self.dtype, name="conv1")(x)
        out = InstanceNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = ReflectConv(self.planes, (3, 3), dtype=self.dtype,
                          name="conv2")(out)
        out = InstanceNorm(self.planes, name="bn2")(out)
        if self.use_downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               (self.stride, self.stride), padding="VALID",
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = InstanceNorm(self.planes, name="down_norm")(identity)
        return nn.relu(out + identity)


class ResidualBlock(nn.Module):
    """Pre-activation residual block (reference ops.py:43-76, use_norm)."""
    dim_out: int
    dim_inter: int | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dim_in = x.shape[-1]
        dim_inter = self.dim_inter or self.dim_out
        h = InstanceNorm(dim_in, name="norm1")(x)
        h = nn.relu(h)
        h = ReflectConv(dim_inter, (3, 3), padding=1, dtype=self.dtype,
                        name="conv1")(h)
        h = InstanceNorm(dim_inter, name="norm2")(h)
        h = nn.relu(h)
        h = ReflectConv(self.dim_out, (3, 3), padding=1, dtype=self.dtype,
                        name="conv2")(h)
        if dim_in != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), padding="VALID", use_bias=True,
                        dtype=self.dtype, name="short_cut")(x)
        return x + h


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample with align_corners=True semantics.

    (jax.image.resize implements the half-pixel convention, so we build the
    gather ourselves: out coord i maps to src i*(n-1)/(2n-1).)
    """
    n, h, w, c = x.shape

    def upsample_axis(arr, size_in, axis):
        size_out = size_in * 2
        pos = jnp.arange(size_out, dtype=jnp.float32)
        src = pos * (size_in - 1) / (size_out - 1)
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, size_in - 1)
        t = (src - i0).astype(arr.dtype)
        a0 = jnp.take(arr, i0, axis=axis)
        a1 = jnp.take(arr, i1, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = size_out
        t = t.reshape(shape)
        return a0 * (1 - t) + a1 * t

    x = upsample_axis(x, h, 1)
    x = upsample_axis(x, w, 2)
    return x


class ConvELU(nn.Module):
    """conv + InstanceNorm + ELU (reference ops.py:125-138 'conv')."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = ReflectConv(self.features, (self.kernel_size, self.kernel_size),
                        (self.stride, self.stride),
                        padding=(self.kernel_size - 1) // 2, use_bias=True,
                        dtype=self.dtype, name="conv")(x)
        x = InstanceNorm(self.features, name="bn")(x)
        return nn.elu(x)


class UpConv(nn.Module):
    """2x align-corners bilinear upsample + ConvELU (reference upconv)."""
    features: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = upsample2x_align_corners(x)
        return ConvELU(self.features, self.kernel_size, 1, dtype=self.dtype,
                       name="conv")(x)


