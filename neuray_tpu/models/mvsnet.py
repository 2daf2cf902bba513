"""MVSNet (plane-sweep stereo) for the cost-volume init net.

Parity: reference network/mvsnet/mvsnet.py (FeatureNet :7-27, CostRegNet
:29-69, construct_cost_volume_with_src :160-188) and modules.py
(homo_warp :25-64, depth_regression :66-71). The reference's InPlaceABN
is inference-frozen here, so it reduces to BatchNorm (running stats) +
leaky_relu(0.01) — implemented as FrozenBN below; the bundled
mvsnet_pl.ckpt statistics convert directly.

TPU notes: channels-last; the homography warp reuses the grid_sample
gather (align_corners=True, zeros padding); cost volumes build per ref
view under lax.scan to bound memory like the reference's batch_num loop.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from neuray_tpu.ops.interpolate import grid_sample_nhwc

_HI = jax.lax.Precision.HIGHEST


class FrozenBN(nn.Module):
    """Inference-mode BatchNorm + leaky_relu(0.01) (frozen InPlaceABN)."""
    features: int
    epsilon: float = 1e-5
    act: bool = True

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return nn.leaky_relu(y, 0.01) if self.act else y


class ConvBnReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride),
                    padding=self.pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return FrozenBN(self.features, name="bn")(x)


class ConvBnReLU3D(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel,) * 3, (self.stride,) * 3,
                    padding=self.pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return FrozenBN(self.features, name="bn")(x)


class FeatureNet(nn.Module):
    """2D CNN -> 32-ch features at 1/4 resolution."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = ConvBnReLU(8, 3, 1, 1, dt, name="conv0")(x)
        x = ConvBnReLU(8, 3, 1, 1, dt, name="conv1")(x)
        x = ConvBnReLU(16, 5, 2, 2, dt, name="conv2")(x)
        x = ConvBnReLU(16, 3, 1, 1, dt, name="conv3")(x)
        x = ConvBnReLU(16, 3, 1, 1, dt, name="conv4")(x)
        x = ConvBnReLU(32, 5, 2, 2, dt, name="conv5")(x)
        x = ConvBnReLU(32, 3, 1, 1, dt, name="conv6")(x)
        return nn.Conv(32, (3, 3), padding=1, use_bias=True, dtype=dt,
                       name="feature")(x)


class _DeconvBn(nn.Module):
    """ConvTranspose3d(k3, s2, p1, output_padding=1) + FrozenBN."""
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose3d(k3,s2,p1,op1) == flax VALID transposed
        # conv (transpose_kernel=True for grad-of-conv semantics) with
        # the full output cropped to [1 : 2*i+1] per spatial dim
        # (verified numerically against torch).
        d, h, w = x.shape[1:4]
        x = nn.ConvTranspose(self.features, (3, 3, 3), (2, 2, 2),
                             padding="VALID", use_bias=False,
                             transpose_kernel=True, dtype=self.dtype,
                             name="conv")(x)
        x = x[:, 1:2 * d + 1, 1:2 * h + 1, 1:2 * w + 1]
        return FrozenBN(self.features, name="bn")(x)


class CostRegNet(nn.Module):
    """3D-conv UNet over [n, dn, h, w, c] volumes -> 1-channel logits."""
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        conv0 = ConvBnReLU3D(8, dtype=dt, name="conv0")(x)
        conv2 = ConvBnReLU3D(16, dtype=dt, name="conv2")(
            ConvBnReLU3D(16, stride=2, dtype=dt, name="conv1")(conv0))
        conv4 = ConvBnReLU3D(32, dtype=dt, name="conv4")(
            ConvBnReLU3D(32, stride=2, dtype=dt, name="conv3")(conv2))
        x = ConvBnReLU3D(64, dtype=dt, name="conv6")(
            ConvBnReLU3D(64, stride=2, dtype=dt, name="conv5")(conv4))
        x = conv4 + _DeconvBn(32, dt, name="conv7")(x)
        x = conv2 + _DeconvBn(16, dt, name="conv9")(x)
        x = conv0 + _DeconvBn(8, dt, name="conv11")(x)
        return nn.Conv(1, (3, 3, 3), padding=1, use_bias=True, dtype=dt,
                       name="prob")(x)


def homo_warp(src_feat, src_proj, ref_proj_inv, depth_values):
    """Warp source features onto the ref view's depth planes.

    src_feat [n, h, w, c]; src_proj/ref_proj_inv [n, 4, 4];
    depth_values [n, dn] -> [n, dn, h, w, c]
    (parity: reference modules.py:25-64 — grid_sample zeros +
    align_corners=True, z clamped at 1e-4 un-signed).
    """
    n, h, w, c = src_feat.shape
    dn = depth_values.shape[1]
    transform = jnp.matmul(src_proj, ref_proj_inv, precision=_HI)
    R = transform[:, :3, :3]
    T = transform[:, :3, 3:]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], 0).reshape(3, h * w)
    # [n,3,dn,h*w]
    grid_d = grid[None, :, None, :] * depth_values[:, None, :, None]
    src = jnp.einsum("nij,njdp->nidp", R, grid_d, precision=_HI) \
        + T[:, :, :, None]
    z = src[:, 2]
    z = jnp.where(z < 1e-4, 1e-4, z)
    px = src[:, 0] / z
    py = src[:, 1] / z
    coords = jnp.stack([px, py], -1).reshape(n, dn * h * w, 2)
    warped = grid_sample_nhwc(src_feat, coords, h, w, "zeros", True)
    return warped.reshape(n, dn, h, w, c)


def depth_regression(prob, depth_values):
    """prob [n, dn, h, w]; depth_values [n, dn] -> [n, h, w]."""
    return jnp.sum(prob * depth_values[:, :, None, None], axis=1)


class MVSNet(nn.Module):
    """Feature extraction + per-ref-view cost volume regularization."""
    dtype: jnp.dtype | None = None

    def setup(self):
        self.feature = FeatureNet(dtype=self.dtype)
        self.cost_regularization = CostRegNet(dtype=self.dtype)

    def __call__(self, ref_imgs, src_imgs, nn_ids, ref_prjs, src_prjs,
                 depth_values):
        """construct_cost_volume_with_src (reference mvsnet.py:160-188).

        ref_imgs [rfn,h,w,3] (imagenet-normalized); src_imgs [srn,h,w,3];
        nn_ids [rfn,nn] (indices into src arrays); ref_prjs [rfn,4,4]
        (0.25-scaled); depth_values [rfn,dn] -> cost logits
        [rfn, dn, h/4, w/4].
        """
        ref_feats = self.feature(ref_imgs)        # rfn,h4,w4,32
        src_feats = self.feature(src_imgs)        # srn,h4,w4,32
        ref_prjs_inv = jnp.linalg.inv(ref_prjs)
        n_num = nn_ids.shape[1]

        def per_view(carry, inputs):
            ref_feat, prj_inv, ids, dvals = inputs
            vol_sum = jnp.broadcast_to(
                ref_feat[None], (depth_values.shape[1], *ref_feat.shape))
            vol_sq = vol_sum ** 2
            for ni in range(n_num):
                warp = homo_warp(
                    src_feats[ids[ni]][None], src_prjs[ids[ni]][None],
                    prj_inv[None], dvals[None])[0]   # dn,h4,w4,c
                vol_sum = vol_sum + warp
                vol_sq = vol_sq + warp ** 2
            var = vol_sq / (n_num + 1) - (vol_sum / (n_num + 1)) ** 2
            cost = self.cost_regularization(var[None])[0, ..., 0]  # dn,h4,w4
            return carry, cost

        # python loop: rfn is small and static (the reference chunks the
        # same way with batch_num, mvsnet.py:175); XLA unrolls it.
        costs = []
        for i in range(ref_feats.shape[0]):
            _, cost = per_view(None, (ref_feats[i], ref_prjs_inv[i],
                                      nn_ids[i], depth_values[i]))
            costs.append(cost)
        return jnp.stack(costs)                   # rfn,dn,h4,w4
