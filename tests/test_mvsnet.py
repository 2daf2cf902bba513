"""MVSNet parity tests: the flax FeatureNet/CostRegNet with the
reference's bundled pretrained weights must match a torch mirror
(BN+leaky_relu(0.01) = frozen InPlaceABN) on random inputs."""
import os

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

CKPT = "/root/reference/network/mvsnet/mvsnet_pl.ckpt"
pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="bundled mvsnet ckpt not present")


class TorchConvBn2D(nn.Module):
    def __init__(self, i, o, k=3, s=1, p=1):
        super().__init__()
        self.conv = nn.Conv2d(i, o, k, s, p, bias=False)
        self.bn = nn.BatchNorm2d(o)

    def forward(self, x):
        return F.leaky_relu(self.bn(self.conv(x)), 0.01)


class TorchFeatureNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = TorchConvBn2D(3, 8, 3, 1, 1)
        self.conv1 = TorchConvBn2D(8, 8, 3, 1, 1)
        self.conv2 = TorchConvBn2D(8, 16, 5, 2, 2)
        self.conv3 = TorchConvBn2D(16, 16, 3, 1, 1)
        self.conv4 = TorchConvBn2D(16, 16, 3, 1, 1)
        self.conv5 = TorchConvBn2D(16, 32, 5, 2, 2)
        self.conv6 = TorchConvBn2D(32, 32, 3, 1, 1)
        self.feature = nn.Conv2d(32, 32, 3, 1, 1)

    def forward(self, x):
        x = self.conv1(self.conv0(x))
        x = self.conv4(self.conv3(self.conv2(x)))
        return self.feature(self.conv6(self.conv5(x)))


class TorchConvBn3D(nn.Module):
    def __init__(self, i, o, s=1):
        super().__init__()
        self.conv = nn.Conv3d(i, o, 3, s, 1, bias=False)
        self.bn = nn.BatchNorm3d(o)

    def forward(self, x):
        return F.leaky_relu(self.bn(self.conv(x)), 0.01)


class TorchDeconvBn(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.seq = nn.Sequential(
            nn.ConvTranspose3d(i, o, 3, 2, 1, output_padding=1,
                               bias=False),
            nn.BatchNorm3d(o))

    def forward(self, x):
        return F.leaky_relu(self.seq(x), 0.01)


class TorchCostRegNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = TorchConvBn3D(32, 8)
        self.conv1 = TorchConvBn3D(8, 16, 2)
        self.conv2 = TorchConvBn3D(16, 16)
        self.conv3 = TorchConvBn3D(16, 32, 2)
        self.conv4 = TorchConvBn3D(32, 32)
        self.conv5 = TorchConvBn3D(32, 64, 2)
        self.conv6 = TorchConvBn3D(64, 64)
        self.conv7 = TorchDeconvBn(64, 32)
        self.conv9 = TorchDeconvBn(32, 16)
        self.conv11 = TorchDeconvBn(16, 8)
        self.prob = nn.Conv3d(8, 1, 3, 1, 1)

    def forward(self, x):
        conv0 = self.conv0(x)
        conv2 = self.conv2(self.conv1(conv0))
        conv4 = self.conv4(self.conv3(conv2))
        x = self.conv6(self.conv5(conv4))
        x = conv4 + self.conv7(x)
        x = conv2 + self.conv9(x)
        x = conv0 + self.conv11(x)
        return self.prob(x)


def load_torch_weights(module, sd, prefix):
    own = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            key = k[len(prefix):]
            # sequential deconv naming: convN.0 -> convN.seq.0, etc.
            for i in (7, 9, 11):
                key = key.replace(f"conv{i}.0.", f"conv{i}.seq.0.")
                key = key.replace(f"conv{i}.1.", f"conv{i}.seq.1.")
            own[key] = torch.from_numpy(np.asarray(v))
    missing, unexpected = module.load_state_dict(own, strict=False)
    # BN num_batches_tracked are the only acceptable missing keys
    assert all("num_batches" in m for m in missing), missing
    assert not unexpected, unexpected


@pytest.fixture(scope="module")
def state_dict():
    ckpt = torch.load(CKPT, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {(k[6:] if k.startswith("model.") else k): v.numpy()
            for k, v in sd.items()}


def test_feature_net_parity(state_dict, rng):
    from neuray_tpu.models.mvsnet import FeatureNet
    from neuray_tpu.utils.mvsnet_convert import convert_mvsnet_state_dict
    params = convert_mvsnet_state_dict(state_dict)

    tnet = TorchFeatureNet().eval()
    load_torch_weights(tnet, state_dict, "feature.")

    x = rng.rand(2, 32, 40, 3).astype(np.float32)
    ours = np.asarray(FeatureNet().apply(
        {"params": params["feature"]}, jnp.asarray(x)))
    with torch.no_grad():
        oracle = tnet(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == oracle.shape == (2, 8, 10, 32)
    np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-4)


def test_cost_reg_net_parity(state_dict, rng):
    from neuray_tpu.models.mvsnet import CostRegNet
    from neuray_tpu.utils.mvsnet_convert import convert_mvsnet_state_dict
    params = convert_mvsnet_state_dict(state_dict)

    tnet = TorchCostRegNet().eval()
    load_torch_weights(tnet, state_dict, "cost_regularization.")

    x = rng.rand(1, 8, 16, 16, 32).astype(np.float32)  # n,dn,h,w,c
    ours = np.asarray(CostRegNet().apply(
        {"params": params["cost_regularization"]}, jnp.asarray(x)))
    with torch.no_grad():
        oracle = tnet(torch.from_numpy(
            x.transpose(0, 4, 1, 2, 3))).numpy().transpose(0, 2, 3, 4, 1)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-3)


def test_homo_warp_matches_torch_grid_sample(rng):
    """homo_warp vs a torch re-derivation (grid_sample zeros +
    align_corners=True), reference modules.py:25-64."""
    from neuray_tpu.models.mvsnet import homo_warp
    n, h, w, c, dn = 1, 12, 16, 4, 5
    src_feat = rng.rand(n, h, w, c).astype(np.float32)
    # mild random projective transforms near identity
    src_proj = np.tile(np.eye(4, dtype=np.float32)[None], (n, 1, 1))
    src_proj[:, :3, :] += rng.randn(n, 3, 4).astype(np.float32) * 0.05
    ref_proj_inv = np.tile(np.eye(4, dtype=np.float32)[None], (n, 1, 1))
    depth_values = np.linspace(1, 4, dn, dtype=np.float32)[None]

    ours = np.asarray(homo_warp(
        jnp.asarray(src_feat), jnp.asarray(src_proj),
        jnp.asarray(ref_proj_inv), jnp.asarray(depth_values)))

    # torch oracle
    transform = src_proj @ ref_proj_inv
    R, T = transform[:, :3, :3], transform[:, :3, 3:]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    grid = np.stack([xs, ys, np.ones_like(xs)], 0).reshape(3, -1)
    grid_d = grid[None, :, None, :] * depth_values[:, None, :, None]
    src = R @ grid_d.reshape(n, 3, -1) + T
    z = np.where(src[:, 2] < 1e-4, 1e-4, src[:, 2])
    gx = (src[:, 0] / z) / ((w - 1) / 2) - 1
    gy = (src[:, 1] / z) / ((h - 1) / 2) - 1
    g = torch.from_numpy(np.stack([gx, gy], -1).reshape(
        n, dn, h * w, 2).astype(np.float32))
    oracle = torch.nn.functional.grid_sample(
        torch.from_numpy(src_feat.transpose(0, 3, 1, 2)),
        g.view(n, dn * h, w, 2) if False else g.reshape(n, dn * h * w, 1, 2),
        mode="bilinear", padding_mode="zeros", align_corners=True)
    oracle = oracle.numpy().reshape(n, c, dn, h, w).transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)
