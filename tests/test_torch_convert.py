"""Checkpoint-converter test: build torch modules with the reference's
exact attribute naming (state_dict keys), convert, and check the result
structurally matches the flax template from renderer.init."""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from neuray_tpu.models.renderer import NeurayRenderer, RenderConfig
from neuray_tpu.utils.torch_convert import (
    convert_gen_state_dict, check_params_match)
from neuray_tpu.data.synthetic import make_sphere_scene, make_query


def conv3x3(i, o, s=1):
    return nn.Conv2d(i, o, 3, s, 1, bias=False)


def conv1x1(i, o, s=1):
    return nn.Conv2d(i, o, 1, s, bias=False)


def norm(d):
    return nn.InstanceNorm2d(d, track_running_stats=False, affine=True)


class BasicBlock(nn.Module):
    def __init__(self, inp, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = conv3x3(inp, planes, stride)
        self.bn1 = norm(planes)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = norm(planes)
        self.downsample = downsample


def make_layer(inp, planes, blocks, stride):
    downsample = None
    if stride != 1 or inp != planes:
        downsample = nn.Sequential(conv1x1(inp, planes, stride),
                                   norm(planes))
    layers = [BasicBlock(inp, planes, stride, downsample)]
    for _ in range(1, blocks):
        layers.append(BasicBlock(planes, planes))
    return nn.Sequential(*layers)


class ConvT(nn.Module):
    def __init__(self, i, o, k):
        super().__init__()
        self.conv = nn.Conv2d(i, o, k, 1, (k - 1) // 2)
        self.bn = norm(o)


class UpConvT(nn.Module):
    def __init__(self, i, o, k):
        super().__init__()
        self.conv = ConvT(i, o, k)


class ResUNetT(nn.Module):
    def __init__(self, in_dim, layers, out_dim, inplanes, k1=7):
        super().__init__()
        self.conv1 = nn.Conv2d(in_dim, inplanes, k1, 2, 3 if k1 == 7 else 2,
                               bias=False)
        self.bn1 = norm(inplanes)
        self.layer1 = make_layer(inplanes, 32, layers[0], 2)
        self.layer2 = make_layer(32, 64, layers[1], 2)
        self.layer3 = make_layer(64, 128, layers[2], 2)
        self.upconv3 = UpConvT(128, 64, 3)
        self.iconv3 = ConvT(128, 64, 3)
        self.upconv2 = UpConvT(64, 32, 3)
        self.iconv2 = ConvT(64, 32, 3)
        self.out_conv = nn.Conv2d(32, out_dim, 1, 1)


class ResidualBlockT(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.conv = nn.Sequential(
            norm(d), nn.ReLU(True), nn.Conv2d(d, d, 3, 1, 1, bias=False),
            norm(d), nn.ReLU(True), nn.Conv2d(d, d, 3, 1, 1, bias=False))


class VisEncoderT(nn.Module):
    def __init__(self):
        super().__init__()
        self.out_conv = nn.Sequential(
            conv3x3(64, 32), ResidualBlockT(32), ResidualBlockT(32),
            conv1x1(32, 32))


def mlp(i, h, o, n_hidden=2):
    mods = [nn.Linear(i, h), nn.ELU(), nn.Linear(h, h), nn.ELU(),
            nn.Linear(h, o)]
    return nn.Sequential(*mods)


class DistDecoderT(nn.Module):
    def __init__(self, use_vis=False):
        super().__init__()
        self.mean_decoder = mlp(32, 32, 2)
        self.var_decoder = mlp(32, 32, 2)
        self.aw_decoder = mlp(32, 32, 1)
        if use_vis:
            self.vis_decoder = mlp(32, 32, 1)


def seq2(i, h, o):
    return nn.Sequential(nn.Linear(i, h), nn.ELU(), nn.Linear(h, o))


class MHAT(nn.Module):
    def __init__(self, n_head=4, d_model=16, d_k=4, d_v=4):
        super().__init__()
        self.w_qs = nn.Linear(d_model, n_head * d_k, bias=False)
        self.w_ks = nn.Linear(d_model, n_head * d_k, bias=False)
        self.w_vs = nn.Linear(d_model, n_head * d_v, bias=False)
        self.fc = nn.Linear(n_head * d_v, d_model, bias=False)
        self.layer_norm = nn.LayerNorm(d_model, eps=1e-6)


class IBRNetT(nn.Module):
    def __init__(self, neuray_in_dim=32, in_feat_ch=32):
        super().__init__()
        self.ray_dir_fc = seq2(4, 16, in_feat_ch + 3)
        self.base_fc = seq2((in_feat_ch + 3) * 5 + neuray_in_dim, 64, 32)
        self.vis_fc = seq2(32, 32, 33)
        self.vis_fc2 = seq2(32, 32, 1)
        self.geometry_fc = seq2(32 * 2 + 1, 64, 16)
        self.ray_attention = MHAT()
        self.out_geometry_fc = seq2(16, 16, 1)
        self.rgb_fc = nn.Sequential(nn.Linear(32 + 1 + 4, 16), nn.ELU(),
                                    nn.Linear(16, 8), nn.ELU(),
                                    nn.Linear(8, 1))
        self.neuray_fc = seq2(neuray_in_dim, 8, 1)


class AggNetT(nn.Module):
    def __init__(self):
        super().__init__()
        self.agg_impl = IBRNetT()
        self.prob_embed = nn.Sequential(
            nn.Linear(2 + 32, 32), nn.ReLU(), nn.Linear(32, 32))


class DepthInitNetT(nn.Module):
    def __init__(self):
        super().__init__()
        self.res_net = ResUNetT(12, (2, 2, 2), 32, 32, k1=8)
        self.depth_skip = nn.Sequential(
            nn.Conv2d(1, 8, 2, 2), nn.ReLU(True), nn.Conv2d(8, 16, 2, 2))
        self.conv_out = nn.Conv2d(48, 32, 1, 1)


class GenRendererT(nn.Module):
    def __init__(self):
        super().__init__()
        self.vis_encoder = VisEncoderT()
        self.dist_decoder = DistDecoderT(False)
        self.image_encoder = ResUNetT(3, (1, 2, 6, 4), 32, 16)
        self.agg_net = AggNetT()
        self.fine_dist_decoder = DistDecoderT(False)
        self.fine_agg_net = AggNetT()
        self.init_net = DepthInitNetT()


@pytest.mark.parametrize("seed", [0])
def test_convert_matches_template(seed):
    torch.manual_seed(seed)
    ref_model = GenRendererT()
    sd = ref_model.state_dict()

    converted = convert_gen_state_dict(sd, use_hierarchical=True,
                                       use_vis=False, fine_use_vis=False)

    cfg = RenderConfig(use_hierarchical_sampling=True, depth_sample_num=8,
                       fine_depth_sample_num=8, ray_batch_num=16,
                       use_vis=False, fine_use_vis=False)
    renderer = NeurayRenderer(cfg)
    rng = np.random.RandomState(0)
    ref = jax.tree.map(jnp.asarray, make_sphere_scene(rng, 3, 32, 32))
    que = jax.tree.map(jnp.asarray, make_query(rng, 32, 32, 8))
    template = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, que, True)

    problems = check_params_match(converted, template)
    assert not problems, "\n".join(problems[:20])

    # converted weights actually drive the renderer
    out = renderer.apply(
        jax.tree.map(jnp.asarray, converted), ref, que, False)
    assert np.isfinite(np.asarray(out["pixel_colors_nr_fine"])).all()
