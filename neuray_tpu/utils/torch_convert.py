"""Convert reference PyTorch checkpoints into neuray_tpu flax params.

The reference saves {'network_state_dict': ...} from NeuralRayGenRenderer
(reference train/trainer.py:180-187). This module maps those state_dict
names onto our flax param tree so the pretrained NeuRay-Depth /
NeuRay-CostVolume checkpoints drive the TPU renderer for PSNR parity.

Layout conversions: torch Conv2d [out,in,kh,kw] -> flax [kh,kw,in,out];
Linear [out,in] -> [in,out]; InstanceNorm/LayerNorm weight->scale.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv(w):
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _lin(w):
    return np.transpose(np.asarray(w, np.float32), (1, 0))


def _arr(w):
    return np.asarray(w, np.float32)


class _Mapper:
    def __init__(self, sd: Dict[str, Any]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()

    def take(self, key):
        self.used.add(key)
        return self.sd[key]

    def conv(self, key):
        out = {"kernel": _conv(self.take(f"{key}.weight"))}
        if f"{key}.bias" in self.sd:
            out["bias"] = _arr(self.take(f"{key}.bias"))
        return out

    def lin(self, key):
        out = {"kernel": _lin(self.take(f"{key}.weight"))}
        if f"{key}.bias" in self.sd:
            out["bias"] = _arr(self.take(f"{key}.bias"))
        return out

    def norm(self, key):
        return {"scale": _arr(self.take(f"{key}.weight")),
                "bias": _arr(self.take(f"{key}.bias"))}

    # ---- composite blocks ----

    def reflect_conv(self, key):
        return {"Conv_0": self.conv(key)}

    def basic_block(self, key, has_down):
        out = {"conv1": self.reflect_conv(f"{key}.conv1"),
               "bn1": self.norm(f"{key}.bn1"),
               "conv2": self.reflect_conv(f"{key}.conv2"),
               "bn2": self.norm(f"{key}.bn2")}
        if has_down:
            out["down_conv"] = self.conv(f"{key}.downsample.0")
            out["down_norm"] = self.norm(f"{key}.downsample.1")
        return out

    def res_layer(self, key, blocks):
        out = {}
        for i in range(blocks):
            has_down = (i == 0 and
                        f"{key}.{i}.downsample.0.weight" in self.sd)
            out[f"block{i}"] = self.basic_block(f"{key}.{i}", has_down)
        return out

    def conv_elu(self, key):
        # reference 'conv' module: .conv (Conv2d) + .bn (InstanceNorm)
        return {"conv": self.reflect_conv(f"{key}.conv"),
                "bn": self.norm(f"{key}.bn")}

    def upconv(self, key):
        return {"conv": self.conv_elu(f"{key}.conv")}

    def resunet(self, key, layers):
        return {
            "conv1": self.reflect_conv(f"{key}.conv1"),
            "bn1": self.norm(f"{key}.bn1"),
            "layer1": self.res_layer(f"{key}.layer1", layers[0]),
            "layer2": self.res_layer(f"{key}.layer2", layers[1]),
            "layer3": self.res_layer(f"{key}.layer3", layers[2]),
            "upconv3": self.upconv(f"{key}.upconv3"),
            "iconv3": self.conv_elu(f"{key}.iconv3"),
            "upconv2": self.upconv(f"{key}.upconv2"),
            "iconv2": self.conv_elu(f"{key}.iconv2"),
            "out_conv": self.conv(f"{key}.out_conv"),
        }

    def residual_block(self, key):
        # reference ResidualBlock.conv = Sequential(norm, relu, conv,
        # norm, relu, conv); optional short_cut
        out = {"norm1": self.norm(f"{key}.conv.0"),
               "conv1": self.reflect_conv(f"{key}.conv.2"),
               "norm2": self.norm(f"{key}.conv.3"),
               "conv2": self.reflect_conv(f"{key}.conv.5")}
        if f"{key}.short_cut.weight" in self.sd:
            out["short_cut"] = self.conv(f"{key}.short_cut")
        return out

    def mlp_head(self, key, ids=(0, 2, 4)):
        return {f"fc{i}": self.lin(f"{key}.{li}")
                for i, li in enumerate(ids)}

    def dist_decoder(self, key, use_vis):
        out = {"mean_decoder": self.mlp_head(f"{key}.mean_decoder"),
               "var_decoder": self.mlp_head(f"{key}.var_decoder"),
               "aw_decoder": self.mlp_head(f"{key}.aw_decoder")}
        if use_vis:
            out["vis_decoder"] = self.mlp_head(f"{key}.vis_decoder")
        return out

    def mha(self, key):
        return {"w_qs": {"kernel": _lin(self.take(f"{key}.w_qs.weight"))},
                "w_ks": {"kernel": _lin(self.take(f"{key}.w_ks.weight"))},
                "w_vs": {"kernel": _lin(self.take(f"{key}.w_vs.weight"))},
                "fc": {"kernel": _lin(self.take(f"{key}.fc.weight"))},
                "layer_norm": self.norm(f"{key}.layer_norm")}

    def ibrnet(self, key):
        return {
            "ray_dir_fc": self.mlp_head(f"{key}.ray_dir_fc", (0, 2)),
            "base_fc": self.mlp_head(f"{key}.base_fc", (0, 2)),
            "vis_fc": self.mlp_head(f"{key}.vis_fc", (0, 2)),
            "vis_fc2": self.mlp_head(f"{key}.vis_fc2", (0, 2)),
            "geometry_fc": self.mlp_head(f"{key}.geometry_fc", (0, 2)),
            "ray_attention": self.mha(f"{key}.ray_attention"),
            "out_geometry_fc": self.mlp_head(
                f"{key}.out_geometry_fc", (0, 2)),
            "rgb_fc": self.mlp_head(f"{key}.rgb_fc", (0, 2, 4)),
            "neuray_fc": self.mlp_head(f"{key}.neuray_fc", (0, 2)),
        }

    def agg_net(self, key):
        return {"prob_embed_0": self.lin(f"{key}.prob_embed.0"),
                "prob_embed_1": self.lin(f"{key}.prob_embed.2"),
                "agg_impl": self.ibrnet(f"{key}.agg_impl")}

    def vis_encoder(self, key):
        return {"conv_in": self.reflect_conv(f"{key}.out_conv.0"),
                "res0": self.residual_block(f"{key}.out_conv.1"),
                "res1": self.residual_block(f"{key}.out_conv.2"),
                "conv_out": self.conv(f"{key}.out_conv.3")}

    def depth_init_net(self, key):
        return {"res_net": self.resunet(f"{key}.res_net", (2, 2, 2)),
                "depth_skip_0": self.conv(f"{key}.depth_skip.0"),
                "depth_skip_1": self.conv(f"{key}.depth_skip.2"),
                "conv_out": self.conv(f"{key}.conv_out")}

    def cost_volume_init_net(self, key):
        """Reference CostVolumeInitNet (reference init_net.py:205-254):
        frozen mvsnet.* + res_net (ResUNetLight defaults 2,3,6,3) +
        three conv3x3/ResidualBlock/conv1x1 Sequentials."""
        from neuray_tpu.utils.mvsnet_convert import (
            convert_mvsnet_state_dict)
        pre = f"{key}.mvsnet."
        mv_sd = {k[len(pre):]: self.sd[k]
                 for k in self.sd if k.startswith(pre)}
        self.used.update(k for k in self.sd if k.startswith(pre))

        def seq(skey, names):
            return {names[0]: self.reflect_conv(f"{skey}.0"),
                    names[1]: self.residual_block(f"{skey}.1"),
                    names[2]: self.conv(f"{skey}.2")}

        return {
            "mvsnet": convert_mvsnet_state_dict(mv_sd),
            "res_net": self.resunet(f"{key}.res_net", (2, 3, 6, 3)),
            **seq(f"{key}.volume_conv2d",
                  ("volume_conv_in", "volume_res", "volume_conv_out")),
            **seq(f"{key}.depth_conv",
                  ("depth_conv_in", "depth_res", "depth_conv_out")),
            **seq(f"{key}.out_conv",
                  ("out_conv_in", "out_res", "out_conv_out")),
        }


def convert_gen_state_dict(state_dict: Dict[str, Any],
                           use_hierarchical: bool = True,
                           use_vis: bool = False,
                           fine_use_vis: bool = False,
                           init_net_type: str = "depth") -> Dict[str, Any]:
    """Reference NeuralRayGenRenderer state_dict -> flax params dict
    matching NeurayRenderer's tree (cite: reference renderer.py:56-62)."""
    m = _Mapper(state_dict)
    params = {
        "image_encoder": m.resunet("image_encoder", (1, 2, 6, 4)),
        "vis_encoder": m.vis_encoder("vis_encoder"),
        "dist_decoder": m.dist_decoder("dist_decoder", use_vis),
        "agg_net": m.agg_net("agg_net"),
    }
    if init_net_type == "depth":
        params["init_net"] = m.depth_init_net("init_net")
    elif init_net_type == "cost_volume":
        params["init_net"] = m.cost_volume_init_net("init_net")
    if use_hierarchical:
        params["fine_dist_decoder"] = m.dist_decoder(
            "fine_dist_decoder", fine_use_vis)
        params["fine_agg_net"] = m.agg_net("fine_agg_net")
    return {"params": params}


def check_params_match(converted, template) -> list:
    """Return a list of mismatch strings between converted params and a
    template tree (from renderer.init); empty = exact structural match."""
    import jax
    problems = []
    flat_c = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    for k in flat_t:
        if k not in flat_c:
            problems.append(f"missing {jax.tree_util.keystr(k)}")
        elif tuple(flat_c[k].shape) != tuple(flat_t[k].shape):
            problems.append(
                f"shape {jax.tree_util.keystr(k)}: "
                f"{flat_c[k].shape} vs {flat_t[k].shape}")
    for k in flat_c:
        if k not in flat_t:
            problems.append(f"extra {jax.tree_util.keystr(k)}")
    return problems
