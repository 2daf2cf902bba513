"""Cost-volume init net: builds raw visibility features G' from a frozen
MVSNet plane-sweep cost volume.

Parity: reference network/init_net.py:103-254 (construct_project_matrix
:103-111, construct_cost_volume_with_src :113-160 incl. >=800px eval
resize, get_depth_vals :162-168, CostVolumeInitNet :205-254). The
MVSNet weights come from the reference's bundled mvsnet_pl.ckpt via
neuray_tpu.utils.mvsnet_convert and are frozen (stop_gradient).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from neuray_tpu.models.mvsnet import MVSNet, depth_regression
from neuray_tpu.models.resunet import ResUNetLight
from neuray_tpu.models.blocks import ReflectConv, ResidualBlock

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def construct_project_matrix(x_ratio, y_ratio, Ks, poses):
    """0.25-scaled [rfn,4,4] projection matrices (reference :103-111)."""
    rfn = Ks.shape[0]
    scale_m = jnp.diag(jnp.asarray([x_ratio, y_ratio, 1.0], jnp.float32))
    ref_prj = jnp.matmul(
        jnp.matmul(scale_m[None], Ks, precision=jax.lax.Precision.HIGHEST),
        poses, precision=jax.lax.Precision.HIGHEST)    # rfn,3,4
    pad = jnp.zeros((rfn, 1, 4), jnp.float32).at[:, :, 3].set(1.0)
    return jnp.concatenate([ref_prj, pad], axis=1)


def get_depth_vals(depth_range, dn: int):
    """Inverse-depth plane values, far pinned (reference :162-168)."""
    near, far = depth_range[:, 0], depth_range[:, 1]
    interval = (1 / far - 1 / near) / (dn - 1)
    ticks = jnp.arange(0, dn - 1, dtype=jnp.float32)
    vals = 1.0 / (1.0 / near[:, None] + ticks[None] * interval[:, None])
    return jnp.concatenate([vals, far[:, None]], axis=1)


def _resize_bilinear(x, h, w):
    """F.interpolate(mode='bilinear', align_corners=False) equivalent."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


class CostVolumeInitNet(nn.Module):
    """cfg: cost_volume_sn=64. Inputs need src views + nn_ids."""
    cfg: Dict[str, Any]
    dtype: jnp.dtype | None = None

    def setup(self):
        self.mvsnet = MVSNet(dtype=self.dtype)
        self.res_net = ResUNetLight(in_dim=3, layers=(2, 3, 6, 3),
                                    out_dim=32, inplanes=32,
                                    dtype=self.dtype)
        sn = self.cfg.get("cost_volume_sn", 64)
        self.volume_conv_in = ReflectConv(32, (3, 3), dtype=self.dtype)
        self.volume_res = ResidualBlock(32, dtype=self.dtype)
        self.volume_conv_out = nn.Conv(32, (1, 1), padding="VALID",
                                       use_bias=False, dtype=self.dtype)
        self.depth_conv_in = ReflectConv(32, (3, 3), dtype=self.dtype)
        self.depth_res = ResidualBlock(32, dtype=self.dtype)
        self.depth_conv_out = nn.Conv(32, (1, 1), padding="VALID",
                                      use_bias=False, dtype=self.dtype)
        self.out_conv_in = ReflectConv(32, (3, 3), dtype=self.dtype)
        self.out_res = ResidualBlock(32, dtype=self.dtype)
        self.out_conv_out = nn.Conv(32, (1, 1), padding="VALID",
                                    use_bias=False, dtype=self.dtype)

    def build_cost_volume(self, ref, src, is_train: bool):
        """(reference :113-160) -> (prob volume [rfn,sn,h4,w4],
        depth [rfn,h4,w4])."""
        sn = self.cfg.get("cost_volume_sn", 64)
        ref_imgs, src_imgs = ref["imgs"], src["imgs"]
        rfn, h, w, _ = ref_imgs.shape
        ratio = 1.0
        ref_, src_ = ref_imgs, src_imgs
        if not is_train and max(h, w) >= 800:
            if (h, w) == (768, 1024):
                ref_ = _resize_bilinear(ref_imgs, 576, 768)
                src_ = _resize_bilinear(src_imgs, 576, 768)
                ratio = 576 / 768
            elif (h, w) == (800, 800):
                ref_ = _resize_bilinear(ref_imgs, 640, 640)
                src_ = _resize_bilinear(src_imgs, 640, 640)
                ratio = 640 / 800

        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        ref_prj = construct_project_matrix(
            0.25 * ratio, 0.25 * ratio, ref["Ks"], ref["poses"])
        src_prj = construct_project_matrix(
            0.25 * ratio, 0.25 * ratio, src["Ks"], src["poses"])
        depth_vals = get_depth_vals(ref["depth_range"], sn)

        cost_reg = self.mvsnet(
            (ref_ - mean) / std, (src_ - mean) / std, ref["nn_ids"],
            ref_prj, src_prj, depth_vals)            # rfn,sn,h4',w4'
        cost_reg = jax.lax.stop_gradient(
            jnp.nan_to_num(cost_reg, nan=0.0))
        if ratio != 1.0:
            # back to h/4, w/4 (resize over the trailing spatial dims)
            cost_reg = jax.image.resize(
                cost_reg, (rfn, sn, h // 4, w // 4), "bilinear")
        prob = jax.nn.softmax(cost_reg, axis=1)
        depth = depth_regression(prob, depth_vals)   # rfn,h4,w4
        return prob, depth

    def __call__(self, ref, src, is_train: bool = False):
        """ref/src imgs_info dicts (ref carries nn_ids) -> G'
        [rfn, h/4, w/4, 32] (reference :247-254)."""
        from neuray_tpu.models.init_net import extract_depth_for_init
        prob, depth = self.build_cost_volume(ref, src, is_train)
        ref_feats = self.res_net(ref["imgs"])        # rfn,h4,w4,32

        volume = jnp.transpose(prob, (0, 2, 3, 1))   # rfn,h4,w4,sn
        volume = self.volume_conv_out(
            self.volume_res(self.volume_conv_in(volume)))

        depth_n = extract_depth_for_init(
            ref["depth_range"], depth[..., None])
        depth_feats = self.depth_conv_out(
            self.depth_res(self.depth_conv_in(depth_n)))

        volume_feats = jnp.concatenate([volume, depth_feats], -1)
        x = jnp.concatenate([ref_feats, volume_feats], -1)
        return self.out_conv_out(self.out_res(self.out_conv_in(x)))
