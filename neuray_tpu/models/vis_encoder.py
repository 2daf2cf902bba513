"""Visibility-feature encoder G' -> G.

Parity: reference network/vis_encoder.py — conv stack over
concat(img_feats 32, ray_feats 32) producing the refined 32-ch
visibility feature map.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from neuray_tpu.models.blocks import ReflectConv, ResidualBlock


class DefaultVisEncoder(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, ray_feats, img_feats):
        """ray_feats, img_feats: [rfn, h, w, 32] -> [rfn, h, w, 32]."""
        x = jnp.concatenate([img_feats, ray_feats], axis=-1)
        x = ReflectConv(32, (3, 3), dtype=self.dtype, name="conv_in")(x)
        x = ResidualBlock(32, dtype=self.dtype, name="res0")(x)
        x = ResidualBlock(32, dtype=self.dtype, name="res1")(x)
        x = nn.Conv(32, (1, 1), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv_out")(x)
        return x


name2vis_encoder = {"default": DefaultVisEncoder}
