"""Aggregation network: embeds visibility probabilities and wraps
IBRNetWithNeuRay. Parity: reference network/aggregate_net.py.

Layout note (TPU): the projection dict arrives as [rfn, qn, rn, dn, f]
channels-last tensors and STAYS view-major ([rfn, qn*rn, dn, f]) all
the way through IBRNetWithNeuRay(view_major=True), which reduces views
over axis 0 — no [rfn,·,dn,f] -> [·,dn,rfn,f] transposes anywhere in
the per-chunk hot path (they cost real HBM round-trips at
[8, 1024, 64, 35..67] chunk shapes).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import flax.linen as nn

from neuray_tpu.models.ibrnet import IBRNetWithNeuRay


def get_dir_diff(prj_dir, que_dir, view_major: bool = False):
    """prj_dir [rfn,qn,rn,dn,3]; que_dir [qn,rn,dn,3] -> [qn*rn,dn,rfn,4]
    (or [rfn,qn*rn,dn,4] with view_major — no transpose)."""
    rfn, qn, rn, dn, _ = prj_dir.shape
    dir_diff = prj_dir - que_dir[None]
    dir_dot = jnp.sum(prj_dir * que_dir[None], axis=-1, keepdims=True)
    dir_diff = jnp.concatenate([dir_diff, dir_dot], axis=-1)  # rfn,qn,rn,dn,4
    dir_diff = dir_diff.reshape(rfn, qn * rn, dn, 4)
    return dir_diff if view_major else dir_diff.transpose(1, 2, 0, 3)


class DefaultAggregationNet(nn.Module):
    """cfg keys: sample_num=64, neuray_dim=32, use_img_feats=False."""
    cfg: Dict[str, Any]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, prj_dict, que_dir, pos_stride: int = 1, pos=None):
        """prj_dict fields [rfn,qn,rn,dn,*]: ray_feats, hit_prob, vis,
        rgb, dir, mask, img_feats; que_dir [qn,rn,dn,3].
        pos_stride: see IBRNetWithNeuRay — lets a reduced-sample probe
        pass reuse this net's params with faithful ray positions.
        pos: optional per-ray fractional table positions [qn,rn,dn]
        (probe-focused render; overrides pos_stride).
        Returns density [qn,rn,dn], colors [qn,rn,dn,3]."""
        dim = self.cfg.get("neuray_dim", 32)
        n_samples = self.cfg.get("sample_num", 64)

        hit_prob_val = (prj_dict["hit_prob"] - 0.5) * 2
        vis_val = (prj_dict["vis"] - 0.5) * 2
        prj_rgb = prj_dict["rgb"]
        prj_dir = prj_dict["dir"]
        prj_ray_feats = prj_dict["ray_feats"]
        rfn, qn, rn, dn, _ = hit_prob_val.shape

        prob_embedding = nn.Dense(dim, dtype=self.dtype, name="prob_embed_0")(
            jnp.concatenate([prj_ray_feats, hit_prob_val, vis_val], axis=-1))
        prob_embedding = nn.relu(prob_embedding)
        prob_embedding = nn.Dense(dim, dtype=self.dtype,
                                  name="prob_embed_1")(prob_embedding)

        # view-major throughout: everything stays [rfn, qn*rn, dn, f]
        # (the layout the projection/gather stage produces) and IBRNet
        # reduces views over axis 0 — skips three large per-chunk
        # transposes. Same math/params (ibrnet.py view_major).
        dir_diff = get_dir_diff(prj_dir, que_dir, view_major=True)
        valid_mask = prj_dict["mask"].reshape(rfn, qn * rn, dn, -1)
        prj_img_feats = jnp.concatenate([prj_rgb, prj_dict["img_feats"]], -1)
        prj_img_feats = prj_img_feats.reshape(rfn, qn * rn, dn, -1)
        prob_embedding = prob_embedding.reshape(rfn, qn * rn, dn, -1)

        if pos is not None:
            pos = pos.reshape(qn * rn, dn)
        outs = IBRNetWithNeuRay(dim, n_samples=n_samples, dtype=self.dtype,
                                view_major=True, name="agg_impl")(
            prj_img_feats, prob_embedding, dir_diff, valid_mask,
            pos_stride=pos_stride, pos=pos)
        colors = outs[..., :3]
        density = outs[..., 3]
        return density.reshape(qn, rn, dn), colors.reshape(qn, rn, dn, 3)


name2agg_net = {"default": DefaultAggregationNet}
