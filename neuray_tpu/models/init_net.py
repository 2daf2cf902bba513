"""Init networks: build raw visibility features G' per reference view.

DepthInitNet (parity: reference network/init_net.py:13-101): normalizes
estimated (COLMAP) depth into [0,1] inverse depth, computes cross-view
rgb/depth consistency features by unprojecting each view's depth map and
re-projecting into all views, then encodes [imgs(3), depth(1), diff(8)]
with a ResEncoder plus a strided depth skip path.

CostVolumeInitNet lives in models/cost_volume.py (MVSNet-based).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from neuray_tpu.models.resunet import ResEncoder
from neuray_tpu.ops.geometry import project_points_ref_views, pose_inverse
from neuray_tpu.ops.interpolate import grid_sample_nhwc, masked_mean_var

_HI = jax.lax.Precision.HIGHEST


def extract_depth_for_init(depth_range, depth):
    """Normalize metric depth to [0,1] inverse depth.

    depth_range [rfn,2]; depth [rfn,h,w,1] -> [rfn,h,w,1]
    (parity: init_net.py:63-74).
    """
    near = depth_range[:, 0][:, None, None, None]
    far = depth_range[:, 1][:, None, None, None]
    near_inv, far_inv = -1.0 / near, -1.0 / far
    depth = jnp.maximum(depth, 1e-5)
    depth = -1.0 / depth
    depth = (depth - near_inv) / (far_inv - near_inv)
    return jnp.clip(depth, 0.0, 1.0)


def depth2pts3d(depth, Ks, poses):
    """Unproject per-pixel depth to world points.

    depth [rfn,h,w,1]; Ks [rfn,3,3]; poses [rfn,3,4] -> [rfn, h*w, 3]
    (parity: init_net.py:13-27 with dn=1).
    """
    rfn, h, w, _ = depth.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    grid_x, grid_y = jnp.meshgrid(xs, ys)                    # h,w
    homog = jnp.stack([grid_x, grid_y, jnp.ones_like(grid_x)], -1)  # h,w,3
    pts = depth * homog[None]                                # rfn,h,w,3
    pts = pts.reshape(rfn, h * w, 3)
    Ks_inv = jnp.linalg.inv(Ks)
    inv_poses = pose_inverse(poses)                          # rfn,3,4
    cam_pts = jnp.einsum("vij,vpj->vpi", Ks_inv, pts, precision=_HI)
    world = jnp.einsum("vij,vpj->vpi", inv_poses[:, :, :3], cam_pts,
                       precision=_HI) + inv_poses[:, :, 3][:, None, :]
    return world


def get_diff_feats(imgs, depth_norm, depth_range, poses, Ks):
    """Cross-view rgb/depth consistency features.

    imgs [rfn,h,w,3]; depth_norm [rfn,h,w,1] (normalized inverse depth);
    depth_range [rfn,2]; -> [rfn,h,w,8]
    (parity: init_net.py:29-61).
    """
    rfn, h, w, _ = imgs.shape
    near = depth_range[:, 0][:, None, None, None]
    far = depth_range[:, 1][:, None, None, None]
    near_inv, far_inv = -1.0 / near, -1.0 / far
    depth = -1.0 / (depth_norm * (far_inv - near_inv) + near_inv)

    pts3d = depth2pts3d(depth, Ks, poses)                    # rfn,h*w,3
    _, pts2d, pts_dpt_prj, valid_mask = project_points_ref_views(
        poses, Ks, h, w, pts3d.reshape(-1, 3))               # rfn, rfn*h*w
    # rfn^2*h*w points x 2 maps x 4 taps is the training-step hot spot;
    # quad-pack depth+rgb into one map -> ONE gather (8x fewer taps).
    # Everything here is a pure function of the input data (no params
    # upstream), so no gradients flow through these gathers.
    from neuray_tpu.ops.interpolate import (
        make_quad_map, gather_bilinear_quad)
    quad = make_quad_map(jnp.concatenate([depth, imgs], axis=-1))
    tap = gather_bilinear_quad(quad, pts2d, h, w, True)
    pts_dpt_int, pts_rgb_int = tap[..., :1], tap[..., 1:]

    rgb_diff = jnp.abs(pts_rgb_int - imgs.reshape(1, rfn * h * w, 3))

    pts_dpt_int = jnp.maximum(pts_dpt_int, 1e-5)
    pts_dpt_prj = jnp.maximum(pts_dpt_prj, 1e-5)
    dpt_diff = jnp.abs(-1.0 / pts_dpt_int + 1.0 / pts_dpt_prj)
    dpt_diff = dpt_diff / (far_inv[..., 0, 0] - near_inv[..., 0, 0])[:, None]
    dpt_diff = jnp.minimum(dpt_diff, 1.5)

    vm = valid_mask.astype(jnp.float32)[..., None]
    dpt_mean, dpt_var = masked_mean_var(dpt_diff, vm, 0)     # 1,rfn*h*w,1
    rgb_mean, rgb_var = masked_mean_var(rgb_diff, vm, 0)     # 1,rfn*h*w,3
    out = jnp.concatenate([rgb_mean, rgb_var, dpt_mean, dpt_var], -1)
    # pure data function — make sure no backward graph is carried
    return jax.lax.stop_gradient(out.reshape(rfn, h, w, 8))


class DepthInitNet(nn.Module):
    cfg: Dict[str, Any]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, ref, src=None, is_train: bool = False):
        """ref imgs_info dict with imgs [rfn,h,w,3] and estimated metric
        depth [rfn,h,w,1] -> G' [rfn, h/4, w/4, 32].

        cfg["diff_scale"] (eval knob, default 1): compute the
        cross-view diff features on a 1/s-subsampled pixel grid and
        bilinearly upsample back — the diff gather is rfn^2*h*w taps,
        the dominant cost of the scene encode at bench shapes
        (tools/profile_encode.py), while the diff signal feeds a /4-res
        output; s=2 cuts those taps 4x. s=1 is exact reference parity
        (init_net.py:29-61)."""
        imgs, depth = ref["imgs"], ref["depth"]
        depth_range, poses, Ks = ref["depth_range"], ref["poses"], ref["Ks"]
        depth_n = extract_depth_for_init(depth_range, depth)
        s = int(self.cfg.get("diff_scale", 1))
        if s > 1:
            # subsampled pixel i maps to original s*i: K' = diag(1/s,1/s,1) K
            scale = jnp.asarray([1.0 / s, 1.0 / s, 1.0],
                                jnp.float32)[:, None]
            Ks_s = Ks * scale[None]
            diff_s = get_diff_feats(
                imgs[:, ::s, ::s], depth_n[:, ::s, ::s], depth_range,
                poses, Ks_s)
            rfn, h, w, _ = imgs.shape
            # corner-aligned upsample: subgrid pixel i sits at ORIGINAL
            # pixel s*i, so output o samples input o/s (translation 0).
            # jax.image.resize's half-pixel-center convention would
            # shift every feature by ~0.5 original pixels.
            diff = jax.image.scale_and_translate(
                diff_s, (rfn, h, w, diff_s.shape[-1]), (1, 2),
                scale=jnp.asarray([float(s), float(s)]),
                translation=jnp.asarray([0.0, 0.0]), method="linear")
        else:
            diff = get_diff_feats(imgs, depth_n, depth_range, poses, Ks)
        feats = ResEncoder(dtype=self.dtype, name="res_net")(
            jnp.concatenate([imgs, depth_n, diff], axis=-1))
        skip = nn.Conv(8, (2, 2), (2, 2), padding="VALID", use_bias=True,
                       dtype=self.dtype, name="depth_skip_0")(depth_n)
        skip = nn.relu(skip)
        skip = nn.Conv(16, (2, 2), (2, 2), padding="VALID", use_bias=True,
                       dtype=self.dtype, name="depth_skip_1")(skip)
        out = nn.Conv(32, (1, 1), padding="VALID", use_bias=True,
                      dtype=self.dtype, name="conv_out")(
            jnp.concatenate([skip, feats], axis=-1))
        return out


def _cost_volume_init_net(cfg, **kwargs):
    from neuray_tpu.models.cost_volume import CostVolumeInitNet
    return CostVolumeInitNet(cfg, **kwargs)


name2init_net = {"depth": DepthInitNet,
                 "cost_volume": _cost_volume_init_net}
