"""Training losses (pure jnp functions over renderer output dicts).

Parity: reference network/loss.py — RenderLoss (:46-77), DepthLoss
(:79-132), ConsistencyLoss (:18-44). Same cfg keys; the loss registry
keeps the reference names ('render', 'depth', 'consist').
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from neuray_tpu.ops.interpolate import grid_sample_nhwc


def _ray_mean(x, axis_name, weight=None):
    """Mean over the ray axis (1). With ``axis_name`` the ray axis is
    SHARDED over a device mesh: numerator and count psum over the mesh
    so every device holds the identical GLOBAL mean — the building
    block of the ray-sharded FT train step (models/ft.py).

    ``weight`` (qn,rn in {0,1}) drops padded rays from BOTH numerator
    and count, so a ray batch padded up to the device count yields the
    exact unpadded loss (models/ft.py make_sharded_train_step)."""
    if weight is None and axis_name is None:
        return jnp.mean(x, 1)
    w = jnp.ones_like(x) if weight is None else weight
    s = jnp.sum(x * w, 1)
    n = jnp.sum(w, 1)
    if axis_name is not None:
        import jax
        s = jax.lax.psum(s, axis_name)
        n = jax.lax.psum(n, axis_name)
    return s / n


def render_loss(cfg: Dict[str, Any], axis_name: str | None = None):
    use_ray_mask = cfg.get("use_ray_mask", True)
    use_dr = cfg.get("use_dr_loss", False)
    use_dr_fine = cfg.get("use_dr_fine_loss", False)
    use_nr_fine = cfg.get("use_nr_fine_loss", False)

    def fn(data_pr: Dict, data_gt: Dict) -> Dict[str, jnp.ndarray]:
        rgb_gt = data_pr["pixel_colors_gt"]
        weight = data_pr.get("ray_weight")                   # qn,rn or None

        def compute(rgb_pr):
            loss = jnp.sum((rgb_pr - rgb_gt) ** 2, -1)       # qn,rn
            if use_ray_mask:
                rm = data_pr["ray_mask"].astype(jnp.float32)
                if weight is not None:
                    rm = rm * weight
                num = jnp.sum(loss * rm, 1)
                den = jnp.sum(rm, 1)
                if axis_name is not None:
                    import jax
                    num = jax.lax.psum(num, axis_name)
                    den = jax.lax.psum(den, axis_name)
                return num / (den + 1e-3)
            return _ray_mean(loss, axis_name, weight)

        out = {"loss_rgb_nr": compute(data_pr["pixel_colors_nr"])}
        if use_dr:
            out["loss_rgb_dr"] = compute(data_pr["pixel_colors_dr"])
        if use_dr_fine:
            out["loss_rgb_dr_fine"] = compute(data_pr["pixel_colors_dr_fine"])
        if use_nr_fine:
            out["loss_rgb_nr_fine"] = compute(data_pr["pixel_colors_nr_fine"])
        return out

    return fn


def depth_loss(cfg: Dict[str, Any]):
    loss_type = cfg.get("depth_loss_type", "l2")
    beta = cfg.get("depth_loss_l1_beta", 0.05)
    correct_thresh = cfg.get("depth_correct_thresh", 0.02)

    def fn(data_pr: Dict, data_gt: Dict) -> Dict[str, jnp.ndarray]:
        ref = data_gt["ref"]
        if "true_depth" not in ref or ref["true_depth"] is None:
            return {"loss_depth": jnp.zeros([1], jnp.float32)}
        coords = data_pr["depth_coords"]                     # rfn,pn,2
        depth_pr = data_pr["depth_mean"]                     # rfn,pn
        depth_maps = ref["true_depth"]                       # rfn,h,w,1
        h, w = depth_maps.shape[1:3]
        depth_gt = grid_sample_nhwc(depth_maps, coords, h, w,
                                    "border", True)[..., 0]

        depth_range = ref["depth_range"]
        near = -1.0 / depth_range[:, 0:1]
        far = -1.0 / depth_range[:, 1:2]

        def process(d):
            d = jnp.maximum(d, 1e-5)
            d = -1.0 / d
            return jnp.clip((d - near) / (far - near), 0.0, 1.0)

        depth_gt = process(depth_gt)

        # gso scenes: only supervise where the augmented depth stayed
        # close to GT (reference loss.py:119-124). Signalled per-sample
        # via the is_gso flag so the loss stays jittable.
        is_gso = data_gt.get("is_gso")

        def compute(depth_pr):
            if loss_type == "l2":
                loss = (depth_gt - depth_pr) ** 2
            elif loss_type == "smooth_l1":
                diff = jnp.abs(depth_gt - depth_pr)
                loss = jnp.where(diff < beta,
                                 0.5 * diff ** 2 / beta, diff - 0.5 * beta)
            else:
                raise NotImplementedError(loss_type)
            if is_gso is not None and "depth" in ref and ref["depth"] is not None:
                depth_aug = grid_sample_nhwc(
                    ref["depth"], coords, h, w, "border", True)[..., 0]
                depth_aug = process(depth_aug)
                mask = (jnp.abs(depth_aug - depth_gt)
                        < correct_thresh).astype(jnp.float32)
                masked = (jnp.sum(loss * mask, 1)
                          / (jnp.sum(mask, 1) + 1e-4))
                plain = jnp.mean(loss, 1)
                return jnp.where(is_gso, masked, plain)
            return jnp.mean(loss, 1)

        out = {"loss_depth": compute(depth_pr)}
        if "depth_mean_fine" in data_pr:
            out["loss_depth_fine"] = compute(data_pr["depth_mean_fine"])
        return out

    return fn


def consistency_loss(cfg: Dict[str, Any], axis_name: str | None = None):
    use_ray_mask = cfg.get("use_ray_mask", False)

    def fn(data_pr: Dict, data_gt: Dict) -> Dict[str, jnp.ndarray]:
        if "hit_prob_self" not in data_pr:
            return {}
        weight = data_pr.get("ray_weight")

        def ce_loss(p0, p1):
            ce = (- p0 * jnp.log(p1 + 1e-5)
                  - (1 - p0) * jnp.log(1 - p1 + 1e-5))
            return _ray_mean(jnp.mean(ce, -1), axis_name, weight)

        import jax
        out = {"loss_prob": ce_loss(
            jax.lax.stop_gradient(data_pr["hit_prob_nr"]),
            data_pr["hit_prob_self"])}
        if "hit_prob_nr_fine" in data_pr:
            out["loss_prob_fine"] = ce_loss(
                jax.lax.stop_gradient(data_pr["hit_prob_nr_fine"]),
                data_pr["hit_prob_self_fine"])
        return out

    return fn


name2loss = {
    "render": render_loss,
    "depth": depth_loss,
    "consist": consistency_loss,
}


def build_losses(cfg: Dict[str, Any], axis_name: str | None = None):
    """Compose the configured losses into one fn(outputs, batch)->dict.

    axis_name: ray-sharded mode — render/consistency reductions over
    the ray axis psum over the named mesh axis, so per-device loss
    VALUES equal the single-device global values exactly (tested in
    tests/test_parallel.py). depth_loss normalizes over ref-view
    coords (replicated, not ray-sharded) and is unaffected."""
    def _make(name):
        if name in ("render", "consist"):
            return name2loss[name](cfg, axis_name=axis_name)
        return name2loss[name](cfg)

    fns = [_make(name) for name in cfg.get("loss", ["render"])]

    def fn(data_pr, data_gt):
        out = {}
        for f in fns:
            out.update(f(data_pr, data_gt))
        return out

    return fn
