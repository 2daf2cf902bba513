"""Mixture-of-logistics visibility/occlusion math — the NeuRay core.

Each reference ray models its surface-hit distribution over normalized
inverse depth as a 2-component mixture of logistics. From the per-point
decoded (mean, var, vis, aw) parameters we compute, for a query sample's
[near, far) interval on that reference ray:
    visibility = 1 - CDF(near)
    hit_prob   = CDF(far) - CDF(near)
    alpha logit = log(hit / (vis - hit + eps) + eps)
with CDF(x) = 0.5 + 0.5*tanh((x - mean) * var), optionally scaled by an
opaqueness factor ``vis``.

Behavioral parity: reference network/dist_decoder.py:6-51 (intervals) and
:109-144 (compute_prob / decode_alpha_value).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def get_near_far_points(depth: jnp.ndarray, interval: jnp.ndarray,
                        depth_range: jnp.ndarray, is_ref: bool,
                        fixed_interval: bool = False,
                        fixed_interval_val: float = 0.01):
    """Per-sample [near, far) intervals in normalized inverse depth.

    is_ref=True:  depth [rfn, qn, rn, dn] (projected z-depth in each ref
                  view), interval [1, qn, rn, dn], depth_range [rfn, 2].
    is_ref=False: depth [qn, rn, dn] (query-ray samples), interval
                  [qn, rn, dn], depth_range [qn, 2].
    """
    if is_ref:
        near = (-1.0 / depth_range[:, 0])[:, None, None, None]
        far = (-1.0 / depth_range[:, 1])[:, None, None, None]
    else:
        near = (-1.0 / depth_range[:, 0])[:, None, None]
        far = (-1.0 / depth_range[:, 1])[:, None, None]
    depth = jnp.maximum(depth, 1e-5)
    depth = -1.0 / depth
    depth = (depth - near) / (far - near)

    if fixed_interval:
        return depth - fixed_interval_val / 2, depth + fixed_interval_val / 2

    if is_ref:
        interval_half = interval / 2
        interval_ext = jnp.concatenate(
            [interval_half[..., 0:1], interval_half], axis=-1)
        near_pts = depth - interval_ext[..., :-1]
        far_pts = depth + interval_ext[..., 1:]
    else:
        interval_half = interval / 2
        first = depth[..., 0] - interval_half[..., 0]
        last = depth[..., -1] + interval_half[..., -1]
        mid = (depth[..., :-1] + depth[..., 1:]) / 2
        depth_ext = jnp.concatenate(
            [first[..., None], mid, last[..., None]], axis=-1)
        near_pts = depth_ext[..., :-1]
        far_pts = depth_ext[..., 1:]
    return near_pts, far_pts


def compute_prob(depth: jnp.ndarray, interval: jnp.ndarray,
                 mean: jnp.ndarray, var: jnp.ndarray,
                 vis: jnp.ndarray | None, aw: jnp.ndarray,
                 is_ref: bool, depth_range: jnp.ndarray,
                 use_vis: bool = True):
    """Mixture-of-logistics interval probabilities -> (alpha_logit,
    visibility, hit_prob), each shaped like ``depth``.

    mean/var: [..., dn_or_1, 2]; vis/aw: [..., dn_or_1, 1].
    """
    near, far = get_near_far_points(depth, interval, depth_range, is_ref)
    mix = jnp.concatenate([aw, 1.0 - aw], axis=-1)          # [...,2]
    near = near[..., None]
    far = far[..., None]

    d0 = (near - mean) * var
    d1 = (far - mean) * var
    cdf0 = 0.5 + 0.5 * jnp.tanh(d0)
    cdf1 = 0.5 + 0.5 * jnp.tanh(d1)
    if use_vis:
        assert vis is not None
        cdf0 = cdf0 * vis
        cdf1 = cdf1 * vis
    visibility = jnp.sum((1.0 - cdf0) * mix, axis=-1)
    hit_prob = jnp.sum((cdf1 - cdf0) * mix, axis=-1)

    eps = 1e-5
    alpha_logit = jnp.log(hit_prob / (visibility - hit_prob + eps) + eps)
    return alpha_logit, visibility, hit_prob


def decode_alpha_value(alpha_logit: jnp.ndarray) -> jnp.ndarray:
    """Alpha logits -> alpha values (reference dist_decoder.py:142-144)."""
    return jax.nn.sigmoid(alpha_logit)
