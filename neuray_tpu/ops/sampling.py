"""Depth sampling along rays (coarse uniform-in-inverse-depth + fine
CDF importance resampling), pure jnp with static shapes.

Behavioral parity targets: reference render_ops.py:41-52 (dists),
:146-170 (sample_depth), :172-229 (sample_fine_depth).

TPU notes: the fine-sampling CDF inversion avoids searchsorted/gather by
computing bucket indices with a dn x fdn comparison reduction (dn, fdn are
64 — tiny), which vectorizes cleanly on the VPU and keeps shapes static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def depth2dists(depth: jnp.ndarray) -> jnp.ndarray:
    """Forward differences with a 1e6 sentinel tail. depth [..., dn]."""
    dists = depth[..., 1:] - depth[..., :-1]
    tail = jnp.full((*depth.shape[:-1], 1), 1e6, depth.dtype)
    return jnp.concatenate([dists, tail], axis=-1)


def depth2inv_dists(depth: jnp.ndarray, depth_range: jnp.ndarray) -> jnp.ndarray:
    """Interval lengths in the normalized inverse-depth domain.

    depth [qn, rn, dn]; depth_range [qn, 2] -> dists [qn, rn, dn]
    """
    near = (-1.0 / depth_range[:, 0])[:, None, None]
    far = (-1.0 / depth_range[:, 1])[:, None, None]
    depth_inv = -1.0 / depth
    depth_inv = (depth_inv - near) / (far - near)
    return depth2dists(depth_inv)


def sample_depth(depth_range: jnp.ndarray, qn: int, rn: int, dn: int,
                 random_sample: bool, rng: jax.Array | None = None):
    """Coarse depth samples, uniform in inverse depth, endpoints pinned.

    depth_range [qn, 2] -> (que_depth [qn, rn, dn], que_dists [qn, rn, dn]).
    With ``random_sample`` the interior ticks are jittered by +-0.4995
    interval (parity with reference render_ops.py:158-168).
    """
    near, far = depth_range[:, 0], depth_range[:, 1]              # qn
    interval = (1.0 / far - 1.0 / near) / (dn - 1)                 # qn
    val = jnp.arange(1, dn - 1, dtype=jnp.float32)[None, None, :]  # 1,1,dn-2
    if random_sample:
        assert rng is not None
        jitter = (jax.random.uniform(rng, (qn, rn, dn - 2)) - 0.5) * 0.999
        val = val + jitter
    else:
        val = jnp.broadcast_to(val, (qn, rn, dn - 2))
    ticks = interval[:, None, None] * val
    diff = (1.0 / far - 1.0 / near)
    zeros = jnp.zeros((qn, rn, 1), jnp.float32)
    last = jnp.broadcast_to(diff[:, None, None], (qn, rn, 1))
    ticks = jnp.concatenate([zeros, ticks, last], axis=-1)
    que_depth = 1.0 / (1.0 / near[:, None, None] + ticks)
    que_dists = depth2dists(que_depth)
    return que_depth, que_dists


def sample_depth_ranged(near: jnp.ndarray, far: jnp.ndarray, dn: int):
    """Coarse depth samples with PER-RAY near/far, uniform in inverse
    depth, endpoints pinned — the per-ray generalization of
    ``sample_depth`` (deterministic / eval only). With constant
    near/far rows it reproduces ``sample_depth`` exactly (same
    tick arithmetic).

    Used by the probe-focused render (renderer.render_chunk_focus):
    the emptiness probe narrows each kept ray's sampling window to the
    interval holding its hit mass, so a reduced sample count keeps (or
    raises) the effective sample density of the full render.

    near, far: [qn, rn] -> (que_depth [qn, rn, dn], que_dists [qn, rn, dn])
    """
    interval = (1.0 / far - 1.0 / near) / (dn - 1)                 # qn,rn
    val = jnp.arange(1, dn - 1, dtype=jnp.float32)[None, None, :]  # 1,1,dn-2
    ticks = interval[..., None] * val
    diff = (1.0 / far - 1.0 / near)[..., None]                     # qn,rn,1
    zeros = jnp.zeros_like(diff)
    ticks = jnp.concatenate([zeros, ticks, diff], axis=-1)
    que_depth = 1.0 / (1.0 / near[..., None] + ticks)
    que_dists = depth2dists(que_depth)
    return que_depth, que_dists


def sample_fine_depth(depth: jnp.ndarray, hit_prob: jnp.ndarray,
                      depth_range: jnp.ndarray, fdn: int,
                      random_sample: bool, rng: jax.Array | None = None,
                      inv_mode: bool = True) -> jnp.ndarray:
    """Importance-resample depths from the coarse hit-prob PDF.

    Parity: reference render_ops.py:172-229 (inverse-CDF with right=True
    searchsorted, midpoints-extended bins, inverse-depth domain).

    depth, hit_prob: [qn, rn, dn]; depth_range [qn, 2] -> [qn, rn, fdn]
    """
    if inv_mode:
        near = -1.0 / depth_range[0, 0]
        far = -1.0 / depth_range[0, 1]
        depth = -1.0 / depth
        depth = (depth - near) / (far - near)

    depth_center = (depth[..., 1:] + depth[..., :-1]) / 2
    depth_center = jnp.concatenate(
        [depth[..., 0:1], depth_center, depth[..., -1:]], axis=-1)  # qn,rn,dn+1

    hit_prob = hit_prob + 1e-5
    pdf = hit_prob / jnp.sum(hit_prob, axis=-1, keepdims=True)
    # inclusive prefix sum as one triangular matmul (jnp.cumsum lowers
    # to a dn-step sequential scan on TPU)
    n = pdf.shape[-1]
    tri = (jnp.arange(n)[:, None] <= jnp.arange(n)[None, :]).astype(
        pdf.dtype)
    cdf = jnp.matmul(pdf, tri, precision=jax.lax.Precision.HIGHEST)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # qn,rn,dn+1

    dn = cdf.shape[-1]
    if random_sample:
        assert rng is not None
        u = jax.random.uniform(rng, (*cdf.shape[:-1], fdn))
    else:
        interval = 1.0 / fdn
        u = 0.5 * interval + jnp.arange(fdn, dtype=jnp.float32) * interval
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], fdn))

    # searchsorted(cdf, u, right=True) + the 4 bin lookups, all without
    # gathers: cdf and depth_center are NONDECREASING along dn, so
    # "value at the last index with cdf <= u" is a masked max and
    # "value at the first index with cdf > u" is a masked min — pure
    # VPU reductions (the per-element take_along_axis gathers here were
    # ~3 s/frame of index-rate-bound gather traffic at bench shapes).
    mask = cdf[..., None, :] <= u[..., :, None]           # *,fdn,dn
    maskf = mask.astype(cdf.dtype)
    big = jnp.asarray(1e9, cdf.dtype)

    def last_leq(vals):   # vals nondecreasing [*, dn] -> [*, fdn]
        return jnp.max(maskf * vals[..., None, :], axis=-1)

    def first_gt(vals):
        shifted = jnp.min(vals[..., None, :] + maskf * big, axis=-1)
        return jnp.minimum(shifted, vals[..., -1:])

    cdf_below = last_leq(cdf)
    cdf_above = first_gt(cdf)
    bins_below = last_leq(depth_center)
    bins_above = first_gt(depth_center)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    fine_depth = bins_below + t * (bins_above - bins_below)

    if inv_mode:
        near = -1.0 / depth_range[0, 0]
        far = -1.0 / depth_range[0, 1]
        fine_depth = fine_depth * (far - near) + near
        fine_depth = -1.0 / fine_depth
    return fine_depth
