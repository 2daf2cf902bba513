"""Parity tests for depth sampling ops vs reference formulas re-derived in
numpy/torch (torch only as searchsorted oracle)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from neuray_tpu.ops import sampling as S


def test_sample_depth_deterministic(rng):
    qn, rn, dn = 2, 5, 16
    depth_range = np.array([[2.0, 8.0], [1.0, 4.0]], np.float32)
    depth, dists = S.sample_depth(jnp.asarray(depth_range), qn, rn, dn, False)
    depth, dists = np.asarray(depth), np.asarray(dists)
    # endpoints pinned at near/far
    np.testing.assert_allclose(
        depth[:, :, 0], np.broadcast_to(depth_range[:, :1], (qn, rn)),
        rtol=1e-5)
    np.testing.assert_allclose(
        depth[:, :, -1], np.broadcast_to(depth_range[:, 1:], (qn, rn)),
        rtol=1e-5)
    # uniform in inverse depth
    inv = 1.0 / depth
    steps = inv[..., 1:] - inv[..., :-1]
    np.testing.assert_allclose(steps, np.broadcast_to(steps[..., :1],
                                                      steps.shape), rtol=1e-4)
    # dists = diff with 1e6 tail
    np.testing.assert_allclose(dists[..., :-1], depth[..., 1:] - depth[..., :-1],
                               rtol=1e-5)
    assert (dists[..., -1] > 1e5).all()


def test_sample_depth_random_within_half_interval():
    qn, rn, dn = 1, 64, 32
    depth_range = np.array([[2.0, 8.0]], np.float32)
    d_det, _ = S.sample_depth(jnp.asarray(depth_range), qn, rn, dn, False)
    d_rnd, _ = S.sample_depth(jnp.asarray(depth_range), qn, rn, dn, True,
                              jax.random.PRNGKey(0))
    inv_det, inv_rnd = 1 / np.asarray(d_det), 1 / np.asarray(d_rnd)
    interval = (1 / 8.0 - 1 / 2.0) / (dn - 1)
    # jitter bounded by half an inverse-depth interval; endpoints pinned
    assert (np.abs(inv_rnd - inv_det) <= abs(interval) * 0.5 + 1e-6).all()
    np.testing.assert_allclose(inv_rnd[..., 0], 1 / 2.0, rtol=1e-5)
    np.testing.assert_allclose(inv_rnd[..., -1], 1 / 8.0, rtol=1e-5)
    assert np.abs(inv_rnd[..., 1:-1] - inv_det[..., 1:-1]).max() > 0


def _torch_sample_fine(depth, hit_prob, depth_range, fdn):
    """Reference render_ops.py:172-229 re-derived with torch as oracle,
    deterministic branch."""
    depth = torch.from_numpy(depth)
    hit_prob = torch.from_numpy(hit_prob)
    near, far = depth_range[0, 0], depth_range[0, 1]
    near, far = -1 / near, -1 / far
    depth = ((-1 / depth) - near) / (far - near)
    depth_center = (depth[..., 1:] + depth[..., :-1]) / 2
    depth_center = torch.cat([depth[..., :1], depth_center, depth[..., -1:]], -1)
    hit_prob = hit_prob + 1e-5
    pdf = hit_prob / hit_prob.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    interval = 1 / fdn
    u = (0.5 * interval + torch.arange(fdn) * interval).expand(
        list(cdf.shape[:-1]) + [fdn]).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    cdf_g = torch.stack([torch.gather(cdf, -1, below),
                         torch.gather(cdf, -1, above)], -1)
    bins_g = torch.stack([torch.gather(depth_center, -1, below),
                          torch.gather(depth_center, -1, above)], -1)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    fine = bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])
    fine = fine * (far - near) + near
    return (-1 / fine).numpy()


def test_sample_fine_depth_matches_searchsorted_oracle(rng):
    qn, rn, dn, fdn = 1, 13, 24, 17
    depth_range = np.array([[2.0, 9.0]], np.float32)
    # strictly increasing coarse depths within range
    t = np.sort(rng.rand(qn, rn, dn).astype(np.float32), -1)
    t = (t - t[..., :1]) / (t[..., -1:] - t[..., :1])
    inv = 1 / 2.0 + t * (1 / 9.0 - 1 / 2.0)
    depth = (1.0 / inv).astype(np.float32)
    hit_prob = rng.rand(qn, rn, dn).astype(np.float32)
    hit_prob[0, 3] = 0.0  # degenerate ray: all-zero prob

    ours = np.asarray(S.sample_fine_depth(
        jnp.asarray(depth), jnp.asarray(hit_prob), jnp.asarray(depth_range),
        fdn, False))
    oracle = _torch_sample_fine(depth, hit_prob, depth_range, fdn)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_depth2inv_dists(rng):
    qn, rn, dn = 2, 4, 8
    depth_range = np.array([[2.0, 8.0], [1.0, 5.0]], np.float32)
    depth, _ = S.sample_depth(jnp.asarray(depth_range), qn, rn, dn, False)
    dists = np.asarray(S.depth2inv_dists(depth, jnp.asarray(depth_range)))
    # uniform-in-inverse sampling => constant normalized interval 1/(dn-1)
    np.testing.assert_allclose(dists[..., :-1], 1.0 / (dn - 1), rtol=1e-4)


def test_sample_depth_ranged_matches_constant(rng):
    """Per-ray ranged sampler with constant rows == sample_depth
    bitwise (same tick arithmetic) — the probe-focused render's
    full-range fallback degrades exactly to the global sampler."""
    dr = jnp.asarray([[2.0, 6.0]], jnp.float32)
    d0, s0 = S.sample_depth(dr, 1, 16, 8, False)
    near = jnp.full((1, 16), 2.0)
    far = jnp.full((1, 16), 6.0)
    d1, s1 = S.sample_depth_ranged(near, far, 8)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_sample_depth_ranged_per_ray(rng):
    """Varying per-ray windows: endpoints pinned, monotone, uniform in
    inverse depth within each ray's own window."""
    near = jnp.asarray(2.0 + rng.rand(2, 8).astype(np.float32))
    far = near + 1.0 + jnp.asarray(2 * rng.rand(2, 8).astype(np.float32))
    dn = 9
    d, _ = S.sample_depth_ranged(near, far, dn)
    d = np.asarray(d)
    np.testing.assert_allclose(d[..., 0], np.asarray(near), rtol=1e-5)
    np.testing.assert_allclose(d[..., -1], np.asarray(far), rtol=1e-5)
    assert (np.diff(d, axis=-1) > 0).all()
    inv = 1.0 / d
    steps = np.diff(inv, axis=-1)
    np.testing.assert_allclose(
        steps, np.broadcast_to(steps[..., :1], steps.shape), rtol=2e-3)
