"""grid_sample semantic-parity tests: our gather vs torch.nn.functional
.grid_sample through the reference's normalization (torch used strictly as
a test oracle)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from neuray_tpu.ops.interpolate import (
    grid_sample_nhwc, interpolate_feature_map, masked_mean_var)


def torch_interpolate_feats(feats_nchw, points, h, w, padding_mode,
                            align_corners):
    """The reference's interpolate_feats (ops.py:14-34), as oracle."""
    x_norm = points[:, :, 0] / (w - 1) * 2 - 1
    y_norm = points[:, :, 1] / (h - 1) * 2 - 1
    pn = torch.stack([x_norm, y_norm], -1).unsqueeze(1)
    out = F.grid_sample(feats_nchw, pn, mode="bilinear",
                        padding_mode=padding_mode,
                        align_corners=align_corners).squeeze(2)
    return out.permute(0, 2, 1)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("scale", [1, 4])
def test_grid_sample_matches_torch(rng, padding_mode, align_corners, scale):
    n, h, w, c = 2, 32, 40, 5
    fh, fw = h // scale, w // scale
    feats = rng.randn(n, fh, fw, c).astype(np.float32)
    # points in the (h, w) frame, including out-of-range ones
    points = (rng.rand(n, 300, 2) * [w + 10, h + 10] - [5, 5]
              ).astype(np.float32)

    ours = np.asarray(grid_sample_nhwc(
        jnp.asarray(feats), jnp.asarray(points), h, w,
        padding_mode, align_corners))

    oracle = torch_interpolate_feats(
        torch.from_numpy(feats.transpose(0, 3, 1, 2)),
        torch.from_numpy(points), h, w, padding_mode, align_corners).numpy()

    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_interpolate_feature_map_align_switch(rng):
    """align_corners must flip automatically on resolution mismatch
    (reference render_ops.py:54-70)."""
    h, w = 32, 40
    feats_full = rng.randn(1, h, w, 3).astype(np.float32)
    feats_quarter = rng.randn(1, h // 4, w // 4, 3).astype(np.float32)
    points = (rng.rand(1, 64, 2) * [w - 1, h - 1]).astype(np.float32)
    mask = np.ones((1, 64), np.float32)

    for feats, align in [(feats_full, True), (feats_quarter, False)]:
        ours = np.asarray(interpolate_feature_map(
            jnp.asarray(feats), jnp.asarray(points), jnp.asarray(mask), h, w))
        oracle = torch_interpolate_feats(
            torch.from_numpy(feats.transpose(0, 3, 1, 2)),
            torch.from_numpy(points), h, w, "border", align).numpy()
        np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_interpolate_feature_map_masks_invalid(rng):
    h, w = 16, 16
    feats = rng.randn(1, h, w, 2).astype(np.float32) + 10.0
    points = (rng.rand(1, 8, 2) * [w - 1, h - 1]).astype(np.float32)
    mask = np.zeros((1, 8), np.float32)
    out = np.asarray(interpolate_feature_map(
        jnp.asarray(feats), jnp.asarray(points), jnp.asarray(mask), h, w))
    assert (out == 0).all()


def test_masked_mean_var(rng):
    x = rng.randn(4, 7, 3).astype(np.float32)
    m = (rng.rand(4, 7, 1) > 0.4).astype(np.float32)
    mean, var = masked_mean_var(jnp.asarray(x), jnp.asarray(m), 1)
    mean, var = np.asarray(mean), np.asarray(var)
    for b in range(4):
        sel = m[b, :, 0] > 0
        if sel.sum() == 0:
            continue
        np.testing.assert_allclose(mean[b, 0], x[b, sel].mean(0), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(var[b, 0], x[b, sel].var(0), rtol=1e-3,
                                   atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("scale", [1, 4])
def test_quad_gather_matches_grid_sample(rng, align_corners, scale):
    from neuray_tpu.ops.interpolate import make_quad_map, \
        gather_bilinear_quad
    n, h, w, c = 2, 32, 40, 5
    fh, fw = h // scale, w // scale
    feats = rng.randn(n, fh, fw, c).astype(np.float32)
    points = (rng.rand(n, 200, 2) * [w + 10, h + 10] - [5, 5]
              ).astype(np.float32)
    quad = make_quad_map(jnp.asarray(feats))
    ours = np.asarray(gather_bilinear_quad(
        quad, jnp.asarray(points), h, w, align_corners))
    oracle = np.asarray(grid_sample_nhwc(
        jnp.asarray(feats), jnp.asarray(points), h, w, "border",
        align_corners))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_fused_map_matches_separate_gathers(rng):
    """ONE fused tap == the two separate quad gathers (feats at 1/4 res
    align_corners=False + full-res rgb align_corners=True, border)."""
    from neuray_tpu.ops.interpolate import (
        make_fused_scene_map, gather_bilinear_fused)
    n, h, w, c = 2, 64, 48, 6
    fh, fw = h // 4, w // 4
    imgs = rng.randn(n, h, w, 3).astype(np.float32)
    feats = rng.randn(n, fh, fw, c).astype(np.float32)
    # points beyond the borders exercise the clamped windows
    points = (rng.rand(n, 500, 2) * [w + 8, h + 8] - [4, 4]
              ).astype(np.float32)
    # force exact border/corner hits too
    points[:, :4] = [[0, 0], [w - 1, h - 1], [0, h - 1], [w - 1, 0]]

    fused = make_fused_scene_map(jnp.asarray(imgs), jnp.asarray(feats),
                                 h, w)
    got_feats, got_rgb = gather_bilinear_fused(
        fused, jnp.asarray(points), h, w)

    want_feats = np.asarray(grid_sample_nhwc(
        jnp.asarray(feats), jnp.asarray(points), h, w, "border", False))
    want_rgb = np.asarray(grid_sample_nhwc(
        jnp.asarray(imgs), jnp.asarray(points), h, w, "border", True))
    np.testing.assert_allclose(np.asarray(got_feats), want_feats,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_rgb), want_rgb,
                               rtol=1e-4, atol=1e-5)


def test_fused_map_u8_quantized_gather(rng):
    """The uint8 fused map reproduces the bilinear gathers within its
    quantization budget: rgb EXACT for 8-bit-sourced images; feats
    within one per-channel quantization step."""
    from neuray_tpu.ops.interpolate import (
        make_fused_scene_map_u8, gather_bilinear_fused_u8)
    n, h, w, c = 2, 64, 48, 6
    fh, fw = h // 4, w // 4
    imgs = (rng.randint(0, 256, (n, h, w, 3)) / 255.0).astype(np.float32)
    feats = rng.randn(n, fh, fw, c).astype(np.float32)
    points = (rng.rand(n, 500, 2) * [w + 8, h + 8] - [4, 4]
              ).astype(np.float32)
    points[:, :4] = [[0, 0], [w - 1, h - 1], [0, h - 1], [w - 1, 0]]

    fused, scale, offset = make_fused_scene_map_u8(
        jnp.asarray(imgs), jnp.asarray(feats), h, w)
    assert fused.dtype == jnp.uint8
    got_feats, got_rgb = gather_bilinear_fused_u8(
        fused, scale, offset, jnp.asarray(points), h, w)

    want_feats = np.asarray(grid_sample_nhwc(
        jnp.asarray(feats), jnp.asarray(points), h, w, "border", False))
    want_rgb = np.asarray(grid_sample_nhwc(
        jnp.asarray(imgs), jnp.asarray(points), h, w, "border", True))
    # rgb: u8 codes interpolate exactly in bf16 up to the final
    # 1/255-scale round; bound by bf16 resolution of the result
    np.testing.assert_allclose(np.asarray(got_rgb, np.float32), want_rgb,
                               atol=1.5 / 255.0)
    # feats error model: 0.5 step quantization + ~1 code of bf16 lerp
    # rounding on the ~255-magnitude u8 codes + bf16 scale rounding
    step = np.asarray(scale, np.float32)
    err = np.abs(np.asarray(got_feats, np.float32) - want_feats)
    assert (err <= step[None, None] * 2.0 + 0.02).all(), \
        (err / step[None, None]).max()


def test_renderer_u8_gather_matches_bf16(rng):
    """End-to-end: gather_quant='u8' renders within the quantization
    budget of the bf16 fused-map render (same weights, same scene)."""
    import jax
    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, render_full)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    rng_np = np.random.RandomState(0)
    h = w = 32
    ref_np = make_sphere_scene(rng_np, 3, h, w)
    que_np = make_query(rng_np, h, w, rn=37)
    ref = jax.tree.map(jnp.asarray, ref_np)
    que = jax.tree.map(jnp.asarray, que_np)

    base = dict(use_hierarchical_sampling=False, depth_sample_num=8,
                ray_batch_num=16, use_vis=False, fine_use_vis=False,
                use_bf16=True)
    r_bf = NeurayRenderer(RenderConfig(**base))
    r_u8 = NeurayRenderer(RenderConfig(**base, gather_quant="u8"))
    params = r_bf.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, que, False)
    out_bf = render_full(r_bf, params, ref, que,
                         keep_keys=("pixel_colors_nr",))
    out_u8 = render_full(r_u8, params, ref, que,
                         keep_keys=("pixel_colors_nr",))
    a = np.asarray(out_bf["pixel_colors_nr"], np.float32)
    b = np.asarray(out_u8["pixel_colors_nr"], np.float32)
    assert np.isfinite(b).all()
    # quantized feats perturb the MLP inputs; colors must stay close
    assert np.abs(a - b).mean() < 0.02, np.abs(a - b).mean()
