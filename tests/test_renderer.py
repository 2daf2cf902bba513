"""End-to-end renderer smoke + behavior tests on a tiny synthetic scene."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuray_tpu.models.renderer import (
    NeurayRenderer, RenderConfig, render_full)

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from conftest import make_camera  # noqa: E402


def make_scene(rng, rfn=3, h=32, w=32):
    """Reference views of a diffuse unit sphere at the origin."""
    imgs, poses, Ks, depths = [], [], [], []
    for _ in range(rfn):
        pose, K = make_camera(rng, h, w, radius=4.0)
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        pix = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float32)
        Kinv = np.linalg.inv(K)
        dirs_cam = pix @ Kinv.T
        R, t = pose[:, :3], pose[:, 3]
        center = -R.T @ t
        dirs = dirs_cam @ R  # world
        # ray-sphere intersection, radius 1
        oc = center
        b = 2 * dirs @ oc
        a = np.sum(dirs * dirs, -1)
        c = oc @ oc - 1.0
        disc = b * b - 4 * a * c
        hit = disc > 0
        tt = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0)
        pts = center[None, None] + dirs * tt[..., None]
        # diffuse shading by normal
        shade = np.clip(pts @ np.array([0.5, 0.5, 0.7]), 0, 1)
        img = np.where(hit[..., None],
                       np.stack([shade, shade * 0.5, 1 - shade], -1), 0.0)
        zdepth = np.where(hit, (pts @ R[2] + t[2]), 0).astype(np.float32)
        imgs.append(img.astype(np.float32))
        poses.append(pose)
        Ks.append(K)
        depths.append(zdepth)
    ref = {
        "imgs": jnp.asarray(np.stack(imgs)),
        "poses": jnp.asarray(np.stack(poses)),
        "Ks": jnp.asarray(np.stack(Ks)),
        "depth_range": jnp.asarray(np.tile([[2.5, 5.5]], (rfn, 1))
                                   .astype(np.float32)),
        "depth": jnp.asarray(np.stack(depths)[..., None]),
    }
    return ref


CFG = RenderConfig(depth_sample_num=8, fine_depth_sample_num=8,
                   use_hierarchical_sampling=True, ray_batch_num=16,
                   use_vis=False, fine_use_vis=False,
                   use_dr_prediction=True, use_self_hit_prob=False,
                   render_depth=True)


@pytest.fixture(scope="module")
def scene_and_params():
    rng = np.random.RandomState(3)
    ref = make_scene(rng)
    que_pose, que_K = make_camera(rng, 32, 32, radius=4.0)
    coords = (rng.rand(1, 32, 2) * 31).astype(np.float32)
    que = {
        "coords": jnp.asarray(coords),
        "poses": jnp.asarray(que_pose[None]),
        "Ks": jnp.asarray(que_K[None]),
        "depth_range": jnp.asarray(np.array([[2.5, 5.5]], np.float32)),
        "imgs": ref["imgs"][:1],
    }
    renderer = NeurayRenderer(CFG)
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, que, True)
    return renderer, params, ref, que


def test_train_forward_outputs(scene_and_params):
    renderer, params, ref, que = scene_and_params
    out = renderer.apply(params, ref, que, True,
                         rngs={"sample": jax.random.PRNGKey(2)})
    assert out["pixel_colors_nr"].shape == (1, 32, 3)
    assert out["pixel_colors_nr_fine"].shape == (1, 32, 3)
    assert out["pixel_colors_gt"].shape == (1, 32, 3)
    assert out["hit_prob_nr"].shape == (1, 32, 8)
    assert out["ray_mask"].shape == (1, 32)
    assert out["render_depth"].shape == (1, 32)
    assert out["pixel_colors_dr"].shape == (1, 32, 3)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
    # hit probs sum <= 1
    assert (np.asarray(out["hit_prob_nr"]).sum(-1) <= 1 + 1e-4).all()
    # render depth within range
    rd = np.asarray(out["render_depth"])
    hp = np.asarray(out["hit_prob_nr"]).sum(-1)
    assert (rd <= 5.5 * hp + 1e-4).all()


def test_train_forward_depth_loss_head(scene_and_params):
    renderer, params, ref, que = scene_and_params
    coords = jnp.asarray(
        (np.random.RandomState(0).rand(3, 16, 2) * 31).astype(np.float32))
    out = renderer.apply(params, ref, que, True, coords,
                         rngs={"sample": jax.random.PRNGKey(2)})
    assert out["depth_mean"].shape == (3, 16)
    assert out["depth_mean_fine"].shape == (3, 16)


def test_render_full_matches_chunked(scene_and_params):
    """Chunked lax.map render must equal a single-chunk render."""
    renderer, params, ref, que = scene_and_params
    out = render_full(renderer, params, ref, que)
    assert out["pixel_colors_nr"].shape == (1, 32, 3)

    big = NeurayRenderer(CFG.__class__(**{
        **CFG.__dict__, "ray_batch_num": 32}))
    out2 = render_full(big, params, ref, que)
    np.testing.assert_allclose(np.asarray(out["pixel_colors_nr_fine"]),
                               np.asarray(out2["pixel_colors_nr_fine"]),
                               rtol=1e-4, atol=1e-5)


def test_split_encode_matches_composed(scene_and_params):
    """make_scene_encode_fn + make_ray_render_fn == make_render_fn
    bit-for-bit (the split must not change numerics)."""
    from neuray_tpu.models.renderer import (
        make_render_fn, make_scene_encode_fn, make_ray_render_fn)
    renderer, params, ref, que = scene_and_params
    keep = ("pixel_colors_nr", "pixel_colors_nr_fine")
    composed = make_render_fn(renderer, keep)(params, ref, que)
    ref_c = make_scene_encode_fn(renderer)(params, ref)
    split = make_ray_render_fn(renderer, keep)(params, ref_c, que)
    for k in keep:
        np.testing.assert_array_equal(np.asarray(composed[k]),
                                      np.asarray(split[k]))


def test_coarse_feats_fallback_matches_fused(scene_and_params):
    """When the feature grid is too coarse for the fused map (ratio > 4)
    the renderer falls back to separate quad maps; both paths must agree
    on scenes where either is usable."""
    renderer, params, ref, que = scene_and_params
    out_fused = renderer.apply(params, ref, que, False)
    # force the fallback by monkeypatching the cache builder's choice:
    # build quad maps directly at the same resolutions
    from neuray_tpu.ops.interpolate import make_quad_map

    class _NoFused(NeurayRenderer):
        def build_gather_cache(self, ref_d):
            ref_d = dict(ref_d)
            feats = jnp.concatenate(
                [ref_d["ray_feats"], ref_d["img_feats"]], axis=-1)
            ref_d["rgb_quad"] = make_quad_map(ref_d["imgs"])
            ref_d["feats_quad"] = make_quad_map(feats)
            return ref_d

    out_quad = _NoFused(CFG).apply(params, ref, que, False)
    np.testing.assert_allclose(
        np.asarray(out_fused["pixel_colors_nr_fine"]),
        np.asarray(out_quad["pixel_colors_nr_fine"]),
        rtol=1e-4, atol=1e-5)


def test_gradients_flow(scene_and_params):
    renderer, params, ref, que = scene_and_params

    def loss_fn(p):
        out = renderer.apply(p, ref, que, True,
                             rngs={"sample": jax.random.PRNGKey(2)})
        return jnp.mean((out["pixel_colors_nr"] - out["pixel_colors_gt"])**2) \
            + jnp.mean((out["pixel_colors_nr_fine"]
                        - out["pixel_colors_gt"])**2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(np.abs(np.asarray(g)).sum() > 0) for g in leaves)
    assert nonzero / len(leaves) > 0.5


def test_skip_empty_render_matches_full(rng):
    """The two-phase empty-ray-skipping driver: threshold=-1 (keep all)
    reproduces the single-phase render to float-ulp tolerance (the
    split coarse/fine programs are DIFFERENT XLA programs than the
    monolithic render, so fusion choices can wobble the last ulp); a
    positive threshold keeps hit rays exact and replaces skipped rays'
    fine output with their coarse output."""
    import jax
    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, render_full, make_scene_encode_fn,
        render_frame_skip_empty)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    r = np.random.RandomState(5)
    h = w = 32
    ref = jax.tree.map(jnp.asarray, make_sphere_scene(r, 3, h, w))
    que_np = make_query(r, h, w, rn=0, full_image=True)
    que = {k: jnp.asarray(v) for k, v in que_np.items() if k != "imgs"}

    cfg = RenderConfig(use_hierarchical_sampling=True, depth_sample_num=8,
                       fine_depth_sample_num=8, ray_batch_num=64,
                       use_vis=False, fine_use_vis=False,
                       ray_mask_point_num=4)
    renderer = NeurayRenderer(cfg)
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, dict(que, coords=que["coords"][:, :64]), False)

    full = render_full(renderer, params, ref, que,
                       keep_keys=("pixel_colors_nr",
                                  "pixel_colors_nr_fine"))
    full_nr = np.asarray(full["pixel_colors_nr"], np.float32)
    full_fine = np.asarray(full["pixel_colors_nr_fine"], np.float32)

    ref_c = make_scene_encode_fn(renderer)(params, ref)
    out_all = render_frame_skip_empty(renderer, params, ref_c, que,
                                      threshold=-1.0)
    assert out_all["kept_rays"] == que["coords"].shape[1]
    np.testing.assert_allclose(out_all["pixel_colors_nr"], full_nr,
                               atol=5e-6)
    np.testing.assert_allclose(out_all["pixel_colors_nr_fine"], full_fine,
                               atol=5e-6)

    out_skip = render_frame_skip_empty(renderer, params, ref_c, que,
                                       threshold=0.5)
    assert 0 < out_skip["kept_rays"] < que["coords"].shape[1]
    # every ray is either exact-vs-full (kept) or equal to its coarse
    # output (skipped)
    kept = np.abs(out_skip["pixel_colors_nr_fine"] - full_fine).max(-1)
    # skipped rays equal their coarse output
    skipped_mask = (out_skip["pixel_colors_nr_fine"]
                    == out_skip["pixel_colors_nr"]).all(-1)
    exact_mask = kept < 5e-6
    assert (exact_mask | skipped_mask).all()


def test_probe_skip_render_matches_full(rng):
    """The THREE-phase probe-skip driver (render_frame_probe_skip):
    threshold=-1 (probe keeps all) reproduces the single-phase render
    EXACTLY; a mid-score threshold keeps those rays exact and zeros
    the skipped rays (the empty-ray background)."""
    import jax
    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, render_full, make_scene_encode_fn,
        make_probe_fn, render_frame_probe_skip)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    r = np.random.RandomState(7)
    h = w = 32
    ref = jax.tree.map(jnp.asarray, make_sphere_scene(r, 3, h, w))
    que_np = make_query(r, h, w, rn=0, full_image=True)
    que = {k: jnp.asarray(v) for k, v in que_np.items() if k != "imgs"}

    cfg = RenderConfig(use_hierarchical_sampling=True, depth_sample_num=8,
                       fine_depth_sample_num=8, ray_batch_num=64,
                       probe_sample_num=4, use_vis=False,
                       fine_use_vis=False, ray_mask_point_num=4)
    renderer = NeurayRenderer(cfg)
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, dict(que, coords=que["coords"][:, :64]), False)

    full = render_full(renderer, params, ref, que,
                       keep_keys=("pixel_colors_nr",
                                  "pixel_colors_nr_fine"))
    full_nr = np.asarray(full["pixel_colors_nr"], np.float32)
    full_fine = np.asarray(full["pixel_colors_nr_fine"], np.float32)

    ref_c = make_scene_encode_fn(renderer)(params, ref)
    out_all = render_frame_probe_skip(renderer, params, ref_c, que,
                                      threshold=-1.0)
    assert out_all["kept_rays"] == que["coords"].shape[1]
    np.testing.assert_allclose(out_all["pixel_colors_nr"], full_nr,
                               atol=1e-6)
    np.testing.assert_allclose(out_all["pixel_colors_nr_fine"], full_fine,
                               atol=1e-6)

    # split the rays at the median probe score so both branches run
    score = np.asarray(make_probe_fn(renderer)(params, ref_c, que))[0]
    th = float(np.median(score))
    out_skip = render_frame_probe_skip(renderer, params, ref_c, que,
                                       threshold=th)
    keep = np.nonzero(score > th)[0]
    assert 0 < out_skip["kept_rays"] < que["coords"].shape[1]
    assert out_skip["kept_rays"] == keep.size
    np.testing.assert_array_equal(
        out_skip["pixel_colors_nr_fine"][0, keep], full_fine[0, keep])
    skipped = np.setdiff1d(np.arange(score.size), keep)
    assert (out_skip["pixel_colors_nr_fine"][0, skipped] == 0).all()
    assert (out_skip["pixel_colors_nr"][0, skipped] == 0).all()

    # dilation grows the keep set to exactly the 3x3-max of the mask
    out_dil = render_frame_probe_skip(renderer, params, ref_c, que,
                                      threshold=th, image_hw=(h, w),
                                      dilate=1)
    m = (score > th).reshape(h, w)
    exp = m.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            sl = np.zeros_like(m)
            ys = slice(max(dy, 0), h + min(dy, 0))
            yd = slice(max(-dy, 0), h + min(-dy, 0))
            xs = slice(max(dx, 0), w + min(dx, 0))
            xd = slice(max(-dx, 0), w + min(-dx, 0))
            sl[yd, xd] = m[ys, xs]
            exp |= sl
    assert out_dil["kept_rays"] == int(exp.sum())
    keep_d = np.nonzero(exp.reshape(-1))[0]
    np.testing.assert_array_equal(
        out_dil["pixel_colors_nr_fine"][0, keep_d], full_fine[0, keep_d])


def test_probe_focus_render(rng):
    """The probe-FOCUSED driver (render_frame_probe_focus):
    (a) analytic fractional position encoding == the table at integers,
    (b) with full-range windows and focus sample counts equal to the
        full render's, the focused pass reproduces the full render
        (positions become the integer grid),
    (c) probe intervals are valid/within-range with full-range fallback
        on negligible-mass rays,
    (d) the driver's kept rays bit-match a direct focus-render call on
        the same windows; skipped rays are zero."""
    import jax
    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, render_full, make_scene_encode_fn,
        make_focus_probe_fn, make_focus_render_fn,
        render_frame_probe_focus)
    from neuray_tpu.models.ibrnet import (
        sinusoid_pos_encoding, sinusoid_pos_at)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    tab = sinusoid_pos_encoding(16, 64)[0]
    at = np.asarray(sinusoid_pos_at(
        16, jnp.arange(64, dtype=jnp.float32)))
    np.testing.assert_allclose(at, tab, atol=2e-6)

    r = np.random.RandomState(7)
    h = w = 32
    ref = jax.tree.map(jnp.asarray, make_sphere_scene(r, 3, h, w))
    que_np = make_query(r, h, w, rn=0, full_image=True)
    que = {k: jnp.asarray(v) for k, v in que_np.items() if k != "imgs"}

    cfg = RenderConfig(use_hierarchical_sampling=True, depth_sample_num=8,
                       fine_depth_sample_num=8, ray_batch_num=64,
                       probe_sample_num=4, use_vis=False,
                       fine_use_vis=False, ray_mask_point_num=4,
                       focus_sample_num=8, focus_fine_sample_num=8)
    renderer = NeurayRenderer(cfg)
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, dict(que, coords=que["coords"][:, :64]), False)

    keep = ("pixel_colors_nr", "pixel_colors_nr_fine")
    full = render_full(renderer, params, ref, que, keep_keys=keep)
    full_fine = np.asarray(full["pixel_colors_nr_fine"], np.float32)
    ref_c = make_scene_encode_fn(renderer)(params, ref)

    qn, rn, _ = que["coords"].shape
    near_full = jnp.full((qn, rn), 2.5)
    far_full = jnp.full((qn, rn), 5.5)
    focus_fn = make_focus_render_fn(renderer, keep_keys=keep)
    out = focus_fn(params, ref_c, que, near_full, far_full)
    np.testing.assert_allclose(
        np.asarray(out["pixel_colors_nr_fine"]), full_fine, atol=1e-4)

    score, nr_, fr_ = make_focus_probe_fn(renderer)(params, ref_c, que)
    score, nr_, fr_ = map(np.asarray, (score, nr_, fr_))
    assert (nr_ < fr_).all()
    assert (nr_ >= 2.5 - 1e-5).all() and (fr_ <= 5.5 + 1e-5).all()
    lowmass = score[0] <= 1e-3
    assert lowmass.any()
    np.testing.assert_allclose(nr_[0][lowmass], 2.5, atol=1e-6)
    np.testing.assert_allclose(fr_[0][lowmass], 5.5, atol=1e-6)

    th = float(np.median(score))
    out_d = render_frame_probe_focus(renderer, params, ref_c, que,
                                     threshold=th)
    kept = np.nonzero(score[0] > th)[0]
    assert out_d["kept_rays"] == kept.size
    skipped = np.setdiff1d(np.arange(rn), kept)
    assert (out_d["pixel_colors_nr_fine"][0, skipped] == 0).all()
    # driver == direct focus render on the kept windows
    que_k = dict(que, coords=jnp.take(que["coords"], jnp.asarray(kept), 1))
    direct = focus_fn(params, ref_c, que_k,
                      jnp.take(jnp.asarray(nr_), jnp.asarray(kept), 1),
                      jnp.take(jnp.asarray(fr_), jnp.asarray(kept), 1))
    np.testing.assert_allclose(
        out_d["pixel_colors_nr_fine"][0, kept],
        np.asarray(direct["pixel_colors_nr_fine"], np.float32)[
            0, :kept.size], atol=1e-6)
    assert np.isfinite(out_d["pixel_colors_nr_fine"]).all()


def test_probe_auto_render(rng):
    """The SELF-VALIDATING driver (render_frame_probe_auto): accepts
    the probe when the audited false-skip rate clears tol (then equals
    render_frame_probe_skip), escalates probe_sample_num when it
    cannot, and past max_probe_sample_num falls back to the exact
    two-phase driver."""
    import jax
    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, make_scene_encode_fn,
        render_frame_probe_skip, render_frame_probe_auto,
        render_frame_skip_empty)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    r = np.random.RandomState(7)
    h = w = 32
    ref = jax.tree.map(jnp.asarray, make_sphere_scene(r, 3, h, w))
    que_np = make_query(r, h, w, rn=0, full_image=True)
    que = {k: jnp.asarray(v) for k, v in que_np.items() if k != "imgs"}

    cfg = RenderConfig(use_hierarchical_sampling=True, depth_sample_num=8,
                       fine_depth_sample_num=8, ray_batch_num=64,
                       probe_sample_num=4, use_vis=False,
                       fine_use_vis=False, ray_mask_point_num=4)
    renderer = NeurayRenderer(cfg)
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, dict(que, coords=que["coords"][:, :64]), False)
    ref_c = make_scene_encode_fn(renderer)(params, ref)

    # tol=1.0: any audit passes -> identical to the plain probe driver
    out_auto = render_frame_probe_auto(
        renderer, params, ref_c, que, threshold=0.3, dilate=0, tol=1.0)
    out_plain = render_frame_probe_skip(
        renderer, params, ref_c, que, threshold=0.3)
    assert out_auto["fallback"] is None
    assert out_auto["probe_sample_num"] == 4
    assert 0.0 <= out_auto["false_skip_rate"] <= 1.0
    assert out_auto["kept_rays"] == out_plain["kept_rays"]
    np.testing.assert_array_equal(out_auto["pixel_colors_nr_fine"],
                                  out_plain["pixel_colors_nr_fine"])

    # impossible tol + no escalation room -> exact two-phase fallback
    out_fb = render_frame_probe_auto(
        renderer, params, ref_c, que, threshold=0.3, dilate=0,
        tol=-1.0, max_probe_sample_num=8)
    assert out_fb["fallback"] == "two_phase"
    assert out_fb["probe_sample_num"] == 8  # escalated once, then fell back
    out_tp = render_frame_skip_empty(
        renderer, params, ref_c, que, threshold=0.3)
    assert out_fb["kept_rays"] == out_tp["kept_rays"]

    # threshold=-1 keeps every ray -> nothing skipped, audit trivially 0
    out_all = render_frame_probe_auto(
        renderer, params, ref_c, que, threshold=-1.0, dilate=0, tol=0.0)
    assert out_all["kept_rays"] == que["coords"].shape[1]
    assert out_all["false_skip_rate"] == 0.0

    # focus variant goes through the same audit machinery, PLUS the
    # window-clip audit (clipped hit mass on kept rays)
    out_f = render_frame_probe_auto(
        renderer, params, ref_c, que, threshold=0.3, dilate=0, tol=1.0,
        focus=True, win_tol_db=1e9)
    assert out_f["fallback"] is None
    assert 0.0 <= out_f["window_clip"] <= 1.0
    assert np.isfinite(out_f["pixel_colors_nr_fine"]).all()

    # impossible window tolerance -> must NOT accept the focused
    # windows: escalates to max then falls back to the exact two-phase
    # driver (the quality guard for diffuse/weak models, where nothing
    # skips and the false-skip audit alone would accept)
    out_wf = render_frame_probe_auto(
        renderer, params, ref_c, que, threshold=0.3, dilate=0, tol=1.0,
        focus=True, win_tol_db=-1.0, max_probe_sample_num=8)
    assert out_wf["fallback"] == "two_phase"
    assert out_wf["kept_rays"] == out_tp["kept_rays"]


def test_probe_focus_stride(rng):
    """probe_stride=2 probes every 2nd pixel: the keep mask must cover
    the (dilated) stride-1 mask's kept surface (conservative window
    upsampling), and outputs stay finite with zeros on skipped rays."""
    import jax
    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, make_scene_encode_fn,
        render_frame_probe_focus)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    r = np.random.RandomState(7)
    h = w = 32
    ref = jax.tree.map(jnp.asarray, make_sphere_scene(r, 3, h, w))
    que_np = make_query(r, h, w, rn=0, full_image=True)
    que = {k: jnp.asarray(v) for k, v in que_np.items() if k != "imgs"}

    cfg = RenderConfig(use_hierarchical_sampling=True, depth_sample_num=8,
                       fine_depth_sample_num=8, ray_batch_num=64,
                       probe_sample_num=4, use_vis=False,
                       fine_use_vis=False, ray_mask_point_num=4,
                       focus_sample_num=8, focus_fine_sample_num=8)
    renderer = NeurayRenderer(cfg)
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, dict(que, coords=que["coords"][:, :64]), False)
    ref_c = make_scene_encode_fn(renderer)(params, ref)

    th = 0.3
    out1 = render_frame_probe_focus(renderer, params, ref_c, que,
                                    threshold=th, image_hw=(h, w))
    out2 = render_frame_probe_focus(renderer, params, ref_c, que,
                                    threshold=th, image_hw=(h, w),
                                    probe_stride=2)
    m1 = out1["keep_mask"].reshape(h, w)
    m2 = out2["keep_mask"].reshape(h, w)
    # strided keep set must contain every stride-1 kept ray whose probe
    # pixel was sampled (even coords) — the conservative guarantee
    assert (m2[::2, ::2] | ~m1[::2, ::2]).all()
    # strided mode keeps MORE rays (dilated at probe resolution)
    assert out2["kept_rays"] >= out1["kept_rays"]
    assert np.isfinite(out2["pixel_colors_nr_fine"]).all()

    # the self-validating driver accepts the strided probe route too
    from neuray_tpu.models.renderer import render_frame_probe_auto
    out_a = render_frame_probe_auto(
        renderer, params, ref_c, que, threshold=th, image_hw=(h, w),
        dilate=0, focus=True, tol=1.0, probe_stride=2)
    assert out_a["fallback"] is None
    assert out_a["kept_rays"] == out2["kept_rays"]


def test_init_diff_scale(rng):
    """init_diff_scale=2 (the encode's diff gather on the half grid)
    uses the SAME param tree (the knob changes only the eval grid) and
    produces G' close to the exact full-grid features."""
    import jax
    import dataclasses
    from neuray_tpu.models.renderer import NeurayRenderer, RenderConfig
    from neuray_tpu.data.synthetic import make_sphere_scene

    r = np.random.RandomState(0)
    ref = jax.tree.map(jnp.asarray, make_sphere_scene(r, 4, 64, 64))
    cfg1 = RenderConfig(use_vis=False, fine_use_vis=False)
    cfg2 = dataclasses.replace(cfg1, init_diff_scale=2)
    r1, r2 = NeurayRenderer(cfg1), NeurayRenderer(cfg2)
    que = {"coords": jnp.zeros((1, 16, 2), jnp.float32),
           "poses": ref["poses"][:1], "Ks": ref["Ks"][:1],
           "depth_range": ref["depth_range"][:1]}
    p1 = r1.init({"params": jax.random.PRNGKey(0),
                  "sample": jax.random.PRNGKey(1)}, ref, que, False)
    p2 = r2.init({"params": jax.random.PRNGKey(0),
                  "sample": jax.random.PRNGKey(1)}, ref, que, False)
    assert jax.tree.structure(p1) == jax.tree.structure(p2)
    g1 = np.asarray(r1.apply(
        p1, ref, None, method=NeurayRenderer.initialize_ray_feats),
        np.float32)
    g2 = np.asarray(r2.apply(
        p1, ref, None, method=NeurayRenderer.initialize_ray_feats),
        np.float32)
    assert g1.shape == g2.shape
    assert np.isfinite(g2).all()
    # same features up to the half-grid interpolation error (random
    # conv weights amplify; trained-weight quality is measured on TPU:
    # -0.05 dB sphere / +0.03 dB blobs, docs/ARCHITECTURE.md)
    corr = np.corrcoef(g1.reshape(-1), g2.reshape(-1))[0, 1]
    assert corr > 0.8  # 64x64 scene -> 32x32 subgrid; 0.88 measured


def test_probe_skip_zero_kept_shapes(rng):
    """A frame where the probe keeps NOTHING zero-fills every output
    with the right per-key rank (colors 3-channel, render_depth
    per-ray)."""
    import jax
    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, make_scene_encode_fn,
        render_frame_probe_skip, render_frame_probe_focus)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    r = np.random.RandomState(7)
    h = w = 16
    ref = jax.tree.map(jnp.asarray, make_sphere_scene(r, 3, h, w))
    que_np = make_query(r, h, w, rn=0, full_image=True)
    que = {k: jnp.asarray(v) for k, v in que_np.items() if k != "imgs"}
    cfg = RenderConfig(use_hierarchical_sampling=True, depth_sample_num=8,
                       fine_depth_sample_num=8, ray_batch_num=64,
                       probe_sample_num=4, use_vis=False,
                       fine_use_vis=False, ray_mask_point_num=4,
                       render_depth=True)
    renderer = NeurayRenderer(cfg)
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, dict(que, coords=que["coords"][:, :64]), False)
    ref_c = make_scene_encode_fn(renderer)(params, ref)
    kb = ("pixel_colors_nr", "render_depth")
    for drv in (render_frame_probe_skip, render_frame_probe_focus):
        out = drv(renderer, params, ref_c, que, threshold=1e9,
                  keep_base=kb)
        assert out["kept_rays"] == 0
        assert out["pixel_colors_nr_fine"].shape == (1, h * w, 3)
        assert out["render_depth"].shape == (1, h * w)
        assert (out["render_depth"] == 0).all()
