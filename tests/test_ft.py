"""Finetune-path test: FT renderer from scratch (random ray feats) on a
fabricated nerf_synthetic scene — one train step must run and update
both ray_feats and network params."""
import json

import numpy as np
import cv2
import jax
import optax
import pytest


@pytest.fixture(scope="module")
def fake_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    scene = root / "nerf_synthetic" / "toy"
    rng = np.random.RandomState(0)

    def make_frames(split, names):
        (scene / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for k, name in enumerate(names):
            img = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
            img[:, :, 3] = 255
            cv2.imwrite(str(scene / split / f"{name}.png"), img)
            # look-at-origin cameras on a circle
            ang = 2 * np.pi * k / max(len(names), 1)
            c = np.asarray([np.cos(ang) * 4, np.sin(ang) * 4, 1.5])
            z = -c / np.linalg.norm(c)
            up = np.asarray([0.0, 0.0, 1.0])
            x = np.cross(up, z)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            R = np.stack([x, y, z], 0)
            c2w = np.eye(4)
            # transforms json stores cam->world OpenGL; invert our
            # OpenCV world->cam and flip
            flip = np.diag([1, -1, -1])
            R_gl = (flip @ R)
            c2w[:3, :3] = R_gl.T
            c2w[:3, 3] = c
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": c2w.tolist()})
        with open(scene / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)

    make_frames("train", [f"r_{i}" for i in range(10)])
    make_frames("val", ["r_39", "r_2", "r_94", "r_62", "r_23", "r_36"])
    make_frames("test", ["r_0"])
    return str(root)


def test_ft_train_step(fake_scene, monkeypatch):
    from neuray_tpu.data import database as D
    monkeypatch.setattr(D, "DATA_ROOT", fake_scene)
    from neuray_tpu.models.ft import FtRenderer
    from neuray_tpu.train.losses import build_losses

    cfg = {
        "database_name": "nerf_synthetic/toy/black_800",
        "database_split": "val_all",
        "gen_cfg": None,
        "use_validation": True,
        "neighbor_view_num": 4,
        "train_ray_num": 32,
        "ray_feats_res": [8, 8],
        "ray_feats_dim": 32,
        "use_self_hit_prob": True,
        "use_hierarchical_sampling": True,
        "depth_sample_num": 8,
        "fine_depth_sample_num": 8,
        "ray_batch_num": 32,
        "ray_mask_point_num": 4,
        "dist_decoder_cfg": {"use_vis": False},
        "fine_dist_decoder_cfg": {"use_vis": False},
    }
    ft = FtRenderer(cfg)
    assert len(ft.ref_ids) == 10

    params = ft.init_params()
    assert params["ray_feats"].shape == (10, 8, 8, 32)

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    loss_fn = build_losses({"loss": ["render", "consist"],
                            "use_ray_mask": True,
                            "use_nr_fine_loss": True})
    step_fn = ft.make_train_step(optimizer, loss_fn)

    rng_np = np.random.RandomState(0)
    ray_feats_before = np.asarray(params["ray_feats"]).copy()
    for i in range(2):
        que_i, ref_idx = ft.sample_train_indices(rng_np)
        que = ft._build_que_train(ref_idx, que_i, rng_np)
        params, opt_state, metrics = step_fn(
            params, opt_state, np.asarray(ref_idx), que,
            np.asarray(que_i), jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss_total"]))
        assert "loss_prob" in metrics  # consistency loss active
    # the gathered views' ray feats must have been updated
    after = np.asarray(params["ray_feats"])
    assert np.abs(after - ray_feats_before).max() > 0


@pytest.mark.parametrize("train_ray_num", [32, 30])
def test_ft_sharded_step_matches_single_device(fake_scene, monkeypatch,
                                               train_ray_num):
    """Ray-sharded FT train step (make_sharded_train_step, 8-device
    mesh): with a deterministic program (no stochastic fine resample)
    the GLOBAL loss value and the updated params must match the
    single-device step exactly (the psum'd ray reductions in
    train/losses.py reproduce the unsharded normalizations).

    train_ray_num=30 exercises the NON-divisible path: the batch is
    padded +2 rays to split over 8 devices, and the 0-weight pad rays
    must drop out of every loss normalization so the result is still
    leaf-exact vs the unpadded single-device step."""
    from neuray_tpu.data import database as D
    monkeypatch.setattr(D, "DATA_ROOT", fake_scene)
    from neuray_tpu.models.ft import FtRenderer
    from neuray_tpu.train.losses import build_losses
    from neuray_tpu.parallel.sharding import make_mesh, unreplicate

    cfg = {
        "database_name": "nerf_synthetic/toy/black_800",
        "database_split": "val_all",
        "gen_cfg": None,
        "use_validation": False,
        "neighbor_view_num": 4,
        "train_ray_num": train_ray_num,
        "ray_feats_res": [8, 8],
        "ray_feats_dim": 32,
        "use_self_hit_prob": True,
        "use_hierarchical_sampling": False,
        "depth_sample_num": 8,
        "ray_batch_num": 32,
        "ray_mask_point_num": 4,
        "loss": ["render", "consist"],
        "use_ray_mask": True,
        "dist_decoder_cfg": {"use_vis": False},
    }
    ft = FtRenderer(cfg)
    params0 = ft.init_params()
    # SGD, not Adam: the equality target is the GRADIENT (psum of the
    # shards == the unsharded ray sum); Adam's m/(sqrt(v)+eps) blows a
    # ~1e-7 f32 reduction-order difference on a near-zero grad up to
    # lr-scale, which would force a meaninglessly loose tolerance.
    # With SGD the param diff IS lr x grad diff.
    optimizer = optax.sgd(1e-2)

    rng_np = np.random.RandomState(3)
    que_i, ref_idx = ft.sample_train_indices(rng_np)
    que = ft._build_que_train(ref_idx, que_i, rng_np)
    args = (np.asarray(ref_idx), que, np.asarray(que_i),
            jax.random.PRNGKey(0))

    # sharded first: it replicates COPIES of params0, so the donation
    # in the single-device step afterwards can't invalidate its inputs
    mesh = make_mesh(8)
    sharded = ft.make_sharded_train_step(optimizer, mesh)
    p8_r, _, m8_r = sharded(params0, optimizer.init(params0), *args)
    p8, m8 = unreplicate(p8_r), unreplicate(m8_r)

    single = ft.make_train_step(optimizer, build_losses(cfg))
    p1, _, m1 = single(params0, optimizer.init(params0), *args)

    np.testing.assert_allclose(float(m8["loss_total"]),
                               float(m1["loss_total"]),
                               rtol=1e-5, atol=1e-7)
    for k in m1:
        np.testing.assert_allclose(float(m8[k]), float(m1[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
    # param diff = lr x grad diff (SGD); tolerance covers only f32
    # psum-vs-serial reduction-order noise
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        p8, p1)


def test_ft_skip_empty_matches_render_fn(fake_scene, monkeypatch):
    """The FT CLI's skip-empty branch (make_ft_encode_fn +
    render_frame_skip_empty, ft.py render_video_ft) at threshold=-1
    reproduces make_ft_render_fn exactly — the FT/gen split is only in
    how ray_feats_raw is produced, the chunked drivers are shared."""
    import jax.numpy as jnp
    from neuray_tpu.data import database as D
    monkeypatch.setattr(D, "DATA_ROOT", fake_scene)
    from neuray_tpu.models.ft import (
        FtRenderer, make_ft_render_fn, make_ft_encode_fn)
    from neuray_tpu.models.renderer import render_frame_skip_empty

    cfg = {
        "database_name": "nerf_synthetic/toy/black_800",
        "database_split": "val_all",
        "gen_cfg": None,
        "use_validation": False,
        "neighbor_view_num": 4,
        "train_ray_num": 32,
        "ray_feats_res": [8, 8],
        "ray_feats_dim": 32,
        "use_self_hit_prob": False,
        "use_hierarchical_sampling": True,
        "depth_sample_num": 8,
        "fine_depth_sample_num": 8,
        "ray_batch_num": 64,
        "ray_mask_point_num": 4,
        "dist_decoder_cfg": {"use_vis": False},
        "fine_dist_decoder_cfg": {"use_vis": False},
    }
    ft = FtRenderer(cfg)
    params = ft.init_params()

    ref_idx = np.arange(cfg["neighbor_view_num"])
    ref = ft._slice_ref(ref_idx)
    ref["ray_feats_raw"] = jnp.take(
        params["ray_feats"], jnp.asarray(ref_idx), axis=0)
    h = w = 16
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    coords = np.stack([xs, ys], -1).reshape(1, -1, 2).astype(np.float32)
    que = {"coords": jnp.asarray(coords),
           "poses": jnp.asarray(ft.ref_info["poses"][:1]),
           "Ks": jnp.asarray(ft.ref_info["Ks"][:1]),
           "depth_range": jnp.asarray(ft.ref_info["depth_range"][:1])}

    full = make_ft_render_fn(ft)(params["net"], dict(ref), que)
    full_nr = np.asarray(full["pixel_colors_nr"], np.float32)
    full_fine = np.asarray(full["pixel_colors_nr_fine"], np.float32)

    ref_c = make_ft_encode_fn(ft)(params["net"], dict(ref))
    out = render_frame_skip_empty(ft.renderer, params["net"], ref_c, que,
                                  threshold=-1.0,
                                  keep_base=("pixel_colors_nr",))
    assert out["kept_rays"] == h * w
    np.testing.assert_allclose(out["pixel_colors_nr"], full_nr, atol=1e-6)
    np.testing.assert_allclose(out["pixel_colors_nr_fine"], full_fine,
                               atol=1e-6)

    # the probe route (ft cfg skip_mode: probe) over the same encoded
    # ref: threshold=-1 keeps all rays and matches exactly too
    from neuray_tpu.models.renderer import render_frame_probe_skip
    out_p = render_frame_probe_skip(ft.renderer, params["net"], ref_c,
                                    que, threshold=-1.0,
                                    keep_base=("pixel_colors_nr",),
                                    image_hw=(h, w), dilate=1)
    assert out_p["kept_rays"] == h * w
    np.testing.assert_allclose(out_p["pixel_colors_nr_fine"], full_fine,
                               atol=1e-6)


def test_ft_focus_and_auto_routes(fake_scene, monkeypatch):
    """The FT CLI's probe_focus and auto_focus skip modes run over an
    FT-encoded scene: finite outputs, zeros on skipped rays, and the
    auto route reports its audit fields."""
    import jax.numpy as jnp
    from neuray_tpu.data import database as D
    monkeypatch.setattr(D, "DATA_ROOT", fake_scene)
    from neuray_tpu.models.ft import FtRenderer, make_ft_encode_fn
    from neuray_tpu.models.renderer import (
        render_frame_probe_focus, render_frame_probe_auto)

    cfg = {
        "database_name": "nerf_synthetic/toy/black_800",
        "database_split": "val_all",
        "gen_cfg": None,
        "use_validation": False,
        "neighbor_view_num": 4,
        "train_ray_num": 32,
        "ray_feats_res": [8, 8],
        "ray_feats_dim": 32,
        "use_self_hit_prob": False,
        "use_hierarchical_sampling": True,
        "depth_sample_num": 8,
        "fine_depth_sample_num": 8,
        "ray_batch_num": 64,
        "ray_mask_point_num": 4,
        "probe_sample_num": 4,
        "focus_sample_num": 8,
        "focus_fine_sample_num": 8,
        "dist_decoder_cfg": {"use_vis": False},
        "fine_dist_decoder_cfg": {"use_vis": False},
    }
    ft = FtRenderer(cfg)
    params = ft.init_params()

    ref_idx = np.arange(cfg["neighbor_view_num"])
    ref = ft._slice_ref(ref_idx)
    ref["ray_feats_raw"] = jnp.take(
        params["ray_feats"], jnp.asarray(ref_idx), axis=0)
    h = w = 16
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    coords = np.stack([xs, ys], -1).reshape(1, -1, 2).astype(np.float32)
    que = {"coords": jnp.asarray(coords),
           "poses": jnp.asarray(ft.ref_info["poses"][:1]),
           "Ks": jnp.asarray(ft.ref_info["Ks"][:1]),
           "depth_range": jnp.asarray(ft.ref_info["depth_range"][:1])}
    ref_c = make_ft_encode_fn(ft)(params["net"], dict(ref))

    out_f = render_frame_probe_focus(
        ft.renderer, params["net"], ref_c, que, threshold=0.3,
        keep_base=("pixel_colors_nr",), image_hw=(h, w), dilate=1)
    assert np.isfinite(out_f["pixel_colors_nr_fine"]).all()
    skipped = ~out_f["keep_mask"]
    if skipped.any():
        assert (out_f["pixel_colors_nr_fine"][0, skipped] == 0).all()

    out_a = render_frame_probe_auto(
        ft.renderer, params["net"], ref_c, que, threshold=0.3,
        keep_base=("pixel_colors_nr",), image_hw=(h, w), dilate=1,
        focus=True, tol=1.0)
    assert out_a["fallback"] is None
    assert 0.0 <= out_a["false_skip_rate"] <= 1.0
    assert np.isfinite(out_a["pixel_colors_nr_fine"]).all()
