"""End-to-end self-check of the render + eval CLI surface.

Fabricates a nerf_synthetic-format scene (analytic sphere renders with
synthetic COLMAP depth maps) under a temp data root, writes a
randomly-initialized gen checkpoint, runs render.py's render_video_gen
on the eval split, and scores the outputs with the eval-CLI metrics.
No datasets are required — this validates the full CLI pipeline
(database -> splits -> working views -> sharded render -> image save ->
GT dump -> metrics) on any backend.

Usage: python tools/selfcheck_render.py [--size 64]
"""
import argparse
import json
import os
import struct
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import cv2


def write_depth_bin(path, depth):
    h, w = depth.shape
    with open(path, "wb") as f:
        f.write(f"{w}&{h}&1&".encode())
        f.write(np.ascontiguousarray(
            depth[:, :, None].transpose(1, 0, 2)).astype(
                np.float32).tobytes(order="F"))


def fabricate_scene(root, size):
    from neuray_tpu.data.synthetic import look_at_camera, render_sphere_view
    scene = os.path.join(root, "nerf_synthetic", "toy")
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(scene, "colmap_depth"), exist_ok=True)

    def gl_c2w(pose):
        R, t = pose[:, :3], pose[:, 3]
        flip = np.diag([1.0, -1.0, -1.0])
        R_gl = flip @ R
        c = -R.T @ t
        c2w = np.eye(4)
        c2w[:3, :3] = R_gl.T
        c2w[:3, 3] = c
        return c2w

    for split, names in (("train", [f"r_{i}" for i in range(12)]),
                         ("val", ["r_39", "r_2", "r_94", "r_62",
                                  "r_23", "r_36"]),
                         ("test", [f"r_{i}" for i in range(3)])):
        os.makedirs(os.path.join(scene, split), exist_ok=True)
        frames = []
        for name in names:
            pose, K = look_at_camera(rng, size, size, radius=4.0)
            rgb, zdepth, mask = render_sphere_view(pose, K, size, size)
            rgba = np.concatenate(
                [np.clip(rgb * 255, 0, 255).astype(np.uint8),
                 (mask * 255).astype(np.uint8)[..., None]], -1)
            cv2.imwrite(os.path.join(scene, split, f"{name}.png"),
                        rgba[:, :, [2, 1, 0, 3]])
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": gl_c2w(pose).tolist()})
            if split == "train":
                write_depth_bin(
                    os.path.join(scene, "colmap_depth",
                                 f"{split}-{name}.png.geometric.bin"),
                    zdepth)
        # NOTE: the fabricated cameras share no single K; the database
        # reads K from transforms json camera_angle_x, so use the last
        # K's fov (all Ks here are identical by construction).
        fx = K[0, 0]
        angle = 2 * np.arctan(0.5 * size / fx)
        with open(os.path.join(scene, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": float(angle), "frames": frames},
                      f)
    return scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--keep", action="store_true")
    parser.add_argument("--skip_empty", action="store_true",
                        help="drive the two-phase empty-ray-skipping "
                             "CLI branch (cfg: skip_empty_rays)")
    parser.add_argument("--skip_mode", default="two_phase",
                        choices=["two_phase", "probe", "probe_focus",
                                 "auto", "auto_focus"],
                        help="with --skip_empty: which skip driver the "
                             "CLI routes through (cfg: skip_mode)")
    parser.add_argument("--probe_stride", type=int, default=1,
                        help="with --skip_empty focus modes: probe "
                             "subgrid stride (cfg: probe_stride)")
    parser.add_argument("--devices", type=int, default=0,
                        help="run the CLI on an N-device virtual CPU "
                             "mesh (0 = whatever backend is default) — "
                             "proves render.py takes the SHARDED "
                             "full/probe/focus paths end-to-end")
    flags = parser.parse_args()

    tmp = tempfile.mkdtemp(prefix="neuray_selfcheck_")
    os.environ["NEURAY_DATA_ROOT"] = os.path.join(tmp, "data")
    os.chdir(tmp)

    if flags.devices:
        xf = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in xf:
            os.environ["XLA_FLAGS"] = (
                f"{xf} --xla_force_host_platform_device_count="
                f"{flags.devices}").strip()

    import jax
    if flags.devices:
        jax.config.update("jax_platforms", "cpu")
        from neuray_tpu.utils.compile_cache import cache_dir as _ccd
        jax.config.update("jax_compilation_cache_dir",
                          _ccd("/tmp/jax_test_cache"))
        n = len(jax.devices())
        assert n == flags.devices, \
            f"wanted {flags.devices} CPU devices, got {n} (jax already " \
            f"initialized?)"
        print(f"selfcheck on {n}-device virtual CPU mesh", flush=True)
    else:
        from neuray_tpu.utils.compile_cache import cache_dir as _ccd
        jax.config.update("jax_compilation_cache_dir",
                          _ccd("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from neuray_tpu.data import database as D
    D.DATA_ROOT = os.path.join(tmp, "data")
    fabricate_scene(D.DATA_ROOT, flags.size)

    # random-init gen checkpoint at small sample counts
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from neuray_tpu.models.renderer import NeurayRenderer, RenderConfig
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    cfg_dict = {
        "name": "selfcheck_gen",
        "network": "neuray_gen",
        "init_net_type": "depth",
        "use_hierarchical_sampling": True,
        "depth_sample_num": 16,
        "fine_depth_sample_num": 16,
        "dist_decoder_cfg": {"use_vis": False},
        "fine_dist_decoder_cfg": {"use_vis": False},
        "ray_batch_num": 2048,
    }
    if flags.skip_empty:
        cfg_dict["skip_empty_rays"] = True
        cfg_dict["skip_empty_threshold"] = 0.05
        cfg_dict["skip_mode"] = flags.skip_mode
        cfg_dict["probe_sample_num"] = 8
        cfg_dict["probe_stride"] = flags.probe_stride
    cfg_path = os.path.join(tmp, "selfcheck_gen.yaml")
    import yaml
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    rcfg = RenderConfig.from_cfg(cfg_dict)
    renderer = NeurayRenderer(rcfg)
    rng = np.random.RandomState(0)
    ref = {k: jnp.asarray(v) for k, v in
           make_sphere_scene(rng, 4, 32, 32).items()}
    que = {k: jnp.asarray(v) for k, v in
           make_query(rng, 32, 32, 16).items()}
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, que, True)
    ckpt_dir = os.path.join(tmp, "data", "model", "selfcheck_gen", "ckpt")
    ocp.PyTreeCheckpointer().save(
        ckpt_dir, {"step": np.asarray(0),
                   "best_metric": np.asarray(0.0, np.float32),
                   "params": jax.device_get(params)}, force=True)

    # drive the render CLI path
    from render import render_video_gen
    render_video_gen("nerf_synthetic/toy/black_800", cfg_path, "eval",
                     None, True, 1024, 0, 2)

    out_dir = "data/render/nerf_synthetic_toy_black_800/selfcheck_gen-eval"
    gt_dir = "data/render/nerf_synthetic_toy_black_800/gt"
    rendered = sorted(os.listdir(out_dir))
    print("rendered files:", rendered)
    assert any(f.endswith("-nr_fine.jpg") for f in rendered)
    assert any(f.endswith("-depth.png") for f in rendered)
    assert os.path.exists(f"{gt_dir}/0.jpg")

    # score with the eval metrics
    from neuray_tpu.train.metrics import compute_psnr, compute_ssim
    pr = cv2.imread(f"{out_dir}/0-nr_fine.jpg")
    gt = cv2.imread(f"{gt_dir}/0.jpg")
    psnr = compute_psnr(gt, pr)
    ssim = compute_ssim(gt, pr)
    print(f"selfcheck PSNR {psnr:.2f} SSIM {ssim:.3f} "
          f"(random weights — low values expected)")
    assert np.isfinite(psnr) and np.isfinite(ssim)
    print("SELFCHECK RENDER CLI: PASS")
    if not flags.keep:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
