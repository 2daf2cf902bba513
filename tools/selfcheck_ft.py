"""End-to-end self-check of the per-scene FINETUNE loop: gen checkpoint
-> FtRenderer initialization -> FtTrainer steps -> val PSNR must improve
over the initialization -> render_video_ft one pose.

Mirrors the reference loop (reference train/trainer.py:94 with
NeuralRayFtRenderer, renderer.py:331-547) on a fabricated
nerf_synthetic-format sphere scene, so it runs with zero datasets on any
backend — including the real TPU (where the numbers land in
docs/ARCHITECTURE.md).

Usage: python tools/selfcheck_ft.py [--steps 500] [--size 64]
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("--skip-empty", action="store_true",
                        help="route the CLI render through the two-phase "
                             "skip-empty driver (skip_empty_rays cfg)")
    flags = parser.parse_args()

    tmp = tempfile.mkdtemp(prefix="neuray_selfcheck_ft_")
    os.environ["NEURAY_DATA_ROOT"] = os.path.join(tmp, "data")
    os.chdir(tmp)

    import jax
    if flags.cpu:
        jax.config.update("jax_platforms", "cpu")
        from neuray_tpu.utils.compile_cache import cache_dir as _ccd
        jax.config.update("jax_compilation_cache_dir",
                          _ccd("/tmp/jax_test_cache"))
    else:
        from neuray_tpu.utils.compile_cache import cache_dir as _ccd
        jax.config.update("jax_compilation_cache_dir",
                          _ccd("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    print("platform:", jax.devices()[0].platform, flush=True)

    from neuray_tpu.data import database as D
    D.DATA_ROOT = os.path.join(tmp, "data")
    from tools.selfcheck_render import fabricate_scene
    fabricate_scene(D.DATA_ROOT, flags.size)

    # --- random-init gen checkpoint (the FT init source) ---
    import jax.numpy as jnp
    import yaml
    import orbax.checkpoint as ocp
    from neuray_tpu.models.renderer import NeurayRenderer, RenderConfig
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    gen_cfg = {
        "name": "ftcheck_gen",
        "network": "neuray_gen",
        "init_net_type": "depth",
        "use_hierarchical_sampling": True,
        "depth_sample_num": 16,
        "fine_depth_sample_num": 16,
        "dist_decoder_cfg": {"use_vis": False},
        "fine_dist_decoder_cfg": {"use_vis": False},
        "ray_batch_num": 2048,
        "ray_mask_point_num": 4,
    }
    gen_cfg_path = os.path.join(tmp, "ftcheck_gen.yaml")
    with open(gen_cfg_path, "w") as f:
        yaml.safe_dump(gen_cfg, f)
    renderer = NeurayRenderer(RenderConfig.from_cfg(gen_cfg))
    rng = np.random.RandomState(0)
    ref = {k: jnp.asarray(v) for k, v in
           make_sphere_scene(rng, 4, 32, 32).items()}
    que = {k: jnp.asarray(v) for k, v in
           make_query(rng, 32, 32, 16).items()}
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, que, True)
    ocp.PyTreeCheckpointer().save(
        os.path.join(tmp, "data", "model", "ftcheck_gen", "ckpt"),
        {"step": np.asarray(0), "best_metric": np.asarray(0.0, np.float32),
         "params": jax.device_get(params)}, force=True)

    # --- FT training from the gen ckpt ---
    from neuray_tpu.train.ft_trainer import FtTrainer

    ft_cfg = {
        "name": "ftcheck",
        "network": "neuray_ft",
        "database_name": "nerf_synthetic/toy/black_800",
        "database_split": "val_all",
        "gen_cfg": gen_cfg_path,
        "init_view_num": 4,
        "neighbor_view_num": 4,
        "train_ray_num": 256,
        "use_self_hit_prob": True,
        "use_hierarchical_sampling": True,
        "depth_sample_num": 16,
        "fine_depth_sample_num": 16,
        "ray_batch_num": 2048,
        "ray_mask_point_num": 4,
        "dist_decoder_cfg": {"use_vis": False},
        "fine_dist_decoder_cfg": {"use_vis": False},
        "loss": ["render", "consist"],
        "use_nr_fine_loss": True,
        "val_metric": ["psnr_ssim"],
        "key_metric_name": "psnr_nr_fine",
        "total_step": flags.steps,
        "train_log_step": max(flags.steps // 10, 1),
        "val_interval": flags.steps,
        "save_interval": flags.steps,
        "validate_initialization": False,
        "output_root": os.path.join(tmp, "data", "model"),
        "lr_cfg": {"lr_init": 5.0e-4, "decay_step": 100000,
                   "decay_rate": 0.5},
    }
    if flags.skip_empty:
        ft_cfg["skip_empty_rays"] = True
        ft_cfg["skip_empty_threshold"] = 0.01
    trainer = FtTrainer(ft_cfg)

    # initialization PSNR on the val views
    init_params = trainer.ft.init_params()
    from neuray_tpu.models.ft import make_ft_render_fn
    render_fn = make_ft_render_fn(trainer.ft)
    psnr_init = trainer.validate(init_params, render_fn, 0)
    print(f"init val psnr_nr_fine: {psnr_init:.3f}", flush=True)

    import time
    t0 = time.time()
    params = trainer.run()
    dt = time.time() - t0
    psnr_final = trainer.validate(params, render_fn, flags.steps)
    print(json.dumps({
        "steps": flags.steps,
        "steps_per_sec": round(flags.steps / dt, 2),
        "psnr_init": round(float(psnr_init), 3),
        "psnr_final": round(float(psnr_final), 3)}), flush=True)
    assert psnr_final > psnr_init, (
        f"FT did not improve: {psnr_final} <= {psnr_init}")

    # --- render one pose through the FT CLI path ---
    from neuray_tpu.models.ft import render_video_ft
    render_video_ft("nerf_synthetic/toy/black_800", _dump_cfg(tmp, ft_cfg),
                    "inter_4", None, False, 2048, 0, 1)
    out_dir = "data/render/nerf_synthetic_toy_black_800/ftcheck-inter_4"
    assert os.path.exists(f"{out_dir}/0-nr_fine.jpg")
    print("SELFCHECK FT: PASS", flush=True)
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


def _dump_cfg(tmp, cfg):
    import yaml
    path = os.path.join(tmp, "ft.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


if __name__ == "__main__":
    main()
