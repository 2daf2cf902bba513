"""Connect the bf16 speed claim to quality: render the SAME scene with
the SAME weights under f32 and under use_bf16, and report the PSNR
delta next to the rays/s delta.

The bf16 path (bench/TPU default) stores the fused scene map and runs
the decoder/agg MLPs in bfloat16; this tool quantifies what that costs
in output accuracy. Two numbers:
  - PSNR(bf16 render, f32 render): direct numerical cost of bf16.
  - PSNR of each render vs the analytic sphere image: whether the cost
    is visible against ground truth at all (random weights, so these
    are low in absolute terms; their DIFFERENCE is the signal).

Run on the TPU (or --cpu): python tools/check_bf16_quality.py
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--rfn", type=int, default=8)
    parser.add_argument("--dn", type=int, default=64)
    parser.add_argument("--chunk", type=int, default=1024)
    parser.add_argument("--cpu", action="store_true")
    flags = parser.parse_args()

    import jax
    if flags.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_test_cache")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    print("platform:", jax.devices()[0].platform, flush=True)

    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, make_render_fn)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query
    from neuray_tpu.train.metrics import compute_psnr

    h = w = flags.size
    rng = np.random.RandomState(0)
    ref_np = make_sphere_scene(rng, flags.rfn, h, w)
    que_np = make_query(rng, h, w, rn=0, full_image=True)
    gt = que_np.pop("imgs")  # [1, h*w, 3]-compatible analytic image
    ref = {k: jnp.asarray(v) for k, v in ref_np.items()}
    que = {k: jnp.asarray(v) for k, v in que_np.items()}

    results = {}
    renders = {}
    params = None
    for tag, use_bf16 in (("f32", False), ("bf16", True)):
        cfg = RenderConfig(
            use_hierarchical_sampling=True, depth_sample_num=flags.dn,
            fine_depth_sample_num=flags.dn, ray_batch_num=flags.chunk,
            use_vis=False, fine_use_vis=False, use_bf16=use_bf16)
        renderer = NeurayRenderer(cfg)
        if params is None:  # same weights for both (dtype-free pytree)
            params = renderer.init(
                {"params": jax.random.PRNGKey(0),
                 "sample": jax.random.PRNGKey(1)},
                ref, {**que, "coords": que["coords"][:, :flags.chunk]},
                False)
        render_fn = make_render_fn(
            renderer, keep_keys=("pixel_colors_nr_fine",))
        out = render_fn(params, ref, que)
        img = np.asarray(jax.device_get(
            out["pixel_colors_nr_fine"]), np.float32)
        t0 = time.perf_counter()
        out = render_fn(params, ref, que)
        img = np.asarray(jax.device_get(
            out["pixel_colors_nr_fine"]), np.float32)
        dt = time.perf_counter() - t0
        renders[tag] = img
        results[f"rays_per_sec_{tag}"] = round(img.shape[1] / dt, 1)
        results[f"psnr_vs_gt_{tag}"] = round(float(
            compute_psnr(img.reshape(-1, 3), gt.reshape(-1, 3))), 4)

    results["psnr_bf16_vs_f32"] = round(float(compute_psnr(
        renders["bf16"].reshape(-1, 3),
        renders["f32"].reshape(-1, 3))), 2)
    results["psnr_gt_delta"] = round(
        results["psnr_vs_gt_f32"] - results["psnr_vs_gt_bf16"], 4)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
