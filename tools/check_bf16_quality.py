"""Connect the reduced-precision speed claims to quality: render the
SAME scene with the SAME weights under f32, bf16, and the uint8-
quantized fused gather map, and report PSNR deltas next to rays/s.

Three configs:
  - f32: reference-grade numerics.
  - bf16 (use_bf16): bf16 fused map + bf16 decoder/agg MLPs.
  - u8 (use_bf16 + gather_quant='u8'): 403-byte gather rows (rgb exact
    for 8-bit sources, feats per-channel absmax int8).

Reported: PSNR(variant, f32 render) — direct numerical cost — and PSNR
of each vs the analytic sphere image (random weights; the DIFFERENCE is
the signal). --size 800 segments the frame like bench.py (single axon
device calls must stay under ~60s).

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
    parser.add_argument("--segment", type=int, default=163840)
    parser.add_argument("--cpu", action="store_true")
    flags = parser.parse_args()

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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    print("platform:", jax.devices()[0].platform, flush=True)

    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, make_scene_encode_fn,
        make_ray_render_fn)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query
    from neuray_tpu.train.metrics import compute_psnr

    h = w = flags.size
    rng = np.random.RandomState(0)
    ref_np = make_sphere_scene(rng, flags.rfn, h, w)
    # quantize the scene images to 8-bit sources (what every real
    # dataset provides) so the u8 rgb path is measured in its exact
    # regime rather than against unrepresentable float colors
    ref_np["imgs"] = np.round(ref_np["imgs"] * 255) / np.float32(255)
    que_np = make_query(rng, h, w, rn=0, full_image=True)
    gt = que_np.pop("imgs")  # analytic image
    ref = {k: jnp.asarray(v) for k, v in ref_np.items()}

    coords_all = np.asarray(que_np["coords"])
    n_rays = coords_all.shape[1]
    seg = min(flags.segment, n_rays)
    n_seg = -(-n_rays // seg)
    pad = n_seg * seg - n_rays
    coords_all = np.pad(coords_all, ((0, 0), (0, pad), (0, 0)), "edge")
    segments = [jnp.asarray(coords_all[:, i * seg:(i + 1) * seg])
                for i in range(n_seg)]
    que_base = {k: jnp.asarray(v) for k, v in que_np.items()
                if k != "coords"}

    variants = (("f32", dict(use_bf16=False)),
                ("bf16", dict(use_bf16=True)),
                ("u8", dict(use_bf16=True, gather_quant="u8")))

    results = {}
    renders = {}
    params = None
    for tag, kw in variants:
        cfg = RenderConfig(
            use_hierarchical_sampling=True, depth_sample_num=flags.dn,
            fine_depth_sample_num=flags.dn, ray_batch_num=flags.chunk,
            use_vis=False, fine_use_vis=False, **kw)
        renderer = NeurayRenderer(cfg)
        if params is None:  # same weights for all (dtype-free pytree)
            params = renderer.init(
                {"params": jax.random.PRNGKey(0),
                 "sample": jax.random.PRNGKey(1)},
                ref, {**que_base,
                      "coords": segments[0][:, :flags.chunk]}, False)
        encode_fn = make_scene_encode_fn(renderer)
        rays_fn = make_ray_render_fn(
            renderer, keep_keys=("pixel_colors_nr_fine",))

        def render_frame():
            ref_c = encode_fn(params, ref)
            pending = [rays_fn(params, ref_c,
                               dict(que_base, coords=c))
                       for c in segments]
            outs = [np.asarray(jax.device_get(o["pixel_colors_nr_fine"]),
                               np.float32) for o in pending]
            return np.concatenate(outs, axis=1)[:, :n_rays]

        render_frame()  # warmup/compile
        t0 = time.perf_counter()
        img = render_frame()
        dt = time.perf_counter() - t0
        renders[tag] = img
        results[f"rays_per_sec_{tag}"] = round(n_rays / dt, 1)
        results[f"psnr_vs_gt_{tag}"] = round(float(
            compute_psnr(img.reshape(-1, 3), gt.reshape(-1, 3))), 4)
        print(tag, "done", results[f"rays_per_sec_{tag}"], "rays/s",
              flush=True)

    for tag in ("bf16", "u8"):
        results[f"psnr_{tag}_vs_f32"] = round(float(compute_psnr(
            renders[tag].reshape(-1, 3),
            renders["f32"].reshape(-1, 3))), 2)
        results[f"psnr_gt_delta_{tag}"] = round(
            results["psnr_vs_gt_f32"] - results[f"psnr_vs_gt_{tag}"], 4)
    results["size"] = h
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
