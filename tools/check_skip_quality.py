"""Quantify the two-phase empty-ray-skipping render at bench shape.

For the trained sphere scene (tools/bench_weights.npz, produced by
tools/make_bench_weights.py) this renders one 800x800 query view
  (a) full two-pass (every ray gets the fine pass; segmented like
      bench.py), and
  (b) skip-empty at several coarse-hit-prob thresholds
      (models/renderer.render_frame_skip_empty),
and reports, per threshold: kept-ray fraction, wall time, rays/s,
PSNR(skip image vs full image) and PSNR vs the analytic GT for both.
Kept rays are bit-identical to the full render; the PSNR delta is
entirely from skipped rays showing their coarse estimate.

Usage: python tools/check_skip_quality.py [--size 800] [--cpu]
       [--thresholds 0.01,0.05,0.1]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

TOOLS = os.path.dirname(os.path.abspath(__file__))


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--segment", type=int, default=327680)
    ap.add_argument("--thresholds", default="0.01,0.05,0.1")
    ap.add_argument("--probe", action="store_true",
                    help="also sweep the THREE-phase probe-skip render")
    ap.add_argument("--probe-samples", default="8,16",
                    help="probe_sample_num values to sweep")
    ap.add_argument("--probe-thresholds", default="0.001,0.005,0.02")
    ap.add_argument("--probe-dilates", default="0,1,2")
    ap.add_argument("--focus", action="store_true",
                    help="sweep the probe-FOCUSED render "
                         "(render_frame_probe_focus)")
    ap.add_argument("--focus-samples", default="16:32,32:64",
                    help="comma list of focus_sample_num:"
                         "focus_fine_sample_num pairs")
    ap.add_argument("--focus-margins", default="1")
    ap.add_argument("--probe-strides", default="1",
                    help="focus mode: probe every stride-th pixel "
                         "(stride^2 fewer probe taps, conservative "
                         "window upsampling)")
    ap.add_argument("--auto", action="store_true",
                    help="run the self-validating auto_focus driver "
                         "(render_frame_probe_auto): reports the "
                         "accepted probe size, audited false-skip "
                         "rate, and whether it escalated/fell back")
    ap.add_argument("--auto-tol", type=float, default=0.02)
    ap.add_argument("--auto-win-tol-db", type=float, default=0.05,
                    help="max PREDICTED PSNR cost (dB) of the focus "
                         "windows on kept rays before they are "
                         "rejected (estimate_window_clip clip_db)")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--scene", default="sphere",
                    choices=["sphere", "blobs", "room"],
                    help="blobs: 5 spheres incl. a thin r=0.08 one; "
                         "room: blobs ENCLOSED by a textured room "
                         "sphere — every ray hits geometry, kept "
                         "fraction ~100%%, skipping cannot win "
                         "(weights: tools/make_bench_weights.py "
                         "--scene <name>)")
    ap.add_argument("--cpu", action="store_true")
    flags = ap.parse_args()
    if flags.weights is None:
        name = ("bench_weights.npz" if flags.scene == "sphere"
                else f"bench_weights_{flags.scene}.npz")
        flags.weights = os.path.join(TOOLS, name)

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

    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, make_scene_encode_fn,
        make_ray_render_fn, render_frame_skip_empty)
    from neuray_tpu.data.synthetic import (
        make_sphere_scene, make_query, make_blob_spheres,
        make_room_spheres, UNIT_SPHERE, DEPTH_RANGE, ROOM_DEPTH_RANGE)
    from neuray_tpu.utils.params_io import load_params_npz

    on_tpu = jax.devices()[0].platform == "tpu"
    h = w = flags.size if on_tpu else min(flags.size, 64)
    dn = 64 if on_tpu else 16
    chunk = flags.chunk if on_tpu else 64
    seg = flags.segment if on_tpu else 4096

    cfg = RenderConfig(
        use_hierarchical_sampling=True, depth_sample_num=dn,
        fine_depth_sample_num=dn, ray_batch_num=chunk,
        use_vis=False, fine_use_vis=False, use_bf16=on_tpu,
        gather_quant="u8" if on_tpu else "none")
    renderer = NeurayRenderer(cfg)
    params = load_params_npz(flags.weights)

    rng = np.random.RandomState(0)  # bench scene
    spheres = {"sphere": UNIT_SPHERE,
               "blobs": make_blob_spheres(np.random.RandomState(42)),
               "room": make_room_spheres(np.random.RandomState(42)),
               }[flags.scene]
    depth_range = (ROOM_DEPTH_RANGE if flags.scene == "room"
                   else DEPTH_RANGE)
    ref = {k: jnp.asarray(v) for k, v in
           make_sphere_scene(rng, 8, h, w, spheres, depth_range).items()}
    que_np = make_query(rng, h, w, rn=0, full_image=True, spheres=spheres,
                        depth_range=depth_range)
    gt = que_np["imgs"][0].reshape(-1, 3)
    coords_all = que_np["coords"]
    n_rays = coords_all.shape[1]
    que_base = {k: jnp.asarray(v) for k, v in que_np.items()
                if k not in ("imgs", "coords")}

    encode_fn = make_scene_encode_fn(renderer)
    rays_fn = make_ray_render_fn(
        renderer, keep_keys=("pixel_colors_nr", "pixel_colors_nr_fine"))

    n_seg = -(-n_rays // seg)
    pad = n_seg * seg - n_rays
    coords_pad = np.pad(coords_all, ((0, 0), (0, pad), (0, 0)), "edge")
    segments = [jnp.asarray(coords_pad[:, i * seg:(i + 1) * seg])
                for i in range(n_seg)]

    ref_c = encode_fn(params, ref)

    def render_full():
        pending = [rays_fn(params, ref_c, dict(que_base, coords=cc))
                   for cc in segments]
        outs = [np.asarray(jax.device_get(o["pixel_colors_nr_fine"]))
                for o in pending]
        return np.concatenate(outs, axis=1)[0, :n_rays]

    full = render_full()  # warmup/compile
    t0 = time.perf_counter()
    full = render_full()
    t_full = time.perf_counter() - t0
    print(json.dumps({
        "mode": "full", "time_s": round(t_full, 2),
        "rays_per_s": round(n_rays / t_full, 1),
        "psnr_vs_gt": round(psnr(full, gt), 3)}), flush=True)

    que_all = dict(que_base, coords=jnp.asarray(coords_all))

    if flags.auto:
        # self-validating auto_focus: the driver must ESCALATE (or fall
        # back to the exact gate) on scenes where the probe misses,
        # rather than lose quality — this is the adversarial-scene test
        from neuray_tpu.models.renderer import render_frame_probe_auto
        for psn in [int(x) for x in flags.probe_samples.split(",")][:1]:
            for th in [float(x) for x in
                       flags.probe_thresholds.split(",")]:
                cfg_a = RenderConfig(
                    use_hierarchical_sampling=True,
                    depth_sample_num=dn, fine_depth_sample_num=dn,
                    ray_batch_num=chunk, probe_sample_num=psn,
                    focus_sample_num=min(16, dn),
                    focus_fine_sample_num=min(32, dn),
                    use_vis=False, fine_use_vis=False, use_bf16=on_tpu,
                    gather_quant="u8" if on_tpu else "none")
                renderer_a = NeurayRenderer(cfg_a)
                ref_ca = make_scene_encode_fn(renderer_a)(params, ref)
                stride = [int(x) for x in
                          flags.probe_strides.split(",")][0]
                out = render_frame_probe_auto(
                    renderer_a, params, ref_ca, que_all, threshold=th,
                    image_hw=(h, w), dilate=1, focus=True,
                    tol=flags.auto_tol, win_tol_db=flags.auto_win_tol_db,
                    probe_stride=stride)
                t0 = time.perf_counter()
                out = render_frame_probe_auto(
                    renderer_a, params, ref_ca, que_all, threshold=th,
                    image_hw=(h, w), dilate=1, focus=True,
                    tol=flags.auto_tol, win_tol_db=flags.auto_win_tol_db,
                    probe_stride=stride)
                dt = time.perf_counter() - t0
                img = out["pixel_colors_nr_fine"][0]
                print(json.dumps({
                    "mode": "auto_focus", "start_probe_samples": psn,
                    "accepted_probe_samples": out["probe_sample_num"],
                    "false_skip_rate": round(out["false_skip_rate"], 4),
                    "window_clip": round(out.get("window_clip", 0.0), 4),
                    "window_clip_db": round(
                        out.get("window_clip_db", 0.0), 4),
                    "fallback": out["fallback"], "threshold": th,
                    "probe_stride": stride,
                    "kept_fraction": round(
                        out.get("kept_rays", n_rays) / n_rays, 4),
                    "time_s": round(dt, 2),
                    "rays_per_s": round(n_rays / dt, 1),
                    "psnr_vs_full": round(psnr(img, full), 3),
                    "psnr_vs_gt": round(psnr(img, gt), 3)}), flush=True)

    for th in [float(x) for x in flags.thresholds.split(",")]:
        out = render_frame_skip_empty(renderer, params, ref_c, que_all,
                                      threshold=th)  # warmup/compile
        t0 = time.perf_counter()
        out = render_frame_skip_empty(renderer, params, ref_c, que_all,
                                      threshold=th)
        dt = time.perf_counter() - t0
        img = out["pixel_colors_nr_fine"][0]
        print(json.dumps({
            "mode": "skip", "threshold": th,
            "kept_fraction": round(out["kept_rays"] / n_rays, 4),
            "time_s": round(dt, 2),
            "rays_per_s": round(n_rays / dt, 1),
            "psnr_vs_full": round(psnr(img, full), 3),
            "psnr_vs_gt": round(psnr(img, gt), 3)}), flush=True)

    if flags.focus:
        from neuray_tpu.models.renderer import render_frame_probe_focus
        for psn in [int(x) for x in flags.probe_samples.split(",")]:
            for pair in flags.focus_samples.split(","):
                fsn, ffn = (int(x) for x in pair.split(":"))
                for margin in [int(x) for x in
                               flags.focus_margins.split(",")]:
                    cfg_f = RenderConfig(
                        use_hierarchical_sampling=True,
                        depth_sample_num=dn, fine_depth_sample_num=dn,
                        ray_batch_num=chunk, probe_sample_num=psn,
                        focus_sample_num=min(fsn, dn),
                        focus_fine_sample_num=min(ffn, dn),
                        focus_margin=margin,
                        use_vis=False, fine_use_vis=False,
                        use_bf16=on_tpu,
                        gather_quant="u8" if on_tpu else "none")
                    renderer_f = NeurayRenderer(cfg_f)
                    ref_cf = make_scene_encode_fn(renderer_f)(params, ref)
                    for th in [float(x) for x in
                               flags.probe_thresholds.split(",")]:
                        for dil in [int(x) for x in
                                    flags.probe_dilates.split(",")]:
                            for stride in [int(x) for x in
                                           flags.probe_strides.split(",")]:
                                out = render_frame_probe_focus(
                                    renderer_f, params, ref_cf, que_all,
                                    threshold=th, image_hw=(h, w),
                                    dilate=dil, probe_stride=stride)
                                t0 = time.perf_counter()
                                out = render_frame_probe_focus(
                                    renderer_f, params, ref_cf, que_all,
                                    threshold=th, image_hw=(h, w),
                                    dilate=dil, probe_stride=stride)
                                dt = time.perf_counter() - t0
                                img = out["pixel_colors_nr_fine"][0]
                                print(json.dumps({
                                    "mode": "focus", "probe_samples": psn,
                                    "focus_samples": f"{fsn}:{ffn}",
                                    "margin": margin, "threshold": th,
                                    "dilate": dil, "probe_stride": stride,
                                    "kept_fraction": round(
                                        out["kept_rays"] / n_rays, 4),
                                    "time_s": round(dt, 2),
                                    "rays_per_s": round(n_rays / dt, 1),
                                    "psnr_vs_full": round(
                                        psnr(img, full), 3),
                                    "psnr_vs_gt": round(
                                        psnr(img, gt), 3)}),
                                    flush=True)

    if not flags.probe:
        return

    from neuray_tpu.models.renderer import render_frame_probe_skip
    for psn in [int(x) for x in flags.probe_samples.split(",")]:
        cfg_p = RenderConfig(
            use_hierarchical_sampling=True, depth_sample_num=dn,
            fine_depth_sample_num=dn, ray_batch_num=chunk,
            probe_sample_num=psn, use_vis=False, fine_use_vis=False,
            use_bf16=on_tpu, gather_quant="u8" if on_tpu else "none")
        renderer_p = NeurayRenderer(cfg_p)
        encode_p = make_scene_encode_fn(renderer_p)
        ref_cp = encode_p(params, ref)
        for th in [float(x) for x in flags.probe_thresholds.split(",")]:
            for dil in [int(x) for x in flags.probe_dilates.split(",")]:
                out = render_frame_probe_skip(
                    renderer_p, params, ref_cp, que_all, threshold=th,
                    image_hw=(h, w), dilate=dil)
                t0 = time.perf_counter()
                out = render_frame_probe_skip(
                    renderer_p, params, ref_cp, que_all, threshold=th,
                    image_hw=(h, w), dilate=dil)
                dt = time.perf_counter() - t0
                img = out["pixel_colors_nr_fine"][0]
                print(json.dumps({
                    "mode": "probe", "probe_samples": psn,
                    "threshold": th, "dilate": dil,
                    "kept_fraction": round(out["kept_rays"] / n_rays, 4),
                    "time_s": round(dt, 2),
                    "rays_per_s": round(n_rays / dt, 1),
                    "psnr_vs_full": round(psnr(img, full), 3),
                    "psnr_vs_gt": round(psnr(img, gt), 3)}), flush=True)


if __name__ == "__main__":
    main()
