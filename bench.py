"""Benchmark: rays/sec/chip for the flagship NeuRay-depth render.

Renders a full 800x800 novel view (640k rays, 64 coarse + 64 fine
samples, 8 reference views — the reference's neuray_gen_depth render
workload, reference configs/gen/neuray_gen_depth.yaml + render.py:205)
and reports throughput as ONE JSON line.

The frame is rendered in ray segments of ~64k rays per device call:
single >60s programs get killed by the axon TPU tunnel (observed worker
crashes), and segmenting costs <2% dispatch overhead.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so
the baseline is MEASURED by running the actual reference renderer
(torch, random weights — the compute path is weight-value independent)
on this host via tools/bench_reference.py, which writes
tools/baseline_measured.json. The reference only runs on CPU here;
tools/bench_reference.py therefore also times THIS repo on the same
CPU for a platform-equal ratio, and vs_baseline below scales the
measured CPU number by REF_GPU_OVER_CPU, a deliberately GENEROUS
allowance for the reference on a datacenter GPU, so vs_baseline
understates rather than overstates the win. Fallback if the json is
missing: the old 1e4 rays/s estimate.
"""
import json
import os
import time

import numpy as np

ESTIMATED_REF_RAYS_PER_SEC = 1.0e4
REF_GPU_OVER_CPU = 100.0  # generous GPU-vs-1-core-CPU allowance


def _baseline_rays_per_sec():
    """Returns (baseline, kind, raw_measured_cpu, multiplier): the raw
    measured CPU number and the GPU-allowance multiplier are reported
    separately so consumers can recompute the ratio under their own
    GPU assumption."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "baseline_measured.json")
    try:
        with open(path) as f:
            measured = json.load(f)["reference_rays_per_sec"]
        return (measured * REF_GPU_OVER_CPU, "measured_cpu_x100",
                measured, REF_GPU_OVER_CPU)
    except (OSError, KeyError, ValueError):
        return ESTIMATED_REF_RAYS_PER_SEC, "estimate", None, None

H = W = 800
RFN = 8
RAY_CHUNK = int(os.environ.get("BENCH_CHUNK", 1024))
# rays per device call (~18-25s at current speed; under the ~60s axon kill)
SEGMENT = int(os.environ.get("BENCH_SEGMENT", 327680))
DN = 64


def main():
    import jax
    import jax.numpy as jnp

    from neuray_tpu.utils.compile_cache import cache_dir as _ccd
    cache_dir = _ccd(os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    # dev knob: BENCH_CPU_DEVICES=8 exercises the multi-chip branch on
    # a virtual CPU mesh (jax is pre-imported on this box, so env vars
    # alone cannot switch platforms)
    force_n = int(os.environ.get("BENCH_CPU_DEVICES", "0"))
    if force_n:
        from __graft_entry__ import _provision_virtual_cpu_mesh
        _provision_virtual_cpu_mesh(force_n)

    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, make_scene_encode_fn,
        make_ray_render_fn, render_frame_skip_empty,
        render_frame_probe_skip, render_frame_probe_focus)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query
    from neuray_tpu.utils.params_io import load_params_npz

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    h, w, rfn, chunk, dn, seg = (
        (H, W, RFN, RAY_CHUNK, DN, SEGMENT) if on_tpu
        else (64, 64, 4, 256, 16, 1024))

    quant = os.environ.get("BENCH_QUANT", "u8" if on_tpu else "none")
    # Default mode: probe-FOCUSED render at 16 probe samples,
    # 12 coarse + 24 fine samples inside each kept ray's probe-narrowed
    # depth window. One setting, measured to beat the FULL render's
    # GT accuracy on BOTH sweep scenes (tools/check_skip_quality.py
    # --focus, docs/ARCHITECTURE.md sample-count sweep): sphere 238.6k
    # rays/s amortized at PSNR-vs-GT 26.25 (full render: 26.08),
    # multi-blob 376.3k at 33.81 (full: 33.37) — no per-scene tuning.
    # 16:32 (BENCH_FOCUS_SN=16 BENCH_FOCUS_FSN=32, the eval-profile
    # setting) buys ~1 dB more GT margin at ~0.8x speed; 8:16 collapses
    # (22.1 dB on the sphere) and is rejected. BENCH_SKIP_MODE=probe
    # restores the exact-kept-ray skip (psn 8, 90.9k, GT 28.0 on the
    # sphere), =two_phase the exact gate.
    skip_mode = os.environ.get("BENCH_SKIP_MODE", "focus")
    default_psn = 16 if skip_mode == "focus" else 8
    probe_sn = int(os.environ.get("BENCH_PROBE_SN", default_psn))
    cfg = RenderConfig(
        use_hierarchical_sampling=True, depth_sample_num=dn,
        fine_depth_sample_num=dn, ray_batch_num=chunk,
        probe_sample_num=probe_sn,
        focus_sample_num=int(os.environ.get("BENCH_FOCUS_SN",
                                            12 if on_tpu else 8)),
        focus_fine_sample_num=int(os.environ.get("BENCH_FOCUS_FSN",
                                                 24 if on_tpu else 8)),
        # the rfn^2*h*w cross-view diff gather dominates the scene
        # encode (tools/profile_encode.py: 1.29s of 1.51s); computing
        # it on the half grid costs -0.05 dB GT on the sphere, +0.03 on
        # blobs (trained weights) for a 1.50s -> 0.46s encode
        init_diff_scale=int(os.environ.get("BENCH_DIFF_SCALE",
                                           2 if on_tpu else 1)),
        use_vis=False, fine_use_vis=False, use_bf16=on_tpu,
        gather_quant=quant)
    renderer = NeurayRenderer(cfg)

    rng = np.random.RandomState(0)
    ref = {k: jnp.asarray(v) for k, v in
           make_sphere_scene(rng, rfn, h, w).items()}
    que_np = make_query(rng, h, w, rn=0, full_image=True)
    coords_all = que_np["coords"]
    n_rays = coords_all.shape[1]
    que_base = {k: jnp.asarray(v) for k, v in que_np.items()
                if k not in ("imgs", "coords")}

    # pad rays to a segment multiple so every call has the same shape
    n_seg = -(-n_rays // seg)
    pad = n_seg * seg - n_rays
    coords_all = np.pad(coords_all, ((0, 0), (0, pad), (0, 0)), "edge")
    segments = [jnp.asarray(coords_all[:, i * seg:(i + 1) * seg])
                for i in range(n_seg)]

    # Trained weights (tools/make_bench_weights.py: the same sphere
    # scene, so the coarse hit-prob separates surface from background)
    # enable the two-phase empty-ray-skipping fine pass — the compute
    # path is weight-value independent, so the full-render number is
    # unaffected; skipping is only meaningful (and only honest) with
    # weights that actually localize the geometry.
    weights_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools",
        "bench_weights.npz")
    n_dev = len(jax.devices())
    use_skip = (os.path.exists(weights_path)
                and os.environ.get("BENCH_SKIP", "1") != "0"
                and (n_dev == 1 or skip_mode in ("probe", "focus")))
    if os.path.exists(weights_path):
        params = load_params_npz(weights_path)
    else:
        params = renderer.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            ref, {**que_base, "coords": segments[0][:, :chunk]}, False)

    encode_fn = make_scene_encode_fn(renderer)
    if n_dev > 1:
        # multi-chip box: shard the ray axis over all chips (verified
        # exact vs the single-device path on the virtual CPU mesh,
        # tests/test_parallel.py); reports aggregate + per-chip rays/s
        from neuray_tpu.parallel.sharding import (
            make_mesh, make_sharded_render_fn)
        rays_fn = make_sharded_render_fn(
            renderer, make_mesh(n_dev),
            keep_keys=("pixel_colors_nr", "pixel_colors_nr_fine"),
            pre_encoded=True)
    else:
        rays_fn = make_ray_render_fn(
            renderer, keep_keys=("pixel_colors_nr",
                                 "pixel_colors_nr_fine"))

    def render_frame():
        """Full frame: ONE scene encode (timed — matches the
        reference's per-pose encode), then segmented ray calls:
        dispatch ALL segments first (async), then read back in order —
        readback of segment i overlaps compute of i+1. The final
        device->host readback is the synchronization barrier
        (block_until_ready is unreliable on the experimental axon
        platform)."""
        ref_c = encode_fn(params, ref)
        pending = [rays_fn(params, ref_c, dict(que_base, coords=coords))
                   for coords in segments]
        outs = [np.asarray(jax.device_get(o["pixel_colors_nr_fine"]))
                for o in pending]
        img = np.concatenate(outs, axis=1)[:, :n_rays]
        assert np.isfinite(img).all()
        return img

    full_img = render_frame()  # warmup / compile

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        full_img = render_frame()
        times.append(time.perf_counter() - t0)
    full_dt = min(times)
    full_rays_per_sec = n_rays / full_dt
    rays_per_sec, dt = full_rays_per_sec, full_dt

    skip_stats = None
    if use_skip:
        # empty-ray skipping with the trained weights. Default: the
        # THREE-phase probe-skip (reduced-sample network probe scores
        # every ray; coarse+fine run only on kept rays; skipped rays
        # output the exact empty-ray background). Kept rays are
        # bit-identical to the full render; on this scene skipping
        # IMPROVES GT accuracy (empty rays' fine output was noise) —
        # both PSNRs are reported below. BENCH_SKIP_MODE=two_phase
        # selects the older coarse-everywhere variant
        # (tools/check_skip_quality.py has the full sweep).
        threshold = float(os.environ.get("BENCH_SKIP_THRESHOLD", 0.01))
        mode = skip_mode
        dilate = int(os.environ.get("BENCH_PROBE_DILATE", 1))
        # focus: probe every stride-th pixel (stride^2 fewer probe
        # taps, conservative window/mask upsampling). stride 2 measured
        # 200k rays/s amortized at GT-PSNR 27.2 on the sphere (stride 1:
        # 141k / 26.8) — quality sweep in check_skip_quality.py
        # --probe-strides.
        probe_stride = int(os.environ.get(
            "BENCH_PROBE_STRIDE", 2 if (on_tpu and mode == "focus") else 1))
        # kept rays are compacted into buckets of `bucket` chunks: 32
        # bounds jit shape variants across frames of a video (kept
        # count varies); a single-frame bench pays 12.5% padding there,
        # 0.5% at 8
        bucket = int(os.environ.get("BENCH_BUCKET", 8))
        que_all = dict(que_base, coords=jnp.asarray(que_np["coords"]))
        # multi-chip: probe + kept phase shard the ray axis
        # (tests/test_parallel.py: sharded == unsharded); the
        # two_phase driver stays single-device
        skip_mesh = None
        if n_dev > 1:
            from neuray_tpu.parallel.sharding import make_mesh
            skip_mesh = make_mesh(n_dev)

        def render_frame_skip():
            ref_c = encode_fn(params, ref)
            if mode == "focus":
                return render_frame_probe_focus(
                    renderer, params, ref_c, que_all,
                    threshold=threshold, image_hw=(h, w), dilate=dilate,
                    mesh=skip_mesh, bucket_chunks=bucket,
                    probe_stride=probe_stride if skip_mesh is None else 1)
            if mode == "probe":
                return render_frame_probe_skip(
                    renderer, params, ref_c, que_all,
                    threshold=threshold, image_hw=(h, w), dilate=dilate,
                    mesh=skip_mesh, bucket_chunks=bucket)
            return render_frame_skip_empty(
                renderer, params, ref_c, que_all, threshold=threshold)

        out = render_frame_skip()  # warmup / compile
        # time the scene encode alone so an amortized (per-scene
        # encode, many poses) number can be reported alongside the
        # per-frame-encode headline
        ref_c_t = encode_fn(params, ref)
        np.asarray(jax.device_get(jax.tree.leaves(ref_c_t)[0]))
        t0 = time.perf_counter()
        ref_c_t = encode_fn(params, ref)
        np.asarray(jax.device_get(jax.tree.leaves(ref_c_t)[0]))
        encode_s = time.perf_counter() - t0
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = render_frame_skip()
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rays_per_sec = n_rays / dt
        mse = float(np.mean(
            (out["pixel_colors_nr_fine"][0] - full_img[0]) ** 2))
        gt = que_np["imgs"][0].reshape(-1, 3)

        def psnr_gt(img):
            m = float(np.mean((img - gt) ** 2))
            return round(10 * np.log10(1.0 / max(m, 1e-12)), 3)

        skip_stats = {
            "skip_mode": mode,
            "skip_threshold": threshold,
            "kept_fraction": round(out["kept_rays"] / n_rays, 4),
            "full_rays_per_sec": round(full_rays_per_sec, 1),
            "skip_psnr_vs_full_db": round(
                10 * np.log10(1.0 / max(mse, 1e-12)), 2),
            "skip_psnr_vs_gt_db": psnr_gt(
                out["pixel_colors_nr_fine"][0]),
            "full_psnr_vs_gt_db": psnr_gt(full_img[0]),
        }
        skip_stats["encode_s"] = round(encode_s, 2)
        skip_stats["amortized_rays_per_sec"] = round(
            n_rays / max(dt - encode_s, 1e-6), 1)
        if mode in ("probe", "focus"):
            skip_stats["probe_dilate"] = dilate
            skip_stats["probe_sample_num"] = probe_sn
        if mode == "focus":
            skip_stats["focus_samples"] = (
                f"{cfg.focus_sample_num}:{cfg.focus_fine_sample_num}")
            skip_stats["probe_stride"] = (
                probe_stride if skip_mesh is None else 1)

    baseline, baseline_kind, raw_cpu, mult = _baseline_rays_per_sec()
    result = {
        "metric": f"rays/sec/chip ({h}x{w} render, {rfn} views, "
                  f"{dn}+{dn} samples, {platform})",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 3),
        "baseline": baseline_kind,
        "weights": ("trained(tools/bench_weights.npz)"
                    if os.path.exists(weights_path) else "random"),
    }
    if skip_stats:
        result.update(skip_stats)
    if raw_cpu is not None:
        result["baseline_ref_cpu_rays_per_sec"] = raw_cpu
        result["baseline_gpu_over_cpu_allowance"] = mult
    if n_dev > 1:
        result["n_chips"] = n_dev
        result["rays_per_sec_aggregate"] = round(rays_per_sec, 1)
        result["value"] = round(rays_per_sec / n_dev, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
