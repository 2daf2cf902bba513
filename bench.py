"""Benchmark: rays/sec/chip for the flagship NeuRay-depth render.

Renders a full 800x800 novel view (640k rays, 64 coarse + 64 fine
samples, 8 reference views — the reference's neuray_gen_depth render
workload, reference configs/gen/neuray_gen_depth.yaml + render.py:205)
and reports throughput as ONE JSON line.

vs_baseline is measured against an ESTIMATED reference throughput of
1e4 rays/s/GPU (order-of-magnitude for the PyTorch renderer at
ray_batch_num 4096-8192 on a single accelerator; the reference repo
publishes no numbers — see BASELINE.md). Replace with a measured
number when one exists.
"""
import json
import os
import sys
import time

import numpy as np

ESTIMATED_REF_RAYS_PER_SEC = 1.0e4

H = W = 800
RFN = 8
RAY_CHUNK = 2048
DN = 64


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, make_render_fn)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    h, w, rfn, chunk, dn = (H, W, RFN, RAY_CHUNK, DN) if on_tpu else (
        64, 64, 4, 256, 16)

    cfg = RenderConfig(
        use_hierarchical_sampling=True, depth_sample_num=dn,
        fine_depth_sample_num=dn, ray_batch_num=chunk,
        use_vis=False, fine_use_vis=False, use_bf16=on_tpu)
    renderer = NeurayRenderer(cfg)

    rng = np.random.RandomState(0)
    ref = {k: jnp.asarray(v) for k, v in
           make_sphere_scene(rng, rfn, h, w).items()}
    que_np = make_query(rng, h, w, rn=0, full_image=True)
    que = {k: jnp.asarray(v) for k, v in que_np.items() if k != "imgs"}

    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, {**que, "coords": que["coords"][:, :chunk]}, False)

    render_fn = make_render_fn(
        renderer, keep_keys=("pixel_colors_nr", "pixel_colors_nr_fine"))

    def run_sync():
        """Render + force a device->host readback: block_until_ready is
        not a reliable barrier on the experimental axon platform, so we
        time through an actual transfer of the output image."""
        out = render_fn(params, ref, que)
        host = np.asarray(jax.device_get(out["pixel_colors_nr_fine"]))
        assert np.isfinite(host).all()
        return host

    # warmup / compile
    run_sync()

    n_rays = que["coords"].shape[1]
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rays_per_sec = n_rays / dt

    result = {
        "metric": f"rays/sec/chip ({h}x{w} render, {rfn} views, "
                  f"{dn}+{dn} samples, {platform})",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / ESTIMATED_REF_RAYS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
