"""Per-stage timing of the SCENE ENCODE program at bench shapes.

The encode (run once per frame in bench.py's headline) is ~1.5s of the
4.6s strided-focus frame — this tool splits it into its four stages,
each timed as its own jit program on the real chip:

  init_net        DepthInitNet: depth maps -> raw visibility feats G'
  image_encoder   ResUNetLight on all ref views -> image feats
  vis_encoder     (G', img feats) -> visibility feats G
  gather_cache    fused scene map build (+ u8 quantization)

Per-stage sums exceed the fused encode program's wall time (XLA fuses
and overlaps across stages); the split shows RATIOS, not additive
truth.

Usage: python tools/profile_encode.py [--size 800] [--rfn 8] [--cpu]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--rfn", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    flags = ap.parse_args()

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
        NeurayRenderer, RenderConfig, make_scene_encode_fn)
    from neuray_tpu.data.synthetic import make_sphere_scene
    from neuray_tpu.utils.params_io import load_params_npz

    on_tpu = jax.devices()[0].platform == "tpu"
    h = w = flags.size if on_tpu else min(flags.size, 64)
    cfg = RenderConfig(
        use_hierarchical_sampling=True, depth_sample_num=64 if on_tpu else 8,
        fine_depth_sample_num=64 if on_tpu else 8,
        use_vis=False, fine_use_vis=False, use_bf16=on_tpu,
        gather_quant="u8" if on_tpu else "none")
    renderer = NeurayRenderer(cfg)
    wpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_weights.npz")
    rng = np.random.RandomState(0)
    ref = {k: jnp.asarray(v) for k, v in
           make_sphere_scene(rng, flags.rfn, h, w).items()}
    if os.path.exists(wpath) and on_tpu:
        params = load_params_npz(wpath)
    else:
        que = {"coords": jnp.zeros((1, 64, 2), jnp.float32),
               "poses": ref["poses"][:1], "Ks": ref["Ks"][:1],
               "depth_range": ref["depth_range"][:1]}
        params = renderer.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)}, ref, que, False)

    def sync(x):
        # scalar-index on device, then move 4 bytes — device_get of a
        # full leaf would drag tens of MB through the ~20MB/s tunnel
        # and dominate the measurement
        leaf = jax.tree.leaves(x)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    def timeit(fn, *args):
        out = fn(*args)
        sync(out)
        best = float("inf")
        for _ in range(flags.iters):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    init_fn = jax.jit(lambda p, r: renderer.apply(
        p, r, None, method=NeurayRenderer.initialize_ray_feats))
    t_init, ray_feats_raw = timeit(init_fn, params, ref)

    enc_fn = jax.jit(lambda p, r, rf: renderer.apply(
        p, r, rf, method=NeurayRenderer.encode_scene))
    t_enc, (img_feats, ray_feats) = timeit(enc_fn, params, ref,
                                           ray_feats_raw)

    ref_c_in = dict(ref)
    ref_c_in["img_feats"] = img_feats
    ref_c_in["ray_feats"] = ray_feats
    cache_fn = jax.jit(renderer.build_gather_cache)
    t_cache, _ = timeit(cache_fn, ref_c_in)

    full_fn = make_scene_encode_fn(renderer)
    t_full, _ = timeit(full_fn, params, ref)

    print(json.dumps({
        "shape": f"{flags.rfn}x{h}x{w}",
        "platform": jax.devices()[0].platform,
        "init_net_s": round(t_init, 3),
        "image+vis_encoder_s": round(t_enc, 3),
        "gather_cache_s": round(t_cache, 3),
        "fused_encode_s": round(t_full, 3),
        "sum_of_stages_s": round(t_init + t_enc + t_cache, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
