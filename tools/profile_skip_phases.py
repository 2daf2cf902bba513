"""Phase-level timing of the skip-empty bench renders with explicit
host syncs between phases (so the numbers are upper bounds — bench.py
overlaps readbacks with compute; the split tells us which lever pays
next).

Default: the TWO-phase exact-gate render (encode / coarse+score /
fine(kept) / merge-readback). --focus: the probe-FOCUSED bench
default (encode at init_diff_scale 2 / strided probe + conservative
window pooling / host compaction / focused coarse+fine on kept /
merge), at bench.py's shipped settings (probe 16, focus 16:32,
stride 2, dilate 1, bucket 8).

Also reports the fine-pass padding waste (kept rays vs padded rays at
the current bucket granularity) and optionally sweeps the bucket size.

Run on the TPU: python tools/profile_skip_phases.py
  [--iters 2] [--bucket 32] [--threshold 0.01] [--chunk 1024]
  [--focus]
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
    parser.add_argument("--iters", type=int, default=2)
    parser.add_argument("--bucket", type=int, default=32)
    parser.add_argument("--threshold", type=float, default=0.01)
    parser.add_argument("--chunk", type=int, default=1024)
    parser.add_argument("--focus", action="store_true",
                        help="profile the probe-FOCUSED bench default "
                             "instead of the two-phase exact gate")
    parser.add_argument("--cpu", action="store_true")
    flags = parser.parse_args()

    import jax
    import jax.numpy as jnp
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

    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, make_scene_encode_fn,
        make_coarse_render_fn, make_fine_render_fn)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query
    from neuray_tpu.utils.params_io import load_params_npz

    on_tpu = jax.devices()[0].platform == "tpu"
    h = w = 800 if on_tpu else 64
    rfn, dn = (8, 64) if on_tpu else (4, 16)
    chunk = flags.chunk if on_tpu else 256
    print("platform:", jax.devices()[0].platform, flush=True)

    cfg = RenderConfig(
        use_hierarchical_sampling=True, depth_sample_num=dn,
        fine_depth_sample_num=dn, ray_batch_num=chunk,
        # focus mode mirrors bench.py's shipped settings
        probe_sample_num=16 if on_tpu else 8,
        focus_sample_num=16 if on_tpu else 8,
        focus_fine_sample_num=32 if on_tpu else 8,
        init_diff_scale=(2 if on_tpu and flags.focus else 1),
        use_vis=False, fine_use_vis=False, use_bf16=on_tpu,
        gather_quant="u8" if on_tpu else "none")
    renderer = NeurayRenderer(cfg)

    rng = np.random.RandomState(0)
    ref = {k: jnp.asarray(v) for k, v in
           make_sphere_scene(rng, rfn, h, w).items()}
    que_np = make_query(rng, h, w, rn=0, full_image=True)
    n_rays = que_np["coords"].shape[1]
    que = {k: jnp.asarray(v) for k, v in que_np.items() if k != "imgs"}

    weights = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_weights.npz")
    if on_tpu and os.path.exists(weights):
        params = load_params_npz(weights)
    else:
        params = renderer.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            ref, dict(que, coords=que["coords"][:, :chunk]), False)

    encode_fn = make_scene_encode_fn(renderer)
    keep_base = ("pixel_colors_nr",)
    coarse_fn = make_coarse_render_fn(
        renderer, keep_keys=keep_base + ("hit_prob_nr",))
    fine_fn = make_fine_render_fn(
        renderer, keep_keys=tuple(k + "_fine" for k in keep_base))

    def sync(x):
        return np.asarray(jax.device_get(x))

    def one_frame_focus(bucket_chunks):
        """Phases of render_frame_probe_focus at the bench settings:
        strided probe every 2nd pixel + 3x3 conservative window
        pooling, dilate-1 keep upsample, host compaction into
        ``bucket_chunks``-chunk buckets, focused coarse+fine on kept,
        host merge scatter. Mirrors models/renderer.py:960-1050."""
        from neuray_tpu.models.renderer import (
            make_focus_probe_fn, make_focus_render_fn,
            _strided_focus_probe, _dilate_keep_mask,
            _merge_kept_outputs)
        keep_base = ("pixel_colors_nr",)
        keep_keys = keep_base + tuple(k + "_fine" for k in keep_base)
        probe_fn = make_focus_probe_fn(renderer)
        rays_fn = make_focus_render_fn(renderer, keep_keys=keep_keys)
        stride, dilate = 2, 1

        ts = {}
        t0 = time.perf_counter()
        ref_c = encode_fn(params, ref)
        sync(jax.tree.leaves(ref_c)[0])
        ts["encode"] = time.perf_counter() - t0

        # device probe on the 1/4 subgrid + host 3x3 pooling/upsample
        # (readback of score/near/far is inside the helper)
        t0 = time.perf_counter()
        keep_mask, near, far = _strided_focus_probe(
            probe_fn, params, ref_c, que, flags.threshold, (h, w),
            stride)
        ts["probe+pool"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        keep_mask = _dilate_keep_mask(keep_mask, (h, w), dilate)
        keep = np.nonzero(keep_mask)[0]
        ceil = lambda a, b: -(-a // b)
        total_chunks = ceil(n_rays, chunk)
        bucket = min(bucket_chunks, total_chunks)
        n_chunks = min(ceil(ceil(keep.size, chunk), bucket) * bucket,
                       total_chunks)
        k_pad = n_chunks * chunk
        keep_padded = (np.pad(keep, (0, k_pad - keep.size), mode="edge")
                       if k_pad > keep.size else keep[:k_pad])
        kidx = jnp.asarray(keep_padded)
        que_k = dict(que)
        que_k["coords"] = jnp.take(que["coords"], kidx, axis=1)
        near_k = jnp.asarray(near[:, keep_padded])
        far_k = jnp.asarray(far[:, keep_padded])
        ts["compact"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        kept_out = rays_fn(params, ref_c, que_k, near_k, far_k)
        sync(kept_out[keep_base[0] + "_fine"])
        ts["focus-render(kept)"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        _merge_kept_outputs(keep_base, kept_out, keep, keep_mask,
                            1, n_rays)
        ts["merge"] = time.perf_counter() - t0
        ts["kept"] = int(keep.size)
        ts["padded"] = int(k_pad)
        ts["total"] = sum(v for k, v in ts.items()
                          if k not in ("kept", "padded"))
        return ts

    def one_frame(bucket_chunks):
        if flags.focus:
            return one_frame_focus(bucket_chunks)
        ts = {}
        t0 = time.perf_counter()
        ref_c = encode_fn(params, ref)
        sync(jax.tree.leaves(ref_c)[0])
        ts["encode"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        coarse = coarse_fn(params, ref_c, que)
        score = sync(jnp.sum(coarse["hit_prob_nr"], -1))  # qn,rn
        ts["coarse+score"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        keep = np.nonzero(score[0] > flags.threshold)[0]
        ceil = lambda a, b: -(-a // b)
        total_chunks = ceil(n_rays, chunk)
        bucket = min(bucket_chunks, total_chunks)
        n_chunks = min(ceil(ceil(keep.size, chunk), bucket) * bucket,
                       total_chunks)
        k_pad = n_chunks * chunk
        keep_padded = (np.pad(keep, (0, k_pad - keep.size), mode="edge")
                       if k_pad > keep.size else keep[:k_pad])
        kp = jnp.asarray(keep_padded)
        que_k = dict(que)
        que_k["coords"] = jnp.take(que["coords"], kp, axis=1)
        hp_k = jnp.take(coarse["hit_prob_nr"], kp, axis=1)
        fine = fine_fn(params, ref_c, que_k, hp_k)
        sync(fine[keep_base[0] + "_fine"])
        ts["fine"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        for k in keep_base:
            sync(coarse[k])
        ts["merge-readback"] = time.perf_counter() - t0
        ts["kept"] = int(keep.size)
        ts["padded"] = int(k_pad)
        ts["total"] = sum(v for k, v in ts.items()
                          if k not in ("kept", "padded"))
        return ts

    one_frame(flags.bucket)  # warmup / compile
    best = None
    for _ in range(flags.iters):
        ts = one_frame(flags.bucket)
        if best is None or ts["total"] < best["total"]:
            best = ts
    best = {k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in best.items()}
    best["bucket_chunks"] = flags.bucket
    best["rays_per_sec"] = round(n_rays / best["total"], 1)
    best["pad_waste_fraction"] = round(
        (best["padded"] - best["kept"]) / max(best["padded"], 1), 4)
    print(json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
