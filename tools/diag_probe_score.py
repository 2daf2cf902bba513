"""Diagnose the probe emptiness score: does ANY threshold on the cheap
dist-decoder probe score separate the rays the NETWORK coarse pass
keeps (sum hit_prob_nr > 0.01) from the rays it skips?

Prints quantiles of the probe score within both classes and, for a few
recall targets (fraction of network-kept rays retained), the probe
threshold and the resulting overall keep fraction.

Run on the TPU: python tools/diag_probe_score.py [--probe-samples 16]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

TOOLS = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--probe-samples", type=int, default=16)
    ap.add_argument("--net-threshold", type=float, default=0.01)
    ap.add_argument("--weights", default=os.path.join(
        TOOLS, "bench_weights.npz"))
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
        NeurayRenderer, RenderConfig, make_scene_encode_fn,
        make_coarse_render_fn, make_probe_fn)
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query
    from neuray_tpu.utils.params_io import load_params_npz

    on_tpu = jax.devices()[0].platform == "tpu"
    h = w = flags.size if on_tpu else 64
    dn = 64 if on_tpu else 16
    chunk = flags.chunk if on_tpu else 64

    cfg = RenderConfig(
        use_hierarchical_sampling=True, depth_sample_num=dn,
        fine_depth_sample_num=dn, ray_batch_num=chunk,
        probe_sample_num=flags.probe_samples,
        use_vis=False, fine_use_vis=False, use_bf16=on_tpu,
        gather_quant="u8" if on_tpu else "none")
    renderer = NeurayRenderer(cfg)
    params = load_params_npz(flags.weights) if os.path.exists(
        flags.weights) else None

    rng = np.random.RandomState(0)
    ref = {k: jnp.asarray(v)
           for k, v in make_sphere_scene(rng, 8, h, w).items()}
    que_np = make_query(rng, h, w, rn=0, full_image=True)
    que = {k: jnp.asarray(v) for k, v in que_np.items() if k != "imgs"}
    if params is None:
        params = renderer.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            ref, dict(que, coords=que["coords"][:, :chunk]), False)

    ref_c = make_scene_encode_fn(renderer)(params, ref)
    probe = np.asarray(jax.device_get(
        make_probe_fn(renderer)(params, ref_c, que)))[0]
    coarse_fn = make_coarse_render_fn(renderer, keep_keys=("hit_prob_nr",))
    net = np.asarray(jax.device_get(jnp.sum(
        coarse_fn(params, ref_c, que)["hit_prob_nr"], -1)))[0]

    kept = net > flags.net_threshold
    qs = [0, 0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999, 1.0]
    out = {
        "net_kept_fraction": round(float(kept.mean()), 4),
        "probe_score_kept_quantiles": {
            str(q): round(float(np.quantile(probe[kept], q)), 5)
            for q in qs},
        "probe_score_skipped_quantiles": {
            str(q): round(float(np.quantile(probe[~kept], q)), 5)
            for q in qs},
        "pearson_r": round(float(np.corrcoef(probe, net)[0, 1]), 4),
    }
    for recall in (1.0, 0.9999, 0.999, 0.99):
        th = float(np.quantile(probe[kept], 1.0 - recall))
        keep_frac = float((probe >= th).mean())
        out[f"recall_{recall}"] = {
            "probe_threshold": round(th, 5),
            "overall_keep_fraction": round(keep_frac, 4)}
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
