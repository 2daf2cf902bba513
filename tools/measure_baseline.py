"""Measure the reference renderer's throughput on THIS box's CPU, and
ours on the identical workload/platform — the measured baseline that
replaces bench.py's former order-of-magnitude estimate (BASELINE.md row
1; the reference is CPU-runnable per SURVEY.md section 6).

Workload = the neuray_gen_depth render recipe (reference
configs/gen/neuray_gen_depth.yaml + render.py:68): 8 reference views of
a 400x400 scene, 64 coarse + 64 fine samples, hierarchical sampling,
random weights (weights don't change the op mix), a fixed query-ray
count timed after warmup.

Usage: python tools/measure_baseline.py [--rays 8192] [--size 400]
Prints one JSON line per system plus the ratio.
"""
import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def load_reference_renderer():
    import torch

    class _ABN(torch.nn.Module):
        def __init__(self, ch, **kw):
            super().__init__()
            self.bn = torch.nn.BatchNorm2d(ch)

        def forward(self, x):
            return torch.nn.functional.leaky_relu(self.bn(x), 0.01)

    _stub("inplace_abn", ABN=_ABN, InPlaceABN=_ABN)
    _stub("kornia")
    _stub("kornia.utils", create_meshgrid=None)
    sys.modules["kornia"].utils = sys.modules["kornia.utils"]
    _stub("transforms3d")
    _stub("transforms3d.axangles", mat2axangle=None)
    _stub("transforms3d.euler", euler2mat=None)
    _stub("skimage")
    _stub("skimage.io", imread=None, imsave=None)
    _stub("plyfile", PlyData=None)
    _stub("easydict", EasyDict=dict)
    sys.path.insert(0, "/root/reference")
    import network.ibrnet as ref_ibrnet
    from neuray_tpu.models.ibrnet import sinusoid_pos_encoding
    ref_ibrnet.IBRNetWithNeuRay.posenc = (
        lambda self, d_hid, n_samples: torch.from_numpy(
            sinusoid_pos_encoding(d_hid, n_samples)).float())
    from network.renderer import NeuralRayGenRenderer
    return NeuralRayGenRenderer


CFG = {
    "use_hierarchical_sampling": True,
    "depth_sample_num": 64,
    "fine_depth_sample_num": 64,
    "ray_batch_num": 4096,  # reference render.py:205 default
    "dist_decoder_cfg": {"use_vis": False},
    "fine_dist_decoder_cfg": {"use_vis": False},
    "init_net_type": "depth",
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rays", type=int, default=8192)
    parser.add_argument("--size", type=int, default=400)
    parser.add_argument("--rfn", type=int, default=8)
    flags = parser.parse_args()

    from neuray_tpu.data.synthetic import make_sphere_scene, make_query
    rng = np.random.RandomState(0)
    ref_np = make_sphere_scene(rng, flags.rfn, flags.size, flags.size)
    que_np = make_query(rng, flags.size, flags.size, flags.rays)
    que_np.pop("imgs")

    # ---------------- reference (torch CPU) ----------------
    import torch
    torch.manual_seed(0)
    RefRenderer = load_reference_renderer()
    model = RefRenderer(dict(CFG)).eval()
    ref_t = {
        "imgs": torch.from_numpy(
            np.transpose(ref_np["imgs"], (0, 3, 1, 2))).float(),
        "poses": torch.from_numpy(ref_np["poses"]).float(),
        "Ks": torch.from_numpy(ref_np["Ks"]).float(),
        "depth_range": torch.from_numpy(ref_np["depth_range"]).float(),
        "depth": torch.from_numpy(
            np.transpose(ref_np["depth"], (0, 3, 1, 2))).float(),
    }
    que_t = {k: torch.from_numpy(np.asarray(v)).float()
             for k, v in que_np.items()}

    # steady-state ray throughput: time the per-chunk render path with
    # the scene encoding (init net + image/vis encoders) done once, the
    # same way render.py amortizes it over a full frame. The full
    # reference forward is minutes per call on this 1-core host, so the
    # per-scene stage is timed separately.
    with torch.no_grad():
        t0 = time.perf_counter()
        ref_info = dict(ref_t)
        ref_info["ray_feats"] = model.init_net(ref_info, None, False)
        img_feats = model.image_encoder(ref_info["imgs"])
        ref_info["img_feats"] = img_feats
        ref_info["ray_feats"] = model.vis_encoder(
            ref_info["ray_feats"], img_feats)
        dt_scene = time.perf_counter() - t0
        print(json.dumps({"system": "reference scene encode (CPU)",
                          "seconds": round(dt_scene, 2)}), flush=True)

        def ray_chunk():
            q = dict(que_t)
            return model.render_impl(q, dict(ref_info), False)

        ray_chunk()  # warmup
        t0 = time.perf_counter()
        ray_chunk()
        dt_ref = time.perf_counter() - t0
    ref_rps = flags.rays / dt_ref
    print(json.dumps({
        "system": "reference torch (CPU, this box)",
        "rays_per_sec": round(ref_rps, 1), "seconds": round(dt_ref, 2),
        "rays": flags.rays, "workload":
            f"{flags.rfn} views {flags.size}x{flags.size}, 64+64 samples"}),
        flush=True)

    # ---------------- ours (jax CPU, same box) ----------------
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    import jax.numpy as jnp
    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, make_render_fn)

    renderer = NeurayRenderer(RenderConfig.from_cfg(CFG))
    ref_j = jax.tree.map(jnp.asarray, ref_np)
    que_j = jax.tree.map(jnp.asarray, que_np)
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref_j, {**que_j, "coords": que_j["coords"][:, :CFG["ray_batch_num"]]},
        False)
    render_fn = make_render_fn(
        renderer, keep_keys=("pixel_colors_nr", "pixel_colors_nr_fine"))

    def run():
        out = render_fn(params, ref_j, que_j)
        return np.asarray(jax.device_get(out["pixel_colors_nr_fine"]))

    run()  # warmup/compile
    t0 = time.perf_counter()
    run()
    dt_ours = time.perf_counter() - t0
    ours_rps = flags.rays / dt_ours
    print(json.dumps({
        "system": "neuray_tpu jax (CPU, this box)",
        "rays_per_sec": round(ours_rps, 1), "seconds": round(dt_ours, 2),
        "rays": flags.rays}), flush=True)
    print(json.dumps({
        "cpu_vs_cpu_speedup": round(ours_rps / ref_rps, 3),
        "reference_cpu_rays_per_sec": round(ref_rps, 1)}), flush=True)


if __name__ == "__main__":
    main()
