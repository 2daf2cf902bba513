"""Measure the reference NeuRay renderer's throughput (rays/s) on this
host's CPU, and this repo's renderer on the IDENTICAL workload and
platform — the measured baseline VERDICT r1 asked for.

The reference repo publishes no numbers (BASELINE.md) and no pretrained
checkpoint or dataset is on this zero-egress box, so the measurable
quantity is forward-pass throughput with random weights on a fabricated
scene: the render compute path (reference network/renderer.py:228-327,
render.py:121-146) does not depend on the weight values, so random
weights time exactly what a checkpoint would.

Workload = the lego black_400 render shape (reference render.py:68,
configs/gen/neuray_gen_depth.yaml): 400x400 query, 8 reference views,
64 coarse + 64 fine samples, ray_batch_num 4096. Rays are timed over a
subset and reported per-ray (throughput is ray-linear; both renderers
chunk identically).

Writes tools/baseline_measured.json, which bench.py reads to compute
vs_baseline from a MEASURED number.

Usage: python tools/bench_reference.py [--rays 8192] [--size 400]
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

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "baseline_measured.json")

CFG = {
    "use_hierarchical_sampling": True,
    "depth_sample_num": 64,
    "fine_depth_sample_num": 64,
    "ray_batch_num": 4096,  # overridden by --chunk
    "dist_decoder_cfg": {"use_vis": False},
    "fine_dist_decoder_cfg": {"use_vis": False},
    "init_net_type": "depth",
    "ray_mask_point_num": 8,
}


def _stub_module(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def _setup_reference():
    import torch

    class _ABN(torch.nn.Module):
        def __init__(self, ch, **kw):
            super().__init__()
            self.bn = torch.nn.BatchNorm2d(ch)

        def forward(self, x):
            return torch.nn.functional.leaky_relu(self.bn(x), 0.01)

    def _create_meshgrid(h, w, normalized_coordinates=False, device=None):
        ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w),
                                indexing="ij")
        if normalized_coordinates:
            xs = 2 * xs / (w - 1) - 1
            ys = 2 * ys / (h - 1) - 1
        return torch.stack([xs, ys], -1)[None].float()

    _stub_module("inplace_abn", ABN=_ABN, InPlaceABN=_ABN)
    _stub_module("kornia")
    _stub_module("kornia.utils", create_meshgrid=_create_meshgrid)
    sys.modules["kornia"].utils = sys.modules["kornia.utils"]
    _stub_module("transforms3d")
    _stub_module("transforms3d.axangles", mat2axangle=None)
    _stub_module("transforms3d.euler", euler2mat=None)
    _stub_module("skimage")
    _stub_module("skimage.io", imread=None, imsave=None)
    _stub_module("plyfile", PlyData=None)
    _stub_module("easydict", EasyDict=dict)
    if REF not in sys.path:
        sys.path.insert(0, REF)

    import network.ibrnet as ref_ibrnet
    from neuray_tpu.models.ibrnet import sinusoid_pos_encoding
    ref_ibrnet.IBRNetWithNeuRay.posenc = (
        lambda self, d_hid, n_samples: torch.from_numpy(
            sinusoid_pos_encoding(d_hid, n_samples)).float())
    import network.renderer as ref_renderer
    return ref_renderer


def bench_reference(ref_np, que_np, rays):
    import torch
    torch.manual_seed(0)
    ref_renderer = _setup_reference()
    model = ref_renderer.NeuralRayGenRenderer(dict(CFG)).eval()

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

    def run():
        with torch.no_grad():
            out = model({"ref_imgs_info": ref_t, "que_imgs_info": que_t,
                         "eval": True})
        return float(out["pixel_colors_nr_fine"].sum())

    run()  # warmup
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"reference (torch cpu): {rays} rays in {dt:.2f}s "
          f"-> {rays / dt:.1f} rays/s", flush=True)
    return rays / dt


def bench_ours_cpu(ref_np, que_np, rays):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from neuray_tpu.utils.compile_cache import cache_dir as _ccd
    jax.config.update("jax_compilation_cache_dir",
                      _ccd("/tmp/jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from neuray_tpu.models.renderer import (
        NeurayRenderer, RenderConfig, make_render_fn)

    renderer = NeurayRenderer(RenderConfig.from_cfg(CFG))
    ref_j = {k: jnp.asarray(v) for k, v in ref_np.items()}
    que_j = {k: jnp.asarray(v) for k, v in que_np.items()}
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref_j, que_j, False)
    render_fn = make_render_fn(renderer,
                               keep_keys=("pixel_colors_nr_fine",))

    def run():
        out = render_fn(params, ref_j, que_j)
        return np.asarray(
            jax.device_get(out["pixel_colors_nr_fine"])).sum()

    run()  # warmup / compile
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"ours (jax cpu): {rays} rays in {dt:.2f}s "
          f"-> {rays / dt:.1f} rays/s", flush=True)
    return rays / dt


def _timed_steps(step_fn, warmup=1, reps=2):
    for _ in range(warmup):
        step_fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        step_fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_reference_train_gen(rays=512, size=512, views=8):
    """Time the reference's gen-training step (forward + RenderLoss +
    DepthLoss + backward + Adam; reference train/trainer.py:104-135) on
    torch CPU at the row-5 BASELINE.md workload shape: 512 rays,
    8 ref views, 512x512 images, 64+64 samples, depth loss (default
    8192 depth-loss coords, renderer.py:258-261)."""
    import torch
    torch.manual_seed(0)
    ref_renderer = _setup_reference()
    from network.loss import RenderLoss, DepthLoss

    cfg = dict(CFG)
    cfg["use_depth_loss"] = True
    cfg["use_nr_fine_loss"] = True
    model = ref_renderer.NeuralRayGenRenderer(dict(cfg)).train()
    losses = [RenderLoss(cfg), DepthLoss(cfg)]
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    from neuray_tpu.data.synthetic import make_sphere_scene, make_query
    rng = np.random.RandomState(0)
    ref_np = make_sphere_scene(rng, views, size, size)
    que_np = make_query(rng, size, size, rays)

    ref_t = {
        "imgs": torch.from_numpy(
            np.transpose(ref_np["imgs"], (0, 3, 1, 2))).float(),
        "poses": torch.from_numpy(ref_np["poses"]).float(),
        "Ks": torch.from_numpy(ref_np["Ks"]).float(),
        "depth_range": torch.from_numpy(ref_np["depth_range"]).float(),
        "depth": torch.from_numpy(
            np.transpose(ref_np["depth"], (0, 3, 1, 2))).float(),
    }
    ref_t["true_depth"] = ref_t["depth"].clone()
    que_t = {k: torch.from_numpy(np.asarray(v)).float()
             for k, v in que_np.items()}
    que_t["imgs"] = que_t["imgs"].permute(0, 3, 1, 2).contiguous()
    data = {"ref_imgs_info": ref_t, "que_imgs_info": que_t,
            "scene_name": "llff/fern"}  # no 'eval' key -> is_train

    def step():
        opt.zero_grad()
        outputs = model(data)
        log = {}
        for loss in losses:
            log.update(loss(outputs, data, 0))
        total = sum(torch.mean(v) for k, v in log.items()
                    if k.startswith("loss"))
        total.backward()
        opt.step()
        return float(total.detach())

    dt = _timed_steps(step)
    print(f"reference gen train step (torch cpu): {dt:.2f}s/step "
          f"-> {1.0 / dt:.4f} steps/s", flush=True)
    return 1.0 / dt


def bench_reference_train_ft(rays=256, size=64, views=8, samples=16):
    """Time the reference's FT-style train step (render with leaf
    ray_feats parameters + RenderLoss + ConsistencyLoss + backward +
    Adam over [network, ray_feats]; reference renderer.py:476-525,
    loss.py:18-44) at the selfcheck_ft workload shape (64x64, 256 rays,
    16+16 samples) so the repo's measured FtTrainer steps/s has a
    same-shape reference number."""
    import torch
    torch.manual_seed(0)
    ref_renderer = _setup_reference()
    from network.loss import RenderLoss, ConsistencyLoss

    cfg = dict(CFG)
    cfg["depth_sample_num"] = samples
    cfg["fine_depth_sample_num"] = samples
    cfg["agg_net_cfg"] = {"sample_num": samples}
    cfg["fine_agg_net_cfg"] = {"sample_num": samples}
    cfg["use_self_hit_prob"] = True
    cfg["use_nr_fine_loss"] = True
    model = ref_renderer.NeuralRayGenRenderer(dict(cfg)).train()
    losses = [RenderLoss(cfg), ConsistencyLoss(cfg)]

    from neuray_tpu.data.synthetic import make_sphere_scene
    rng = np.random.RandomState(0)
    ref_np = make_sphere_scene(rng, views, size, size)
    fh, fw, fdim = size // 4, size // 4, 32
    ray_feats = [torch.nn.Parameter(torch.randn(1, fdim, fh, fw))
                 for _ in range(views + 1)]
    coords = np.stack([rng.uniform(0, size - 1, rays),
                       rng.uniform(0, size - 1, rays)],
                      -1)[None].astype(np.float32)

    imgs_t = torch.from_numpy(
        np.transpose(ref_np["imgs"], (0, 3, 1, 2))).float()
    poses_t = torch.from_numpy(ref_np["poses"]).float()
    Ks_t = torch.from_numpy(ref_np["Ks"]).float()
    dr_t = torch.from_numpy(ref_np["depth_range"]).float()
    opt = torch.optim.Adam(list(model.parameters()) + ray_feats, lr=1e-4)

    def step():
        opt.zero_grad()
        ref_t = {"imgs": imgs_t, "poses": poses_t, "Ks": Ks_t,
                 "depth_range": dr_t,
                 "ray_feats": torch.cat(ray_feats[:views], 0)}
        que_t = {"imgs": imgs_t[0:1],
                 "coords": torch.from_numpy(coords),
                 "poses": poses_t[0:1], "Ks": Ks_t[0:1],
                 "depth_range": dr_t[0:1], "ray_feats": ray_feats[views]}
        outputs = model.render(que_t, ref_t, True)
        log = {}
        for loss in losses:
            log.update(loss(outputs, {}, 0))
        total = sum(torch.mean(v) for k, v in log.items()
                    if k.startswith("loss"))
        total.backward()
        opt.step()
        return float(total.detach())

    dt = _timed_steps(step)
    print(f"reference ft train step (torch cpu): {dt:.2f}s/step "
          f"-> {1.0 / dt:.4f} steps/s", flush=True)
    return 1.0 / dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rays", type=int, default=8192)
    parser.add_argument("--size", type=int, default=400)
    parser.add_argument("--chunk", type=int, default=4096,
                        help="ray_batch_num for both renderers (smaller"
                             " = much lighter 1-core XLA compile)")
    parser.add_argument("--skip-ours", action="store_true")
    parser.add_argument("--skip-reference", action="store_true",
                        help="reuse reference_rays_per_sec from the"
                             " existing json")
    parser.add_argument("--train", action="store_true",
                        help="time the reference TRAIN steps (gen 512-"
                             "ray step + ft step, torch CPU) and merge "
                             "the steps/s into baseline_measured.json")
    flags = parser.parse_args()
    CFG["ray_batch_num"] = flags.chunk

    if flags.train:
        gen_sps = bench_reference_train_gen()
        ft_sps = bench_reference_train_ft()
        data = {}
        if os.path.exists(OUT):
            with open(OUT) as f:
                data = json.load(f)
        data.update({
            "train_workload": "gen: 512 rays, 8 views, 512x512, 64+64 "
                              "samples, render+depth loss; ft: 256 "
                              "rays, 8 views, 64x64, 16+16 samples, "
                              "render+consistency loss",
            "reference_gen_train_steps_per_sec": round(gen_sps, 4),
            "reference_ft_train_steps_per_sec": round(ft_sps, 4),
        })
        with open(OUT, "w") as f:
            json.dump(data, f, indent=1)
        print(json.dumps(data), flush=True)
        return

    from neuray_tpu.data.synthetic import make_sphere_scene, make_query
    rng = np.random.RandomState(0)
    rfn, h, w = 8, flags.size, flags.size
    ref_np = make_sphere_scene(rng, rfn, h, w)
    que_np = make_query(rng, h, w, flags.rays)
    que_np.pop("imgs")

    if flags.skip_reference:
        with open(OUT) as f:
            ref_rps = json.load(f)["reference_rays_per_sec"]
    else:
        ref_rps = bench_reference(ref_np, que_np, flags.rays)
    ours_rps = None if flags.skip_ours else bench_ours_cpu(
        ref_np, que_np, flags.rays)

    result = {
        "workload": f"{h}x{w} scene, {rfn} views, 64+64 samples, "
                    f"{flags.rays} rays, ray_batch_num {flags.chunk}",
        "platform": "host cpu (1 core)",
        "reference_rays_per_sec": round(ref_rps, 2),
        "ours_cpu_rays_per_sec": (None if ours_rps is None
                                  else round(ours_rps, 2)),
        "cpu_speedup": (None if ours_rps is None
                        else round(ours_rps / ref_rps, 3)),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
