"""TPU bench for the COST-VOLUME init path (BASELINE.md row 3 shape).

Renders one fern-shaped novel view — 1008x756 query (762k rays),
64+64 samples, 8 reference views with MVSNet cost-volume
initialization over nn=3 source neighbours (reference
configs/gen/neuray_gen_cost_volume.yaml + network/init_net.py:205) —
on the analytic sphere scene, and reports rays/s plus a separate
scene-encode time, proving the cost volume is built ONCE per frame in
the encode program, not per ray segment.

Ref views are rendered at 1024x768 (the cost-volume config pads ref
images with ref_pad_interval=32: 756->768, 1008->1024, reference
configs/gen/neuray_gen_cost_volume.yaml:37 — that shape hits MVSNet's
eval-time 576x768 resize branch, exactly the reference fern path);
src views are the refs themselves with nn_ids = the 3 nearest other
refs by camera center, mirroring render.py's
build_src_imgs_info_select union.

Usage: python tools/bench_cost_volume.py [--cpu] [--frames 2]
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
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--segment", type=int, default=327680)
    ap.add_argument("--weights", default=None,
                    help="trained CV weights "
                         "(tools/make_bench_weights.py --init "
                         "cost_volume); default: random init")
    ap.add_argument("--focus", action="store_true",
                    help="also bench the probe-FOCUSED render: "
                         "threshold=-1 keeps EVERY ray (the "
                         "forward-facing / fully-occupied regime — the "
                         "win is purely from probe-narrowed sampling "
                         "windows) and threshold=0.01 additionally "
                         "skips empty rays. Needs --weights.")
    ap.add_argument("--probe-stride", type=int, default=2,
                    help="focus modes: probe every stride-th pixel")
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
        make_ray_render_fn)
    from neuray_tpu.data.synthetic import (
        look_at_camera, render_sphere_view, DEPTH_RANGE)

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        qw, qh, rw, rh, dn, chunk, seg = (
            1008, 756, 1024, 768, 64, flags.chunk, flags.segment)
    else:
        qw, qh, rw, rh, dn, chunk, seg = 64, 48, 64, 64, 16, 64, 4096
    rfn, nn = 8, 3

    rng = np.random.RandomState(0)
    imgs, poses, Ks, centers = [], [], [], []
    for _ in range(rfn):
        pose, K = look_at_camera(rng, rh, rw)
        rgb, _, _ = render_sphere_view(pose, K, rh, rw)
        imgs.append(rgb)
        poses.append(pose)
        Ks.append(K)
        centers.append(-pose[:, :3].T @ pose[:, 3])
    centers = np.stack(centers)
    nn_ids = np.stack([
        np.argsort(np.linalg.norm(centers - centers[i], axis=1))[1:nn + 1]
        for i in range(rfn)]).astype(np.int32)

    ref = {
        "imgs": jnp.asarray(np.stack(imgs)),
        "poses": jnp.asarray(np.stack(poses)),
        "Ks": jnp.asarray(np.stack(Ks)),
        "depth_range": jnp.asarray(
            np.tile(np.asarray([DEPTH_RANGE], np.float32), (rfn, 1))),
        "nn_ids": jnp.asarray(nn_ids),
    }
    src = {k: ref[k] for k in ("imgs", "poses", "Ks", "depth_range")}

    que_pose, que_K = look_at_camera(rng, qh, qw)
    xs, ys = np.meshgrid(np.arange(qw), np.arange(qh))
    coords_all = np.stack([xs, ys], -1).reshape(1, -1, 2).astype(np.float32)
    n_rays = coords_all.shape[1]
    que_base = {
        "poses": jnp.asarray(que_pose[None]),
        "Ks": jnp.asarray(que_K[None]),
        "depth_range": jnp.asarray(
            np.asarray([DEPTH_RANGE], np.float32)),
    }

    cfg = RenderConfig(
        init_net_type="cost_volume",
        use_hierarchical_sampling=True, depth_sample_num=dn,
        fine_depth_sample_num=dn, ray_batch_num=chunk,
        use_vis=False, fine_use_vis=False, use_bf16=on_tpu,
        gather_quant="u8" if on_tpu else "none")
    renderer = NeurayRenderer(cfg)

    n_seg = -(-n_rays // seg)
    pad = n_seg * seg - n_rays
    coords_pad = np.pad(coords_all, ((0, 0), (0, pad), (0, 0)), "edge")
    segments = [jnp.asarray(coords_pad[:, i * seg:(i + 1) * seg])
                for i in range(n_seg)]

    if flags.weights:
        from neuray_tpu.utils.params_io import load_params_npz
        params = load_params_npz(flags.weights)
    else:
        params = renderer.init(
            {"params": jax.random.PRNGKey(0),
             "sample": jax.random.PRNGKey(1)},
            ref, {**que_base, "coords": segments[0][:, :chunk]}, False,
            src=src)

    encode_fn = make_scene_encode_fn(renderer)
    rays_fn = make_ray_render_fn(
        renderer, keep_keys=("pixel_colors_nr", "pixel_colors_nr_fine"))

    def encode():
        ref_c = encode_fn(params, ref, src)
        # sync via a tiny readback (block_until_ready unreliable on axon)
        np.asarray(jax.device_get(ref_c["ray_feats"][0, 0, 0, :1]))
        return ref_c

    def render_frame(ref_c):
        pending = [rays_fn(params, ref_c, dict(que_base, coords=cc))
                   for cc in segments]
        outs = [np.asarray(jax.device_get(o["pixel_colors_nr_fine"]))
                for o in pending]
        img = np.concatenate(outs, axis=1)[:, :n_rays]
        assert np.isfinite(img).all()
        return img

    ref_c = encode()            # compile encode (incl. cost volume)
    render_frame(ref_c)         # compile ray loop

    t0 = time.perf_counter()
    ref_c = encode()
    t_encode = time.perf_counter() - t0

    times = []
    for _ in range(flags.frames):
        t0 = time.perf_counter()
        render_frame(ref_c)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    full_img = render_frame(ref_c)
    print(json.dumps({
        "metric": f"rays/sec/chip cost-volume ({qw}x{qh}, {rfn} views, "
                  f"nn={nn}, {dn}+{dn} samples, "
                  f"{jax.devices()[0].platform})",
        "value": round(n_rays / (dt + t_encode), 1),
        "unit": "rays/s",
        "rays_per_sec_ray_loop": round(n_rays / dt, 1),
        "encode_s_incl_cost_volume": round(t_encode, 3),
        "frame_s": round(dt + t_encode, 3),
        "weights": "trained" if flags.weights else "random",
    }), flush=True)

    if not flags.focus:
        return
    from neuray_tpu.models.renderer import render_frame_probe_focus
    gt, _, _ = render_sphere_view(que_pose, que_K, qh, qw)
    gt = gt.reshape(-1, 3)

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return round(10 * np.log10(1.0 / max(mse, 1e-12)), 3)

    cfg_f = RenderConfig(
        init_net_type="cost_volume",
        use_hierarchical_sampling=True, depth_sample_num=dn,
        fine_depth_sample_num=dn, ray_batch_num=chunk,
        probe_sample_num=16 if on_tpu else 8,
        focus_sample_num=16 if on_tpu else 8,
        focus_fine_sample_num=32 if on_tpu else 8,
        use_vis=False, fine_use_vis=False, use_bf16=on_tpu,
        gather_quant="u8" if on_tpu else "none")
    renderer_f = NeurayRenderer(cfg_f)
    encode_f = make_scene_encode_fn(renderer_f)
    que_all = dict(que_base, coords=jnp.asarray(coords_all))
    ref_cf = encode_f(params, ref, src)
    np.asarray(jax.device_get(ref_cf["ray_feats"][0, 0, 0, :1]))
    stride = flags.probe_stride
    for th, label in ((-1.0, "focus_all_rays"), (0.01, "focus_skip")):
        # threshold=-1 keeps all rays regardless of the probe grid, so
        # the strided keep mask is exact there; windows stay pooled
        out = render_frame_probe_focus(
            renderer_f, params, ref_cf, que_all, threshold=th,
            image_hw=(qh, qw), dilate=0 if th < 0 else 1,
            probe_stride=stride, bucket_chunks=8)  # warm
        times_f = []
        for _ in range(flags.frames):
            t0 = time.perf_counter()
            out = render_frame_probe_focus(
                renderer_f, params, ref_cf, que_all, threshold=th,
                image_hw=(qh, qw), dilate=0 if th < 0 else 1,
                probe_stride=stride, bucket_chunks=8)
            times_f.append(time.perf_counter() - t0)
        dt_f = min(times_f)
        img = out["pixel_colors_nr_fine"][0]
        print(json.dumps({
            "mode": label, "threshold": th, "probe_stride": stride,
            "kept_fraction": round(out["kept_rays"] / n_rays, 4),
            "rays_per_sec_amortized": round(n_rays / dt_f, 1),
            "rays_per_sec_incl_encode": round(
                n_rays / (dt_f + t_encode), 1),
            "frame_s": round(dt_f + t_encode, 3),
            "psnr_vs_full": psnr(img, full_img[0]),
            "psnr_vs_gt": psnr(img, gt),
            "full_psnr_vs_gt": psnr(full_img[0], gt),
        }), flush=True)


if __name__ == "__main__":
    main()
