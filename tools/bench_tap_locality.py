"""Does tap locality change gather cost? Compares the fused-map gather
with (a) random indices, (b) realistic scanline-strip chunks (today's
chunk shape), (c) 32x32 tile chunks — same tap count, different
clustering in the ref feature maps.

If (c) << (b), reordering full-frame rays into tiles (a pure layout
permutation) is a free speedup.

Run on the TPU: python tools/bench_tap_locality.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

H = W = 800
RFN = 8
CHUNK = 1024
DN = 64
K = 16


def main():
    import jax
    import jax.numpy as jnp

    from neuray_tpu.utils.compile_cache import cache_dir as _ccd
    jax.config.update("jax_compilation_cache_dir",
                      _ccd("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("platform:", jax.devices()[0].platform, flush=True)

    from neuray_tpu.data.synthetic import make_sphere_scene
    from neuray_tpu.ops import geometry as G
    from neuray_tpu.ops.interpolate import (
        make_fused_scene_map, gather_bilinear_fused)

    rng = np.random.RandomState(0)
    scene = make_sphere_scene(rng, RFN, H, W)
    poses = jnp.asarray(scene["poses"])
    Ks = jnp.asarray(scene["Ks"])
    feats = jnp.asarray(
        rng.rand(RFN, H // 4, W // 4, 64).astype(np.float32), jnp.bfloat16)
    imgs = jnp.asarray(scene["imgs"], jnp.bfloat16)
    fused = make_fused_scene_map(imgs, feats, H, W)
    print("fused map:", fused.shape, fused.dtype, flush=True)

    # query camera: one of the ref cams shifted
    que_pose, que_K = scene["poses"][0], scene["Ks"][0]

    def rays_to_prj(coords):
        """coords [K, n, 2] -> projected taps [K, RFN, n*DN, 2], numpy."""
        R, t = que_pose[:, :3], que_pose[:, 3]
        Kinv = np.linalg.inv(que_K)
        out = []
        depth = np.linspace(2.5, 5.5, DN)
        for k in range(K):
            pix = np.concatenate([coords[k],
                                  np.ones((CHUNK, 1), np.float32)], -1)
            dirs = (pix @ Kinv.T) @ R                       # world dirs
            center = -R.T @ t
            pts = center[None, None] + dirs[:, None] * depth[None, :, None]
            pts = pts.reshape(-1, 3)                        # CHUNK*DN,3
            taps = []
            for v in range(RFN):
                Rv, tv = scene["poses"][v][:, :3], scene["poses"][v][:, 3]
                cam = pts @ Rv.T + tv
                uv = cam @ scene["Ks"][v].T
                taps.append(uv[:, :2] / np.maximum(uv[:, 2:], 1e-4))
            out.append(np.stack(taps))
        return jnp.asarray(np.stack(out).astype(np.float32))

    # (a) random taps
    prj_rand = jnp.asarray(
        (rng.rand(K, RFN, CHUNK * DN, 2) * [W - 1, H - 1]).astype(
            np.float32))
    # (b) scanline strips: chunks of 1024 consecutive pixels
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    scan = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    strips = scan[:K * CHUNK].reshape(K, CHUNK, 2)
    # (c) 32x32 tiles
    tiles = []
    for k in range(K):
        ty, tx = divmod(k * 7, W // 32 - 1)
        base = scan.reshape(H, W, 2)[ty * 32:(ty + 1) * 32,
                                     tx * 32:(tx + 1) * 32]
        tiles.append(base.reshape(-1, 2))
    tiles = np.stack(tiles)

    @jax.jit
    def run(prj):
        def one(pp):
            f, rgb = gather_bilinear_fused(fused, pp, H, W)
            return (jnp.sum(f.astype(jnp.float32))
                    + jnp.sum(rgb.astype(jnp.float32)))
        return jnp.sum(jax.lax.map(one, prj))

    def timeit(fn, *args, iters=3):
        out = fn(*args)
        np.asarray(jax.device_get(out)).ravel()[:1]
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.device_get(out)).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for name, prj in (("random", prj_rand),
                      ("scanline strip", rays_to_prj(strips)),
                      ("32x32 tile", rays_to_prj(tiles))):
        t = timeit(run, prj)
        per_frame = t / K * (640000 / CHUNK) * 2
        print(f"{name:16s} {t / K * 1e3:7.2f} ms/chunk "
              f"-> {per_frame:6.2f} s/frame-equiv", flush=True)


if __name__ == "__main__":
    main()
