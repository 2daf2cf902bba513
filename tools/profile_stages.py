"""Stage-time breakdown of the render hot loop on the real TPU.

Times each pipeline stage as its own jit program over K chunks (inside
one device program via lax.map, so the ~30ms axon dispatch RTT is
amortized) at the exact bench.py hot shapes: 1024-ray chunks, dn=64,
rfn=8, 800x800 scene, bf16 quad maps. Reports seconds per 640k-ray
frame-equivalent (x2 passes for per-pass stages) so the numbers can be
read against bench.py's frame time.

Run: python tools/profile_stages.py  (on the TPU)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

CHUNK = 1024
DN = 64
RFN = 8
H = W = 800
K = int(os.environ.get("PROFILE_K", "64"))  # chunks per timed program
FRAME_CHUNKS = 640000 / CHUNK   # 625 chunks per 800x800 frame


def main():
    import jax
    import jax.numpy as jnp

    from neuray_tpu.utils.compile_cache import cache_dir as _ccd
    jax.config.update("jax_compilation_cache_dir",
                      _ccd("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("platform:", jax.devices()[0].platform, flush=True)

    from neuray_tpu.ops import geometry as G
    from neuray_tpu.ops import sampling as S
    from neuray_tpu.ops.interpolate import (
        gather_bilinear_quad, make_fused_scene_map, gather_bilinear_fused)
    from neuray_tpu.ops.compositing import alpha_values2hit_prob
    from neuray_tpu.models.dist_decoder import name2dist_decoder
    from neuray_tpu.models.agg_net import name2agg_net

    rng = np.random.RandomState(0)
    fh = fw = H // 4

    poses = jnp.asarray(rng.randn(RFN, 3, 4).astype(np.float32))
    Ks = jnp.asarray((np.eye(3)[None] * [W, H, 1.0] +
                      rng.rand(RFN, 3, 3)).astype(np.float32))
    rgb_quad = jnp.asarray(
        rng.rand(RFN, H - 1, W - 1, 12).astype(np.float32), jnp.bfloat16)
    feats_quad = jnp.asarray(
        rng.rand(RFN, fh - 1, fw - 1, 256).astype(np.float32), jnp.bfloat16)

    pts = jnp.asarray(
        rng.randn(K, 1, CHUNK, DN, 3).astype(np.float32) * 2)
    prj_pts = jnp.asarray(
        (rng.rand(K, RFN, CHUNK * DN, 2) * [W - 1, H - 1]).astype(
            np.float32))
    depth_range = jnp.asarray(
        np.tile([[2.5, 5.5]], (RFN, 1)).astype(np.float32))
    que_range = jnp.asarray(np.asarray([[2.5, 5.5]], np.float32))

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

    results = {}
    only = os.environ.get("PROFILE_STAGES")  # e.g. "dist,agg,sampling"

    def want(tag):
        return only is None or tag in only.split(",")

    # Dispatch floor: a near-empty program timed the same way. On the
    # axon tunnel one dispatch+readback costs ~30ms REGARDLESS of the
    # program, so every stage number below includes ~t_null of pure
    # RTT — at K=16 that floor alone reads as "2.3 s/frame" for a
    # 2-pass stage, which is how the round-4 table overstated the
    # cheap stages (compositing/sampling/projection). Stages report
    # floor-corrected time; `dispatch_floor` records the raw floor.
    tiny = jnp.asarray(np.zeros((K, 8), np.float32))

    @jax.jit
    def stage_null(x):
        return jnp.sum(jax.lax.map(lambda v: jnp.sum(v * 2.0), x))
    t_null = timeit(stage_null, tiny)
    print(f"{'dispatch floor':24s} {t_null * 1e3:8.2f} ms/program",
          flush=True)
    results["dispatch_floor_ms"] = round(t_null * 1e3, 2)

    def report(name, t_per_k, passes=2):
        t_corr = max(t_per_k - t_null, 0.0)
        per_frame = t_corr / K * FRAME_CHUNKS * passes
        results[name] = round(per_frame, 3)
        print(f"{name:24s} {t_corr / K * 1e3:8.2f} ms/chunk "
              f"-> {per_frame:6.2f} s/frame (x{passes} passes, "
              f"floor-corrected)", flush=True)

    # A. projection math
    @jax.jit
    def stage_proj(pts):
        def one(p):
            out = G.project_points_ref_views(
                poses, Ks, H, W, p.reshape(-1, 3))
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out[1:3])
        return jnp.sum(jax.lax.map(one, pts))
    if want("proj"):
        report("projection", timeit(stage_proj, pts))

    # B/C. the two quad gathers
    def make_gather_stage(quad, align):
        @jax.jit
        def stage(prj_pts):
            def one(pp):
                out = gather_bilinear_quad(quad, pp, H, W, align)
                return jnp.sum(out.astype(jnp.float32))
            return jnp.sum(jax.lax.map(one, prj_pts))
        return stage
    if want("gather"):
        report("gather rgb_quad(12ch)",
               timeit(make_gather_stage(rgb_quad, True), prj_pts))
        report("gather feats_quad(256)",
               timeit(make_gather_stage(feats_quad, False), prj_pts))

    # C2. the fused single-tap gather (what the renderer actually runs)
    if want("fused"):
        imgs_full = jnp.asarray(
            rng.rand(RFN, H, W, 3).astype(np.float32), jnp.bfloat16)
        feats_map = jnp.asarray(
            rng.rand(RFN, fh, fw, 64).astype(np.float32), jnp.bfloat16)
        fused = make_fused_scene_map(imgs_full, feats_map, H, W)

        @jax.jit
        def stage_fused(prj):
            def one(pp):
                f, rgb = gather_bilinear_fused(fused, pp, H, W)
                return (jnp.sum(f.astype(jnp.float32))
                        + jnp.sum(rgb.astype(jnp.float32)))
            return jnp.sum(jax.lax.map(one, prj))
        report("gather fused(403ch)", timeit(stage_fused, prj_pts))

        # variant: fold ALL interpolation weights into one 403-wide
        # per-tap vector -> one elementwise mul -> reshape-sums, to see
        # if the 64-ch quad slices (lane-unaligned) are the overhead.
        # (kept as a measured negative result; opt-in via
        # PROFILE_STAGES=fusedv2 — the compile is expensive)
        fh2, fw2 = H // 4, W // 4
        flat = fused.reshape(RFN, (fh2 - 1) * (fw2 - 1), fused.shape[-1])

        def fused_v2(pp):
            x, y = pp[..., 0], pp[..., 1]
            ix = jnp.clip(x * fw2 / (W - 1.0) - 0.5, 0.0, fw2 - 1.0)
            iy = jnp.clip(y * fh2 / (H - 1.0) - 0.5, 0.0, fh2 - 1.0)
            x0 = jnp.clip(jnp.floor(ix), 0.0, fw2 - 2.0)
            y0 = jnp.clip(jnp.floor(iy), 0.0, fh2 - 2.0)
            tx, ty = ix - x0, iy - y0
            idx = (y0 * (fw2 - 1) + x0).astype(jnp.int32)
            tap = jnp.take_along_axis(flat, idx[..., None], axis=1)
            w4 = jnp.stack([(1 - tx) * (1 - ty), tx * (1 - ty),
                            (1 - tx) * ty, tx * ty], -1)      # *,4
            wq = jnp.broadcast_to(
                w4[..., :, None], (*w4.shape, 64)).reshape(
                    *w4.shape[:-1], 256)
            dx = jnp.clip(x, 0.0, W - 1.0) - x0 * 4.02  # approx base (timing only)
            dy = jnp.clip(y, 0.0, H - 1.0) - y0 * 4.02
            offs = jnp.arange(7, dtype=jnp.float32)
            wx = jnp.maximum(1.0 - jnp.abs(dx[..., None] - offs), 0.0)
            wy = jnp.maximum(1.0 - jnp.abs(dy[..., None] - offs), 0.0)
            w49 = (wy[..., :, None] * wx[..., None, :]).reshape(
                *wx.shape[:-1], 49)
            w403 = jnp.concatenate(
                [wq, jnp.tile(w49, (1, 1, 3))], -1).astype(tap.dtype)
            prod = tap * w403
            feats = jnp.sum(prod[..., :256].reshape(
                *prod.shape[:-1], 4, 64), axis=-2)
            rgb = jnp.sum(prod[..., 256:].reshape(
                *prod.shape[:-1], 3, 49), axis=-1, dtype=jnp.float32)
            return (jnp.sum(feats.astype(jnp.float32))
                    + jnp.sum(rgb))

        if want("fusedv2") and only is not None:
            @jax.jit
            def stage_fused2(prj):
                return jnp.sum(jax.lax.map(fused_v2, prj))
            report("gather fused v2(1-mul)", timeit(stage_fused2, prj_pts))

    # C3. the uint8-quantized fused gather (403B rows vs 806B bf16)
    if want("fused_u8"):
        from neuray_tpu.ops.interpolate import (
            make_fused_scene_map_u8, gather_bilinear_fused_u8)
        imgs_full8 = jnp.asarray(
            rng.rand(RFN, H, W, 3).astype(np.float32))
        feats_map8 = jnp.asarray(
            rng.rand(RFN, fh, fw, 64).astype(np.float32))
        fused8, scale8, off8 = make_fused_scene_map_u8(
            imgs_full8, feats_map8, H, W)

        @jax.jit
        def stage_fused_u8(prj):
            def one(pp):
                f, rgb = gather_bilinear_fused_u8(
                    fused8, scale8, off8, pp, H, W)
                return (jnp.sum(f.astype(jnp.float32))
                        + jnp.sum(rgb.astype(jnp.float32)))
            return jnp.sum(jax.lax.map(one, prj))
        report("gather fused_u8(403B)", timeit(stage_fused_u8, prj_pts))

    # D. dist decoder + compute_prob
    dd = name2dist_decoder["mixture_logistics"]({"use_vis": False},
                                                dtype=jnp.bfloat16)
    feats_in = jnp.asarray(
        rng.rand(K, RFN, 1, CHUNK, DN, 32).astype(np.float32), jnp.bfloat16)
    prj_depth = jnp.asarray(
        rng.rand(K, RFN, 1, CHUNK, DN).astype(np.float32) * 3 + 2.5)
    que_dists = jnp.asarray(
        rng.rand(1, 1, CHUNK, DN).astype(np.float32) * 0.02)
    dd_params = dd.init(jax.random.PRNGKey(0), feats_in[0])

    from neuray_tpu.ops import mixture

    @jax.jit
    def stage_dist(feats_in, prj_depth):
        def one(args):
            f, d = args
            mean, var, vis, aw = dd.apply(dd_params, f)
            alpha, visibility, hit_prob = mixture.compute_prob(
                d, que_dists[None], mean, var, vis, aw, True,
                depth_range, False)
            return (jnp.sum(alpha.astype(jnp.float32))
                    + jnp.sum(hit_prob.astype(jnp.float32)))
        return jnp.sum(jax.lax.map(one, (feats_in, prj_depth)))
    if want("dist"):
        report("dist decoder+prob",
               timeit(stage_dist, feats_in, prj_depth))

    # E. aggregation net (IBRNet + attention)
    agg = name2agg_net["default"]({"neuray_dim": 32, "sample_num": DN},
                                  dtype=jnp.bfloat16)
    prj_dict = {
        "ray_feats": feats_in[0],
        "hit_prob": jnp.asarray(rng.rand(RFN, 1, CHUNK, DN, 1),
                                jnp.float32),
        "vis": jnp.asarray(rng.rand(RFN, 1, CHUNK, DN, 1), jnp.float32),
        "rgb": jnp.asarray(rng.rand(RFN, 1, CHUNK, DN, 3), jnp.float32),
        "dir": jnp.asarray(rng.rand(RFN, 1, CHUNK, DN, 3), jnp.float32),
        "mask": jnp.asarray(rng.rand(RFN, 1, CHUNK, DN, 1) > 0.3,
                            jnp.float32),
        "img_feats": feats_in[0],
    }
    que_dir = jnp.asarray(rng.rand(1, CHUNK, DN, 3), jnp.float32)
    agg_params = agg.init(jax.random.PRNGKey(1), prj_dict, que_dir)
    feats_all = feats_in

    @jax.jit
    def stage_agg(feats_all):
        def one(f):
            pd = dict(prj_dict)
            pd["ray_feats"] = f
            density, colors = agg.apply(agg_params, pd, que_dir)
            return (jnp.sum(density.astype(jnp.float32))
                    + jnp.sum(colors.astype(jnp.float32)))
        return jnp.sum(jax.lax.map(one, feats_all))
    if want("agg"):
        report("agg net (IBRNet)", timeit(stage_agg, feats_all))

    # F. sampling: coarse + fine CDF inversion
    hit_prob = jnp.asarray(
        rng.rand(K, 1, CHUNK, DN).astype(np.float32))

    @jax.jit
    def stage_sampling(hit_prob):
        def one(hp):
            que_depth, _ = S.sample_depth(que_range, 1, CHUNK, DN, False)
            fine = S.sample_fine_depth(que_depth, hp, que_range, DN,
                                       False, None)
            return jnp.sum(fine)
        return jnp.sum(jax.lax.map(one, hit_prob))
    if want("sampling"):
        report("sampling (coarse+fine)", timeit(stage_sampling, hit_prob),
               passes=1)

    # G. compositing
    alpha = jnp.asarray(rng.rand(K, 1, CHUNK, DN).astype(np.float32))

    @jax.jit
    def stage_comp(alpha):
        def one(a):
            return jnp.sum(alpha_values2hit_prob(a))
        return jnp.sum(jax.lax.map(one, alpha))
    if want("comp"):
        report("compositing", timeit(stage_comp, alpha))

    total = sum(v for k, v in results.items()
                if k != "dispatch_floor_ms")
    print(f"{'SUM of stages':24s} -> {total:6.2f} s/frame", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
