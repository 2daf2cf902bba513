"""Quantify gather-tap waste at the bench workload shapes.

Answers three questions the perf roofline needs (VERDICT r2 weak #1):
  1. What fraction of (point, view) pairs is INVALID (projects outside
     the ref image / behind the camera) yet still pays a full gather
     tap today (models/renderer.py gathers then masks)?
  2. What fraction of RAYS is fully invalid across all views — those
     rays deterministically composite to the alpha ground state
     (sigmoid(-15) ~ 3e-7, i.e. black) and could skip the network
     entirely.
  3. What fraction of rays falls under the use_ray_mask thresholds
     (<=2 valid views or <=8 valid points, reference renderer.py:47) —
     the mask the training loss already treats as background.

Pure projection geometry (ops/geometry.py, the exact production
function) — no gathers, no network — so it runs in seconds on either
backend. Run: python tools/measure_tap_stats.py [--size 800]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--rfn", type=int, default=8)
    ap.add_argument("--dn", type=int, default=64)
    ap.add_argument("--seg", type=int, default=65536)
    args = ap.parse_args()

    import jax
    from neuray_tpu.utils.compile_cache import cache_dir as _ccd
    jax.config.update("jax_compilation_cache_dir",
                      _ccd("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from neuray_tpu.ops import geometry as G
    from neuray_tpu.ops import sampling as S
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    h = w = args.size
    rfn, dn = args.rfn, args.dn
    rng = np.random.RandomState(0)
    ref = make_sphere_scene(rng, rfn, h, w)
    que = make_query(rng, h, w, rn=0, full_image=True)

    poses = jnp.asarray(ref["poses"])
    Ks = jnp.asarray(ref["Ks"])
    qposes = jnp.asarray(que["poses"])
    qKs = jnp.asarray(que["Ks"])
    depth_range = jnp.asarray(que["depth_range"])

    @jax.jit
    def stats(coords):
        qn, rn, _ = coords.shape
        que_depth, _ = S.sample_depth(depth_range, qn, rn, dn, False)
        que_pts, _ = G.depth2points(coords, qposes, qKs, que_depth)
        pts = que_pts.reshape(qn * rn * dn, 3)
        _, _, _, mask = G.project_points_ref_views(poses, Ks, h, w, pts)
        m = mask.reshape(rfn, rn, dn)
        valid_pairs = jnp.sum(m.astype(jnp.int32))
        # per-(ray,view): all-dn-invalid rows
        rv_any = jnp.any(m, axis=2)                       # rfn, rn
        dead_rows = jnp.sum(1 - rv_any.astype(jnp.int32))
        # per-ray: valid views / valid points (reference ray-mask calc)
        views_per_ray = jnp.sum(rv_any.astype(jnp.int32), axis=0)  # rn
        pts_per_ray = jnp.sum(
            (jnp.sum(m.astype(jnp.int32), axis=0) > 0).astype(jnp.int32),
            axis=1)                                        # rn
        dead_rays = jnp.sum((views_per_ray == 0).astype(jnp.int32))
        masked_rays = jnp.sum(
            ((views_per_ray <= 2) | (pts_per_ray <= 8)).astype(jnp.int32))
        return (valid_pairs, dead_rows, dead_rays, masked_rays)

    coords_all = que["coords"]
    n_rays = coords_all.shape[1]
    seg = args.seg
    n_seg = -(-n_rays // seg)
    pad = n_seg * seg - n_rays
    coords_all = np.pad(coords_all, ((0, 0), (0, pad), (0, 0)), "edge")

    tot = np.zeros(4, np.int64)
    for i in range(n_seg):
        c = jnp.asarray(coords_all[:, i * seg:(i + 1) * seg])
        out = stats(c)
        vals = np.asarray(jax.device_get(jnp.stack(out)))
        if i == n_seg - 1 and pad:
            # recompute last segment without padding contamination:
            # padded coords repeat the last ray (edge mode) — subtract
            # by re-running on the exact tail instead.
            c = jnp.asarray(
                np.pad(coords_all[:, i * seg:i * seg + (seg - pad)],
                       ((0, 0), (0, pad), (0, 0)), "constant"))
            # simpler: count the tail exactly with a fresh call on
            # unpadded coords (new shape, one extra compile — fine)
            c2 = jnp.asarray(coords_all[:, i * seg:i * seg + (seg - pad)])
            out = stats(c2)
            vals = np.asarray(jax.device_get(jnp.stack(out)))
        tot += vals.astype(np.int64)

    pairs_total = n_rays * dn * rfn
    rows_total = n_rays * rfn
    res = {
        "size": h, "rfn": rfn, "dn": dn, "n_rays": n_rays,
        "invalid_pair_fraction": 1.0 - float(tot[0]) / pairs_total,
        "dead_rayview_row_fraction": float(tot[1]) / rows_total,
        "dead_ray_fraction": float(tot[2]) / n_rays,
        "ray_masked_fraction": float(tot[3]) / n_rays,
    }
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
