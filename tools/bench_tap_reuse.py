"""Measure whether reusing the COARSE pass's gathered rows in the fine
pass would pay on the exact render path.

SCOPE: the bench/eval exact path runs ``fine_depth_use_all=False``
(both here and in the reference default, reference renderer.py:39) —
its fine pass evaluates 64 FRESH importance-sampled depths, so there
are ZERO duplicate taps to reuse and this lever does not exist there.
The measurement below covers the ``fine_depth_use_all=True`` config
(reference renderer.py:210), where reuse IS nominally available:

With fine_depth_use_all the fine pass evaluates sorted(cat(coarse_depth,
fine_depth)) — the 64 coarse samples project to the SAME points, so
their fused-map gathers (64/192 = 33% of all fine-pass taps) return
bit-identical rows and could be cached from the coarse pass. BUT the
merged sample order interleaves per ray, and the aggregation net is
order-dependent (along-ray positional encoding + ray attention,
models/ibrnet.py), so reuse requires a per-(ray,sample) PERMUTATION of
the concatenated feature rows — itself a take_along_axis whose row is
all views x channels (8 x 403 x 2B bf16 = 6448B). This tool measures
both sides at the bench chunk shape on the real chip:

  saved:  the coarse-share fused gather it would remove
          ([rays x 64 x 8] taps of 403B u8 rows + dequant)
  added:  the merge permutation it would introduce
          (take_along_axis [rays, 192] over [rays, 192, 8x403] bf16)

and extrapolates to the 800x800 frame (625 chunks). If added >= saved
- noise, coarse-tap reuse is REFUTED the way valid-pair compaction was
(docs/ARCHITECTURE.md roofline).

Usage (TPU): python tools/bench_tap_reuse.py [--rays 1024]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def timed(fn, reps=5):
    import jax
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn()))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--coarse", type=int, default=64)
    ap.add_argument("--fine", type=int, default=128)
    ap.add_argument("--channels", type=int, default=403)
    ap.add_argument("--map-rows", type=int, default=200 * 200)
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

    rn, v, dc, df, ch = (flags.rays, flags.views, flags.coarse,
                         flags.fine, flags.channels)
    dn = dc + df
    rng = np.random.RandomState(0)

    # ---- saved side: the coarse-share fused gather -------------------
    table = jnp.asarray(rng.randint(0, 255, (flags.map_rows, ch)),
                        jnp.uint8)
    idx_g = jnp.asarray(rng.randint(0, flags.map_rows, (rn * dc * v,)),
                        jnp.int32)

    @jax.jit
    def gather_coarse(table, idx):
        rows = jnp.take(table, idx, axis=0)           # taps x ch, u8
        return jnp.sum(rows.astype(jnp.bfloat16).astype(jnp.float32))

    t_saved = timed(lambda: gather_coarse(table, idx_g))

    # ---- added side: the merge permutation ---------------------------
    feats = jnp.asarray(
        rng.randn(rn, dn, v * ch).astype(np.float32), jnp.bfloat16)
    perm = np.stack([rng.permutation(dn) for _ in range(rn)])
    idx_p = jnp.asarray(perm[:, :, None], jnp.int32)

    @jax.jit
    def permute_merge(feats, idx):
        out = jnp.take_along_axis(feats, idx, axis=1)
        return jnp.sum(out.astype(jnp.float32))

    t_added = timed(lambda: permute_merge(feats, idx_p))

    # ---- also: a cheap-row permutation (alpha/color-level reorder),
    # the fallback if only order-independent tails were reordered ------
    small = jnp.asarray(rng.randn(rn, dn, 4).astype(np.float32))

    @jax.jit
    def permute_small(x, idx):
        return jnp.sum(jnp.take_along_axis(x, idx, axis=1))

    t_small = timed(lambda: permute_small(small, idx_p))

    chunks_per_frame = 800 * 800 // rn
    out = {
        "chunk_shape": f"{rn} rays x ({dc}+{df}) samples x {v} views "
                       f"x {ch}ch",
        "saved_coarse_gather_ms": round(t_saved * 1e3, 2),
        "added_merge_permute_ms": round(t_added * 1e3, 2),
        "small_row_permute_ms": round(t_small * 1e3, 3),
        "net_ms_per_chunk": round((t_saved - t_added) * 1e3, 2),
        "net_s_per_frame": round(
            (t_saved - t_added) * chunks_per_frame, 2),
        "saved_s_per_frame": round(t_saved * chunks_per_frame, 2),
        "added_s_per_frame": round(t_added * chunks_per_frame, 2),
    }
    import json
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
