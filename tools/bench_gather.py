"""Microbenchmark: TPU gather variants at the renderer's hot-path shapes.

Hot shape (bench.py, 800x800 render, chunk=1024 rays, dn=64, rfn=8):
  per pass: quad-gather of rfn*qn*rn*dn = 524288 taps from
    - rgb_quad   [8, 799, 799, 12]  (bf16)
    - feats_quad [8, 199, 199, 256] (bf16)

Variants measured:
  A. take_along_axis batched over rfn        (current production path)
  B. flat jnp.take with global indices       (no batch dim in gather)
  C. lax.gather, mode=clip, unique=False
  D. one-hot windowed matmul (MXU gather)    (prototype, window=rows)
  E. tap-count scaling (x2 points in one call)

Run on the real TPU:  python tools/bench_gather.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.device_get(out)).ravel()[:1]  # sync
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(out)).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from neuray_tpu.utils.compile_cache import cache_dir as _ccd
    jax.config.update("jax_compilation_cache_dir",
                      _ccd("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("platform:", jax.devices()[0].platform, flush=True)

    rfn, pn = 8, 65536              # points per view per chunk
    rng = np.random.RandomState(0)

    for (fh, fw, c4), tag in [((799, 799, 12), "rgb_quad"),
                              ((199, 199, 256), "feats_quad")]:
        quad = jnp.asarray(
            rng.rand(rfn, fh, fw, c4).astype(np.float32), jnp.bfloat16)
        idx = jnp.asarray(
            (rng.rand(rfn, pn) * (fh * fw)).astype(np.int32))
        flat = quad.reshape(rfn, fh * fw, c4)
        gflat = quad.reshape(rfn * fh * fw, c4)
        gidx = idx + (jnp.arange(rfn, dtype=jnp.int32) * (fh * fw))[:, None]

        # NOTE: reduce to a scalar ON DEVICE — the axon tunnel moves
        # ~20MB/s, so device_get of the full gather output would dwarf
        # the gather itself (observed 13s for a 268MB readback).
        @jax.jit
        def v_a(flat, idx):
            return jnp.sum(jnp.take_along_axis(
                flat, idx[..., None], axis=1).astype(jnp.float32))

        @jax.jit
        def v_b(gflat, gidx):
            return jnp.sum(jnp.take(
                gflat, gidx.reshape(-1), axis=0).astype(jnp.float32))

        @jax.jit
        def v_c(gflat, gidx):
            return jnp.sum(gflat[gidx.reshape(-1)].astype(jnp.float32))

        ta = timeit(v_a, flat, idx)
        tb = timeit(v_b, gflat, gidx)
        tc = timeit(v_c, gflat, gidx)
        ntap = rfn * pn
        print(f"{tag}: A take_along {ta*1e3:8.2f}ms ({ta/ntap*1e9:5.1f} ns/tap)"
              f" | B flat take {tb*1e3:8.2f}ms | C getitem {tc*1e3:8.2f}ms",
              flush=True)

        # E: 2x taps in one call (index-rate scaling / dispatch overhead)
        idx2 = jnp.concatenate([idx, idx], axis=1)
        te = timeit(v_a, flat, idx2)
        print(f"{tag}: E 2x taps    {te*1e3:8.2f}ms "
              f"({te/(2*ntap)*1e9:5.1f} ns/tap)", flush=True)

    # D: one-hot windowed matmul gather (MXU). Simulates: points arrive
    # grouped so that each group of G points reads from a W-pixel window
    # whose base offset is known. Gather = sparse one-hot [G, W] @ window
    # [W, C]. Uses feats_quad-like channel width but RAW channels + fused
    # bilinear weights (4 nonzeros per row) — so C=64+3 not 4C.
    for W in (512, 1024, 2048):
        G = 256
        ngroups = rfn * pn // G      # 2048 groups per chunk-pass
        C = 67
        maps = jnp.asarray(rng.rand(ngroups, W, C).astype(np.float32),
                           jnp.bfloat16)  # stand-in for windowed slices
        lidx = jnp.asarray((rng.rand(ngroups, G, 4) * W).astype(np.int32))
        lw = jnp.asarray(rng.rand(ngroups, G, 4).astype(np.float32),
                         jnp.bfloat16)

        @jax.jit
        def v_d(maps, lidx, lw):
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
            onehot = jnp.sum(
                (lidx[..., None] == iota[..., None, :]).astype(jnp.bfloat16)
                * lw[..., None], axis=2)               # ngroups, G, W
            out = jnp.einsum("ngw,nwc->ngc", onehot, maps,
                             preferred_element_type=jnp.bfloat16)
            return jnp.sum(out.astype(jnp.float32))

        td = timeit(v_d, maps, lidx, lw)
        print(f"D one-hot matmul W={W}: {td*1e3:8.2f}ms for {ngroups*G} pts "
              f"({td/(ngroups*G)*1e9:5.1f} ns/pt, incl. 4-tap bilinear)",
              flush=True)
