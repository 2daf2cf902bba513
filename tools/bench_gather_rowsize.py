"""Map the TPU gather cost vs row size / dtype / batching.

Questions (all at the bench tap count: 1024-ray chunks, dn=64, rfn=8
-> 524288 taps/chunk):
  a. where does cost jump as bf16 row bytes grow past 512B?
  b. do int8 rows of the same BYTE size cost the same as bf16?
  c. is ONE flat gather over all views cheaper than 8 per-view ones?

Run on the TPU: python tools/bench_gather_rowsize.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

RFN = 8
CELLS = 199 * 199
TAPS = 1024 * 64      # per view per chunk
K = 16                # chunks per timed program


def main():
    import jax
    import jax.numpy as jnp

    from neuray_tpu.utils.compile_cache import cache_dir as _ccd
    jax.config.update("jax_compilation_cache_dir",
                      _ccd("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("platform:", jax.devices()[0].platform, flush=True)

    rng = np.random.RandomState(0)
    idx = jnp.asarray(
        rng.randint(0, CELLS, size=(K, RFN, TAPS, 1)).astype(np.int32))
    flat_idx = jnp.asarray(
        (rng.randint(0, CELLS * RFN, size=(K, RFN * TAPS, 1))
         ).astype(np.int32))

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

    def per_view_stage(table):
        @jax.jit
        def run(ix):
            def one(i):
                tap = jnp.take_along_axis(table, i, axis=1)
                return jnp.sum(tap.astype(jnp.float32))
            return jnp.sum(jax.lax.map(one, ix))
        return run

    for ch, dt in [(256, jnp.bfloat16), (288, jnp.bfloat16),
                   (320, jnp.bfloat16), (403, jnp.bfloat16),
                   (512, jnp.bfloat16), (403, jnp.int8),
                   (512, jnp.int8), (806, jnp.int8),
                   (104, jnp.int32)]:
        if dt == jnp.int8:
            table = jnp.asarray(rng.randint(
                -127, 127, size=(RFN, CELLS, ch)).astype(np.int8))
            nbytes = ch
        elif dt == jnp.int32:
            table = jnp.asarray(rng.randint(
                -2**30, 2**30, size=(RFN, CELLS, ch)).astype(np.int32))
            nbytes = ch * 4
        else:
            table = jnp.asarray(
                rng.rand(RFN, CELLS, ch).astype(np.float32), dt)
            nbytes = ch * 2
        t = timeit(per_view_stage(table), idx) / K
        print(f"per-view {ch:4d}ch {np.dtype(table.dtype).name:8s} "
              f"({nbytes:4d}B) -> {t * 1e3:7.2f} ms/chunk", flush=True)

    # (c) one flat gather over all views' cells
    table = jnp.asarray(
        rng.rand(RFN * CELLS, 403).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def run_flat(ix):
        def one(i):
            tap = jnp.take_along_axis(
                table[None], i[None], axis=1)
            return jnp.sum(tap.astype(jnp.float32))
        return jnp.sum(jax.lax.map(one, ix))
    t = timeit(run_flat, flat_idx) / K
    print(f"flat all-views 403ch bf16 -> {t * 1e3:7.2f} ms/chunk",
          flush=True)


if __name__ == "__main__":
    main()
