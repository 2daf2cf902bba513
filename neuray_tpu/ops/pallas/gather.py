"""Pallas TPU kernel: bilinear feature gather (border padding).

STATUS (measured v5e, 1M points x 64ch quarter-res map): this scalar-
loop kernel runs 82ms (bf16) / 163ms (f32) per 131k-point x 8-view
chunk vs ~50ms for XLA's native gather — the per-point sequential
(2,16,C) window loads don't beat the hardware gather path, so the
renderer keeps the jnp gather. Kept as a correct, tested baseline for
a future design (ray-coherent window batching / double-buffered DMA
per epipolar segment).

Hard-won TPU constraints encoded here:
  * dynamic sublane (x) slices must be 8-aligned -> aligned 16-wide
    window + one-hot column selection;
  * stores must also hit 8-aligned sublane offsets -> 8 points per
    iteration with one (8, C) store;
  * the lane (channel) dim pads to 128, so small-channel full-res maps
    (e.g. rgb 800x800x3) explode 40x in VMEM — unusable without
    pixel-packing the lane dim;
  * v5e VMEM is 128MB but the default scoped limit is 16MB
    (CompilerParams(vmem_limit_bytes=...) raises it).

Semantics: border-clamped bilinear at unnormalized pixel coords — the
same result as ops.interpolate.grid_sample_nhwc(..., 'border', ...)
AFTER the caller converts coords to feature-map pixels (align-corners
handling stays in the caller). Forward only (no custom VJP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(coords_ref, feats_ref, out_ref, *, block_p, fh, fw):
    # the sublane (x) dimension only supports 8-aligned dynamic slices:
    # load an aligned 16-wide window and pick the two tap columns with
    # one-hot contractions (VPU-friendly, no unaligned access).
    lane_iota = jax.lax.broadcasted_iota(
        jnp.int32, (16, 1), 0)[:, 0].astype(jnp.float32)

    def sample_one(i):
        ix = coords_ref[0, i, 0]
        iy = coords_ref[0, i, 1]
        # border-clamped bilinear: clamp the continuous coordinate,
        # anchor x0 in [0, size-2], t = clamped - x0 in [0, 1]
        ixc = jnp.clip(ix, 0.0, fw - 1.0)
        iyc = jnp.clip(iy, 0.0, fh - 1.0)
        x0 = jnp.clip(jnp.floor(ixc), 0.0, fw - 2.0)
        y0 = jnp.clip(jnp.floor(iyc), 0.0, fh - 2.0)
        tx = ixc - x0
        ty = iyc - y0
        y0i = y0.astype(jnp.int32)
        xb = jnp.clip((x0 // 8.0) * 8.0, 0.0, fw - 16.0)
        xbi = xb.astype(jnp.int32)
        off = x0 - xb                                     # in [0, 15)
        win = feats_ref[0, pl.ds(y0i, 2), pl.ds(pl.multiple_of(xbi, 8),
                                                16), :]   # 2,16,C
        win = win.astype(jnp.float32)
        # column-selection weights fold the x-lerp in directly:
        # w[k] = (1-tx) [k == off] + tx [k == off+1]
        wsel = (jnp.where(lane_iota == off, 1.0 - tx, 0.0)
                + jnp.where(lane_iota == off + 1.0, tx, 0.0))  # (16,)
        rows = jnp.sum(win * wsel[None, :, None], axis=1)  # (2, C)
        return rows[0] * (1 - ty) + rows[1] * ty           # (C,)

    # 8 points per iteration: stores must hit 8-aligned sublane offsets
    def body(j, _):
        base = pl.multiple_of(j * 8, 8)
        vals = jnp.stack([sample_one(base + k) for k in range(8)])
        out_ref[0, pl.ds(base, 8), :] = vals.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, block_p // 8, body, 0)


# keep the VMEM-resident map block under ~5MB: with double buffering +
# the output block this stays inside the 16MB VMEM budget.
_MAX_MAP_BYTES = 5 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("block_p", "interpret"))
def gather_bilinear_border(feats: jnp.ndarray, coords: jnp.ndarray,
                           block_p: int = 2048,
                           interpret: bool = False) -> jnp.ndarray:
    """feats [v, fh, fw, c]; coords [v, p, 2] (unnormalized feature-map
    pixels) -> [v, p, c] border-clamped bilinear samples.

    Maps larger than the VMEM budget are gathered in channel chunks
    (the tap-index math re-runs per chunk — cheap next to the loads).
    """
    v, fh, fw, c = feats.shape
    _, p, _ = coords.shape
    n_blocks = -(-p // block_p)
    pad = n_blocks * block_p - p
    if pad:
        coords = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)))

    bytes_per_ch = fh * fw * feats.dtype.itemsize
    c_chunk = max(1, min(c, _MAX_MAP_BYTES // max(bytes_per_ch, 1)))

    kernel = functools.partial(_gather_kernel, block_p=block_p,
                               fh=fh, fw=fw)

    def call(feats_chunk):
        cc = feats_chunk.shape[-1]
        return pl.pallas_call(
            kernel,
            grid=(v, n_blocks),
            in_specs=[
                pl.BlockSpec((1, block_p, 2), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, fh, fw, cc), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_p, cc),
                                   lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((v, n_blocks * block_p, cc),
                                           feats.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(coords, feats_chunk)

    if c_chunk >= c:
        out = call(feats)
    else:
        outs = [call(feats[..., i:i + c_chunk])
                for i in range(0, c, c_chunk)]
        out = jnp.concatenate(outs, axis=-1)
    return out[:, :p]
