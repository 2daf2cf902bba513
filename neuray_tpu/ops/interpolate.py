"""Bilinear feature interpolation (the grid_sample-equivalent gather).

This is THE hot op of the system: every (query point x reference view)
pair gathers interpolated features from reference feature maps. The
reference implements it as torch.nn.functional.grid_sample wrapped by
interpolate_feats (reference network/ops.py:14-34); align_corners and
padding_mode vary by call site and are parity-critical.

TPU-native design: channels-last [n, h, w, c] maps, one flat gather of 4
taps per point from the [h*w, c] view, lerp on the VPU. A fused
projection+gather Pallas kernel lives in ops/pallas/ for the hot path;
this jnp version is the semantics reference and autodiff path.
"""
from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(points: jnp.ndarray, h: int, w: int, align_corners: bool):
    """Map pixel coords (relative to an (h, w) image) through the
    reference's normalize->grid_sample-unnormalize round trip.

    The reference normalizes px -> px/(w-1)*2-1 and then grid_sample
    unnormalizes with its own convention, so the composite is:
      align_corners=True:  ix = px                       (identity)
      align_corners=False: ix = px * w/(w-1) - 0.5
    (and same for y with h). The non-identity case matters whenever the
    feature map resolution differs from the (h, w) the coords live in.
    """
    x, y = points[..., 0], points[..., 1]
    if align_corners:
        return x, y
    return x * (w / (w - 1.0)) - 0.5, y * (h / (h - 1.0)) - 0.5


def grid_sample_nhwc(feats: jnp.ndarray, points: jnp.ndarray,
                     h: int | None = None, w: int | None = None,
                     padding_mode: str = "zeros",
                     align_corners: bool = False) -> jnp.ndarray:
    """Bilinear-sample channels-last feature maps at pixel coordinates.

    Args:
      feats:  [n, fh, fw, c] feature maps.
      points: [n, pn, 2] (x, y) pixel coords expressed in an (h, w) frame
              (defaults to (fh, fw)).
      padding_mode: 'zeros' | 'border' (the two modes the system uses).
      align_corners: grid_sample flag; see _unnormalize.
    Returns:
      [n, pn, c] interpolated features.
    """
    n, fh, fw, c = feats.shape
    if h is None and w is None:
        h, w = fh, fw
    # coords in an (h,w) frame; scale-to-feature-map happens through the
    # normalized round trip exactly as the reference does it.
    x_norm = points[..., 0] / (w - 1.0) * 2.0 - 1.0
    y_norm = points[..., 1] / (h - 1.0) * 2.0 - 1.0
    if align_corners:
        ix = (x_norm + 1.0) / 2.0 * (fw - 1.0)
        iy = (y_norm + 1.0) / 2.0 * (fh - 1.0)
    else:
        ix = ((x_norm + 1.0) * fw - 1.0) / 2.0
        iy = ((y_norm + 1.0) * fh - 1.0) / 2.0

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    tx = ix - x0
    ty = iy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if padding_mode == "zeros":
        def tap_weight_mask(xi, yi):
            inb = (xi >= 0) & (xi < fw) & (yi >= 0) & (yi < fh)
            return inb.astype(feats.dtype)
        m00 = tap_weight_mask(x0, y0)
        m01 = tap_weight_mask(x1, y0)
        m10 = tap_weight_mask(x0, y1)
        m11 = tap_weight_mask(x1, y1)
    elif padding_mode == "border":
        one = jnp.ones(ix.shape, feats.dtype)
        m00 = m01 = m10 = m11 = one
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")

    x0c = jnp.clip(x0, 0, fw - 1)
    x1c = jnp.clip(x1, 0, fw - 1)
    y0c = jnp.clip(y0, 0, fh - 1)
    y1c = jnp.clip(y1, 0, fh - 1)

    flat = feats.reshape(n, fh * fw, c)

    def gather(yi, xi):
        idx = yi * fw + xi                                   # n,pn
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    w00 = ((1 - tx) * (1 - ty) * m00)[..., None]
    w01 = (tx * (1 - ty) * m01)[..., None]
    w10 = ((1 - tx) * ty * m10)[..., None]
    w11 = (tx * ty * m11)[..., None]

    out = (gather(y0c, x0c) * w00 + gather(y0c, x1c) * w01 +
           gather(y1c, x0c) * w10 + gather(y1c, x1c) * w11)
    return out


def interpolate_feats(feats, points, h=None, w=None,
                      padding_mode="zeros", align_corners=False):
    """Alias matching the reference API name (reference ops.py:14)."""
    return grid_sample_nhwc(feats, points, h, w, padding_mode, align_corners)


def interpolate_feature_map(feats, coords, mask, h: int, w: int,
                            padding_mode: str = "border"):
    """Interpolate + zero out invalid projections.

    Parity: reference render_ops.py:54-70 — align_corners=True iff the
    feature map is at full (h, w) resolution.

    feats [n, fh, fw, c]; coords [n, pn, 2]; mask [n, pn] -> [n, pn, c]
    """
    fh, fw = feats.shape[1:3]
    align = (fh == h and fw == w)
    out = grid_sample_nhwc(feats, coords, h, w, padding_mode, align)
    return out * mask[..., None].astype(out.dtype)


def masked_mean_var(feats: jnp.ndarray, mask: jnp.ndarray, axis: int):
    """Mean/var over ``axis`` counting only mask>0 entries.

    Parity: reference ops.py:36-41. feats [...], mask broadcastable.
    """
    mask = mask.astype(feats.dtype)
    mask_sum = jnp.maximum(jnp.sum(mask, axis=axis, keepdims=True), 1e-4)
    mean = jnp.sum(feats * mask, axis=axis, keepdims=True) / mask_sum
    var = jnp.sum((feats - mean) ** 2 * mask, axis=axis, keepdims=True) / mask_sum
    return mean, var


# ---------------------------------------------------------------------
# Quad-packed gather: the TPU gather is index-rate bound (~17ms per
# 1M-point tap on v5e) and nearly channel-width insensitive, so packing
# the 2x2 bilinear neighborhood into one 4C-channel map turns 4 gathers
# into 1 (~3x faster interpolation, measured). Border semantics only —
# the render hot path uses border everywhere.
# ---------------------------------------------------------------------

def make_quad_map(feats: jnp.ndarray) -> jnp.ndarray:
    """Pack each pixel's 2x2 neighborhood into channels.

    feats [n, fh, fw, c] -> quad [n, fh-1, fw-1, 4c] with channel blocks
    (y0x0, y0x1, y1x0, y1x1). Built once per scene (4x HBM for the map,
    negligible vs per-chunk gather traffic).
    """
    return jnp.concatenate([
        feats[:, :-1, :-1], feats[:, :-1, 1:],
        feats[:, 1:, :-1], feats[:, 1:, 1:]], axis=-1)


def _patch_base(cell: jnp.ndarray, ratio: float, size: int,
                patch: int) -> jnp.ndarray:
    """First full-res pixel of the ``patch``-wide window that covers
    every full-res coordinate whose 1/4-res anchor is ``cell``.

    cell k >= 1 covers full-res x in [(k+0.5)*ratio, (k+1.5)*ratio);
    cell 0 additionally absorbs all clipped-left coords down to 0.
    With ratio < 4 a 7-wide window always suffices (see
    make_fused_scene_map's assert).
    """
    base = jnp.floor((cell.astype(jnp.float32) + 0.5) * ratio)
    base = jnp.where(cell == 0, 0.0, base)
    return jnp.clip(base, 0.0, float(size - patch))


_PATCH = 7  # full-res rgb window per 1/4-res cell


def fused_map_supported(h: int, w: int, fh: int, fw: int) -> bool:
    """Whether a (h, w) image with a (fh, fw) feature grid fits the
    fused map's fixed rgb patch: the _PATCH-wide window must cover cell
    0's clipped span of 1.5*ratio pixels plus the bilinear +1 tap.
    Callers (renderer.build_gather_cache) use this to route to the
    separate-quad fallback instead of tripping the assert below."""
    ratio = max((w - 1) / fw, (h - 1) / fh)
    return 1.5 * ratio + 1.0 <= _PATCH


def make_fused_scene_map(imgs: jnp.ndarray, feats: jnp.ndarray,
                         h: int, w: int) -> jnp.ndarray:
    """Pack the feats 2x2 quad AND the full-res rgb 7x7 patch into one
    1/4-res map so the render hot loop pays ONE gather tap per
    (point, view) instead of two.

    Why: the TPU gather is index-rate bound (~20ns/tap measured on v5e
    regardless of 24B vs 512B rows — tools/profile_stages.py); the two
    per-point taps (rgb_quad at full res + feats_quad at 1/4 res) were
    80% of the 800x800 frame time, split evenly. Packing rgb alongside
    the feats cell halves the tap count for near-zero extra bytes.

    imgs [n,h,w,3] (any float dtype); feats [n,fh,fw,c] ->
    fused [n, fh-1, fw-1, 4c + 147] with channels
    [feats quad (4c) | rgb patch CHANNEL-major 3x7x7 (147)].

    The patch is packed channel-major ([c][dy][dx]) so the weighted
    reconstruction in gather_bilinear_fused reduces over a 49-wide
    minor axis; pixel-major ([dy][dx][c]) would put a 3-wide minor dim
    on the VPU's 128 lanes (measured ~3.4ms/chunk of pure layout waste).
    """
    n, fh, fw, c = feats.shape
    ratio_x, ratio_y = (w - 1) / fw, (h - 1) / fh
    assert fused_map_supported(h, w, fh, fw), (
        f"feature grid too coarse for the fused map: ratio "
        f"{(ratio_x, ratio_y)}")
    quad = make_quad_map(feats)                       # n,fh-1,fw-1,4c

    kx = jnp.arange(fw - 1)
    ky = jnp.arange(fh - 1)
    base_x = _patch_base(kx, ratio_x, w, _PATCH).astype(jnp.int32)
    base_y = _patch_base(ky, ratio_y, h, _PATCH).astype(jnp.int32)
    iy = base_y[:, None] + jnp.arange(_PATCH)[None]   # fh-1,7
    ix = base_x[:, None] + jnp.arange(_PATCH)[None]   # fw-1,7
    rows = jnp.take(imgs, iy.reshape(-1), axis=1)     # n,(fh-1)*7,w,3
    patch = jnp.take(rows, ix.reshape(-1), axis=2)    # n,(fh-1)*7,(fw-1)*7,3
    patch = patch.reshape(n, fh - 1, _PATCH, fw - 1, _PATCH, 3)
    patch = patch.transpose(0, 1, 3, 5, 2, 4).reshape(
        n, fh - 1, fw - 1, 3 * _PATCH * _PATCH)
    return jnp.concatenate([quad, patch.astype(quad.dtype)], axis=-1)


def gather_bilinear_fused(fused: jnp.ndarray, points: jnp.ndarray,
                          h: int, w: int):
    """One tap from a make_fused_scene_map map -> (feats [n,pn,c],
    rgb [n,pn,3]); c is derived from the map's channel layout.

    feats reproduce gather_bilinear_quad(feats_quad, pts, h, w, False);
    rgb reproduces gather_bilinear_quad(rgb_quad, pts, h, w, True) (the
    full-res align-corners bilinear with border clamp), evaluated from
    the packed 7x7 patch with hat-function weights — exact bilinear
    because hat(dx - j) IS the linear interpolation kernel on the
    integer grid.
    """
    n = fused.shape[0]
    fh, fw = fused.shape[1] + 1, fused.shape[2] + 1
    c4 = fused.shape[-1] - _PATCH * _PATCH * 3

    x = points[..., 0]
    y = points[..., 1]
    # 1/4-res anchor (align_corners=False round trip, as in
    # gather_bilinear_quad)
    ix = jnp.clip(x * fw / (w - 1.0) - 0.5, 0.0, fw - 1.0)
    iy = jnp.clip(y * fh / (h - 1.0) - 0.5, 0.0, fh - 1.0)
    x0 = jnp.clip(jnp.floor(ix), 0.0, fw - 2.0)
    y0 = jnp.clip(jnp.floor(iy), 0.0, fh - 2.0)
    # weights in the MAP's dtype: f32 weights would promote the whole
    # gathered [*, 403] bf16 row to f32 (hundreds of MB of casts per
    # chunk); bf16 weight error (~4e-3 relative) is the same scale as
    # the bf16 storage error already accepted for the map.
    tx = (ix - x0)[..., None].astype(fused.dtype)
    ty = (iy - y0)[..., None].astype(fused.dtype)
    idx = (y0 * (fw - 1) + x0).astype(jnp.int32)

    flat = fused.reshape(n, (fh - 1) * (fw - 1), fused.shape[-1])
    tap = jnp.take_along_axis(flat, idx[..., None], axis=1)

    qc = c4 // 4
    f00, f01, f10, f11 = (tap[..., :qc], tap[..., qc:2 * qc],
                          tap[..., 2 * qc:3 * qc], tap[..., 3 * qc:c4])
    top = f00 * (1 - tx) + f01 * tx
    bot = f10 * (1 - tx) + f11 * tx
    feats = top * (1 - ty) + bot * ty

    # full-res rgb from the patch: hat weights around (x, y)
    ratio_x, ratio_y = (w - 1) / fw, (h - 1) / fh
    base_x = _patch_base(x0, ratio_x, w, _PATCH)
    base_y = _patch_base(y0, ratio_y, h, _PATCH)
    dx = jnp.clip(x, 0.0, w - 1.0) - base_x            # in [0, 6]
    dy = jnp.clip(y, 0.0, h - 1.0) - base_y
    offs = jnp.arange(_PATCH, dtype=jnp.float32)
    wx = jnp.maximum(1.0 - jnp.abs(dx[..., None] - offs), 0.0)  # n,pn,7
    wy = jnp.maximum(1.0 - jnp.abs(dy[..., None] - offs), 0.0)
    # outer-product weights flattened to the patch's 49-wide minor
    # axis: ONE lane-dim reduction per color channel (the patch is
    # packed channel-major, see make_fused_scene_map). The hat weights
    # are computed in f32 (exactness at integer offsets), then cast.
    w49 = (wy[..., :, None] * wx[..., None, :]).reshape(
        *wx.shape[:-1], _PATCH * _PATCH).astype(fused.dtype)
    patch = tap[..., c4:].reshape(
        *tap.shape[:-1], 3, _PATCH * _PATCH)
    # products stay in the map dtype; the 49-term reduction widens to
    # f32 (bf16 accumulation over 49 terms would cost ~1e-2 absolute)
    rgb = jnp.sum(patch * w49[..., None, :], axis=-1,
                  dtype=jnp.float32).astype(fused.dtype)  # n,pn,3
    return feats, rgb


def make_fused_scene_map_u8(imgs: jnp.ndarray, feats: jnp.ndarray,
                            h: int, w: int):
    """uint8-quantized fused scene map: same layout as
    make_fused_scene_map but 1 byte/channel, dropping the gather row
    from 806B (bf16) to 403B — under the measured 512B knee where the
    TPU gather is purely index-rate bound (+16% above it,
    tools/bench_gather_rowsize.py).

    Quantization scheme:
      * feats quad: symmetric per-BASE-channel absmax scaling around
        zero-point 128 (the 4 quad blocks hold shifted copies of the
        same channels, so they share scales). The bilinear lerp runs on
        the raw u8 codes (weights sum to 1), and the affine dequant
        (x*scale - 128*scale) applies ONCE per output channel.
      * rgb patch: exact-255 quantization — LOSSLESS for images that
        came from 8-bit sources (all real datasets); synthetic float
        images round to 1/255.

    Returns (fused_u8 [n,fh-1,fw-1,4c+147], scale [c] bf16,
    offset [c] bf16) with offset = 128*scale.
    """
    feats = feats.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(feats), axis=(0, 1, 2))
    scale = jnp.maximum(absmax, 1e-8) / 127.0                 # [c]
    q = jnp.clip(jnp.round(feats / scale) + 128.0, 0.0, 255.0)
    quad = make_quad_map(q.astype(jnp.uint8))                 # n,fh-1,fw-1,4c

    n, fh, fw, c = feats.shape
    imgs_u8 = jnp.clip(jnp.round(imgs.astype(jnp.float32) * 255.0),
                       0.0, 255.0).astype(jnp.uint8)
    kx = jnp.arange(fw - 1)
    ky = jnp.arange(fh - 1)
    ratio_x, ratio_y = (w - 1) / fw, (h - 1) / fh
    assert fused_map_supported(h, w, fh, fw)
    base_x = _patch_base(kx, ratio_x, w, _PATCH).astype(jnp.int32)
    base_y = _patch_base(ky, ratio_y, h, _PATCH).astype(jnp.int32)
    iy = base_y[:, None] + jnp.arange(_PATCH)[None]
    ix = base_x[:, None] + jnp.arange(_PATCH)[None]
    rows = jnp.take(imgs_u8, iy.reshape(-1), axis=1)
    patch = jnp.take(rows, ix.reshape(-1), axis=2)
    patch = patch.reshape(n, fh - 1, _PATCH, fw - 1, _PATCH, 3)
    patch = patch.transpose(0, 1, 3, 5, 2, 4).reshape(
        n, fh - 1, fw - 1, 3 * _PATCH * _PATCH)
    fused = jnp.concatenate([quad, patch], axis=-1)
    scale_bf = scale.astype(jnp.bfloat16)
    # offset computed FROM the bf16 scale (x128 = exponent shift, exact
    # in bf16) so dequant has zero constant bias vs the stored scale
    return fused, scale_bf, scale_bf * jnp.bfloat16(128.0)


def gather_bilinear_fused_u8(fused: jnp.ndarray, scale: jnp.ndarray,
                             offset: jnp.ndarray, points: jnp.ndarray,
                             h: int, w: int):
    """One 403-byte tap from a make_fused_scene_map_u8 map ->
    (feats [n,pn,c] bf16, rgb [n,pn,3] bf16). Same interpolation math
    as gather_bilinear_fused, on u8 codes (exact in bf16: integers
    <=255 have exact bf16 representations), dequantized once at the
    end."""
    n = fused.shape[0]
    fh, fw = fused.shape[1] + 1, fused.shape[2] + 1
    c4 = fused.shape[-1] - _PATCH * _PATCH * 3
    bf = jnp.bfloat16

    x = points[..., 0]
    y = points[..., 1]
    ix = jnp.clip(x * fw / (w - 1.0) - 0.5, 0.0, fw - 1.0)
    iy = jnp.clip(y * fh / (h - 1.0) - 0.5, 0.0, fh - 1.0)
    x0 = jnp.clip(jnp.floor(ix), 0.0, fw - 2.0)
    y0 = jnp.clip(jnp.floor(iy), 0.0, fh - 2.0)
    tx = (ix - x0)[..., None].astype(bf)
    ty = (iy - y0)[..., None].astype(bf)
    idx = (y0 * (fw - 1) + x0).astype(jnp.int32)

    flat = fused.reshape(n, (fh - 1) * (fw - 1), fused.shape[-1])
    tap = jnp.take_along_axis(flat, idx[..., None], axis=1).astype(bf)

    qc = c4 // 4
    f00, f01, f10, f11 = (tap[..., :qc], tap[..., qc:2 * qc],
                          tap[..., 2 * qc:3 * qc], tap[..., 3 * qc:c4])
    top = f00 * (1 - tx) + f01 * tx
    bot = f10 * (1 - tx) + f11 * tx
    lerp = top * (1 - ty) + bot * ty
    # affine dequant: weights sum to 1, so the zero-point folds into a
    # single per-channel offset
    feats = lerp * scale - offset

    ratio_x, ratio_y = (w - 1) / fw, (h - 1) / fh
    base_x = _patch_base(x0, ratio_x, w, _PATCH)
    base_y = _patch_base(y0, ratio_y, h, _PATCH)
    dx = jnp.clip(x, 0.0, w - 1.0) - base_x
    dy = jnp.clip(y, 0.0, h - 1.0) - base_y
    offs = jnp.arange(_PATCH, dtype=jnp.float32)
    wx = jnp.maximum(1.0 - jnp.abs(dx[..., None] - offs), 0.0)
    wy = jnp.maximum(1.0 - jnp.abs(dy[..., None] - offs), 0.0)
    w49 = (wy[..., :, None] * wx[..., None, :]).reshape(
        *wx.shape[:-1], _PATCH * _PATCH).astype(bf)
    patch = tap[..., c4:].reshape(*tap.shape[:-1], 3, _PATCH * _PATCH)
    rgb = (jnp.sum(patch * w49[..., None, :], axis=-1,
                   dtype=jnp.float32) * (1.0 / 255.0)).astype(bf)
    return feats, rgb


def gather_bilinear_quad(quad: jnp.ndarray, points: jnp.ndarray,
                         h: int, w: int,
                         align_corners: bool) -> jnp.ndarray:
    """Border-clamped bilinear sampling from a quad-packed map.

    quad [n, fh-1, fw-1, 4c] (from make_quad_map); points [n, pn, 2] in
    the (h, w) frame. Exactly matches
    grid_sample_nhwc(feats, points, h, w, 'border', align_corners).
    """
    n = quad.shape[0]
    fh, fw = quad.shape[1] + 1, quad.shape[2] + 1
    c = quad.shape[-1] // 4
    x_norm = points[..., 0] / (w - 1.0) * 2.0 - 1.0
    y_norm = points[..., 1] / (h - 1.0) * 2.0 - 1.0
    if align_corners:
        ix = (x_norm + 1.0) / 2.0 * (fw - 1.0)
        iy = (y_norm + 1.0) / 2.0 * (fh - 1.0)
    else:
        ix = ((x_norm + 1.0) * fw - 1.0) / 2.0
        iy = ((y_norm + 1.0) * fh - 1.0) / 2.0

    # border clamp + anchor in [0, size-2]; t in [0, 1] reproduces the
    # clamped-coordinate bilinear exactly
    ix = jnp.clip(ix, 0.0, fw - 1.0)
    iy = jnp.clip(iy, 0.0, fh - 1.0)
    x0 = jnp.clip(jnp.floor(ix), 0.0, fw - 2.0)
    y0 = jnp.clip(jnp.floor(iy), 0.0, fh - 2.0)
    tx = (ix - x0)[..., None]
    ty = (iy - y0)[..., None]
    idx = (y0 * (fw - 1) + x0).astype(jnp.int32)             # n,pn

    flat = quad.reshape(n, (fh - 1) * (fw - 1), 4 * c)
    tap = jnp.take_along_axis(flat, idx[..., None], axis=1)  # n,pn,4c
    f00, f01, f10, f11 = (tap[..., :c], tap[..., c:2 * c],
                          tap[..., 2 * c:3 * c], tap[..., 3 * c:])
    top = f00 * (1 - tx) + f01 * tx
    bot = f10 * (1 - tx) + f11 * tx
    return top * (1 - ty) + bot * ty
