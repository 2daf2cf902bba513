"""Cross-view aggregation MLP + along-ray attention (IBRNet w/ NeuRay).

Parity: reference network/ibrnet.py:239-369 (IBRNetWithNeuRay) and
:52-102 (MultiHeadAttention with LayerNorm eps 1e-6, residual, no
dropout at inference).

TPU notes: all heavy compute is [n_rays*dn, rfn, f] matmuls and a tiny
4-head attention over dn (= 64) positions — one fused attention per ray.
The sinusoidal position table is a compile-time constant.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

he_normal = nn.initializers.he_normal()


def sinusoid_pos_encoding(d_hid: int, n_samples: int) -> np.ndarray:
    """Sinusoidal table [1, n_samples, d_hid] (reference ibrnet.py:305-313)."""
    pos = np.arange(n_samples)[:, None]
    hid = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (hid // 2) / d_hid)
    table = np.zeros_like(angle)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None].astype(np.float32)


def sinusoid_pos_at(d_hid: int, pos: jnp.ndarray) -> jnp.ndarray:
    """Sinusoid positional encoding evaluated at FRACTIONAL positions.

    Same formula as ``sinusoid_pos_encoding`` (so integer ``pos``
    reproduces the table row-for-row), but computed on device from a
    per-ray position array — pure VPU math, no gathers. Lets the
    probe-focused render feed the ray attention the table position its
    samples *geometrically* occupy in the full coarse grid, keeping a
    narrowed / reduced-count pass in the trained position distribution.

    pos: [..., dn] -> [..., dn, d_hid]
    """
    hid = jnp.arange(d_hid)
    denom = jnp.power(10000.0, (2 * (hid // 2) / d_hid).astype(jnp.float32))
    angle = pos[..., None] / denom
    return jnp.where(hid % 2 == 0, jnp.sin(angle), jnp.cos(angle))


class _Kernel(nn.Module):
    """Bias-free Dense param container (nn.Dense's kernel name/init) —
    lets the parent read the kernel to PACK shared-input projections."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.linear.default_kernel_init,
                          (self.in_features, self.features))


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head attention with residual (reference ibrnet.py:52)."""
    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        """q,k,v: [b, l, d_model]; mask: [b, l, 1] (key mask) or None."""
        b, lq, _ = q.shape
        residual = q
        wq = _Kernel(self.n_head * self.d_k, self.d_model, name="w_qs")()
        wk = _Kernel(self.n_head * self.d_k, self.d_model, name="w_ks")()
        wv = _Kernel(self.n_head * self.d_v, self.d_model, name="w_vs")()
        dt = self.dtype
        if dt is not None:
            wq, wk, wv = wq.astype(dt), wk.astype(dt), wv.astype(dt)
            q, k, v = q.astype(dt), k.astype(dt), v.astype(dt)
        if q is k and q is v:
            # self-attention (the only caller): ONE packed projection
            # matmul instead of three K=16 tile passes — exact, the
            # packed kernel is a concat of the same params
            qkv = jnp.dot(q, jnp.concatenate([wq, wk, wv], axis=1))
            nk = self.n_head * self.d_k
            qh, kh, vh = (qkv[..., :nk], qkv[..., nk:2 * nk],
                          qkv[..., 2 * nk:])
        else:
            qh, kh, vh = jnp.dot(q, wq), jnp.dot(k, wk), jnp.dot(v, wv)
        qh = qh.reshape(b, lq, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        kh = kh.reshape(b, -1, self.n_head, self.d_k).transpose(0, 2, 1, 3)
        vh = vh.reshape(b, -1, self.n_head, self.d_v).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", qh / (self.d_k ** 0.5), kh)
        if mask is not None:
            # reference: masked_fill(mask == 0, -1e9) with mask broadcast
            # over heads; mask [b, lk, 1] -> [b, 1, lk, 1] matches the
            # reference's unsqueeze(1) broadcast over the last dim.
            m = mask[:, None, :, :]                 # b,1,lk,1
            m = jnp.broadcast_to(m, attn.shape[:3] + (m.shape[-1],))
            attn = jnp.where(m == 0, -1e9, attn)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, -1)
        out = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                       name="fc")(out)
        out = out + residual
        out = nn.LayerNorm(epsilon=1e-6, name="layer_norm")(out)
        return out, attn


def fused_mean_variance(x, weight, axis: int = 2):
    """Weighted mean/var over the view axis (reference ibrnet.py:112-116).
    x [b, dn, rfn, f]; weight [b, dn, rfn, 1] (or view-major with
    axis=0: x [rfn, b, dn, f])."""
    mean = jnp.sum(x * weight, axis=axis, keepdims=True)
    var = jnp.sum(weight * (x - mean) ** 2, axis=axis, keepdims=True)
    return mean, var


class _Seq(nn.Module):
    """Dense->ELU chain, optionally sigmoid/relu-terminated."""
    widths: tuple
    final: str = "elu"  # 'elu' | 'sigmoid' | 'relu' | 'none'
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i, wd in enumerate(self.widths):
            x = nn.Dense(wd, kernel_init=he_normal, dtype=self.dtype,
                         name=f"fc{i}")(x)
            last = i == len(self.widths) - 1
            if not last:
                x = nn.elu(x)
            elif self.final == "elu":
                x = nn.elu(x)
            elif self.final == "sigmoid":
                x = nn.sigmoid(x)
            elif self.final == "relu":
                x = nn.relu(x)
        return x


class _SplitDense(nn.Module):
    """Dense(features) over concat([broadcast(shared), per_view], -1)
    WITHOUT materializing the broadcast concat: the kernel is sliced at
    ``split`` and the shared part is contracted once per point instead
    of once per (point, view). Parameter tree and numerics match the
    plain Dense exactly (same kernel [split+pv, features] and bias)."""
    features: int
    split: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, shared, per_view):
        kernel = self.param(
            "kernel", he_normal,
            (self.split + per_view.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype) if self.dtype else kernel
        a = shared.astype(self.dtype) if self.dtype else shared
        b = per_view.astype(self.dtype) if self.dtype else per_view
        return (jnp.dot(a, k[:self.split]) + jnp.dot(b, k[self.split:])
                + bias.astype(k.dtype))


class _SplitSeq(nn.Module):
    """_Seq((w0, w1), 'elu') over concat([broadcast(shared), per_view])
    with the fc0 contraction split (see _SplitDense). Same param tree
    as the _Seq it replaces: fc0/{kernel,bias}, fc1/{kernel,bias}."""
    widths: tuple
    split: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, shared, per_view):
        x = _SplitDense(self.widths[0], self.split, self.dtype,
                        name="fc0")(shared, per_view)
        x = nn.elu(x)
        x = nn.Dense(self.widths[1], kernel_init=he_normal,
                     dtype=self.dtype, name="fc1")(x)
        return nn.elu(x)


class IBRNetWithNeuRay(nn.Module):
    """Inputs (per ray microbatch):
      rgb_feat    [b, dn, rfn, 3+in_feat_ch]   (rgb + image features)
      neuray_feat [b, dn, rfn, neuray_in_dim]  (prob embedding)
      ray_diff    [b, dn, rfn, 4]              (dir diff + dot)
      mask        [b, dn, rfn, 1]
    Output: [b, dn, 4] (rgb, sigma).

    view_major=True takes the SAME inputs laid out [rfn, b, dn, f]
    (view axis leading, the layout the projection/gather stage
    naturally produces) and reduces views over axis 0 — identical math
    and params, but the caller skips three large [rfn,b,dn,f] ->
    [b,dn,rfn,f] transposes per chunk (agg_net.py; measured in the
    full-frame time, not the per-stage profile).
    """
    neuray_in_dim: int = 32
    in_feat_ch: int = 32
    n_samples: int = 64
    dtype: jnp.dtype | None = None
    view_major: bool = False

    @nn.compact
    def __call__(self, rgb_feat, neuray_feat, ray_diff, mask,
                 pos_stride: int = 1, pos=None):
        """pos_stride: subsample the ray-attention positional table —
        a dn-sample call with pos_stride=s uses the positions a
        (dn*s)-sample call would give its every s-th sample, so a
        reduced-sample probe pass (renderer.probe_chunk) sees the same
        absolute positional phase as the full coarse pass.

        pos: optional explicit PER-RAY fractional table positions
        [b, dn] (b = qn*rn). Overrides pos_stride; used by the
        probe-focused render, whose per-ray narrowed sampling windows
        put sample j at a ray-dependent position in the full coarse
        grid."""
        dt = self.dtype
        vax = 0 if self.view_major else 2   # the view axis

        direction_feat = _Seq((16, self.in_feat_ch + 3), "elu", dt,
                              name="ray_dir_fc")(ray_diff)
        rgb_in = rgb_feat[..., :3]
        rgb_feat = rgb_feat + direction_feat

        weight = mask / (jnp.sum(mask, axis=vax, keepdims=True) + 1e-8)

        # neuray weighting (reference :337-341)
        w0 = nn.sigmoid(_Seq((8, 1), "none", dt, name="neuray_fc")(neuray_feat))
        weight0 = w0 * weight
        mean0, var0 = fused_mean_variance(rgb_feat, weight0, vax)
        mean1, var1 = fused_mean_variance(rgb_feat, weight, vax)
        globalfeat = jnp.concatenate([mean0, var0, mean1, var1], axis=-1)

        # base_fc with its fc0 kernel split at the shared/per-view
        # boundary: the 4*(3+f) global stats contract once per point,
        # not per (point, view) — same param tree/numerics as the
        # concat form, ~3x fewer MACs in the widest matmul of the net.
        x = _SplitSeq((64, 32), globalfeat.shape[-1], dt,
                      name="base_fc")(
            globalfeat, jnp.concatenate([rgb_feat, neuray_feat], -1))

        x_vis = _Seq((32, 33), "elu", dt, name="vis_fc")(x * weight)
        x_res, vis = x_vis[..., :-1], x_vis[..., -1:]
        vis = nn.sigmoid(vis) * mask
        x = x + x_res
        vis = _Seq((32, 1), "sigmoid", dt, name="vis_fc2")(x * vis) * mask
        weight = vis / (jnp.sum(vis, axis=vax, keepdims=True) + 1e-8)

        mean, var = fused_mean_variance(x, weight, vax)
        squeeze = ((lambda t: t[0]) if self.view_major
                   else (lambda t: t[:, :, 0]))
        globalfeat = jnp.concatenate(
            [squeeze(mean), squeeze(var), jnp.mean(weight, axis=vax)],
            axis=-1)                                        # b,dn,35
        globalfeat = _Seq((64, 16), "elu", dt, name="geometry_fc")(globalfeat)
        num_valid_obs = jnp.sum(mask, axis=vax)              # b,dn,1

        if pos is not None:
            globalfeat = globalfeat + sinusoid_pos_at(
                16, pos).astype(globalfeat.dtype)
        else:
            pos_table = jnp.asarray(sinusoid_pos_encoding(
                16, max(self.n_samples, globalfeat.shape[1] * pos_stride)))
            pos_table = pos_table[:, ::pos_stride]
            globalfeat = globalfeat + pos_table[:, :globalfeat.shape[1]]
        attn_mask = (num_valid_obs > 1).astype(globalfeat.dtype)  # b,dn,1
        globalfeat, _ = MultiHeadAttention(
            4, 16, 4, 4, dtype=dt, name="ray_attention")(
                globalfeat, globalfeat, globalfeat, mask=attn_mask)
        sigma = _Seq((16, 1), "relu", dt, name="out_geometry_fc")(globalfeat)
        sigma_out = jnp.where(num_valid_obs < 1, 0.0, sigma)  # b,dn,1

        x = jnp.concatenate([x, vis, ray_diff], axis=-1)
        x = _Seq((16, 8, 1), "none", dt, name="rgb_fc")(x)
        x = jnp.where(mask == 0, -1e9, x)
        blending_weights = nn.softmax(x, axis=vax)
        rgb_out = jnp.sum(rgb_in * blending_weights, axis=vax)  # b,dn,3
        return jnp.concatenate([rgb_out, sigma_out], axis=-1)


class IBRNet(nn.Module):
    """Plain IBRNet without the NeuRay visibility weighting (present in
    the reference as an unused alternative, reference ibrnet.py:118-237;
    kept for API completeness / ablations)."""
    in_feat_ch: int = 32
    n_samples: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, rgb_feat, ray_diff, mask):
        num_views = rgb_feat.shape[2]
        dt = self.dtype
        direction_feat = _Seq((16, self.in_feat_ch + 3), "elu", dt,
                              name="ray_dir_fc")(ray_diff)
        rgb_in = rgb_feat[..., :3]
        rgb_feat = rgb_feat + direction_feat
        weight = mask / (jnp.sum(mask, axis=2, keepdims=True) + 1e-8)

        mean, var = fused_mean_variance(rgb_feat, weight)
        globalfeat = jnp.concatenate([mean, var], axis=-1)
        x = jnp.concatenate(
            [jnp.broadcast_to(globalfeat,
                              (*globalfeat.shape[:2], num_views,
                               globalfeat.shape[-1])), rgb_feat], axis=-1)
        x = _Seq((64, 32), "elu", dt, name="base_fc")(x)

        x_vis = _Seq((32, 33), "elu", dt, name="vis_fc")(x * weight)
        x_res, vis = x_vis[..., :-1], x_vis[..., -1:]
        vis = nn.sigmoid(vis) * mask
        x = x + x_res
        vis = _Seq((32, 1), "sigmoid", dt, name="vis_fc2")(x * vis) * mask
        weight = vis / (jnp.sum(vis, axis=2, keepdims=True) + 1e-8)

        mean, var = fused_mean_variance(x, weight)
        globalfeat = jnp.concatenate(
            [mean[:, :, 0], var[:, :, 0], jnp.mean(weight, axis=2)], -1)
        globalfeat = _Seq((64, 16), "elu", dt, name="geometry_fc")(globalfeat)
        num_valid_obs = jnp.sum(mask, axis=2)
        pos_table = jnp.asarray(sinusoid_pos_encoding(16, self.n_samples))
        globalfeat = globalfeat + pos_table[:, :globalfeat.shape[1]]
        attn_mask = (num_valid_obs > 1).astype(globalfeat.dtype)
        globalfeat, _ = MultiHeadAttention(
            4, 16, 4, 4, dtype=dt, name="ray_attention")(
                globalfeat, globalfeat, globalfeat, mask=attn_mask)
        sigma = _Seq((16, 1), "relu", dt, name="out_geometry_fc")(globalfeat)
        sigma_out = jnp.where(num_valid_obs < 1, 0.0, sigma)

        x = jnp.concatenate([x, vis, ray_diff], axis=-1)
        x = _Seq((16, 8, 1), "none", dt, name="rgb_fc")(x)
        x = jnp.where(mask == 0, -1e9, x)
        blending_weights = nn.softmax(x, axis=2)
        rgb_out = jnp.sum(rgb_in * blending_weights, axis=2)
        return jnp.concatenate([rgb_out, sigma_out], axis=-1)
