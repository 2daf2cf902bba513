"""Mixture-of-logistics distribution decoder (the NeuRay core MLPs).

Parity: reference network/dist_decoder.py:53-152. Four small MLP heads
decode a 32-d per-point ray feature into mixture parameters:
  mean [..,2] (softplus), var [..,2] (softplus + bias), aw [..,1]
  (sigmoid), and optionally vis [..,1] (sigmoid).
The interval-probability math itself lives in ops/mixture.py (pure fns).

TPU notes: the four heads share their input, so the forward pass runs
them PACKED as one 128-wide MLP — fc0 kernels concatenated along the
output axis, fc1/fc2 block-diagonal (structured zeros contribute
exactly 0, so the math is unchanged up to f32 summation order). The
MXU processes a [K<=128, N<=128] contraction in one tile pass either
way, so 4 separate 32-wide matmuls cost 4 tile passes at 1/16
utilization while the packed one costs 1 — measured ~2x on the
dist+prob stage at bench shapes (tools/profile_stages.py). The param
tree is UNCHANGED (mean_decoder/fc0/kernel, ...), so checkpoints and
reference-weight conversion are unaffected
(tests/test_reference_parity.py pins output parity on converted
weights).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import flax.linen as nn

from neuray_tpu.ops import mixture

_dense_kernel_init = nn.linear.default_kernel_init


class _ParamDense(nn.Module):
    """Parameter container with nn.Dense's exact param names/shapes/init
    — lets the parent READ the kernel without running the layer."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _dense_kernel_init,
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _Head(nn.Module):
    out_dim: int
    final: str  # 'softplus' | 'sigmoid'
    bias_val: float = 0.0
    width: int = 32
    in_dim: int = 32
    dtype: jnp.dtype | None = None

    def setup(self):
        self.fc0 = _ParamDense(self.width, self.in_dim)
        self.fc1 = _ParamDense(self.width, self.width)
        self.fc2 = _ParamDense(self.out_dim, self.width)

    def layers(self):
        """[(kernel, bias)] x 3 — for the parent's packed forward."""
        return [self.fc0(), self.fc1(), self.fc2()]

    def _activate(self, x):
        if self.final == "softplus":
            x = nn.softplus(x)
        elif self.final == "sigmoid":
            x = nn.sigmoid(x)
        return x + self.bias_val

    def __call__(self, x):
        dt = self.dtype
        for i, (k, b) in enumerate(self.layers()):
            if dt is not None:
                k, b, x = k.astype(dt), b.astype(dt), x.astype(dt)
            x = jnp.dot(x, k) + b
            if i < 2:
                x = nn.elu(x)
        return self._activate(x)


class MixtureLogisticsDistDecoder(nn.Module):
    """cfg keys (reference defaults): feats_dim=32, bias_val=0.05,
    use_vis=True."""
    cfg: Dict[str, Any]
    dtype: jnp.dtype | None = None

    @property
    def use_vis(self) -> bool:
        return self.cfg.get("use_vis", True)

    def setup(self):
        width = self.cfg.get("feats_dim", 32)
        bias_val = self.cfg.get("bias_val", 0.05)
        self.mean_decoder = _Head(2, "softplus", width=width,
                                  in_dim=width, dtype=self.dtype)
        self.var_decoder = _Head(2, "softplus", bias_val, width,
                                 in_dim=width, dtype=self.dtype)
        self.aw_decoder = _Head(1, "sigmoid", width=width,
                                in_dim=width, dtype=self.dtype)
        if self.use_vis:
            self.vis_decoder = _Head(1, "sigmoid", width=width,
                                     in_dim=width, dtype=self.dtype)

    def _heads(self):
        heads = [self.mean_decoder, self.var_decoder, self.aw_decoder]
        if self.use_vis:
            heads.append(self.vis_decoder)
        return heads

    def __call__(self, feats):
        """feats [..., feats_dim] -> (mean [..,2], var [..,2],
        vis [..,1] | None, aw [..,1]); outputs are f32 regardless of
        the compute dtype (the CDF math downstream needs f32)."""
        f32 = jnp.float32
        heads = self._heads()
        layers = [h.layers() for h in heads]
        widths = [h.width for h in heads]
        outs = [h.out_dim for h in heads]
        # packed kernels: fc0 concat along out, fc1/fc2 block-diagonal
        w_tot, o_tot = sum(widths), sum(outs)
        k0 = jnp.concatenate([l[0][0] for l in layers], axis=1)
        b0 = jnp.concatenate([l[0][1] for l in layers])
        k1 = jnp.zeros((w_tot, w_tot), layers[0][1][0].dtype)
        b1 = jnp.concatenate([l[1][1] for l in layers])
        k2 = jnp.zeros((w_tot, o_tot), layers[0][2][0].dtype)
        b2 = jnp.concatenate([l[2][1] for l in layers])
        r = c = 0
        for (w, o, l) in zip(widths, outs, layers):
            k1 = k1.at[r:r + w, r:r + w].set(l[1][0])
            k2 = k2.at[r:r + w, c:c + o].set(l[2][0])
            r += w
            c += o
        dt = self.dtype
        x = feats
        for k, b in ((k0, b0), (k1, b1)):
            if dt is not None:
                k, b, x = k.astype(dt), b.astype(dt), x.astype(dt)
            x = nn.elu(jnp.dot(x, k) + b)
        if dt is not None:
            k2, b2 = k2.astype(dt), b2.astype(dt)
        z = jnp.dot(x, k2) + b2
        # split + per-head finals
        pieces = []
        c = 0
        for h, o in zip(heads, outs):
            pieces.append(h._activate(z[..., c:c + o]).astype(f32))
            c += o
        mean, var, aw = pieces[0], pieces[1], pieces[2]
        vis = pieces[3] if self.use_vis else None
        return mean, var, vis, aw

    def predict_mean(self, feats):
        """Only the mean head (depth-loss path, reference :146-148)."""
        return self.mean_decoder(feats)

    def compute_prob(self, depth, interval, mean, var, vis, aw, is_ref,
                     depth_range):
        return mixture.compute_prob(depth, interval, mean, var, vis, aw,
                                    is_ref, depth_range, self.use_vis)


name2dist_decoder = {"mixture_logistics": MixtureLogisticsDistDecoder}
