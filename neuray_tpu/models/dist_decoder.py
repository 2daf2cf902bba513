"""Mixture-of-logistics distribution decoder (the NeuRay core MLPs).

Parity: reference network/dist_decoder.py:53-152. Four small MLP heads
decode a 32-d per-point ray feature into mixture parameters:
  mean [..,2] (softplus), var [..,2] (softplus + bias), aw [..,1]
  (sigmoid), and optionally vis [..,1] (sigmoid).
The interval-probability math itself lives in ops/mixture.py (pure fns).

TPU notes: heads run as [N, 32] x [32, 32] matmuls over all points of a
ray microbatch at once; XLA fuses the ELU chains. f32 by default (tiny
fraction of total FLOPs; the CDF math downstream needs the precision).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import flax.linen as nn

from neuray_tpu.ops import mixture


class _Head(nn.Module):
    out_dim: int
    final: str  # 'softplus' | 'sigmoid'
    bias_val: float = 0.0
    width: int = 32
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.width, dtype=self.dtype, name="fc0")(x)
        x = nn.elu(x)
        x = nn.Dense(self.width, dtype=self.dtype, name="fc1")(x)
        x = nn.elu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        if self.final == "softplus":
            x = nn.softplus(x)
        elif self.final == "sigmoid":
            x = nn.sigmoid(x)
        return x + self.bias_val


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
                                  dtype=self.dtype)
        self.var_decoder = _Head(2, "softplus", bias_val, width,
                                 dtype=self.dtype)
        self.aw_decoder = _Head(1, "sigmoid", width=width, dtype=self.dtype)
        if self.use_vis:
            self.vis_decoder = _Head(1, "sigmoid", width=width,
                                     dtype=self.dtype)

    def __call__(self, feats):
        """feats [..., feats_dim] -> (mean [..,2], var [..,2],
        vis [..,1] | None, aw [..,1]); outputs are f32 regardless of
        the compute dtype (the CDF math downstream needs f32)."""
        f32 = jnp.float32
        mean = self.mean_decoder(feats).astype(f32)
        var = self.var_decoder(feats).astype(f32)
        aw = self.aw_decoder(feats).astype(f32)
        vis = (self.vis_decoder(feats).astype(f32)
               if self.use_vis else None)
        return mean, var, vis, aw

    def predict_mean(self, feats):
        """Only the mean head (depth-loss path, reference :146-148)."""
        return self.mean_decoder(feats)

    def compute_prob(self, depth, interval, mean, var, vis, aw, is_ref,
                     depth_range):
        return mixture.compute_prob(depth, interval, mean, var, vis, aw,
                                    is_ref, depth_range, self.use_vis)


name2dist_decoder = {"mixture_logistics": MixtureLogisticsDistDecoder}
