"""Volume-rendering compositing (alpha -> hit probability / weights)."""
from __future__ import annotations

import jax.numpy as jnp


def alpha_values2hit_prob(alpha_values: jnp.ndarray) -> jnp.ndarray:
    """hit_prob[i] = alpha[i] * prod_{j<i} (1 - alpha[j] + 1e-10).

    Parity: reference render_ops.py:72-80 (exclusive cumprod of the
    no-hit density with a leading 1).

    alpha_values [..., dn] -> [..., dn]
    """
    no_hit = 1.0 - alpha_values + 1e-10
    ones = jnp.ones((*alpha_values.shape[:-1], 1), alpha_values.dtype)
    transmittance = jnp.cumprod(
        jnp.concatenate([ones, no_hit], axis=-1), axis=-1)[..., :-1]
    return alpha_values * transmittance


def composite_colors(hit_prob: jnp.ndarray, colors: jnp.ndarray) -> jnp.ndarray:
    """Sum_i hit_prob[i] * color[i]. hit_prob [...,dn], colors [...,dn,3]."""
    return jnp.sum(hit_prob[..., None] * colors, axis=-2)
