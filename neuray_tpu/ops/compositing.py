"""Volume-rendering compositing (alpha -> hit probability / weights)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def alpha_values2hit_prob(alpha_values: jnp.ndarray) -> jnp.ndarray:
    """hit_prob[i] = alpha[i] * prod_{j<i} (1 - alpha[j] + 1e-10).

    Parity: reference render_ops.py:72-80 (exclusive cumprod of the
    no-hit density with a leading 1).

    TPU note: jnp.cumprod lowers to a dn-step sequential scan (measured
    ~2.4 s/frame at bench shapes); the exclusive prefix product is
    instead computed in log space as ONE strictly-lower-triangular
    [dn, dn] matmul on the MXU. no_hit > 0 always (alpha <= 1 and the
    +1e-10), so the log is safe; f32 round trip error ~1e-6.

    alpha_values [..., dn] -> [..., dn]
    """
    dn = alpha_values.shape[-1]
    no_hit = 1.0 - alpha_values + 1e-10
    log_no_hit = jnp.log(no_hit)
    # strict lower triangle: logT[i] = sum_{j<i} log_no_hit[j]
    tri = (jnp.arange(dn)[:, None] < jnp.arange(dn)[None, :]).astype(
        log_no_hit.dtype)
    log_t = jnp.matmul(log_no_hit, tri,
                       precision=jax.lax.Precision.HIGHEST)
    return alpha_values * jnp.exp(log_t)


def composite_colors(hit_prob: jnp.ndarray, colors: jnp.ndarray) -> jnp.ndarray:
    """Sum_i hit_prob[i] * color[i]. hit_prob [...,dn], colors [...,dn,3]."""
    return jnp.sum(hit_prob[..., None] * colors, axis=-2)
