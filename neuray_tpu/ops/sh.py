"""Spherical-harmonics weighted least-squares color fit (direct rendering).

Fits a degree-<=4 SH expansion of view-dependent color per query point by
solving the regularized normal equations, then evaluates it along the
query direction. Behavioral parity: reference network/sph_solver.py.

TPU notes: A^T W A is a [b, k, k] batched matmul (k = 16 for degree 3) —
tiny MXU-friendly matmuls; the solve uses an explicit batched inverse to
match reference numerics (torch.inverse @ rhs).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# The LS solve is precision-sensitive (regularizers down to 1e-3); force
# full-f32 contractions regardless of the global matmul-precision default.
_HI = jax.lax.Precision.HIGHEST

_DEGREE_SIZES = (1, 3, 5, 7, 9)
_DEFAULT_REGS = (0.001, 0.005, 0.05, 0.1)


def sh_regs(degree: int = 3, init_regs=_DEFAULT_REGS) -> np.ndarray:
    """Per-coefficient Tikhonov regularizers (reference sph_solver.py:10-12)."""
    regs = [np.zeros([1])]
    for lvl in range(1, degree + 1):
        regs.append(np.ones([lvl * 2 + 1]) * init_regs[lvl - 1])
    return np.concatenate(regs, 0).astype(np.float32)


def sh_basis(directions: jnp.ndarray, degree: int = 3) -> jnp.ndarray:
    """Evaluate the (unnormalized, reference-convention) SH basis.

    directions [..., 3] -> [..., k] with k = (degree+1)^2.
    """
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    cols = [jnp.ones_like(x)]
    if degree >= 1:
        cols += [x, y, z]
    if degree >= 2:
        cols += [x * y, y * z, -x**2 - y**2 + 2 * z**2, z * x, x**2 - y**2]
    if degree >= 3:
        cols += [(3 * x**2 - y**2) * y, x * y * z,
                 y * (4 * z**2 - x**2 - y**2),
                 z * (2 * z**2 - 3 * x**2 - 3 * y**2),
                 x * (4 * z**2 - x**2 - y**2),
                 (x**2 - y**2) * z, (x**2 - 3 * y**2) * x]
    if degree >= 4:
        cols += [x * y * (x**2 - y**2), (3 * x**2 - y**2) * y * z,
                 x * y * (7 * z**2 - 1), y * z * (7 * z**2 - 3),
                 35 * z**4 - 30 * z**2 + 3, x * z * (7 * z**2 - 3),
                 (x**2 - y**2) * (7 * z**2 - 1), (x**2 - 3 * y**2) * x * z,
                 x**2 * (x**2 - 3 * y**2) - y**2 * (3 * x**2 - y**2)]
    return jnp.stack(cols, axis=-1)


def sh_fit(directions: jnp.ndarray, colors: jnp.ndarray,
           weights: jnp.ndarray, degree: int = 3,
           regs: jnp.ndarray | None = None, eps: float = 1e-4) -> jnp.ndarray:
    """Weighted regularized LS fit of SH coefficients.

    directions [b, n, 3]; colors [b, n, 3]; weights [b, n] -> theta [b, k, 3]
    """
    if regs is None:
        regs = jnp.asarray(sh_regs(degree))
    A = sh_basis(directions, degree)                         # b,n,k
    insufficient = jnp.sum(weights, axis=1, keepdims=True) < eps
    weights = weights + insufficient.astype(weights.dtype) * eps
    Aw = jnp.swapaxes(A * weights[..., None], -1, -2)        # b,k,n
    lhs = jnp.matmul(Aw, A, precision=_HI) + jnp.diag(regs)[None]   # b,k,k
    rhs = jnp.matmul(Aw, colors, precision=_HI)                      # b,k,3
    return jnp.matmul(jnp.linalg.inv(lhs), rhs, precision=_HI)


def sh_predict(directions: jnp.ndarray, theta: jnp.ndarray,
               degree: int = 3) -> jnp.ndarray:
    """Evaluate fitted SH: directions [b, n, 3], theta [b, k, 3] -> [b, n, 3]."""
    return jnp.matmul(sh_basis(directions, degree), theta, precision=_HI)
