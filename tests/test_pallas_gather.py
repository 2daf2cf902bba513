"""Pallas gather kernel parity vs the jnp grid_sample (interpret mode on
the CPU backend; the compiled path is exercised on real TPUs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from neuray_tpu.ops.pallas.gather import gather_bilinear_border
from neuray_tpu.ops.interpolate import grid_sample_nhwc


@pytest.mark.parametrize("c", [8, 32])
def test_pallas_gather_matches_jnp(rng, c):
    v, fh, fw, p = 2, 32, 48, 100
    feats = rng.rand(v, fh, fw, c).astype(np.float32)
    # include out-of-range coords (border clamped)
    coords = (rng.rand(v, p, 2) * [fw + 6, fh + 6] - 3).astype(np.float32)
    ours = np.asarray(gather_bilinear_border(
        jnp.asarray(feats), jnp.asarray(coords), block_p=32,
        interpret=True))
    oracle = np.asarray(grid_sample_nhwc(
        jnp.asarray(feats), jnp.asarray(coords), fh, fw, "border", True))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_pallas_gather_pad_path(rng):
    """point counts not divisible by block_p pad internally."""
    v, fh, fw, c, p = 1, 16, 16, 8, 37
    feats = rng.rand(v, fh, fw, c).astype(np.float32)
    coords = (rng.rand(v, p, 2) * [fw - 1, fh - 1]).astype(np.float32)
    out = np.asarray(gather_bilinear_border(
        jnp.asarray(feats), jnp.asarray(coords), block_p=16,
        interpret=True))
    assert out.shape == (v, p, c)
