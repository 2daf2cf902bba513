"""Test configuration: force an 8-device virtual CPU mesh.

Must set env vars before jax is imported anywhere in the test process.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# This box pre-imports jax with JAX_PLATFORMS=axon (remote TPU), so the
# env var above may be ignored — force the platform through the config.
jax.config.update("jax_platforms", "cpu")

# XLA-CPU compiles dominate test wall time; cache them across runs.
from neuray_tpu.utils.compile_cache import cache_dir as _ccd
jax.config.update("jax_compilation_cache_dir",
                  _ccd("/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The trainer tests run in a fresh subprocess (tests/test_trainer.py
# explains why); keep the impl module out of top-level collection so
# they run exactly once.
collect_ignore = ([] if os.environ.get("NEURAY_TRAINER_SUBPROC")
                  else ["test_trainer_impl.py"])


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def make_camera(rng, h=48, w=64, radius=4.0):
    """Random look-at-origin camera: returns (pose [3,4], K [3,3])."""
    d = rng.randn(3)
    d = d / np.linalg.norm(d)
    center = d * radius
    z = -d  # look at origin
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(up, z)) > 0.98:
        up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0)  # world->cam rows
    t = -R @ center
    pose = np.concatenate([R, t[:, None]], 1).astype(np.float32)
    K = np.array([[w * 1.2, 0, w / 2], [0, w * 1.2, h / 2], [0, 0, 1]],
                 dtype=np.float32)
    return pose, K


@pytest.fixture
def cameras():
    return make_camera
