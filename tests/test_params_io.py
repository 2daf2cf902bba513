"""npz param save/load round-trip (neuray_tpu/utils/params_io.py)."""
import numpy as np
import pytest

from neuray_tpu.utils.params_io import save_params_npz, load_params_npz


def test_roundtrip_nested_tree(tmp_path):
    tree = {"params": {
        "dense": {"kernel": np.random.RandomState(0).randn(4, 3)
                  .astype(np.float32) * 10,
                  "bias": np.zeros(3, np.float32)},
        "conv": {"kernel": np.full((2, 2, 1, 1), 0.5, np.float32)},
    }}
    p = tmp_path / "w.npz"
    save_params_npz(str(p), tree)
    back = load_params_npz(str(p))
    assert set(back["params"]) == {"dense", "conv"}
    # f16 storage: exact for f16-representable values, ~1e-3 rel else
    np.testing.assert_allclose(back["params"]["dense"]["kernel"],
                               tree["params"]["dense"]["kernel"],
                               rtol=1e-3)
    np.testing.assert_array_equal(back["params"]["conv"]["kernel"],
                                  tree["params"]["conv"]["kernel"])
    assert back["params"]["dense"]["kernel"].dtype == np.float32


def test_int_arrays_pass_through(tmp_path):
    tree = {"idx": np.arange(5, dtype=np.int32)}
    p = tmp_path / "w.npz"
    save_params_npz(str(p), tree)
    back = load_params_npz(str(p))
    assert back["idx"].dtype == np.int32
    np.testing.assert_array_equal(back["idx"], tree["idx"])


def test_bench_weights_file_loads():
    """The checked-in bench weights parse into a params tree."""
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "bench_weights.npz")
    if not os.path.exists(path):
        pytest.skip("bench_weights.npz not present")
    tree = load_params_npz(path)
    assert "params" in tree
    assert "image_encoder" in tree["params"]


def test_compile_cache_fingerprint_live_and_stable():
    """cache_dir must key on the LIVE cpu identity (cpuid), not only
    boot-time /proc/cpuinfo: a mid-session live migration changes what
    cpuid reports without touching /proc, and XLA:CPU AOT entries
    written pre-migration then deserialize as executables 'compiled
    for a different machine' (the round-4 suite segfault; re-observed
    2026-08-19 as cpu_aot_loader mismatch warnings under an unchanged
    boot-time fingerprint)."""
    import platform
    from neuray_tpu.utils.compile_cache import (
        _cpuid_fingerprint, cache_dir)
    d1 = cache_dir("/tmp/x")
    assert d1.startswith("/tmp/x_") and len(d1) == len("/tmp/x_") + 10
    assert d1 == cache_dir("/tmp/x")  # stable within one session
    if platform.machine() in ("x86_64", "AMD64"):
        fp = _cpuid_fingerprint()
        assert fp and fp == _cpuid_fingerprint()
        # vendor string leaf present (GenuineIntel/AuthenticAMD bytes)
        assert fp.startswith("0.0:")
