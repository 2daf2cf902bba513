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
