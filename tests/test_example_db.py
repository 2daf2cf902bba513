"""ExampleDatabase (custom COLMAP scenes): fabricated sparse model +
images -> ids, K/pose/image loading, depth ranges, resolution scaling."""
import os
import struct

import numpy as np
import cv2
import pytest

from tests.test_colmap_io import (
    write_cameras_bin, write_images_bin, write_points3d_bin)


@pytest.fixture
def example_scene(tmp_path, rng):
    root = tmp_path / "data"
    scene = root / "example" / "desk"
    (scene / "sparse" / "0").mkdir(parents=True)
    (scene / "images").mkdir(parents=True)

    write_cameras_bin(scene / "sparse" / "0" / "cameras.bin",
                      [(1, 0, 64, 48, [60.0, 32.0, 24.0])])
    images = []
    for i in range(4):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        images.append((i + 1, q, rng.randn(3) * 0.1 + [0, 0, 4],
                       1, f"frame_{i}.jpg", np.zeros((0, 2)),
                       np.zeros(0, np.int64)))
        cv2.imwrite(str(scene / "images" / f"frame_{i}.jpg"),
                    (rng.rand(48, 64, 3) * 255).astype(np.uint8))
    write_images_bin(scene / "sparse" / "0" / "images.bin", images)
    pts = [(k, rng.randn(3) * 0.5, rng.randint(0, 255, 3), 0.5, [])
           for k in range(1, 30)]
    write_points3d_bin(scene / "sparse" / "0" / "points3D.bin", pts)
    return str(root)


def test_example_database(example_scene, monkeypatch):
    from neuray_tpu.data import database as D
    monkeypatch.setattr(D, "DATA_ROOT", example_scene)

    db = D.parse_database_name("example/desk/raw")
    assert len(db.get_img_ids()) == 4
    img = db.get_image("1")
    assert img.shape == (48, 64, 3)
    K = db.get_K("1")
    assert K[0, 0] == 60.0
    pose = db.get_pose("2")
    np.testing.assert_allclose(pose[:, :3] @ pose[:, :3].T, np.eye(3),
                               atol=1e-5)
    near, far = db.get_depth_range("1")
    assert 0 < near < far
    # no dense depth present
    assert db.get_depth("1") is None
    assert db.get_img_ids(check_depth_exist=True) == []

    # resolution scaling: longest side -> 32
    db32 = D.parse_database_name("example/desk/32")
    img32 = db32.get_image("1")
    assert max(img32.shape[:2]) == 32
    K32 = db32.get_K("1")
    np.testing.assert_allclose(K32[0, 0], 60.0 * 32 / 64, rtol=1e-5)

    # example split
    ref_ids, que_ids = D.get_database_split(db, "example_1")
    assert len(que_ids) == 1 and len(ref_ids) == 3
