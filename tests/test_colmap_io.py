"""COLMAP binary I/O: write synthetic files in the documented format and
check the python reader and the native C++ reader agree."""
import os
import struct

import numpy as np
import pytest

from neuray_tpu.data import colmap_io
from neuray_tpu.data import colmap_native


def write_cameras_bin(path, cams):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cam_id, model_id, w, h, params in cams:
            f.write(struct.pack("<iiQQ", cam_id, model_id, w, h))
            f.write(struct.pack(f"<{len(params)}d", *params))


def write_images_bin(path, images):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for img_id, qvec, tvec, cam_id, name, xys, p3d in images:
            f.write(struct.pack("<i", img_id))
            f.write(struct.pack("<4d", *qvec))
            f.write(struct.pack("<3d", *tvec))
            f.write(struct.pack("<i", cam_id))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(xys)))
            for (x, y), pid in zip(xys, p3d):
                f.write(struct.pack("<ddq", x, y, pid))


def write_points3d_bin(path, points):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for pid, xyz, rgb, err, track in points:
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", *xyz))
            f.write(struct.pack("<3B", *rgb))
            f.write(struct.pack("<d", err))
            f.write(struct.pack("<Q", len(track)))
            for img_id, p2d in track:
                f.write(struct.pack("<ii", img_id, p2d))


@pytest.fixture
def model_dir(tmp_path, rng):
    cams = [(1, 1, 640, 480, [500.0, 510.0, 320.0, 240.0]),
            (2, 0, 320, 240, [250.0, 160.0, 120.0])]
    write_cameras_bin(tmp_path / "cameras.bin", cams)
    images = []
    for i in range(3):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        xys = rng.rand(5, 2) * 100
        p3d = rng.randint(-1, 10, 5)
        images.append((i + 1, q, rng.randn(3), 1 + (i % 2),
                       f"img_{i:03d}.jpg", xys, p3d))
    write_images_bin(tmp_path / "images.bin", images)
    pts = [(k, rng.randn(3), rng.randint(0, 255, 3), 0.5,
            [(1, 2), (2, 3)][:k % 3]) for k in range(1, 6)]
    write_points3d_bin(tmp_path / "points3D.bin", pts)
    return tmp_path


def test_readers_roundtrip_and_native_parity(model_dir):
    cams = colmap_io.read_cameras_binary_py(str(model_dir / "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 640
    K = cams[1].K()
    assert K[0, 0] == 500.0 and K[1, 2] == 240.0
    assert cams[2].model == "SIMPLE_PINHOLE"

    images = colmap_io.read_images_binary_py(str(model_dir / "images.bin"))
    assert len(images) == 3
    assert images[1].name == "img_000.jpg"
    assert images[2].pose34().shape == (3, 4)
    assert images[3].point3d_ids.shape == (5,)

    pts = colmap_io.read_points3d_binary_py(str(model_dir / "points3D.bin"))
    assert len(pts) == 5
    assert pts[1].xyz.shape == (3,)

    if colmap_native.get_lib() is None:
        pytest.skip("native reader not built")
    # explicit native-vs-python parity
    n_cams = colmap_native.read_cameras_binary_native(
        str(model_dir / "cameras.bin"))
    for cid in cams:
        np.testing.assert_allclose(n_cams[cid].params, cams[cid].params)
    n_imgs = colmap_native.read_images_binary_native(
        str(model_dir / "images.bin"))
    for iid in images:
        np.testing.assert_allclose(n_imgs[iid].qvec, images[iid].qvec)
        np.testing.assert_allclose(n_imgs[iid].xys, images[iid].xys)
        np.testing.assert_array_equal(n_imgs[iid].point3d_ids,
                                      images[iid].point3d_ids)
        assert n_imgs[iid].name == images[iid].name
    n_pts = colmap_native.read_points3d_binary_native(
        str(model_dir / "points3D.bin"))
    for pid in pts:
        np.testing.assert_allclose(n_pts[pid].xyz, pts[pid].xyz)
        np.testing.assert_array_equal(n_pts[pid].image_ids,
                                      pts[pid].image_ids)
