"""Golden-file tests for the six training-set database adapters:
fabricate minimal valid on-disk scenes in each dataset's real format
(reference dataset/database.py:355-981 documents the formats) and
assert pose/K/depth-range/image outputs analytically.
"""
import json
import os

import numpy as np
import cv2
import pytest

from neuray_tpu.data import database as D
from neuray_tpu.data import train_databases as T


def look_at_pose(center):
    z = -center / np.linalg.norm(center)
    up = np.asarray([0.0, 0.0, 1.0])
    if abs(np.dot(up, z)) > 0.98:
        up = np.asarray([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0)
    t = -R @ center
    return np.concatenate([R, t[:, None]], 1)


@pytest.fixture
def data_root(tmp_path, monkeypatch):
    monkeypatch.setattr(D, "DATA_ROOT", str(tmp_path))
    return tmp_path


def test_gso_database(data_root, rng):
    scene = data_root / "google_scanned_objects" / "toy_obj"
    for sub in ("rgb", "mask", "depth", "intrinsics", "pose"):
        (scene / sub).mkdir(parents=True)
    K = np.asarray([[512.0, 0, 256], [0, 512.0, 256], [0, 0, 1]])
    K44 = np.eye(4)
    K44[:3, :3] = K
    for i in range(250):
        ang = 2 * np.pi * i / 250
        center = np.asarray([np.cos(ang), np.sin(ang), 0.5]) * 1.4
        pose = look_at_pose(center)  # world->cam
        c2w = np.eye(4)
        c2w[:3, :3] = pose[:, :3].T
        c2w[:3, 3] = center
        np.savetxt(scene / "pose" / f"{i:06}.txt", c2w.reshape(-1))
        np.savetxt(scene / "intrinsics" / f"{i:06}.txt", K44.reshape(-1))
    img = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
    mask = np.zeros((512, 512), np.uint8)
    mask[100:400, 100:400] = 255
    depth_mm = (rng.rand(512, 512) * 2000).astype(np.uint16)
    cv2.imwrite(str(scene / "rgb" / "000000.png"), img)
    cv2.imwrite(str(scene / "mask" / "000000.png"), mask)
    cv2.imwrite(str(scene / "depth" / "000000.png"), depth_mm)

    assert T.scan_scene_names("gso") == ["gso/toy_obj/black_raw"]
    db = D.parse_database_name("gso/toy_obj/black_400")
    assert len(db.get_img_ids()) == 250
    pose = db.get_pose("0")
    np.testing.assert_allclose(pose[:, :3] @ pose[:, :3].T, np.eye(3),
                               atol=1e-6)
    # camera center recovered
    np.testing.assert_allclose(-pose[:, :3].T @ pose[:, 3],
                               [1.4, 0, 0.7], atol=1e-6)
    K_got = db.get_K("0")
    assert abs(K_got[0, 0] - 512 * 400 / 512) < 1e-4
    # depth range: origin depth +- 0.5*sqrt(2)*1.1 (reference :615-624)
    origin_depth = pose[2, 3]
    nr = db.get_depth_range("0")
    assert abs(nr[1] - (origin_depth + 0.5 * np.sqrt(2) * 1.1)) < 1e-4
    img400 = db.get_image("0")
    assert img400.shape == (400, 400, 3)
    # black background outside mask
    assert img400[:30, :30].max() == 0
    d = db.get_depth("0")
    assert d.shape == (400, 400)
    m = db.get_mask("0")
    assert m.shape == (400, 400) and m.dtype == bool


def test_space_database(data_root, rng):
    scene = data_root / "spaces_dataset" / "data" / "800" / "scene_000"
    scene.mkdir(parents=True)
    views = []
    for rig in range(2):
        rig_views = []
        for cam in range(3):
            fn = f"cam_{rig}_{cam}.png"
            cv2.imwrite(str(scene / fn),
                        (rng.rand(40, 60, 3) * 255).astype(np.uint8))
            rig_views.append({
                "relative_path": fn, "height": 40, "width": 60,
                "focal_length": 55.0, "pixel_aspect_ratio": 1.1,
                "principal_point": [30.0, 20.0],
                "position": [float(rig), float(cam), 1.0],
                "orientation": [0.1, -0.2, 0.3],
            })
        views.append(rig_views)
    with open(scene / "models.json", "w") as f:
        json.dump(views, f)

    assert T.scan_scene_names("space") == ["space/scene_000"]
    db = D.parse_database_name("space/scene_000")
    assert len(db.get_img_ids()) == 6
    K = db.get_K("1-2")
    assert K[0, 0] == 55.0 and abs(K[1, 1] - 60.5) < 1e-5
    pose = db.get_pose("1-2")
    np.testing.assert_allclose(pose[:, :3] @ pose[:, :3].T, np.eye(3),
                               atol=1e-6)
    # camera center = stored position
    np.testing.assert_allclose(-pose[:, :3].T @ pose[:, 3], [1, 2, 1],
                               atol=1e-6)
    nr = db.get_depth_range("0-0")
    assert nr[0] == np.float32(0.7) and nr[1] == 100
    assert db.get_image("0-0").shape == (40, 60, 3)


def test_real_estate_database(data_root, rng):
    frames = data_root / "real_estate_dataset" / "train" / "frames" / "vid0"
    cams = data_root / "real_estate_dataset" / "train" / "cameras"
    frames.mkdir(parents=True)
    cams.mkdir(parents=True)
    timestamps = [3000, 1000, 2000]
    lines = ["https://example.com/video\n"]
    for ts in timestamps:
        cv2.imwrite(str(frames / f"{ts}.png"),
                    (rng.rand(90, 160, 3) * 255).astype(np.uint8))
        pose = look_at_pose(np.asarray([ts / 1000, 1.0, 2.0]))
        vals = ([ts, 0.5, 0.9, 0.5, 0.5, 0.0, 0.0]
                + pose.reshape(-1).tolist())
        lines.append(" ".join(str(v) for v in vals) + "\n")
    with open(cams / "vid0.txt", "w") as f:
        f.writelines(lines)

    assert T.scan_scene_names("real_estate") == \
        ["real_estate/vid0/450_800"]
    db = D.parse_database_name("real_estate/vid0/450_800")
    # ids sorted numerically
    assert db.get_img_ids() == ["1000", "2000", "3000"]
    img = db.get_image("1000")
    assert img.shape == (450, 800, 3)
    K = db.get_K("2000")
    # normalized fx*w, fy*h, cx*w, cy*h
    assert K[0, 0] == 0.5 * 800 and K[1, 1] == 0.9 * 450
    assert K[0, 2] == 0.5 * 800 and K[1, 2] == 0.5 * 450
    pose = db.get_pose("3000")
    np.testing.assert_allclose(-pose[:, :3].T @ pose[:, 3], [3, 1, 2],
                               atol=1e-5)
    nr = db.get_depth_range("1000")
    assert nr[0] == 1.0 and nr[1] == 100.0


def test_dtu_train_database(data_root, rng):
    scene = data_root / "dtu_train" / "scan1"
    (scene / "image").mkdir(parents=True)
    K = np.asarray([[400.0, 0, 200], [0, 400.0, 150], [0, 0, 1]])
    cams = {}
    centers = []
    for i in range(3):
        ang = 2 * np.pi * i / 3
        center = np.asarray([np.cos(ang) * 3, np.sin(ang) * 3, 1.0])
        centers.append(center)
        pose = look_at_pose(center)
        P = K @ pose
        cams[f"world_mat_{i}"] = np.concatenate(
            [P, np.asarray([[0.0, 0, 0, 1]])], 0)
        cams[f"scale_mat_{i}"] = np.eye(4)
        cv2.imwrite(str(scene / "image" / f"{i:06}.png"),
                    (rng.rand(300, 400, 3) * 255).astype(np.uint8))
    np.savez(str(scene / "cameras.npz"), **cams)

    assert T.scan_scene_names("dtu_train") == ["dtu_train/scan1"]
    db = D.parse_database_name("dtu_train/scan1")
    assert db.get_img_ids() == ["0", "1", "2"]
    for i in range(3):
        pose = db.get_pose(str(i))
        np.testing.assert_allclose(pose[:, :3] @ pose[:, :3].T,
                                   np.eye(3), atol=1e-5)
        # decomposeProjectionMatrix recovers the camera center; the
        # IDR-convention flip (reference :907) then maps it through
        # diag(1,-1,-1)
        np.testing.assert_allclose(-pose[:, :3].T @ pose[:, 3],
                                   np.diag([1, -1, -1]) @ centers[i],
                                   atol=1e-4)
        K_got = db.get_K(str(i))
        np.testing.assert_allclose(K_got, K, atol=1e-3)
    nr = db.get_depth_range("0")
    assert nr[0] == np.float32(0.8) and nr[1] == 4.0


def test_dtu_train_missing_exclusion_list_is_loud(data_root, monkeypatch):
    """A missing configs/dtu_test_scans.txt must ABORT scene scanning,
    not silently drop dtu_train from the training mixture: the
    missing-dataset-dir handler swallows FileNotFoundError, so the
    refusal must be a different exception type."""
    (data_root / "dtu_train" / "scan1").mkdir(parents=True)
    real_exists = os.path.exists
    monkeypatch.setattr(
        T.os.path, "exists",
        lambda p: False if p.endswith("dtu_test_scans.txt")
        else real_exists(p))
    with pytest.raises(RuntimeError, match="dtu_test_scans"):
        T.scan_scene_names("dtu_train")


def test_blended_mvs_database(data_root, rng):
    uid = T.BlendedMVSDatabase.name2uid["santa"]
    scene = data_root / "blended-mvs" / uid
    (scene / "blended_images").mkdir(parents=True)
    (scene / "cams").mkdir(parents=True)
    pose = look_at_pose(np.asarray([2.0, 1.0, 3.0]))
    extr = np.concatenate([pose, np.asarray([[0.0, 0, 0, 1]])], 0)
    K = np.asarray([[333.0, 0, 80], [0, 333.0, 60], [0, 0, 1.0]])
    for i in range(2):
        img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(scene / "blended_images" / f"{i:08d}.jpg"), img)
        cv2.imwrite(str(scene / "blended_images" / f"{i:08d}_masked.jpg"),
                    img)
        with open(scene / "cams" / f"{i:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for row in extr:
                f.write(" ".join(str(v) for v in row) + "\n")
            f.write("\nintrinsic\n")
            for row in K:
                f.write(" ".join(str(v) for v in row) + "\n")
            f.write("\n2.0 0.01 0.01 8.0\n")

    assert T.scan_scene_names("blended_mvs") == ["blended_mvs/santa/half"]
    db = D.parse_database_name("blended_mvs/santa/half")
    assert len(db.get_img_ids()) == 2
    nr = db.get_depth_range("0")
    np.testing.assert_allclose(nr, [2.0 * 0.8, 8.0 * 1.2], atol=1e-6)
    K_got = db.get_K("0")
    np.testing.assert_allclose(K_got[0, 0], 333.0 * 0.5, atol=1e-5)
    got = db.get_pose("0")
    np.testing.assert_allclose(got, pose, atol=1e-6)
    assert db.get_image("0").shape == (60, 80, 3)
    assert db.get_mask("0").shape == (60, 80)


def test_real_iconic_database(data_root, rng):
    scene = data_root / "real_iconic_noface" / "chair"
    (scene / "images").mkdir(parents=True)
    n, h, w, focal = 6, 64, 96, 80.0
    poses_bounds = np.zeros((n, 17))
    for i in range(n):
        ang = 0.3 * i
        center = np.asarray([np.sin(ang), 0.3 * i, 4.0])
        w2c = look_at_pose(np.asarray([0.0, 0.0, 4.0]) + 0)  # base rot
        # camera-to-world in LLFF [down, right, back] convention
        R_c2w = w2c[:, :3].T
        m = np.zeros((3, 5))
        # columns of LLFF pose: [-y, x, z] of OpenGL c2w; build from an
        # OpenCV c2w [x, y, z] as [ -(-y), x, -z ] -> keep it simple and
        # orthonormal:
        x, y, z = R_c2w[:, 0], R_c2w[:, 1], R_c2w[:, 2]
        m[:, 0] = -y
        m[:, 1] = x
        m[:, 2] = -z
        m[:, 3] = center
        m[:, 4] = [h, w, focal]
        poses_bounds[i, :15] = m.reshape(-1)
        poses_bounds[i, 15:] = [2.0, 9.0]
        cv2.imwrite(str(scene / "images" / f"img_{i:03}.png"),
                    (rng.rand(h * 4, w * 4, 3) * 255).astype(np.uint8))
    np.save(str(scene / "poses_bounds.npy"), poses_bounds)

    assert T.scan_scene_names("real_iconic") == ["real_iconic/chair/4"]
    db = D.parse_database_name("real_iconic/chair/4")
    assert len(db.get_img_ids()) == n
    img = db.get_image("0")
    assert img.shape == (h, w, 3)
    K = db.get_K("0")
    # focal rescaled by 1/factor
    assert abs(K[0, 0] - focal / 4) < 1e-4
    for i in range(n):
        pose = db.get_pose(str(i))
        np.testing.assert_allclose(pose[:, :3] @ pose[:, :3].T,
                                   np.eye(3), atol=1e-5)
    # bd_factor rescale: near bound maps to 1/0.75
    nr = db.get_depth_range("0")
    np.testing.assert_allclose(nr[0], 1 / 0.75, rtol=1e-5)
