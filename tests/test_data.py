"""Data-layer tests on a fabricated on-disk nerf_synthetic scene."""
import json
import os

import numpy as np
import cv2
import pytest


@pytest.fixture(scope="module")
def fake_nerf_scene(tmp_path_factory):
    """Write a tiny nerf_synthetic-format scene (RGBA pngs + transforms)."""
    root = tmp_path_factory.mktemp("data")
    scene = root / "nerf_synthetic" / "toy"
    rng = np.random.RandomState(0)

    def make_frames(split, names):
        (scene / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for name in names:
            img = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
            img[:8, :8, 3] = 0  # some transparent corner
            cv2.imwrite(str(scene / split / f"{name}.png"), img)
            c2w = np.eye(4)
            c2w[:3, 3] = rng.randn(3) * 2
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": c2w.tolist()})
        with open(scene / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)

    make_frames("train", [f"r_{i}" for i in range(8)])
    make_frames("val", ["r_39", "r_2", "r_94", "r_62", "r_23", "r_36"])
    make_frames("test", [f"r_{i}" for i in range(2)])
    return str(root)


def test_nerf_synthetic_database(fake_nerf_scene, monkeypatch):
    from neuray_tpu.data import database as D
    monkeypatch.setattr(D, "DATA_ROOT", fake_nerf_scene)
    db = D.parse_database_name("nerf_synthetic/toy/black_800")
    ids = db.get_img_ids()
    assert len(ids) == 16
    img = db.get_image("train-r_0")
    assert img.shape == (32, 32, 3)
    # black background: transparent corner must be black
    assert img[:8, :8].max() == 0
    K = db.get_K("train-r_0")
    assert K.shape == (3, 3) and K[0, 2] == 16.0
    pose = db.get_pose("train-r_0")
    assert pose.shape == (3, 4)
    # orthonormal rotation
    np.testing.assert_allclose(pose[:, :3] @ pose[:, :3].T, np.eye(3),
                               atol=1e-5)
    mask = db.get_mask("train-r_0")
    assert not mask[:8, :8].any()
    nr = db.get_depth_range("train-r_0")
    assert nr[0] == 2.0 and nr[1] == 6.0


def test_database_split(fake_nerf_scene, monkeypatch):
    from neuray_tpu.data import database as D
    monkeypatch.setattr(D, "DATA_ROOT", fake_nerf_scene)
    db = D.parse_database_name("nerf_synthetic/toy/black_800")
    ref_ids, que_ids = D.get_database_split(db, "val_all")
    assert all(i.startswith("train-") for i in ref_ids)
    assert que_ids == D.nerf_syn_val_ids
    ref_ids, que_ids = D.get_database_split(db, "test_all")
    assert all(i.startswith("test-") for i in que_ids)


def test_build_imgs_info(fake_nerf_scene, monkeypatch):
    from neuray_tpu.data import database as D
    from neuray_tpu.data.imgs_info import build_imgs_info
    monkeypatch.setattr(D, "DATA_ROOT", fake_nerf_scene)
    db = D.parse_database_name("nerf_synthetic/toy/black_800")
    ids = [f"train-r_{i}" for i in range(4)]
    info = build_imgs_info(db, ids, pad_interval=16,
                           replace_none_depth=True)
    assert info["imgs"].shape == (4, 32, 32, 3)
    assert info["imgs"].dtype == np.float32
    assert info["imgs"].max() <= 1.0
    assert info["depth"].shape == (4, 32, 32, 1)
    assert info["poses"].shape == (4, 3, 4)
    assert info["masks"].shape == (4, 32, 32, 1)


def test_view_select(fake_nerf_scene, monkeypatch):
    from neuray_tpu.data import database as D
    from neuray_tpu.data.view_select import (
        compute_nearest_camera_indices, select_working_views_db)
    monkeypatch.setattr(D, "DATA_ROOT", fake_nerf_scene)
    db = D.parse_database_name("nerf_synthetic/toy/black_800")
    ids = [f"train-r_{i}" for i in range(8)]
    idx = compute_nearest_camera_indices(db, ids)
    assert idx.shape == (8, 8)
    # nearest to itself is itself
    np.testing.assert_array_equal(idx[:, 0], np.arange(8))
    poses = np.asarray([db.get_pose(i) for i in ids[:2]])
    sel = select_working_views_db(db, ids, poses, 3, exclude_self=True)
    assert sel.shape == (2, 3)
    assert ids[0] not in sel[0]


def test_render_poses(fake_nerf_scene, monkeypatch):
    from neuray_tpu.data import database as D
    from neuray_tpu.data.render_poses import get_render_poses
    monkeypatch.setattr(D, "DATA_ROOT", fake_nerf_scene)
    db = D.parse_database_name("nerf_synthetic/toy/black_800")
    poses = get_render_poses(db, "inter")
    assert poses.shape[1:] == (3, 4)
    assert len(poses) > 10
    for p in poses[::40]:
        np.testing.assert_allclose(p[:, :3] @ p[:, :3].T, np.eye(3),
                                   atol=1e-4)
    circle = get_render_poses(db, "circle")
    assert circle.shape == (60, 3, 4)


def test_synthetic_dataset_schema():
    from neuray_tpu.data.train_dataset import SyntheticRendererDataset
    ds = SyntheticRendererDataset({"rfn": 3, "h": 24, "w": 24,
                                   "train_ray_num": 16,
                                   "depth_loss_coords_num": 8}, True)
    s = ds[0]
    assert s["ref"]["imgs"].shape == (3, 24, 24, 3)
    assert s["que"]["coords"].shape == (1, 16, 2)
    assert s["depth_loss_coords"].shape == (3, 8, 2)
    assert "true_depth" in s["ref"]


def test_pan_scene_separable_from_shell():
    """The trajectory-escalation tool's precondition: some radius-4
    shell camera frames the anchor while EVERY rod sphere projects
    outside the image (12 px margin) — and centering the rod brings
    it back in. Pin it here so scene edits can't silently break
    tools/check_trajectory_escalation.py's camera search."""
    import numpy as np
    from neuray_tpu.data.synthetic import make_pan_scene_spheres, RADIUS
    sys_path = __import__("sys").path
    import os
    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    if tools not in sys_path:
        sys_path.insert(0, tools)
    from check_trajectory_escalation import look_at_pose, sphere_in_frustum

    spheres = make_pan_scene_spheres()
    anchor, rod = spheres[0], spheres[1:]
    assert anchor[1] == 0.5 and all(s[1] == 0.10 for s in rod)
    h = w = 400
    K = np.array([[w * 1.2, 0, w / 2], [0, w * 1.2, h / 2], [0, 0, 1]],
                  np.float32)
    t0 = np.asarray(anchor[0], np.float64)
    rs = np.random.RandomState(7)
    found = None
    for _ in range(512):
        d = rs.randn(3)
        d /= np.linalg.norm(d)
        c = d * RADIUS
        pose0 = look_at_pose(c, t0)
        if (sphere_in_frustum(pose0, K, h, w, np.asarray(anchor[0]),
                              anchor[1])
                and not any(sphere_in_frustum(
                    pose0, K, h, w, np.asarray(s[0]), s[1], margin=12.0)
                    for s in rod)):
            found = c
            break
    assert found is not None, "no shell camera separates anchor from rod"
    # panning to the rod center must bring the rod into the frustum
    pose1 = look_at_pose(found, np.array([-1.25, 0.0, 0.0]))
    assert any(sphere_in_frustum(pose1, K, h, w, np.asarray(s[0]), s[1])
               for s in rod)
