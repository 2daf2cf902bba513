"""COLMAP preprocessing driver for custom example scenes.

Behavioral parity: reference colmap_scripts/process.py (camera-prior
injection via sqlite :16-39, feature_extractor -> exhaustive_matcher ->
mapper -> image_undistorter -> patch_match_stereo -> stereo_fusion
:43-84, clear_project :86) and run_colmap.py:16
(visualize_camera_locations via utils/draw_utils.py:260 output_points).

The sqlite writer is a fresh minimal implementation of the documented
COLMAP database schema (the reference vendors COLMAP's own
colmap/database.py); only the camera/image-prior rows the pipeline
needs are written — COLMAP fills in the rest.
"""
from __future__ import annotations

import os
import shutil
import sqlite3
import subprocess
from glob import glob
from pathlib import Path

import numpy as np
import cv2

# COLMAP's documented sqlite schema (colmap.github.io/format.html)
_SCHEMA = """
CREATE TABLE IF NOT EXISTS cameras (
    camera_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    model INTEGER NOT NULL, width INTEGER NOT NULL,
    height INTEGER NOT NULL, params BLOB,
    prior_focal_length INTEGER NOT NULL);
CREATE TABLE IF NOT EXISTS images (
    image_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    name TEXT NOT NULL UNIQUE, camera_id INTEGER NOT NULL,
    prior_qw REAL, prior_qx REAL, prior_qy REAL, prior_qz REAL,
    prior_tx REAL, prior_ty REAL, prior_tz REAL,
    CONSTRAINT image_id_check CHECK(image_id >= 0 and image_id < 2147483647),
    FOREIGN KEY(camera_id) REFERENCES cameras(camera_id));
CREATE TABLE IF NOT EXISTS keypoints (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE);
CREATE TABLE IF NOT EXISTS descriptors (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE);
CREATE TABLE IF NOT EXISTS matches (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB);
CREATE TABLE IF NOT EXISTS two_view_geometries (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    config INTEGER NOT NULL, F BLOB, E BLOB, H BLOB,
    qvec BLOB, tvec BLOB);
"""

_SIMPLE_PINHOLE = 0  # COLMAP camera model id


def _add_camera_priors(project_dir: str, same_camera: bool):
    """Seed the database with SIMPLE_PINHOLE priors (focal guess =
    image diagonal) so the mapper starts near plausible intrinsics
    (reference process.py:16-39)."""
    db = sqlite3.connect(f"{project_dir}/database.db")
    db.executescript(_SCHEMA)

    img_fns = []
    for pattern in ("*.jpg", "*.png", "*.PNG", "*.JPG"):
        img_fns += glob(f"{project_dir}/images/{pattern}")
    img_fns = sorted(img_fns)

    def add_camera(w, h, focal):
        params = np.asarray([focal, w / 2, h / 2], np.float64)
        cur = db.execute(
            "INSERT INTO cameras VALUES (NULL, ?, ?, ?, ?, ?)",
            (_SIMPLE_PINHOLE, w, h, params.tobytes(), 1))
        return cur.lastrowid

    cam_id = None
    for k, fn in enumerate(img_fns):
        img = cv2.imread(fn)
        h, w = img.shape[:2]
        focal = float(np.sqrt(h ** 2 + w ** 2))
        if not same_camera or k == 0:
            cam_id = add_camera(w, h, focal)
        db.execute(
            "INSERT INTO images VALUES "
            "(NULL, ?, ?, NULL, NULL, NULL, NULL, NULL, NULL, NULL)",
            (os.path.basename(fn), cam_id))
    db.commit()
    db.close()


def _run(cmd):
    print(" ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def process_example_dataset(project_dir: str, colmap_path: str = "colmap",
                            same_camera: bool = False):
    """SfM+MVS over <project_dir>/images (reference process.py:12-84)."""
    _add_camera_priors(project_dir, same_camera)
    _run([colmap_path, "feature_extractor",
          "--database_path", f"{project_dir}/database.db",
          "--image_path", f"{project_dir}/images"])
    _run([colmap_path, "exhaustive_matcher",
          "--database_path", f"{project_dir}/database.db"])
    Path(f"{project_dir}/sparse").mkdir(exist_ok=True, parents=True)
    _run([colmap_path, "mapper",
          "--database_path", f"{project_dir}/database.db",
          "--image_path", f"{project_dir}/images",
          "--output_path", f"{project_dir}/sparse"])
    Path(f"{project_dir}/dense").mkdir(exist_ok=True, parents=True)
    _run([colmap_path, "image_undistorter",
          "--image_path", f"{project_dir}/images",
          "--input_path", f"{project_dir}/sparse/0",
          "--output_path", f"{project_dir}/dense"])
    _run([colmap_path, "patch_match_stereo",
          "--workspace_path", f"{project_dir}/dense"])
    _run([colmap_path, "stereo_fusion",
          "--workspace_path", f"{project_dir}/dense",
          "--workspace_format", "COLMAP",
          "--input_type", "geometric",
          "--output_path", f"{project_dir}/points.ply"])


def output_points(fn: str, pts: np.ndarray, colors=None):
    """Write an 'x y z [r g b]' point list for external viewers
    (reference utils/draw_utils.py:260)."""
    with open(fn, "w") as f:
        for i, pt in enumerate(pts):
            line = " ".join(f"{v:.6f}" for v in pt[:3])
            if colors is not None:
                line += " " + " ".join(str(int(v)) for v in colors[i][:3])
            f.write(line + "\n")


def visualize_camera_locations(project_dir: str, scene_name: str):
    """Dump recovered camera centers to cam_pts.txt
    (reference run_colmap.py:16-25)."""
    from neuray_tpu.data.database import parse_database_name
    database = parse_database_name(f"example/{scene_name}/raw")
    cam_pts = []
    for img_id in database.get_img_ids():
        pose = database.get_pose(img_id)
        cam_pts.append(-pose[:, :3].T @ pose[:, 3])
    output_points(f"{project_dir}/cam_pts.txt", np.stack(cam_pts, 0))


def clear_project(project_dir: str):
    """Remove intermediate artifacts (reference process.py:86-93)."""
    def rm(path):
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    rm(f"{project_dir}/database.db")
    rm(f"{project_dir}/dense/images")
    rm(f"{project_dir}/dense/sparse")
    for fn in glob(f"{project_dir}/dense/*.sh"):
        rm(fn)
    for fn in glob(f"{project_dir}/dense/stereo/depth_maps/"
                   "*photometric.bin"):
        rm(fn)
    rm(f"{project_dir}/dense/stereo/normal_maps")
