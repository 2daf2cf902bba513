"""Spaces-dataset scene parser (models.json camera rigs).

Behavioral parity: reference utils/space_dataset_utils.py (ReadScene
:137, ReadView :128, angle-axis world-from-camera :89-110 — note the
NEGATED angle, and the pixel-aspect-scaled fy :113-125).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
from scipy.spatial.transform import Rotation


@dataclass
class SpaceCamera:
    intrinsics: np.ndarray  # 3x3
    w_f_c: np.ndarray       # 4x4 world-from-camera


@dataclass
class SpaceView:
    image_path: str
    shape: tuple            # (h, w)
    camera: SpaceCamera
    image: object = field(default=None)


def _world_from_camera(view_json) -> np.ndarray:
    """(reference space_dataset_utils.py:89-110)."""
    transform = np.identity(4)
    transform[0:3, 3] = view_json["position"]
    angle_axis = np.asarray(view_json["orientation"], np.float64)
    if np.linalg.norm(angle_axis) < 1e-7:
        return transform
    # the json stores the camera-from-world rotation as angle-axis;
    # world-from-camera is the NEGATED rotation (reference :108)
    transform[0:3, 0:3] = Rotation.from_rotvec(-angle_axis).as_matrix()
    return transform


def _intrinsics(view_json) -> np.ndarray:
    """(reference space_dataset_utils.py:113-125)."""
    K = np.identity(3)
    K[0, 0] = view_json["focal_length"]
    K[1, 1] = view_json["focal_length"] * view_json["pixel_aspect_ratio"]
    K[0, 2] = view_json["principal_point"][0]
    K[1, 2] = view_json["principal_point"][1]
    return K


def read_view(base_dir: str, view_json) -> SpaceView:
    return SpaceView(
        image_path=os.path.join(base_dir, view_json["relative_path"]),
        shape=(int(view_json["height"]), int(view_json["width"])),
        camera=SpaceCamera(_intrinsics(view_json),
                           _world_from_camera(view_json)))


def read_scene(base_dir: str):
    """All rigs of one scene: list (rig) of list (camera) of SpaceView
    (reference space_dataset_utils.py:137-145)."""
    with open(os.path.join(base_dir, "models.json")) as f:
        model_json = json.load(f)
    return [[read_view(base_dir, vj) for vj in views]
            for views in model_json]
