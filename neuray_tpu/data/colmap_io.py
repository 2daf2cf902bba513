"""Readers for COLMAP binary outputs (fresh implementation of the
documented COLMAP formats: sparse model cameras/images/points3D .bin and
the dense depth/normal map container).

Format docs: https://colmap.github.io/format.html. The reference vendors
COLMAP's own scripts for this; we only need the read paths used by the
renderer data layer (cameras.bin, images.bin, points3D.bin, *.geometric.bin).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

# camera_model_id -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


@dataclass
class Camera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray

    def K(self) -> np.ndarray:
        """3x3 intrinsics for pinhole-family models."""
        if self.model == "SIMPLE_PINHOLE" or self.model == "SIMPLE_RADIAL":
            f, cx, cy = self.params[:3]
            fx = fy = f
        else:
            fx, fy, cx, cy = self.params[:4]
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)


@dataclass
class Image:
    id: int
    qvec: np.ndarray
    tvec: np.ndarray
    camera_id: int
    name: str
    xys: np.ndarray
    point3d_ids: np.ndarray

    def R(self) -> np.ndarray:
        return qvec2rotmat(self.qvec)

    def pose34(self) -> np.ndarray:
        """[3,4] world->cam extrinsics."""
        return np.concatenate([self.R(), self.tvec[:, None]], 1)


@dataclass
class Point3D:
    id: int
    xyz: np.ndarray
    rgb: np.ndarray
    error: float
    image_ids: np.ndarray
    point2d_idxs: np.ndarray


def qvec2rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y]])


def _read(f, fmt: str):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def read_cameras_binary(path: str) -> Dict[int, Camera]:
    from neuray_tpu.data import colmap_native
    native = colmap_native.read_cameras_binary_native(path)
    if native is not None:
        return native
    return read_cameras_binary_py(path)


def read_cameras_binary_py(path: str) -> Dict[int, Camera]:
    cams = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            cam_id, model_id, width, height = _read(f, "<iiQQ")
            name, num_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f, f"<{num_params}d"))
            cams[cam_id] = Camera(cam_id, name, width, height, params)
    return cams


def read_images_binary(path: str) -> Dict[int, Image]:
    from neuray_tpu.data import colmap_native
    native = colmap_native.read_images_binary_native(path)
    if native is not None:
        return native
    return read_images_binary_py(path)


def read_images_binary_py(path: str) -> Dict[int, Image]:
    images = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            img_id = _read(f, "<i")[0]
            qvec = np.array(_read(f, "<4d"))
            tvec = np.array(_read(f, "<3d"))
            cam_id = _read(f, "<i")[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n2d,) = _read(f, "<Q")
            rec = np.frombuffer(
                f.read(24 * n2d),
                dtype=np.dtype([("x", "<f8"), ("y", "<f8"), ("id", "<i8")]))
            xys = np.stack([rec["x"], rec["y"]], -1)
            p3d = rec["id"].copy()
            images[img_id] = Image(img_id, qvec, tvec, cam_id,
                                   name.decode("utf-8"), xys, p3d)
    return images


def read_points3d_binary(path: str) -> Dict[int, Point3D]:
    from neuray_tpu.data import colmap_native
    native = colmap_native.read_points3d_binary_native(path)
    if native is not None:
        return native
    return read_points3d_binary_py(path)


def read_points3d_binary_py(path: str) -> Dict[int, Point3D]:
    pts = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            (pid,) = _read(f, "<Q")
            xyz = np.array(_read(f, "<3d"))
            rgb = np.array(_read(f, "<3B"))
            (err,) = _read(f, "<d")
            (track_len,) = _read(f, "<Q")
            track = np.frombuffer(f.read(8 * track_len), dtype=np.int32)
            track = track.reshape(track_len, 2)
            pts[pid] = Point3D(pid, xyz, rgb, err,
                               track[:, 0].copy(), track[:, 1].copy())
    return pts


def read_array(path: str) -> np.ndarray:
    """Dense depth/normal map: ascii 'w&h&c&' header then f32 data in
    column-major (fortran) order."""
    with open(path, "rb") as f:
        header = b""
        amp = 0
        while amp < 3:
            c = f.read(1)
            header += c
            if c == b"&":
                amp += 1
        w, h, c = (int(x) for x in header.decode("ascii").split("&")[:3])
        data = np.frombuffer(f.read(), dtype=np.float32)
    # data is stored with width fastest: reshape (w, h, c) fortran-order
    # then transpose to (h, w, c).
    arr = data.reshape((w, h, c), order="F").transpose(1, 0, 2)
    return np.squeeze(np.ascontiguousarray(arr))
