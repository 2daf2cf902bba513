"""ctypes bindings for the first-party C++ COLMAP binary-model reader.

The C ABI lives in native/colmap_reader.cpp (built to
native/libcolmap_reader.so by native/Makefile). Each reader returns the
same Dict[int, Camera/Image/Point3D] as the pure-python readers in
colmap_io, or None when the shared library isn't built — colmap_io
falls back to python transparently.

The native reader exists because the python struct-unpack walk takes
minutes on multi-million-point points3D.bin files (the reference vendors
COLMAP's python scripts, reference colmap/read_write_model.py; this is
the framework's native data-ingest path).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_LIB = None
_LIB_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcolmap_reader.so")

_I64P = ctypes.POINTER(ctypes.c_longlong)
_I32P = ctypes.POINTER(ctypes.c_int)
_F64P = ctypes.POINTER(ctypes.c_double)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def _try_build() -> bool:
    """Best-effort build via native/Makefile (g++ is baked in)."""
    try:
        r = subprocess.run(["make", "-C", _NATIVE_DIR],
                           capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib():
    """Load (building on first use) the shared library, or None."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not os.path.exists(_SO_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.colmap_points3d_counts.restype = ctypes.c_longlong
    lib.colmap_points3d_counts.argtypes = [ctypes.c_char_p, _I64P]
    lib.colmap_points3d_read.restype = ctypes.c_int
    lib.colmap_points3d_read.argtypes = [
        ctypes.c_char_p, _I64P, _F64P, _U8P, _F64P, _I64P, _I32P, _I32P]
    lib.colmap_images_counts.restype = ctypes.c_longlong
    lib.colmap_images_counts.argtypes = [ctypes.c_char_p, _I64P, _I64P]
    lib.colmap_images_read.restype = ctypes.c_int
    lib.colmap_images_read.argtypes = [
        ctypes.c_char_p, _I32P, _F64P, _F64P, _I32P, ctypes.c_char_p,
        _I64P, _F64P, _I64P]
    lib.colmap_cameras_count.restype = ctypes.c_longlong
    lib.colmap_cameras_count.argtypes = [ctypes.c_char_p]
    lib.colmap_cameras_read.restype = ctypes.c_longlong
    lib.colmap_cameras_read.argtypes = [
        ctypes.c_char_p, _I32P, _I32P, _I64P, _I64P, _F64P]
    _LIB = lib
    return _LIB


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def read_cameras_binary_native(path: str) -> Optional[Dict]:
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return None
    from neuray_tpu.data.colmap_io import Camera, CAMERA_MODELS
    n = lib.colmap_cameras_count(path.encode())
    if n < 0:
        return None
    cam_ids = np.zeros(n, np.int32)
    model_ids = np.zeros(n, np.int32)
    widths = np.zeros(n, np.int64)
    heights = np.zeros(n, np.int64)
    params = np.zeros((n, 12), np.float64)
    got = lib.colmap_cameras_read(
        path.encode(), _ptr(cam_ids, ctypes.c_int),
        _ptr(model_ids, ctypes.c_int), _ptr(widths, ctypes.c_longlong),
        _ptr(heights, ctypes.c_longlong), _ptr(params, ctypes.c_double))
    if got != n:
        return None
    cams = {}
    for i in range(n):
        name, num_params = CAMERA_MODELS[int(model_ids[i])]
        cams[int(cam_ids[i])] = Camera(
            int(cam_ids[i]), name, int(widths[i]), int(heights[i]),
            params[i, :num_params].copy())
    return cams


def read_images_binary_native(path: str) -> Optional[Dict]:
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return None
    from neuray_tpu.data.colmap_io import Image
    total_p2d = ctypes.c_longlong(0)
    total_name = ctypes.c_longlong(0)
    n = lib.colmap_images_counts(path.encode(), ctypes.byref(total_p2d),
                                 ctypes.byref(total_name))
    if n < 0:
        return None
    image_ids = np.zeros(n, np.int32)
    qvecs = np.zeros((n, 4), np.float64)
    tvecs = np.zeros((n, 3), np.float64)
    cam_ids = np.zeros(n, np.int32)
    names = ctypes.create_string_buffer(max(int(total_name.value), 1))
    p2d_offsets = np.zeros(n + 1, np.int64)
    xys = np.zeros((max(int(total_p2d.value), 1), 2), np.float64)
    p3d_ids = np.zeros(max(int(total_p2d.value), 1), np.int64)
    rc = lib.colmap_images_read(
        path.encode(), _ptr(image_ids, ctypes.c_int),
        _ptr(qvecs, ctypes.c_double), _ptr(tvecs, ctypes.c_double),
        _ptr(cam_ids, ctypes.c_int), names,
        _ptr(p2d_offsets, ctypes.c_longlong), _ptr(xys, ctypes.c_double),
        _ptr(p3d_ids, ctypes.c_longlong))
    if rc != 0:
        return None
    name_list = names.raw.split(b"\x00")[:n]
    images = {}
    for i in range(n):
        lo, hi = int(p2d_offsets[i]), int(p2d_offsets[i + 1])
        images[int(image_ids[i])] = Image(
            int(image_ids[i]), qvecs[i].copy(), tvecs[i].copy(),
            int(cam_ids[i]), name_list[i].decode("utf-8"),
            xys[lo:hi].copy(), p3d_ids[lo:hi].copy())
    return images


def read_points3d_binary_native(path: str) -> Optional[Dict]:
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return None
    from neuray_tpu.data.colmap_io import Point3D
    total_track = ctypes.c_longlong(0)
    n = lib.colmap_points3d_counts(path.encode(), ctypes.byref(total_track))
    if n < 0:
        return None
    tt = max(int(total_track.value), 1)
    ids = np.zeros(n, np.int64)
    xyz = np.zeros((n, 3), np.float64)
    rgb = np.zeros((n, 3), np.uint8)
    err = np.zeros(n, np.float64)
    offsets = np.zeros(n + 1, np.int64)
    track_img = np.zeros(tt, np.int32)
    track_p2d = np.zeros(tt, np.int32)
    rc = lib.colmap_points3d_read(
        path.encode(), _ptr(ids, ctypes.c_longlong),
        _ptr(xyz, ctypes.c_double), _ptr(rgb, ctypes.c_uint8),
        _ptr(err, ctypes.c_double), _ptr(offsets, ctypes.c_longlong),
        _ptr(track_img, ctypes.c_int), _ptr(track_p2d, ctypes.c_int))
    if rc != 0:
        return None
    pts = {}
    for i in range(n):
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        pts[int(ids[i])] = Point3D(
            int(ids[i]), xyz[i].copy(), rgb[i].copy(), float(err[i]),
            track_img[lo:hi].copy(), track_p2d[lo:hi].copy())
    return pts
