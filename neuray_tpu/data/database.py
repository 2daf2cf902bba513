"""Dataset/database abstraction: one ABC, one adapter per dataset family.

Behavioral parity: reference dataset/database.py (BaseDatabase ABC :25-59,
NeRFSynthetic :251-354, LLFFColmap :61-137, DTUTest :138-250, BlendedMVS
:355-468, Example :469-599) and the `<dataset>/<scene>/<setting>` naming
scheme resolved by parse_database_name (:983-1003) / get_database_split
(:1005-1044).

This is host-side numpy code: images load once per scene, get device_put
downstream. All images are returned HWC uint8; poses are [3,4] OpenCV
world->cam; Ks are [3,3].
"""
from __future__ import annotations

import abc
import glob
import json
import os
from pathlib import Path

import numpy as np
import cv2

from neuray_tpu.data import colmap_io

# dataset roots (same layout as the reference's data/ convention)
DATA_ROOT = os.environ.get("NEURAY_DATA_ROOT", "data")


def _imread(path):
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3 and img.shape[2] >= 3:
        img = np.ascontiguousarray(img[:, :, [2, 1, 0] + ([3] if img.shape[2] == 4 else [])])
    return img


def _imsave(path, img):
    if img.ndim == 3 and img.shape[2] >= 3:
        img = np.ascontiguousarray(img[:, :, [2, 1, 0]])
    cv2.imwrite(path, img)


def downsample_gaussian_blur(img, ratio):
    sigma = (1 / ratio) / 3
    ksize = int(np.ceil(((sigma - 0.8) / 0.3 + 1) * 2 + 1))
    ksize = ksize + 1 if ksize % 2 == 0 else ksize
    return cv2.GaussianBlur(img, (ksize, ksize), sigma,
                            borderType=cv2.BORDER_REFLECT101)


def resize_img(img, ratio):
    h, w = img.shape[:2]
    hn, wn = int(np.round(h * ratio)), int(np.round(w * ratio))
    return cv2.resize(downsample_gaussian_blur(img, ratio), (wn, hn),
                      interpolation=cv2.INTER_LINEAR)


class BaseDatabase(abc.ABC):
    def __init__(self, database_name: str):
        self.database_name = database_name

    @abc.abstractmethod
    def get_image(self, img_id):
        ...

    @abc.abstractmethod
    def get_K(self, img_id):
        ...

    @abc.abstractmethod
    def get_pose(self, img_id):
        ...

    @abc.abstractmethod
    def get_img_ids(self, check_depth_exist=False):
        ...

    @abc.abstractmethod
    def get_depth(self, img_id):
        ...

    @abc.abstractmethod
    def get_mask(self, img_id):
        ...

    @abc.abstractmethod
    def get_depth_range(self, img_id):
        ...


class NeRFSyntheticDatabase(BaseDatabase):
    """nerf_synthetic/<scene>/<background>_<size> (reference :251-354)."""

    def __init__(self, database_name: str):
        super().__init__(database_name)
        _, model_name, background_size = database_name.split("/")
        background, size = background_size.split("_")
        self.model_name = model_name
        self.img_size = int(size)
        self.background = background
        self.root_dir = f"{DATA_ROOT}/nerf_synthetic/{model_name}"

        self.img_ids, self.poses = [], []
        K = None
        for split in ("train", "test", "val") if False else ("train", "val", "test"):
            ids, poses, K = self._parse_info(split)
            self.img_ids += ids
            self.poses += poses
        ratio = self.img_size / 800
        self.K = (np.diag([ratio, ratio, 1.0]).astype(np.float32) @ K)
        self.range_dict = {i: np.asarray((2.0, 6.0), np.float32)
                           for i in self.img_ids}
        self.depth_img_ids = [i for i in self.img_ids
                              if self._depth_exists(i)]

    def _parse_info(self, split):
        with open(f"{self.root_dir}/transforms_{split}.json") as f:
            info = json.load(f)
        focal_angle = float(info["camera_angle_x"])
        img_ids, poses = [], []
        for frame in info["frames"]:
            img_ids.append("-".join(frame["file_path"].split("/")[1:]))
            # cam->world OpenGL -> world->cam OpenCV (reference :282-287)
            pose = np.asarray(frame["transform_matrix"], np.float32)
            R = pose[:3, :3].T
            t = -R @ pose[:3, 3:]
            flip = np.diag(np.asarray([1, -1, -1], np.float32))
            poses.append(np.concatenate([flip @ R, flip @ t], 1))
        h, w = _imread(
            f"{self.root_dir}/{self._img_path(img_ids[0])}.png").shape[:2]
        focal = 0.5 * w / np.tan(0.5 * focal_angle)
        K = np.asarray([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                       np.float32)
        return img_ids, poses, K

    @staticmethod
    def _img_path(img_id):
        return "/".join(img_id.split("-"))

    def get_image(self, img_id):
        img = _imread(f"{self.root_dir}/{self._img_path(img_id)}.png")
        alpha = img[:, :, 3:].astype(np.float32) / 255.0
        img = img[:, :, :3].astype(np.float32) / 255.0
        if self.background == "black":
            img = img * alpha
        elif self.background == "white":
            img = img * alpha + 1.0 - alpha
        else:
            raise NotImplementedError(self.background)
        img = np.clip(img * 255, 0, 255).astype(np.uint8)
        if self.img_size != 800:
            img = resize_img(img, self.img_size / 800)
        return img

    def get_K(self, img_id):
        return self.K.astype(np.float32).copy()

    def get_pose(self, img_id):
        return self.poses[self.img_ids.index(img_id)].astype(np.float32).copy()

    def get_img_ids(self, check_depth_exist=False):
        return self.depth_img_ids if check_depth_exist else self.img_ids

    def _depth_exists(self, img_id):
        return os.path.exists(
            f"{self.root_dir}/colmap_depth/{img_id}.png.geometric.bin")

    def get_depth(self, img_id):
        fn = f"{self.root_dir}/colmap_depth/{img_id}.png.geometric.bin"
        if not os.path.exists(fn):
            return None
        depth = colmap_io.read_array(fn)
        if self.img_size != 800:
            depth = cv2.resize(depth, (self.img_size, self.img_size),
                               interpolation=cv2.INTER_NEAREST)
        return depth

    def get_mask(self, img_id):
        alpha = _imread(f"{self.root_dir}/{self._img_path(img_id)}.png")[:, :, 3]
        if self.img_size != 800:
            alpha = cv2.resize(alpha, (self.img_size, self.img_size),
                               interpolation=cv2.INTER_NEAREST)
        return alpha > 0

    def get_depth_range(self, img_id):
        return self.range_dict[img_id].copy()


class LLFFColmapDatabase(BaseDatabase):
    """llff_colmap/<scene>/<high|low> (reference :61-137)."""

    def __init__(self, database_name: str):
        super().__init__(database_name)
        _, self.model_name, self.res_type = database_name.split("/")
        self.root_dir = f"{DATA_ROOT}/llff_colmap/{self.model_name}"
        self.cameras = colmap_io.read_cameras_binary(
            f"{self.root_dir}/sparse/cameras.bin")
        self.images = colmap_io.read_images_binary(
            f"{self.root_dir}/sparse/images.bin")
        self.img_ids = [str(k + 1) for k in range(len(self.images))]
        self._cache_resolution()
        self.bounds = np.load(f"{self.root_dir}/depth_range.npy")

    def get_resolution(self):
        if self.res_type == "high":
            return 756, 1008
        if self.res_type == "low":
            return 756 // 2, 1008 // 2
        raise NotImplementedError(self.res_type)

    def _cache_resolution(self):
        self.image_dir = f"{self.root_dir}/cache/{self.res_type}"
        Path(self.image_dir).mkdir(exist_ok=True, parents=True)
        h, w = self.get_resolution()
        ratio = w / 4032
        for img_id in self.img_ids:
            fn = self.images[int(img_id)].name
            if os.path.exists(f"{self.image_dir}/{fn}"):
                continue
            img = _imread(f"{self.root_dir}/images/{fn}")
            img = downsample_gaussian_blur(img, ratio)
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
            _imsave(f"{self.image_dir}/{fn}", img)

    def get_image(self, img_id):
        fn = self.images[int(img_id)].name
        return _imread(f"{self.image_dir}/{fn}")

    def get_K(self, img_id):
        cam = self.cameras[self.images[int(img_id)].camera_id]
        h, w = self.get_resolution()
        fx, fy, cx, cy = cam.params[:4]
        K = np.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        K = np.diag([w / cam.width, h / cam.height, 1]) @ K
        return K.astype(np.float32)

    def get_pose(self, img_id):
        return self.images[int(img_id)].pose34().astype(np.float32)

    def get_img_ids(self, check_depth_exist=False):
        return self.img_ids

    def get_depth(self, img_id):
        return colmap_io.read_array(
            f"{self.root_dir}/colmap_depth/{img_id}.jpg.geometric.bin")

    def get_mask(self, img_id):
        h, w = self.get_resolution()
        return np.ones([h, w], dtype=bool)

    def get_depth_range(self, img_id):
        return self.bounds[int(img_id) - 1]


class DTUTestDatabase(BaseDatabase):
    """dtu_test/<scene>/<background>_<size> (reference :138-250)."""

    def __init__(self, database_name: str):
        super().__init__(database_name)
        _, model_name, background_size = database_name.split("/")
        background, image_size = background_size.split("_")
        self.root_dir = f"{DATA_ROOT}/dtu_test/{model_name}"
        self.background = background
        image_size = int(image_size)
        self.ratio = image_size / 1600
        self.h, self.w = int(self.ratio * 1200), image_size

        flip = np.diag([1, -1, -1, 1]).astype(np.float32)
        rgb_paths = sorted(
            x for x in glob.glob(os.path.join(self.root_dir, "image", "*"))
            if x.endswith((".jpg", ".png")))
        self.depth_range = np.load(f"{self.root_dir}/depth_range.npy")
        all_cam = np.load(os.path.join(self.root_dir, "cameras.npz"))
        self.Ks, self.Rts, self.img_ids = [], [], []
        for i, _ in enumerate(rgb_paths):
            P = all_cam["world_mat_" + str(i)][:3]
            K, R, t = cv2.decomposeProjectionMatrix(P)[:3]
            K = K / K[2, 2]
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = R.transpose()
            pose[:3, 3] = (t[:3] / t[3])[:, 0]
            scale_mtx = all_cam.get("scale_mat_" + str(i))
            if scale_mtx is not None:
                pose[:3, 3:] -= scale_mtx[:3, 3:]
                pose[:3, 3:] /= np.diagonal(scale_mtx[:3, :3])[..., None]
            pose = (flip @ pose)[:3]
            pose = np.concatenate(
                [pose[:, :3].T, -pose[:, :3].T @ pose[:, 3:]], 1)
            self.Ks.append(np.diag([self.ratio, self.ratio, 1]) @ K)
            self.Rts.append(pose[:3])
            self.img_ids.append(f"{i}")
        self._img_cache, self._mask_cache, self._depth_cache = {}, {}, {}

    def get_image(self, img_id):
        if img_id not in self._img_cache:
            img = _imread(
                os.path.join(self.root_dir, "image", f"{int(img_id):06}.png"))
            if self.w != 1600:
                img = cv2.resize(downsample_gaussian_blur(img, self.ratio),
                                 (self.w, self.h),
                                 interpolation=cv2.INTER_LINEAR)
            if self.background == "black":
                img = img * self.get_mask(img_id).astype(np.uint8)[:, :, None]
            else:
                raise NotImplementedError(self.background)
            self._img_cache[img_id] = img
        return self._img_cache[img_id]

    def get_K(self, img_id):
        return self.Ks[int(img_id)].astype(np.float32).copy()

    def get_pose(self, img_id):
        return self.Rts[int(img_id)].astype(np.float32).copy()

    def get_img_ids(self, check_depth_exist=False):
        return self.img_ids

    def get_depth(self, img_id):
        if img_id not in self._depth_cache:
            fn = f"{self.root_dir}/colmap_depth/{img_id}.jpg.geometric.bin"
            depth = np.ascontiguousarray(
                colmap_io.read_array(fn), dtype=np.float32)
            if self.w != 800:
                depth = cv2.resize(depth, (self.w, self.h),
                                   interpolation=cv2.INTER_NEAREST)
            depth[~self.get_mask(img_id)] = 0
            self._depth_cache[img_id] = depth
        return self._depth_cache[img_id]

    def get_mask(self, img_id):
        if img_id not in self._mask_cache:
            mask = np.sum(_imread(os.path.join(
                self.root_dir, "mask", f"{int(img_id):03}.png")), -1) > 0
            if self.w != 1600:
                mask = cv2.resize(mask.astype(np.uint8), (self.w, self.h),
                                  interpolation=cv2.INTER_NEAREST) > 0
            self._mask_cache[img_id] = mask
        return self._mask_cache[img_id]

    def get_depth_range(self, img_id):
        return self.depth_range.copy()


class ExampleDatabase(BaseDatabase):
    """example/<scene>/<resolution|raw> — custom scenes preprocessed by
    COLMAP (reference :469-599): sparse model + optional dense depth;
    per-image depth range from robust percentiles over the sparse
    points; optional longest-side resize."""

    def __init__(self, database_name: str):
        super().__init__(database_name)
        parts = database_name.split("/")
        self.scene_name = parts[1]
        self.resolution = parts[2] if len(parts) > 2 else "raw"
        self.root_dir = f"{DATA_ROOT}/example/{self.scene_name}"
        sparse = f"{self.root_dir}/sparse/0"
        if not os.path.exists(sparse):
            # layout produced by our run_colmap.py wrapper
            sparse = f"{self.root_dir}/colmap/sparse/0"
        self._sparse_dir = sparse
        self.cameras = colmap_io.read_cameras_binary(f"{sparse}/cameras.bin")
        self.images = colmap_io.read_images_binary(f"{sparse}/images.bin")
        self.img_ids = [str(k) for k in sorted(self.images.keys())]

        if self.resolution != "raw":
            first = self.images[int(self.img_ids[0])].name
            h, w = _imread(f"{self.root_dir}/images/{first}").shape[:2]
            self.ratio = int(self.resolution) / max(h, w)
        else:
            self.ratio = 1.0
        self._depth_ranges = self._compute_depth_ranges()

    def _compute_depth_ranges(self):
        """Percentile 2/98 of sparse-point depths per image, widened by
        0.8x/1.2x (reference :509-525); cached to depth_range.pkl."""
        import pickle
        cache = f"{self.root_dir}/depth_range.pkl"
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                return pickle.load(f)
        pts = colmap_io.read_points3d_binary(
            f"{self._sparse_dir}/points3D.bin")
        points = np.asarray([v.xyz for v in pts.values()], np.float32)
        ranges = {}
        for img_id in self.img_ids:
            pose = self.get_pose(img_id)
            z = (pose[:, :3] @ points.T + pose[:, 3:])[2]
            far = np.percentile(z.flatten(), 98) * 1.2
            near = np.percentile(z.flatten(), 2) * 0.8
            ranges[img_id] = np.asarray([near, far], np.float32)
        try:
            with open(cache, "wb") as f:
                pickle.dump(ranges, f)
        except OSError:
            pass
        return ranges

    def _name(self, img_id):
        return self.images[int(img_id)].name

    def get_image(self, img_id):
        img = _imread(f"{self.root_dir}/images/{self._name(img_id)}")[..., :3]
        if self.resolution != "raw":
            img = resize_img(img, self.ratio)
        return img

    def get_K(self, img_id):
        K = self.cameras[
            self.images[int(img_id)].camera_id].K().astype(np.float32)
        if self.resolution != "raw":
            K = (np.diag([self.ratio, self.ratio, 1.0]) @ K).astype(
                np.float32)
        return K

    def get_pose(self, img_id):
        return self.images[int(img_id)].pose34().astype(np.float32)

    def get_img_ids(self, check_depth_exist=False):
        if check_depth_exist:
            return [i for i in self.img_ids
                    if self._depth_path(i) is not None]
        return self.img_ids

    def _depth_path(self, img_id):
        name = self._name(img_id)
        for base in ("dense", "colmap/dense"):
            fn = (f"{self.root_dir}/{base}/stereo/depth_maps/"
                  f"{name}.geometric.bin")
            if os.path.exists(fn):
                return fn
        return None

    def get_depth(self, img_id):
        fn = self._depth_path(img_id)
        if fn is None:
            return None
        depth = colmap_io.read_array(fn).astype(np.float32)
        if self.resolution != "raw":
            h, w = depth.shape
            depth = cv2.resize(
                depth, (int(w * self.ratio), int(h * self.ratio)),
                interpolation=cv2.INTER_NEAREST)
        return depth

    def get_mask(self, img_id):
        img = self.get_image(img_id)
        return np.ones(img.shape[:2], dtype=bool)

    def get_depth_range(self, img_id):
        return self._depth_ranges[img_id].copy()


name2database = {
    "nerf_synthetic": NeRFSyntheticDatabase,
    "llff_colmap": LLFFColmapDatabase,
    "dtu_test": DTUTestDatabase,
    "example": ExampleDatabase,
}


def parse_database_name(database_name: str) -> BaseDatabase:
    """(reference dataset/database.py:983-1003)"""
    name2database_all = dict(name2database)
    try:
        from neuray_tpu.data import train_databases
        name2database_all.update(train_databases.name2database_train)
    except ImportError:
        pass
    dataset_type = database_name.split("/")[0]
    if dataset_type in name2database_all:
        return name2database_all[dataset_type](database_name)
    raise NotImplementedError(f"unknown dataset type {dataset_type}")


# fixed NeRF-synthetic validation views (reference asset.py:46)
nerf_syn_val_ids = ["val-r_39", "val-r_2", "val-r_94", "val-r_62",
                    "val-r_23", "val-r_36"]


def get_database_split(database: BaseDatabase, split_type: str = "val"):
    """Val/test splits per dataset family (reference :1005-1044).

    Returns (ref_ids, que_ids). 'val'/'test' restrict refs to views with
    depth; the '_all' suffix ('val_all'/'test_all') lifts that.
    """
    name = database.database_name

    if split_type.startswith("val") or split_type.startswith("test"):
        splits = split_type.split("_")
        depth_valid = not (len(splits) > 1 and splits[1] == "all")
        is_test = split_type.startswith("test")
        if name.startswith("nerf_synthetic"):
            ref_ids = [i for i in database.get_img_ids(depth_valid)
                       if i.startswith("tr")]
            if is_test:
                que_ids = [i for i in database.get_img_ids()
                           if i.startswith("te")]
            else:
                que_ids = list(nerf_syn_val_ids)
        elif name.startswith("llff"):
            que_ids = database.get_img_ids()[::8]
            ref_ids = [i for i in database.get_img_ids(depth_valid)
                       if i not in set(que_ids)]
        elif name.startswith("dtu_test"):
            que_ids = database.get_img_ids()[3:-3:8]
            ref_ids = [i for i in database.get_img_ids(depth_valid)
                       if i not in set(que_ids)]
        else:
            que_ids = database.get_img_ids()[::8]
            ref_ids = [i for i in database.get_img_ids(depth_valid)
                       if i not in set(que_ids)]
    elif split_type.startswith("example"):
        import random as _random
        _, split_num = split_type.split("_")
        ref_ids = list(database.get_img_ids())
        _random.seed(1234)
        _random.shuffle(ref_ids)
        que_ids = ref_ids[:int(split_num)]
        ref_ids = ref_ids[int(split_num):]
    else:
        raise NotImplementedError(split_type)
    return ref_ids, que_ids
