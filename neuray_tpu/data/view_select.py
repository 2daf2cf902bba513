"""Working-view selection by nearest camera centers.

Behavioral parity: reference utils/view_select.py
(compute_nearest_camera_indices :7, select_working_views :18,
select_working_views_db :80).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


def _camera_centers(poses) -> np.ndarray:
    """World-space camera centers from [n,3,4] world->cam poses."""
    return np.asarray([-pose[:, :3].T @ pose[:, 3] for pose in poses])


def compute_nearest_camera_indices(database, que_ids: List[str],
                                   ref_ids: Optional[List[str]] = None
                                   ) -> np.ndarray:
    """For each query image id, ref indices sorted by camera distance
    (reference view_select.py:7-16). [len(que_ids), len(ref_ids)]."""
    if ref_ids is None:
        ref_ids = que_ids
    ref_pts = _camera_centers([database.get_pose(i) for i in ref_ids])
    que_pts = _camera_centers([database.get_pose(i) for i in que_ids])
    dists = np.linalg.norm(ref_pts[None] - que_pts[:, None], 2, 2)
    return np.argsort(dists, 1)


def select_working_views(ref_poses, que_poses, work_num: int,
                         exclude_self: bool = False) -> np.ndarray:
    """Nearest work_num ref views per query pose
    (reference view_select.py:18-27). Returns [qn, work_num] indices."""
    ref_pts = _camera_centers(ref_poses)
    que_pts = _camera_centers(que_poses)
    dists = np.linalg.norm(ref_pts[None] - que_pts[:, None], 2, 2)
    ids = np.argsort(dists, 1)
    if exclude_self:
        return ids[:, 1:work_num + 1]
    return ids[:, :work_num]


def select_working_views_db(database, ref_ids, que_poses, work_num: int,
                            exclude_self: bool = False) -> np.ndarray:
    """select_working_views over database ids
    (reference view_select.py:80-87). Returns [qn, work_num] img ids."""
    ref_ids = database.get_img_ids() if ref_ids is None else ref_ids
    ref_poses = np.asarray([database.get_pose(i) for i in ref_ids])
    ref_ids = np.asarray(ref_ids)
    idx = select_working_views(ref_poses, que_poses, work_num, exclude_self)
    return ref_ids[idx]
