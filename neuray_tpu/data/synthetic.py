"""Analytic synthetic scenes: diffuse unit sphere at the origin.

No reference counterpart — the reference has no test suite or synthetic
data (SURVEY.md §4). These fabricated scenes back the test pyramid, the
driver entry points, bench.py and the CLI self-checks: exact camera
geometry + analytic depth lets every pipeline stage run with zero
datasets on disk.

Conventions match the data layer: channels-last, poses [3,4] OpenCV
world->cam, coords (x, y) float32.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

# cameras on a radius-4 shell around a unit sphere: every z-depth lies
# safely inside [2.5, 5.5]
RADIUS = 4.0
DEPTH_RANGE = (2.5, 5.5)


def look_at_camera(rng: np.random.RandomState, h: int, w: int,
                   radius: float = RADIUS):
    """Random camera on a radius shell looking at the origin.
    Returns (pose [3,4] world->cam, K [3,3])."""
    d = rng.randn(3)
    d = d / np.linalg.norm(d)
    center = d * radius
    z = -d  # optical axis towards the origin
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(up, z)) > 0.98:
        up = np.array([0.0, 1.0, 0.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0)  # world->cam rows
    t = -R @ center
    pose = np.concatenate([R, t[:, None]], 1).astype(np.float32)
    K = np.array([[w * 1.2, 0, w / 2], [0, w * 1.2, h / 2], [0, 0, 1]],
                 np.float32)
    return pose, K


def render_spheres_view(pose: np.ndarray, K: np.ndarray, h: int, w: int,
                        spheres):
    """Analytic render of a set of diffuse spheres
    (``spheres`` = iterable of (center [3], radius, palette)):
    nearest-intersection depth test per pixel.
    Returns (rgb [h,w,3] f32 0..1, zdepth [h,w] f32, mask [h,w] bool)."""
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float32)
    Kinv = np.linalg.inv(K)
    dirs_cam = pix @ Kinv.T
    R, t = pose[:, :3], pose[:, 3]
    cam = -R.T @ t
    dirs = dirs_cam @ R  # world-space ray directions per pixel

    best_t = np.full((h, w), np.inf, np.float32)
    rgb = np.zeros((h, w, 3), np.float32)
    light = np.array([0.5, 0.5, 0.7])
    a = np.sum(dirs * dirs, -1)
    for sphere in spheres:
        center, radius, palette = sphere[:3]
        textured = len(sphere) > 3 and sphere[3]
        oc = cam - np.asarray(center, np.float64)
        b = 2 * dirs @ oc
        c = oc @ oc - radius * radius
        disc = b * b - 4 * a * c
        hit_s = disc > 0
        sq = np.sqrt(np.maximum(disc, 0))
        # smallest POSITIVE root: the far root applies when the camera
        # is INSIDE the sphere (the enclosing-room scene)
        t0 = (-b - sq) / (2 * a)
        t1 = (-b + sq) / (2 * a)
        tt = np.where(t0 > 1e-3, t0, t1)
        tt = np.where(hit_s & (tt > 1e-3), tt, np.inf)
        closer = np.isfinite(tt) & (tt < best_t)
        tt_f = np.where(closer, tt, 0.0)  # keep inf out of the shading
        pts = cam[None, None] + dirs * tt_f[..., None]
        normal = (pts - np.asarray(center)) / radius
        shade = np.clip(normal @ light, 0, 1)
        col = np.stack([shade * palette[0], shade * palette[1],
                        (1 - shade) * palette[2]], -1)
        if textured:
            # procedural 3D checker so the surface carries spatial
            # detail the model must actually reconstruct (a flat room
            # would hide focus-window quality errors)
            checker = (np.floor(pts[..., 0] * 1.5)
                       + np.floor(pts[..., 1] * 1.5)
                       + np.floor(pts[..., 2] * 1.5)) % 2
            col = (col + 0.25) * (0.5 + 0.5 * checker[..., None])
        rgb = np.where(closer[..., None], np.clip(col, 0, 1), rgb)
        best_t = np.where(closer, tt, best_t)

    hit = np.isfinite(best_t)
    tt = np.where(hit, best_t, 0.0)
    pts = cam[None, None] + dirs * tt[..., None]
    zdepth = np.where(hit, pts @ R[2] + t[2], 0).astype(np.float32)
    return rgb.astype(np.float32), zdepth, hit


UNIT_SPHERE = (((0.0, 0.0, 0.0), 1.0, (1.0, 0.5, 1.0)),)


def render_sphere_view(pose: np.ndarray, K: np.ndarray, h: int, w: int):
    """Analytic render of the diffuse unit sphere.
    Returns (rgb [h,w,3] f32 0..1, zdepth [h,w] f32, mask [h,w] bool)."""
    return render_spheres_view(pose, K, h, w, UNIT_SPHERE)


def make_blob_spheres(rng: np.random.RandomState, n: int = 5):
    """n spheres of varying size scattered in the unit ball, always
    including one THIN one (radius 0.08) — the hard case for a
    reduced-sample emptiness probe (silhouette misses)."""
    spheres = []
    for i in range(n):
        center = rng.randn(3)
        center = center / np.linalg.norm(center) * rng.uniform(0.15, 0.7)
        radius = 0.08 if i == 0 else rng.uniform(0.15, 0.45)
        palette = tuple(rng.uniform(0.4, 1.0, 3))
        spheres.append((tuple(center), radius, palette))
    return tuple(spheres)


ROOM_RADIUS = 8.0
ROOM_DEPTH_RANGE = (2.5, 12.5)  # cameras at 4 inside the radius-8 room


def make_room_spheres(rng: np.random.RandomState, n_inner: int = 4):
    """FULL-COVERAGE adversarial scene: the blob objects ENCLOSED by a
    textured radius-8 room sphere (cameras sit inside it at radius 4),
    so EVERY ray hits geometry and the empty-ray skip has nothing to
    skip — the scene where the speedup must come honestly from focus
    windows, not from background rays. Use with
    depth_range=ROOM_DEPTH_RANGE."""
    spheres = list(make_blob_spheres(rng, n_inner))
    spheres.append(((0.0, 0.0, 0.0), ROOM_RADIUS, (0.75, 0.7, 0.55),
                    True))
    return tuple(spheres)


def make_pan_scene_spheres():
    """Trajectory PAN scene (tools/check_trajectory_escalation.py): a
    diffuse anchor sphere on +X and a thin X of rods (chains of
    r=0.10 spheres, the blob scene's probe-killer scaled up in COUNT)
    on -X. From the radius-4 shell the two groups are ~32 deg apart —
    beyond the default K's ~26 deg half-diagonal FOV — so a camera can
    hold the anchor while the rods are genuinely OUTSIDE the frustum,
    then pan them in. The rod radius sits between the 8-probe depth
    spacing (3.0/8 = 0.375: ~half the crossing rays stepped over) and
    the 16/32-probe spacing (<= 0.19: caught), so the false-skip audit
    must fail at probe 8 and pass after escalating. The anchor radius
    is bounded by the sampleable ball: every scene point must stay
    within [near, far] = [2.5, 5.5] of every radius-4 shell camera
    (i.e. inside the 1.5-ball) or near-plane clipping starves the
    ref/query views and the model fogs (measured: a unit anchor at
    +1.1 reached x=2.1, trained 13 dB WORSE, and the fog drove every
    frame's audit to escalate). r=0.5 at +1.1 keeps the extent at 1.6
    (clipped only in a tiny +X camera cap). The demo must run at
    >=800px / probe_stride 2: the anchor's thin-chord silhouette ring
    (the band where the chord is shorter than the 8-probe depth
    spacing) is a few px wide, and a 400px stride-2 probe grid
    undersamples it enough to fail the 2% audit even on a 33 dB
    model — at 800px the same geometry audits at the bench sphere's
    ~0.5% and probe 8 is accepted. Deterministic (no rng): the
    geometry IS the experiment.

    The anchor is DIFFUSE, not checker-textured: per-rung audit
    trails on a 33 dB checker-anchor model read 7.4% / 4.9% / 0.2%
    false-skip at probe 8/16/32 on the rod-FREE view — the trained
    density around a textured surface carries thin shells that only
    the 32-sample probe resolves, so every frame escalated to 32 at
    frame 0 and the rods' mid-trajectory entry had nothing left to
    escalate. A diffuse sphere is the regime the 8-sample probe is
    measured to pass (bench sphere: 0.44%, ARCHITECTURE auto
    table). The checker stays on the room scene, where hiding
    focus-window errors is the point."""
    anchor = ((1.1, 0.0, 0.0), 0.5, (0.9, 0.6, 0.5))
    ts = np.linspace(-0.5, 0.5, 13)
    rods = tuple(
        ((-1.25, float(t / np.sqrt(2)), float(sgn * t / np.sqrt(2))),
         0.10, (0.5, 0.9, 0.6))
        for sgn in (1.0, -1.0) for t in ts
        if not (sgn < 0 and abs(t) < 1e-9))  # dedupe the center
    return (anchor,) + rods


def make_sphere_scene(rng: np.random.RandomState, rfn: int, h: int,
                      w: int, spheres=UNIT_SPHERE,
                      depth_range=DEPTH_RANGE) -> Dict[str, np.ndarray]:
    """rfn reference views of the sphere(s), in the renderer's ref
    schema: {imgs [rfn,h,w,3], poses [rfn,3,4], Ks [rfn,3,3],
    depth_range [rfn,2], depth [rfn,h,w,1]}. Depth is the exact z-depth
    (the "COLMAP estimate" for the depth init net). Pass
    ``spheres=make_blob_spheres(rng)`` for the harder multi-object
    scene."""
    imgs, poses, Ks, depths = [], [], [], []
    for _ in range(rfn):
        pose, K = look_at_camera(rng, h, w)
        rgb, zdepth, _ = render_spheres_view(pose, K, h, w, spheres)
        imgs.append(rgb)
        poses.append(pose)
        Ks.append(K)
        depths.append(zdepth)
    return {
        "imgs": np.stack(imgs),
        "poses": np.stack(poses).astype(np.float32),
        "Ks": np.stack(Ks).astype(np.float32),
        "depth_range": np.tile(np.asarray([depth_range], np.float32),
                               (rfn, 1)),
        "depth": np.stack(depths)[..., None],
    }


def make_query(rng: np.random.RandomState, h: int, w: int, rn: int,
               full_image: bool = False,
               spheres=UNIT_SPHERE,
               depth_range=DEPTH_RANGE) -> Dict[str, np.ndarray]:
    """One query view in the renderer's que schema: {coords [1,rn,2],
    poses [1,3,4], Ks [1,3,3], depth_range [1,2], imgs [1,h,w,3]}.
    full_image=True emits the full pixel grid instead of rn random
    pixels."""
    pose, K = look_at_camera(rng, h, w)
    rgb, _, _ = render_spheres_view(pose, K, h, w, spheres)
    if full_image:
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        coords = np.stack([xs, ys], -1).reshape(1, -1, 2)
    else:
        coords = np.stack([rng.randint(0, w, rn),
                           rng.randint(0, h, rn)], -1)[None]
    return {
        "coords": coords.astype(np.float32),
        "poses": pose[None],
        "Ks": K[None],
        "depth_range": np.asarray([depth_range], np.float32),
        "imgs": rgb[None],
    }
