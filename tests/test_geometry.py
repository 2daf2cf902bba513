"""Unit + golden-parity tests for ops.geometry against independent numpy
math and the reference formulas (re-derived, not imported)."""
import numpy as np
import jax.numpy as jnp

from neuray_tpu.ops import geometry as G


def test_pose_inverse_roundtrip(rng, cameras):
    pose, _ = cameras(rng)
    inv = np.asarray(G.pose_inverse(jnp.asarray(pose)))
    # compose: should give identity
    R, t = pose[:, :3], pose[:, 3]
    Ri, ti = inv[:, :3], inv[:, 3]
    np.testing.assert_allclose(Ri @ R, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(Ri @ t + ti, np.zeros(3), atol=1e-5)


def test_coords2rays_points_project_back(rng, cameras):
    """A point sampled along a pixel's ray must project back to that pixel
    with z-depth equal to the sampled depth."""
    h, w = 48, 64
    pose, K = cameras(rng, h, w)
    coords = (rng.rand(1, 17, 2) * [w - 1, h - 1]).astype(np.float32)
    depth = (rng.rand(1, 17, 5).astype(np.float32) * 3 + 2)

    pts, que_dir = G.depth2points(
        jnp.asarray(coords), jnp.asarray(pose[None]), jnp.asarray(K[None]),
        jnp.asarray(depth))
    pts = np.asarray(pts).reshape(-1, 3)

    # project with plain numpy
    cam = (pose[:, :3] @ pts.T + pose[:, 3:]).T
    z = cam[:, 2]
    uv = (K @ cam.T).T
    uv = uv[:, :2] / uv[:, 2:]
    np.testing.assert_allclose(z, depth.reshape(-1), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(uv, np.tile(coords.reshape(-1, 1, 2), (1, 5, 1))
                               .reshape(-1, 2), rtol=1e-3, atol=2e-2)
    # que_dir: unit, pointing back to camera center
    qd = np.asarray(que_dir).reshape(-1, 3)
    np.testing.assert_allclose(np.linalg.norm(qd, axis=-1), 1.0, atol=1e-5)
    center = -pose[:, :3].T @ pose[:, 3]
    to_cam = center[None] - pts
    cos = np.sum(qd * to_cam, -1) / np.linalg.norm(to_cam, axis=-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


def test_project_points_coords(rng, cameras):
    h, w = 48, 64
    poses, Ks = zip(*[cameras(rng, h, w) for _ in range(3)])
    poses, Ks = np.stack(poses), np.stack(Ks)
    pts = rng.randn(50, 3).astype(np.float32) * 0.5

    pts2d, valid, depth = G.project_points_coords(
        jnp.asarray(pts), jnp.asarray(poses), jnp.asarray(Ks))
    pts2d, valid, depth = map(np.asarray, (pts2d, valid, depth))

    for v in range(3):
        cam = (poses[v, :, :3] @ pts.T + poses[v, :, 3:]).T
        uv = (Ks[v] @ cam.T).T
        expect = uv[:, :2] / uv[:, 2:]
        np.testing.assert_allclose(pts2d[v], expect, rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(depth[v, :, 0], cam[:, 2], rtol=1e-4, atol=1e-4)
    assert valid.all()  # all cameras at radius 4 looking at origin


def test_project_points_ref_views_mask(rng, cameras):
    h, w = 48, 64
    pose, K = cameras(rng, h, w)
    center = -pose[:, :3].T @ pose[:, 3]
    # a point far off the optical axis projects out of image bounds
    off_axis = center + pose[2, :3] * 2.0 + pose[0, :3] * 10.0
    # a point at the camera plane (degenerate depth) is masked
    degenerate = center + pose[0, :3] * 1.0  # z-depth exactly 0
    front = np.zeros(3, np.float32)  # origin is in view
    pts = np.stack([off_axis, degenerate, front]).astype(np.float32)
    _, _, _, mask = G.project_points_ref_views(
        jnp.asarray(pose[None]), jnp.asarray(K[None]), h, w, jnp.asarray(pts))
    mask = np.asarray(mask)
    assert not mask[0, 0]
    assert not mask[0, 1]
    assert mask[0, 2]


def test_project_points_directions_unit_toward_camera(rng, cameras):
    pose, _ = cameras(rng)
    pts = rng.randn(10, 3).astype(np.float32)
    d = np.asarray(G.project_points_directions(
        jnp.asarray(pose[None]), jnp.asarray(pts)))[0]
    center = -pose[:, :3].T @ pose[:, 3]
    expect = -(pts - center[None])
    expect /= np.linalg.norm(expect, axis=-1, keepdims=True)
    np.testing.assert_allclose(d, expect, atol=1e-5)
