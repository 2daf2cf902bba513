"""FT initialization from a generalization checkpoint: ray feats come
from the gen init net per view; shared module weights are copied."""
import json
import os

import numpy as np
import cv2
import yaml
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def scene_root(tmp_path, rng):
    root = tmp_path / "data"
    scene = root / "nerf_synthetic" / "toy"

    def make(split, names):
        (scene / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for k, name in enumerate(names):
            img = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
            img[:, :, 3] = 255
            cv2.imwrite(str(scene / split / f"{name}.png"), img)
            ang = 2 * np.pi * k / max(len(names), 1)
            c = np.asarray([np.cos(ang) * 4, np.sin(ang) * 4, 1.5])
            z = -c / np.linalg.norm(c)
            up = np.asarray([0.0, 0.0, 1.0])
            x = np.cross(up, z); x /= np.linalg.norm(x)
            y = np.cross(z, x)
            R_gl = np.diag([1, -1, -1]) @ np.stack([x, y, z], 0)
            c2w = np.eye(4)
            c2w[:3, :3] = R_gl.T
            c2w[:3, 3] = c
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": c2w.tolist()})
        with open(scene / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)

    make("train", [f"r_{i}" for i in range(6)])
    make("val", ["r_39", "r_2", "r_94", "r_62", "r_23", "r_36"])
    make("test", ["r_0"])
    return tmp_path


def test_ft_init_from_gen_ckpt(scene_root, monkeypatch, rng):
    from neuray_tpu.data import database as D
    monkeypatch.setattr(D, "DATA_ROOT", str(scene_root / "data"))
    monkeypatch.chdir(scene_root)

    from neuray_tpu.models.renderer import NeurayRenderer, RenderConfig
    from neuray_tpu.models.ft import FtRenderer
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query
    import orbax.checkpoint as ocp

    gen_cfg = {
        "name": "toy_gen",
        "network": "neuray_gen",
        "init_net_type": "depth",
        "use_hierarchical_sampling": False,
        "depth_sample_num": 8,
        "ray_batch_num": 16,
        "dist_decoder_cfg": {"use_vis": False},
        "ray_mask_point_num": 4,
    }
    gen_cfg_path = str(scene_root / "gen.yaml")
    with open(gen_cfg_path, "w") as f:
        yaml.safe_dump(gen_cfg, f)

    # random-init gen params and save a ckpt
    renderer = NeurayRenderer(RenderConfig.from_cfg(gen_cfg))
    r = np.random.RandomState(0)
    ref = jax.tree.map(jnp.asarray, make_sphere_scene(r, 3, 32, 32))
    que = jax.tree.map(jnp.asarray, make_query(r, 32, 32, 8))
    gen_params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, que, True)
    ocp.PyTreeCheckpointer().save(
        os.path.abspath("data/model/toy_gen/ckpt"),
        {"step": np.asarray(0), "best_metric": np.asarray(0.0, np.float32),
         "params": jax.device_get(gen_params)}, force=True)

    ft = FtRenderer({
        "database_name": "nerf_synthetic/toy/black_800",
        "database_split": "val_all",
        "gen_cfg": gen_cfg_path,
        "init_view_num": 4,
        "neighbor_view_num": 3,
        "use_hierarchical_sampling": False,
        "depth_sample_num": 8,
        "ray_batch_num": 16,
        "ray_mask_point_num": 4,
        "dist_decoder_cfg": {"use_vis": False},
    })
    params = ft.init_params()
    n = len(ft.ref_ids)
    assert params["ray_feats"].shape == (n, 8, 8, 32)
    assert np.isfinite(np.asarray(params["ray_feats"])).all()
    # module weights copied verbatim from the gen model
    got = np.asarray(
        params["net"]["params"]["dist_decoder"]["mean_decoder"]["fc0"]
        ["kernel"])
    want = np.asarray(
        gen_params["params"]["dist_decoder"]["mean_decoder"]["fc0"]
        ["kernel"])
    np.testing.assert_array_equal(got, want)
    assert "init_net" not in params["net"]["params"]
