"""FtTrainer smoke: a few steps from scratch on a fabricated scene, with
validation + checkpointing."""
import os

import numpy as np
import cv2
import json
import pytest


@pytest.fixture(scope="module")
def fake_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    scene = root / "nerf_synthetic" / "toy"
    rng = np.random.RandomState(0)

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

    make("train", [f"r_{i}" for i in range(8)])
    make("val", ["r_39", "r_2", "r_94", "r_62", "r_23", "r_36"])
    make("test", ["r_0"])
    return str(root)


def test_ft_trainer_runs(fake_scene, tmp_path, monkeypatch):
    from neuray_tpu.data import database as D
    monkeypatch.setattr(D, "DATA_ROOT", fake_scene)
    from neuray_tpu.train.ft_trainer import FtTrainer

    cfg = {
        "name": "ft_smoke",
        "database_name": "nerf_synthetic/toy/black_800",
        "database_split": "val_all",
        "gen_cfg": None,
        "use_validation": True,
        "validate_initialization": False,
        "neighbor_view_num": 3,
        "train_ray_num": 16,
        "ray_feats_res": [8, 8],
        "ray_feats_dim": 32,
        "use_self_hit_prob": True,
        "use_hierarchical_sampling": False,
        "depth_sample_num": 8,
        "ray_batch_num": 64,
        "ray_mask_point_num": 4,
        "dist_decoder_cfg": {"use_vis": False},
        "loss": ["render", "consist"],
        "use_ray_mask": True,
        "val_metric": ["psnr_ssim"],
        "key_metric_name": "psnr_nr",
        "total_step": 3,
        "train_log_step": 2,
        "val_interval": 3,
        "save_interval": 3,
        "output_root": str(tmp_path),
    }
    trainer = FtTrainer(cfg)
    params = trainer.run()
    assert os.path.exists(f"{trainer.model_dir}/ckpt")
    import jax
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(params))
    with open(f"{trainer.model_dir}/val.txt") as f:
        assert "psnr_nr" in f.read()
