"""Every shipped YAML config parses and wires into the registries.

The reference merges flat YAML dicts over per-class default_cfg dicts
at runtime (reference utils/base_utils.py:316-318), so a typo'd key or
registry name only surfaces mid-run; this suite front-loads that check
for every file under configs/.
"""
import glob
import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"),
              recursive=True))


def _load(path):
    from neuray_tpu.utils.config import load_cfg
    return load_cfg(path)


def test_configs_discovered():
    assert len(CONFIGS) >= 20


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_config_parses_and_builds_render_cfg(path):
    from neuray_tpu.models.renderer import RenderConfig
    cfg = _load(path)
    assert isinstance(cfg, dict) and cfg, path
    assert "name" in cfg, f"{path}: every config needs a name"
    # every config must build a RenderConfig without error, with the
    # typed fields landing as the right types
    rc = RenderConfig.from_cfg(cfg)
    assert rc.depth_sample_num > 0
    assert rc.init_diff_scale >= 1
    if "init_net_type" in cfg:
        from neuray_tpu.models.init_net import name2init_net
        assert cfg["init_net_type"] in name2init_net, path


@pytest.mark.parametrize(
    "path",
    [p for p in CONFIGS if f"{os.sep}train{os.sep}" in p],
    ids=[os.path.relpath(p, REPO) for p in CONFIGS
         if f"{os.sep}train{os.sep}" in p])
def test_train_config_registry_names(path):
    from neuray_tpu.data.train_dataset import name2dataset
    from neuray_tpu.train.lr import name2lr_manager
    cfg = _load(path)
    if "lr_type" in cfg:
        assert cfg["lr_type"] in name2lr_manager, path
    if "train_dataset_type" in cfg:
        assert cfg["train_dataset_type"] in name2dataset, path
    for key in ("total_step", "val_interval"):
        if key in cfg:
            assert isinstance(cfg[key], int) and cfg[key] > 0, (path, key)


def test_eval_profile_reuses_base_checkpoint():
    """The fast eval profile must point at the base config's checkpoint
    (eval-time knobs don't change the parameter tree)."""
    fast = _load(os.path.join(
        REPO, "configs", "gen", "neuray_gen_depth_fast.yaml"))
    base = _load(os.path.join(
        REPO, "configs", "gen", "neuray_gen_depth.yaml"))
    assert fast.get("load_ckpt_name") == base["name"]


def test_fast_train_profile_matches_base_hyperparams():
    """neuray_gen_depth_train_fast differs from the parity config only
    in name + init_net_cfg.diff_scale (the measured 4.4x step win)."""
    base = _load(os.path.join(
        REPO, "configs", "train", "gen", "neuray_gen_depth_train.yaml"))
    fast = _load(os.path.join(
        REPO, "configs", "train", "gen",
        "neuray_gen_depth_train_fast.yaml"))
    assert fast["init_net_cfg"] == {"diff_scale": 2}
    fast = {k: v for k, v in fast.items()
            if k not in ("name", "init_net_cfg")}
    base = {k: v for k, v in base.items() if k != "name"}
    assert fast == base
