"""Trajectory-robust auto skip-mode: the CLI audits EVERY frame, so a
pose later in the trajectory that reveals geometry the first frame's
probe missed (audited false-skip above tol) provably re-escalates the
probe sample count instead of inheriting a stale first-frame accept.

The probe-physics failure itself (an 8-sample probe stepping over a
thin structure) is measured on real weights in
tools/check_skip_quality.py / docs/ARCHITECTURE.md; here the audit
outcome is scripted per frame so the CONTROL LOGIC (per-frame audit,
sticky-up escalation, no ladder re-climb on stable frames, fallback
stickiness) is tested deterministically end-to-end through
render.render_video_gen.
"""
import json
import os

import numpy as np
import pytest


@pytest.fixture()
def toy_cli_env(tmp_path, monkeypatch):
    """Fabricated nerf_synthetic scene + random-init ckpt + cwd=tmp."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    import yaml
    from tools.selfcheck_render import fabricate_scene
    from neuray_tpu.data import database as D
    from neuray_tpu.models.renderer import NeurayRenderer, RenderConfig
    from neuray_tpu.data.synthetic import make_sphere_scene, make_query

    root = str(tmp_path / "data")
    monkeypatch.setattr(D, "DATA_ROOT", root)
    monkeypatch.chdir(tmp_path)
    fabricate_scene(root, 32)

    cfg_dict = {
        "name": "reaudit_gen",
        "network": "neuray_gen",
        "init_net_type": "depth",
        "use_hierarchical_sampling": True,
        "depth_sample_num": 16,
        "fine_depth_sample_num": 16,
        "ray_batch_num": 1024,
        "dist_decoder_cfg": {"use_vis": False},
        "fine_dist_decoder_cfg": {"use_vis": False},
        "skip_empty_rays": True,
        "skip_empty_threshold": 0.05,
        "skip_mode": "auto",
        "probe_sample_num": 8,
    }
    cfg_path = str(tmp_path / "reaudit_gen.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    renderer = NeurayRenderer(RenderConfig.from_cfg(cfg_dict))
    rng = np.random.RandomState(0)
    ref = {k: jnp.asarray(v) for k, v in
           make_sphere_scene(rng, 4, 32, 32).items()}
    que = {k: jnp.asarray(v) for k, v in
           make_query(rng, 32, 32, 16).items()}
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, que, True)
    ocp.PyTreeCheckpointer().save(
        str(tmp_path / "data" / "model" / "reaudit_gen" / "ckpt"),
        {"step": np.asarray(0),
         "best_metric": np.asarray(0.0, np.float32),
         "params": jax.device_get(params)}, force=True)
    return cfg_path


def test_auto_mode_reescalates_mid_trajectory(toy_cli_env, monkeypatch):
    import neuray_tpu.models.renderer as R
    from render import render_video_gen

    # scripted audit: the FIRST psn-8 audit (frame 0) passes; every
    # later psn-8 audit (frame 1+ — "new geometry appeared") fails;
    # psn >= 16 always passes. Records (psn, verdict) per call.
    calls = []

    def fake_audit(renderer, params, ref_c, que, skip_idx, threshold,
                   sample_rays=2048, seed=0):
        psn = renderer.cfg.probe_sample_num
        n8 = sum(1 for p, _ in calls if p == 8)
        fs = 0.5 if (psn == 8 and n8 >= 1) else 0.0
        calls.append((psn, fs))
        return fs

    monkeypatch.setattr(R, "estimate_false_skip", fake_audit)

    render_video_gen("nerf_synthetic/toy/black_800", toy_cli_env,
                     "eval", None, False, 1024, 0, 3)

    out_dir = "data/render/nerf_synthetic_toy_black_800/reaudit_gen-eval"
    with open(f"{out_dir}/auto_audit.jsonl") as f:
        log = [json.loads(line) for line in f]
    by_frame = {e["frame"]: e for e in log}

    # frame 0 accepted the base 8-sample probe
    assert by_frame[0]["probe_sample_num"] == 8
    assert by_frame[0]["fallback"] is None
    # frame 1's audit failed psn 8 -> RE-ESCALATED to 16
    assert by_frame[1]["probe_sample_num"] == 16
    assert by_frame[1]["fallback"] is None
    # frame 2 STARTED from the sticky 16 (no ladder re-climb: exactly
    # two psn-8 audits ever ran — frame 0's accept and frame 1's fail)
    assert by_frame[2]["probe_sample_num"] == 16
    assert sum(1 for p, _ in calls if p == 8) == 2
    # every frame logged an audited false-skip rate
    assert sorted(by_frame) == [0, 1, 2]
    for qi in range(3):
        assert os.path.exists(f"{out_dir}/{qi}-nr_fine.jpg")
