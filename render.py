"""Rendering CLI: feed-forward (gen) and finetuned (ft) novel-view
rendering with resume-on-rerun.

Parity: reference render.py (flags :196-214, render_video_gen :68-153,
render_video_ft :155-194; save conventions {qi}-nr.jpg / {qi}-nr_fine.jpg
+ GT dump for eval poses).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from pathlib import Path

import numpy as np
import cv2

import jax
import jax.numpy as jnp

from neuray_tpu.utils.config import load_cfg
from neuray_tpu.models.renderer import (
    NeurayRenderer, RenderConfig, make_scene_encode_fn,
    make_ray_render_fn, render_frame_skip_empty,
    render_frame_probe_skip, render_frame_probe_focus,
    render_frame_probe_auto)
from neuray_tpu.parallel.sharding import make_mesh, make_sharded_render_fn

# stay below the ~60s single-program limit observed on tunneled TPU
# workers; segmenting costs <2% dispatch overhead
RAYS_PER_CALL = 327680


def segmented_render(render_fn, params, ref, que, src=None, split=None,
                     ref_c=None):
    """Render a full frame in bounded-ray device calls.

    With ``split=(encode_fn, rays_fn)`` (single-device path) the scene
    is encoded ONCE and the encoded ref is reused by every segment —
    the conv encoders + gather-map build are per-scene work, not
    per-segment work. Pass ``ref_c`` (a previous ``encode_fn`` result
    for the same refs) to skip the encode entirely — the CLI caches it
    across query poses that select the same working views."""
    if split is not None:
        encode_fn, rays_fn = split
        if ref_c is None:
            ref_c = encode_fn(params, ref, src)

        def call(sub):
            return rays_fn(params, ref_c, sub)
    else:
        def call(sub):
            return render_fn(params, ref, sub, src)

    coords = que["coords"]
    n = coords.shape[1]
    if n <= RAYS_PER_CALL:
        return jax.device_get(call(que))
    outs = []
    for i in range(0, n, RAYS_PER_CALL):
        sub = dict(que)
        chunk = coords[:, i:i + RAYS_PER_CALL]
        pad = RAYS_PER_CALL - chunk.shape[1]
        if pad:
            chunk = jnp.pad(chunk, ((0, 0), (0, pad), (0, 0)), mode="edge")
        sub["coords"] = chunk
        outs.append(jax.device_get(call(sub)))
    merged = jax.tree.map(lambda *xs: np.concatenate(xs, axis=1), *outs)
    return jax.tree.map(lambda x: x[:, :n], merged)
from neuray_tpu.data.database import parse_database_name, get_database_split
from neuray_tpu.data.imgs_info import (
    build_imgs_info, build_render_imgs_info, imgs_info_slice)
from neuray_tpu.data.train_dataset import build_src_imgs_info_select
from neuray_tpu.data.view_select import select_working_views_db
from neuray_tpu.data.render_poses import get_render_poses
from neuray_tpu.train.metrics import color_map_backward


def prepare_render_info(database, pose_type, pose_fn, use_depth):
    """(reference render.py:18-47)"""
    if pose_type.startswith("eval"):
        split_name = "test" if use_depth else "test_all"
        ref_ids, render_ids = get_database_split(database, split_name)
        que_Ks = np.asarray([database.get_K(i) for i in render_ids],
                            np.float32)
        que_poses = np.asarray([database.get_pose(i) for i in render_ids],
                               np.float32)
        que_shapes = np.asarray(
            [database.get_image(i).shape[:2] for i in render_ids])
        que_depth_ranges = np.asarray(
            [database.get_depth_range(i) for i in render_ids], np.float32)
    else:
        ref_ids = (database.get_img_ids(check_depth_exist=True)
                   if use_depth else database.get_img_ids())
        que_poses = get_render_poses(database, pose_type, pose_fn)
        k0 = database.get_img_ids()[0]
        que_Ks = np.tile(database.get_K(k0)[None], (len(que_poses), 1, 1))
        h, w = database.get_image(k0).shape[:2]
        que_shapes = np.tile(np.asarray([[h, w]]), (len(que_poses), 1))
        ranges = np.asarray(
            [database.get_depth_range(i) for i in database.get_img_ids()],
            np.float32)
        near = np.min(ranges[:, 0])
        far = np.max(ranges[:, 1])
        que_depth_ranges = np.tile(
            np.asarray([[near, far]], np.float32), (len(que_poses), 1))
        render_ids = None
    return ref_ids, render_ids, que_poses, que_Ks, que_shapes, \
        que_depth_ranges


def save_renderings(output_dir, qi, render_info, h, w):
    """(reference render.py:49-57)"""
    suffix2name = {"nr": "nr", "nr_fine": "nr_fine", "dr": "dr",
                   "dr_fine": "dr_fine"}
    for suffix, name in suffix2name.items():
        key = f"pixel_colors_{suffix}"
        if key in render_info:
            img = color_map_backward(
                np.asarray(render_info[key]).reshape(h, w, 3))
            cv2.imwrite(f"{output_dir}/{qi}-{name}.jpg", img[:, :, ::-1])


def save_depth(output_dir, qi, render_info, h, w, depth_range):
    """(reference render.py:58-66) inverse-depth visualization."""
    for key, name in (("render_depth", "depth"),
                      ("render_depth_fine", "depth_fine")):
        if key in render_info:
            depth = np.asarray(render_info[key]).reshape(h, w)
            near, far = depth_range
            inv = 1.0 / np.maximum(depth, 1e-5)
            inv = (inv - 1 / far) / max(1 / near - 1 / far, 1e-8)
            img = (np.clip(inv, 0, 1) * 255).astype(np.uint8)
            cv2.imwrite(f"{output_dir}/{qi}-{name}.png", img)


def render_video_gen(database_name, cfg_fn, pose_type, pose_fn,
                     render_depth, ray_num, rb, re):
    cfg = load_cfg(cfg_fn)
    render_cfg = RenderConfig.from_cfg(
        {**cfg, "ray_batch_num": ray_num, "render_depth": render_depth})
    renderer = NeurayRenderer(render_cfg)

    import orbax.checkpoint as ocp
    # load_ckpt_name: eval profiles (e.g. neuray_gen_depth_fast.yaml)
    # reuse another config's trained checkpoint — eval-time knobs do
    # not change the parameter tree
    ckpt_name = cfg.get("load_ckpt_name", cfg["name"])
    ckpt_dir = os.path.abspath(f'data/model/{ckpt_name}/ckpt_best')
    if not os.path.exists(ckpt_dir):
        ckpt_dir = os.path.abspath(f'data/model/{ckpt_name}/ckpt')
    params = ocp.PyTreeCheckpointer().restore(ckpt_dir)["params"]

    database = parse_database_name(database_name)
    use_depth = render_cfg.init_net_type == "depth"
    (ref_ids_all, render_ids, que_poses, que_Ks, que_shapes,
     que_depth_ranges) = prepare_render_info(
        database, pose_type, pose_fn, use_depth)
    ref_ids_list = select_working_views_db(
        database, ref_ids_all, que_poses, 8)

    output_dir = (f'data/render/{database_name.replace("/", "_")}/'
                  f'{cfg["name"]}-{pose_type}')
    Path(output_dir).mkdir(exist_ok=True, parents=True)

    mesh = make_mesh()
    multi = mesh.devices.size > 1
    keep = ["pixel_colors_nr", "pixel_colors_nr_fine"]
    if render_depth:
        keep += ["render_depth", "render_depth_fine"]
    # the scene encode is one (replicated) program either way; the ray
    # phase shards over the mesh when devices > 1 — segments and query
    # poses with the same working views share one encode in both cases
    encode_fn = make_scene_encode_fn(renderer)
    if multi:
        rays_fn = make_sharded_render_fn(renderer, mesh, tuple(keep),
                                         pre_encoded=True)
    else:
        rays_fn = make_ray_render_fn(renderer, tuple(keep))
    split = (encode_fn, rays_fn)

    skip_mode = cfg.get("skip_mode", "two_phase")
    if "skip_auto_win_tol" in cfg:
        print("NOTE: skip_auto_win_tol (hit-mass fraction) was replaced "
              "by skip_auto_win_tol_db (predicted PSNR cost, dB; "
              "default 0.05) — the old knob is ignored", flush=True)
    use_skip_empty = (cfg.get("skip_empty_rays", False)
                      and render_cfg.use_hierarchical_sampling)
    if use_skip_empty and multi and skip_mode == "two_phase":
        print("skip_mode=two_phase: coarse gate + kept fine pass shard "
              "the ray axis over the mesh (compaction host-side)",
              flush=True)

    use_src_imgs = cfg.get("use_src_imgs", False) or \
        render_cfg.init_net_type == "cost_volume"
    cv_nn_num = cfg.get("cost_volume_nn_num", 3)
    pad_interval = cfg.get("ref_pad_interval", 16)

    re = len(que_poses) if re == -1 else min(re, len(que_poses))
    accepted_psn = None      # auto skip-mode: escalated sticky-up by the
    auto_fallback = False    # per-frame audit / audit rejected all sizes
    renderer_skip = renderer
    # per-scene encode cache: working views are selected per query pose
    # (nearest cameras), so consecutive poses usually pick the SAME ref
    # set — the conv encoders + gather-map build (and the src/union
    # info assembly) are then reusable verbatim. The encode is a
    # deterministic function of (params, ref, src), so this changes
    # nothing numerically. Keyed by the ref id tuple.
    enc_key = None
    ref = src = ref_c = None
    # fresh audit log per run: append-mode writes below would otherwise
    # accumulate stale entries from prior renders into the same dir
    audit_path = f"{output_dir}/auto_audit.jsonl"
    if skip_mode in ("auto", "auto_focus") and os.path.exists(audit_path):
        os.remove(audit_path)
    for qi in range(rb, re):
        if os.path.exists(f"{output_dir}/{qi}-nr_fine.jpg"):
            continue
        ref_ids = ref_ids_list[qi]
        key = tuple(str(i) for i in ref_ids)
        if key != enc_key:
            src = None
            if use_src_imgs:
                # cost-volume init: the union of refs + their source
                # views (reference render.py:129-137)
                union_info, ref_cv_idx, ref_real_idx = \
                    build_src_imgs_info_select(database, ref_ids,
                                               ref_ids_all, cv_nn_num,
                                               pad_interval)
                ref_info = imgs_info_slice(union_info, ref_real_idx)
                ref_info["nn_ids"] = ref_cv_idx.astype(np.int64)
                src = jax.tree.map(jnp.asarray, {
                    k: union_info[k]
                    for k in ("imgs", "poses", "Ks", "depth_range")})
            else:
                ref_info = build_imgs_info(database, list(ref_ids),
                                           pad_interval, True,
                                           replace_none_depth=True)
            ref = jax.tree.map(jnp.asarray, ref_info)
            ref_c = None  # encoded lazily by the skip path below
            enc_key = key
        que_info = build_render_imgs_info(
            que_poses[qi], que_Ks[qi], que_shapes[qi], que_depth_ranges[qi])
        h, w = que_info.pop("shape")
        que = jax.tree.map(jnp.asarray, que_info)
        if use_skip_empty:
            # empty-ray skip (cfg: skip_empty_rays). skip_mode=probe
            # (default two_phase for output backward-compat): a
            # reduced-sample network probe scores rays first, then
            # coarse+fine run only on kept rays — skipped rays output
            # the empty-ray background; with two_phase the fine pass
            # alone is gated and skipped rays keep their coarse
            # estimate (speed/quality trade in
            # tools/check_skip_quality.py). Kept rays are bit-identical
            # to the full render in both modes.
            if ref_c is None:
                ref_c = encode_fn(params, ref, src)
            keep_base = ["pixel_colors_nr"]
            if render_cfg.use_dr_prediction:
                keep_base.append("pixel_colors_dr")
            if render_depth:
                keep_base.append("render_depth")
            skip_mesh = mesh if multi else None
            skip_th = cfg.get("skip_empty_threshold", 0.05)
            p_stride = cfg.get("probe_stride", 1)
            p_dilate = cfg.get("probe_dilate", 1)
            if skip_mode in ("auto", "auto_focus") and not auto_fallback:
                # self-validating probe (audits skipped rays against
                # the exact gate, escalates probe samples, two-phase
                # fallback) — no per-scene probe_sample_num tuning.
                # The audit runs on EVERY frame (it costs ~2k coarse
                # rays, ~0.3% of a frame): a trajectory whose later
                # poses reveal geometry the first frame did not
                # (thin structures between probe samples) re-escalates
                # instead of inheriting a stale accept. The accepted
                # probe size is sticky-UP: later frames START from it
                # so stable scenes never re-climb the ladder.
                out = render_frame_probe_auto(
                    renderer_skip, params, ref_c, que, threshold=skip_th,
                    keep_base=tuple(keep_base), image_hw=(h, w),
                    dilate=p_dilate, focus=skip_mode == "auto_focus",
                    tol=cfg.get("skip_auto_tol", 0.02),
                    win_tol_db=cfg.get("skip_auto_win_tol_db", 0.05),
                    win_ref_psnr=cfg.get("skip_auto_win_ref_psnr", 35.0),
                    probe_stride=p_stride, mesh=skip_mesh)
                if out["fallback"] is None:
                    if out["probe_sample_num"] != \
                            renderer_skip.cfg.probe_sample_num:
                        accepted_psn = out["probe_sample_num"]
                        renderer_skip = NeurayRenderer(
                            dataclasses.replace(
                                render_cfg,
                                probe_sample_num=accepted_psn))
                else:
                    # the audit rejected every probe size for this
                    # frame — exact gate for the remaining frames
                    # instead of re-running the escalation ladder
                    auto_fallback = True
                print(f"auto probe frame {qi}: "
                      f"psn={out['probe_sample_num']} "
                      f"false_skip={out['false_skip_rate']:.4f} "
                      f"fallback={out['fallback']}", flush=True)
                with open(f"{output_dir}/auto_audit.jsonl", "a") as f:
                    import json
                    f.write(json.dumps({
                        "frame": qi,
                        "probe_sample_num": out["probe_sample_num"],
                        "false_skip_rate": out["false_skip_rate"],
                        # in auto_focus mode window_clip_db can be THE
                        # rejection reason — log it alongside
                        "window_clip": out.get("window_clip"),
                        "window_clip_db": out.get("window_clip_db"),
                        "audit_trail": out.get("audit_trail"),
                        "fallback": out["fallback"]}) + "\n")
            elif skip_mode in ("auto", "auto_focus") and auto_fallback:
                out = render_frame_skip_empty(
                    renderer, params, ref_c, que, threshold=skip_th,
                    keep_base=tuple(keep_base), mesh=skip_mesh)
            elif skip_mode in ("probe_focus", "auto_focus"):
                out = render_frame_probe_focus(
                    renderer_skip, params, ref_c, que, threshold=skip_th,
                    keep_base=tuple(keep_base), image_hw=(h, w),
                    dilate=p_dilate, probe_stride=p_stride,
                    mesh=skip_mesh)
            elif skip_mode in ("probe", "auto"):
                out = render_frame_probe_skip(
                    renderer_skip, params, ref_c, que, threshold=skip_th,
                    keep_base=tuple(keep_base), image_hw=(h, w),
                    dilate=p_dilate, mesh=skip_mesh)
            else:
                out = render_frame_skip_empty(
                    renderer, params, ref_c, que, threshold=skip_th,
                    keep_base=tuple(keep_base), mesh=skip_mesh)
        else:
            if ref_c is None:
                ref_c = encode_fn(params, ref, src)
            out = segmented_render(None, params, ref, que, src,
                                   split, ref_c=ref_c)
        save_renderings(output_dir, qi, out, h, w)
        if render_depth:
            save_depth(output_dir, qi, out, h, w, que_depth_ranges[qi])
        print(f"rendered {qi + 1}/{re}", flush=True)

    # dump GT for eval poses (reference render.py:149-153)
    if pose_type.startswith("eval"):
        gt_dir = f'data/render/{database_name.replace("/", "_")}/gt'
        Path(gt_dir).mkdir(exist_ok=True, parents=True)
        for qi, render_id in enumerate(render_ids):
            if qi < rb or qi >= re:
                continue
            img = database.get_image(render_id)
            cv2.imwrite(f"{gt_dir}/{qi}.jpg", img[:, :, ::-1])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--database_name", type=str,
                        default="nerf_synthetic/lego/black_800")
    parser.add_argument("--cfg", type=str,
                        default="configs/gen/neuray_gen_depth.yaml")
    parser.add_argument("--pose_type", type=str, default="eval")
    parser.add_argument("--pose_fn", type=str, default=None)
    parser.add_argument("--rb", type=int, default=0)
    parser.add_argument("--re", type=int, default=-1)
    parser.add_argument("--render_type", type=str, default="gen")
    parser.add_argument("--ray_num", type=int, default=4096)
    parser.add_argument("--depth", action="store_true")
    flags = parser.parse_args()

    if flags.render_type == "gen":
        render_video_gen(flags.database_name, flags.cfg, flags.pose_type,
                         flags.pose_fn, flags.depth, flags.ray_num,
                         flags.rb, flags.re)
    elif flags.render_type == "ft":
        from neuray_tpu.models.ft import render_video_ft
        render_video_ft(flags.database_name, flags.cfg, flags.pose_type,
                        flags.pose_fn, flags.depth, flags.ray_num,
                        flags.rb, flags.re)
    else:
        raise NotImplementedError(flags.render_type)


if __name__ == "__main__":
    main()
