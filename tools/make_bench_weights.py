"""Train the gen renderer on the analytic sphere scene and save the
weights for bench.py's trained-weight mode (tools/bench_weights.npz).

Why bench needs trained weights: the two-phase empty-ray-skipping
render (models/renderer.render_frame_skip_empty) gates the fine pass on
the COARSE hit probability, which only separates surface from
background once the model has actually learned the scene — with random
weights nothing (or everything) skips. The compute path itself is
weight-value independent, so the full-render rays/s is unchanged;
trained weights make the skip fraction (and its quality cost,
tools/check_skip_quality.py) meaningful.

Training setup mirrors the reference gen recipe (reference
train/trainer.py:21-35: 512 rays/step, Adam, exp-decay LR, render
loss on coarse+fine) on the same sphere geometry bench.py renders
(seed 0 — look_at_camera consumes the same rng draws at any
resolution, so the 400x400 training views match the 800x800 bench
views in pose). Conv weights are resolution-agnostic.

Usage: python tools/make_bench_weights.py [--steps 1500] [--size 400]
       [--out tools/bench_weights.npz] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--rays", type=int, default=512)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--scene", default="sphere",
                    choices=["sphere", "blobs", "room", "pan"],
                    help="blobs: 5 spheres incl. a thin r=0.08 one "
                         "(probe-generality evidence); room: blobs "
                         "ENCLOSED by a textured room sphere — every "
                         "ray hits geometry (full-coverage adversarial "
                         "quality scene; nothing can skip)")
    ap.add_argument("--init", default="depth",
                    choices=["depth", "cost_volume"],
                    help="cost_volume: train the MVSNet-cost-volume "
                         "init config (trained weights for "
                         "tools/bench_cost_volume.py --focus)")
    ap.add_argument("--n-que", type=int, default=16,
                    help="number of training query views (the room "
                         "scene needs more than the default 16 to "
                         "train well — full coverage means far more "
                         "visible surface per scene)")
    ap.add_argument("--cpu", action="store_true")
    flags = ap.parse_args()
    if flags.out is None:
        name = "bench_weights"
        if flags.scene != "sphere":
            name += f"_{flags.scene}"
        if flags.init == "cost_volume":
            name += "_cv"
        flags.out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), name + ".npz")

    import jax
    if flags.cpu:
        jax.config.update("jax_platforms", "cpu")
        from neuray_tpu.utils.compile_cache import cache_dir as _ccd
        jax.config.update("jax_compilation_cache_dir",
                          _ccd("/tmp/jax_test_cache"))
    else:
        from neuray_tpu.utils.compile_cache import cache_dir as _ccd
        jax.config.update("jax_compilation_cache_dir",
                          _ccd("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import optax

    from neuray_tpu.models.renderer import NeurayRenderer, RenderConfig
    from neuray_tpu.data.synthetic import (
        make_sphere_scene, make_query, make_blob_spheres,
        make_room_spheres, make_pan_scene_spheres, UNIT_SPHERE,
        DEPTH_RANGE, ROOM_DEPTH_RANGE)
    from neuray_tpu.train.losses import render_loss
    from neuray_tpu.utils.params_io import save_params_npz

    on_tpu = jax.devices()[0].platform == "tpu"
    size = flags.size if (on_tpu or not flags.cpu) else min(flags.size, 64)
    dn = 64 if on_tpu else 16
    if flags.init == "cost_volume" and size % 32:
        # MVSNet's 3-level cost-reg U-Net needs h/4, w/4 divisible by 8
        # (the reference pads ref images to /32, ref_pad_interval=32)
        size -= size % 32
        print(f"cost_volume: rounding size down to {size} (/32)",
              flush=True)

    # bench cfg minus the eval-only gather quantization; f32-accumulated
    # bf16 compute on TPU (params stay f32)
    cfg = RenderConfig(
        init_net_type=flags.init,
        use_hierarchical_sampling=True, depth_sample_num=dn,
        fine_depth_sample_num=dn, ray_batch_num=flags.rays,
        use_vis=False, fine_use_vis=False, use_bf16=on_tpu,
        gather_quant="none")
    renderer = NeurayRenderer(cfg)

    rng = np.random.RandomState(0)  # SAME scene poses as bench.py
    spheres = {"sphere": UNIT_SPHERE,
               "blobs": make_blob_spheres(np.random.RandomState(42)),
               "room": make_room_spheres(np.random.RandomState(42)),
               "pan": make_pan_scene_spheres(),
               }[flags.scene]
    depth_range = (ROOM_DEPTH_RANGE if flags.scene == "room"
                   else DEPTH_RANGE)
    ref = {k: jnp.asarray(v) for k, v in
           make_sphere_scene(rng, 8, size, size, spheres,
                             depth_range).items()}
    src = None
    if flags.init == "cost_volume":
        # src views = the refs themselves; nn_ids = 3 nearest other
        # refs by camera center (mirrors tools/bench_cost_volume.py)
        poses_np = np.asarray(ref["poses"])
        centers = np.stack([-p[:, :3].T @ p[:, 3] for p in poses_np])
        nn_ids = np.stack([
            np.argsort(np.linalg.norm(centers - centers[i], axis=1))[1:4]
            for i in range(len(centers))]).astype(np.int32)
        ref["nn_ids"] = jnp.asarray(nn_ids)
        src = {k: ref[k] for k in ("imgs", "poses", "Ks", "depth_range")}

    n_que = flags.n_que
    ques = []
    for i in range(n_que):
        q = make_query(np.random.RandomState(100 + i), size, size, rn=0,
                       full_image=False, spheres=spheres,
                       depth_range=depth_range)
        ques.append({k: jnp.asarray(v) for k, v in q.items()
                     if k != "coords"})

    loss_fn_parts = render_loss({"use_nr_fine_loss": True,
                                 "use_ray_mask": True})

    def loss_fn(params, que, key):
        out = renderer.apply(params, ref, que, True, src=src,
                             rngs={"sample": key})
        losses = loss_fn_parts(out, {})
        return sum(jnp.mean(v) for v in losses.values())

    sched = optax.exponential_decay(
        flags.lr, flags.steps, 0.05, staircase=False)
    opt = optax.adam(sched)

    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, {**ques[0],
              "coords": jnp.zeros((1, flags.rays, 2), jnp.float32)},
        True, src=src)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, que, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, que, key)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    host_rng = np.random.RandomState(7)
    t0 = time.perf_counter()
    for i in range(flags.steps):
        q = dict(ques[i % n_que])
        q["coords"] = jnp.asarray(np.stack(
            [host_rng.randint(0, size, flags.rays),
             host_rng.randint(0, size, flags.rays)],
            -1)[None].astype(np.float32))
        params, opt_state, loss = step(
            params, opt_state, q, jax.random.PRNGKey(i))
        if i % 100 == 0 or i == flags.steps - 1:
            lv = float(np.asarray(jax.device_get(loss)))
            dt = time.perf_counter() - t0
            print(f"step {i:5d} loss {lv:.5f}  ({dt:.1f}s)", flush=True)

    save_params_npz(flags.out, params)
    sz = os.path.getsize(flags.out) / 1e6
    print(f"saved {flags.out} ({sz:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
