"""Multi-chip execution: ray-sharded rendering and data-parallel training.

The reference is single-process single-GPU (reference train/trainer.py:66
raises on multi_gpus; SURVEY.md section 2.5) — there is no distributed
design to translate, so this is TPU-native by construction:

  * RENDERING shards the ray axis of a single scene across the mesh via
    shard_map: every chip holds the (small) scene feature cache and
    renders its ray slice; results concatenate along rays. Collectives:
    none in the hot loop (pure data parallel over rays; the gather reads
    replicated feature maps).
  * TRAINING is scene-level data parallelism: each chip takes one scene
    sample of the batch, computes local grads, and a psum over the mesh
    averages them (the optax update then runs replicated). This scales
    the reference's batch=1 recipe to batch=n_devices.

Both run over a 1-D jax.sharding.Mesh and work on any device count,
including the virtual CPU mesh used in tests.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from neuray_tpu.models.renderer import NeurayRenderer, chunk_coords


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


# ------------------------- sharded rendering -------------------------

_SHARDED_RENDER_CACHE: dict = {}


def make_sharded_render_fn(renderer: NeurayRenderer, mesh: Mesh,
                           keep_keys=("pixel_colors_nr",
                                      "pixel_colors_nr_fine", "ray_mask"),
                           pre_encoded: bool = False):
    """Jitted full render with the ray axis sharded over the mesh.

    Returned fn: (params, ref, que) -> outputs with rays restored to the
    unsharded [qn, rn, ...] layout. The caller must pass rn divisible by
    (n_devices * ray_batch_num) after internal padding — handled here.

    pre_encoded=True: ``ref`` is already the encoded scene from
    make_scene_encode_fn (img_feats/ray_feats/gather maps present) —
    callers rendering many segments of one scene pay the conv encoders
    once instead of once per segment (mirrors make_ray_render_fn).
    """
    key = (renderer.cfg, tuple(keep_keys), mesh.shape_tuple, pre_encoded)
    if key in _SHARDED_RENDER_CACHE:
        return _SHARDED_RENDER_CACHE[key]

    c = renderer.cfg
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def impl(params, ref, que, src=None):
        if pre_encoded:
            ref_c = ref
        else:
            # scene encoding: replicated (cheap relative to rays at
            # scale)
            ray_feats_raw = renderer.apply(
                params, ref, src,
                method=NeurayRenderer.initialize_ray_feats)
            img_feats, ray_feats = renderer.apply(
                params, ref, ray_feats_raw,
                method=NeurayRenderer.encode_scene)
            ref_c = dict(ref)
            ref_c["img_feats"] = img_feats
            ref_c["ray_feats"] = ray_feats
            ref_c = renderer.build_gather_cache(ref_c)

        qn, rn, _ = que["coords"].shape
        # pad rays to n_dev * chunk multiple, reshape to [n_dev, ...]
        per_dev = -(-rn // (n_dev * c.ray_batch_num)) * c.ray_batch_num
        pad = n_dev * per_dev - rn
        coords = jnp.pad(que["coords"], ((0, 0), (0, pad), (0, 0)),
                         mode="edge")
        coords = coords.reshape(qn, n_dev, per_dev, 2).transpose(1, 0, 2, 3)

        que_base = {k: v for k, v in que.items() if k != "coords"}

        def render_shard(coords_shard):
            # coords_shard [1, qn, per_dev, 2] (leading mesh dim of size 1)
            chunks, _ = chunk_coords(coords_shard[0], c.ray_batch_num)

            def render_one(cc):
                q = dict(que_base)
                q["coords"] = cc
                out = renderer.apply(params, ref_c, q, False,
                                     method=NeurayRenderer.render_chunk)
                return {k: v for k, v in out.items() if k in keep_keys}

            outs = jax.lax.map(render_one, chunks)
            # [n_chunks, qn, chunk, ...] -> [1, qn, per_dev, ...]
            outs = jax.tree.map(
                lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                    x.shape[1], -1, *x.shape[3:])[None], outs)
            return outs

        outs = jax.shard_map(
            render_shard, mesh=mesh,
            in_specs=P(axis), out_specs=P(axis),
            check_vma=False)(coords)
        # [n_dev, qn, per_dev, ...] -> [qn, rn, ...]
        outs = jax.tree.map(
            lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                x.shape[1], -1, *x.shape[3:])[:, :rn], outs)
        return outs

    fn = jax.jit(impl)
    _SHARDED_RENDER_CACHE[key] = fn
    return fn


def make_sharded_probe_fn(renderer: NeurayRenderer, mesh: Mesh):
    """Jitted emptiness probe (renderer.probe_chunk) with the ray axis
    sharded over the mesh: (params, ref_c, que) -> score [qn, rn].
    The encoded scene is replicated; no collectives in the loop —
    the multi-chip leg of the three-phase probe-skip render
    (renderer.render_frame_probe_skip(mesh=...))."""
    key = (renderer.cfg, mesh.shape_tuple, "probe")
    if key in _SHARDED_RENDER_CACHE:
        return _SHARDED_RENDER_CACHE[key]

    c = renderer.cfg
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def impl(params, ref_c, que):
        qn, rn, _ = que["coords"].shape
        per_dev = -(-rn // (n_dev * c.ray_batch_num)) * c.ray_batch_num
        pad = n_dev * per_dev - rn
        coords = jnp.pad(que["coords"], ((0, 0), (0, pad), (0, 0)),
                         mode="edge")
        coords = coords.reshape(qn, n_dev, per_dev, 2).transpose(1, 0, 2, 3)
        que_base = {k: v for k, v in que.items() if k != "coords"}

        def probe_shard(coords_shard):
            chunks, _ = chunk_coords(coords_shard[0], c.ray_batch_num)

            def probe_one(cc):
                q = dict(que_base)
                q["coords"] = cc
                return renderer.apply(params, ref_c, q,
                                      method=NeurayRenderer.probe_chunk)

            scores = jax.lax.map(probe_one, chunks)  # n_chunks, qn, chunk
            return scores.transpose(1, 0, 2).reshape(
                scores.shape[1], -1)[None]

        scores = jax.shard_map(
            probe_shard, mesh=mesh,
            in_specs=P(axis), out_specs=P(axis),
            check_vma=False)(coords)            # n_dev, qn, per_dev
        return scores.transpose(1, 0, 2).reshape(qn, -1)[:, :rn]

    fn = jax.jit(impl)
    _SHARDED_RENDER_CACHE[key] = fn
    return fn


def make_sharded_focus_probe_fn(renderer: NeurayRenderer, mesh: Mesh):
    """Sharded renderer.probe_chunk_focus: (params, ref_c, que) ->
    (score, near, far), each [qn, rn] — the multi-chip leg of the
    probe-FOCUSED render (renderer.render_frame_probe_focus(mesh=...));
    scene replicated, ray axis sharded, no collectives."""
    key = (renderer.cfg, mesh.shape_tuple, "focus_probe")
    if key in _SHARDED_RENDER_CACHE:
        return _SHARDED_RENDER_CACHE[key]

    c = renderer.cfg
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def impl(params, ref_c, que):
        qn, rn, _ = que["coords"].shape
        per_dev = -(-rn // (n_dev * c.ray_batch_num)) * c.ray_batch_num
        pad = n_dev * per_dev - rn
        coords = jnp.pad(que["coords"], ((0, 0), (0, pad), (0, 0)),
                         mode="edge")
        coords = coords.reshape(qn, n_dev, per_dev, 2).transpose(1, 0, 2, 3)
        que_base = {k: v for k, v in que.items() if k != "coords"}

        def probe_shard(coords_shard):
            chunks, _ = chunk_coords(coords_shard[0], c.ray_batch_num)

            def probe_one(cc):
                q = dict(que_base)
                q["coords"] = cc
                return renderer.apply(
                    params, ref_c, q,
                    method=NeurayRenderer.probe_chunk_focus)

            outs = jax.lax.map(probe_one, chunks)  # 3x n_chunks,qn,chunk
            return tuple(
                x.transpose(1, 0, 2).reshape(x.shape[1], -1)[None]
                for x in outs)

        outs = jax.shard_map(
            probe_shard, mesh=mesh,
            in_specs=P(axis), out_specs=P(axis),
            check_vma=False)(coords)            # 3 x [n_dev, qn, per_dev]
        return tuple(
            x.transpose(1, 0, 2).reshape(qn, -1)[:, :rn] for x in outs)

    fn = jax.jit(impl)
    _SHARDED_RENDER_CACHE[key] = fn
    return fn


def make_sharded_focus_render_fn(renderer: NeurayRenderer, mesh: Mesh,
                                 keep_keys=("pixel_colors_nr",
                                            "pixel_colors_nr_fine")):
    """Sharded renderer.render_chunk_focus over a pre-encoded scene:
    (params, ref_c, que, near, far) -> outputs [qn, rn, ...]."""
    key = (renderer.cfg, tuple(keep_keys), mesh.shape_tuple, "focus")
    if key in _SHARDED_RENDER_CACHE:
        return _SHARDED_RENDER_CACHE[key]

    c = renderer.cfg
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def impl(params, ref_c, que, near, far):
        qn, rn, _ = que["coords"].shape
        per_dev = -(-rn // (n_dev * c.ray_batch_num)) * c.ray_batch_num
        pad = n_dev * per_dev - rn
        coords = jnp.pad(que["coords"], ((0, 0), (0, pad), (0, 0)),
                         mode="edge")
        coords = coords.reshape(qn, n_dev, per_dev, 2).transpose(1, 0, 2, 3)

        def shard_rows(x):  # [qn, rn] -> [n_dev, qn, per_dev]
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="edge")
            return x.reshape(qn, n_dev, per_dev).transpose(1, 0, 2)

        que_base = {k: v for k, v in que.items() if k != "coords"}

        def render_shard(coords_shard, near_shard, far_shard):
            chunks, _ = chunk_coords(coords_shard[0], c.ray_batch_num)
            n_chunks = chunks.shape[0]

            def chunk_rows(x):  # [1, qn, per_dev] -> [n_chunks, qn, chunk]
                return x[0].reshape(
                    qn, n_chunks, c.ray_batch_num).transpose(1, 0, 2)

            def render_one(args):
                cc, nr, fr = args
                q = dict(que_base)
                q["coords"] = cc
                out = renderer.apply(
                    params, ref_c, q, nr, fr,
                    method=NeurayRenderer.render_chunk_focus)
                return {k: v for k, v in out.items() if k in keep_keys}

            outs = jax.lax.map(
                render_one,
                (chunks, chunk_rows(near_shard), chunk_rows(far_shard)))
            return jax.tree.map(
                lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                    x.shape[1], -1, *x.shape[3:])[None], outs)

        outs = jax.shard_map(
            render_shard, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)), out_specs=P(axis),
            check_vma=False)(coords, shard_rows(near), shard_rows(far))
        outs = jax.tree.map(
            lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                x.shape[1], -1, *x.shape[3:])[:, :rn], outs)
        return outs

    fn = jax.jit(impl)
    _SHARDED_RENDER_CACHE[key] = fn
    return fn


def make_sharded_coarse_render_fn(renderer: NeurayRenderer, mesh: Mesh,
                                  keep_keys=("pixel_colors_nr",
                                             "hit_prob_nr")):
    """Sharded COARSE-ONLY pass over a pre-encoded scene — the scoring
    leg of the exact two-phase gate (renderer.render_frame_skip_empty
    with mesh=...): (params, ref_c, que) -> coarse outputs incl. the
    per-ray hit_prob_nr [qn, rn, dn]. Scene replicated, ray axis
    sharded, no collectives (pure ray data-parallel)."""
    key = (renderer.cfg, tuple(keep_keys), mesh.shape_tuple, "coarse")
    if key in _SHARDED_RENDER_CACHE:
        return _SHARDED_RENDER_CACHE[key]

    from neuray_tpu.ops import sampling as S

    c = renderer.cfg
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def impl(params, ref_c, que):
        qn, rn, _ = que["coords"].shape
        per_dev = -(-rn // (n_dev * c.ray_batch_num)) * c.ray_batch_num
        pad = n_dev * per_dev - rn
        coords = jnp.pad(que["coords"], ((0, 0), (0, pad), (0, 0)),
                         mode="edge")
        coords = coords.reshape(qn, n_dev, per_dev, 2).transpose(1, 0, 2, 3)
        que_base = {k: v for k, v in que.items() if k != "coords"}

        def render_shard(coords_shard):
            chunks, _ = chunk_coords(coords_shard[0], c.ray_batch_num)

            def render_one(cc):
                q = dict(que_base)
                q["coords"] = cc
                qnc, rnc, _ = cc.shape
                que_depth, _ = S.sample_depth(
                    q["depth_range"], qnc, rnc, c.depth_sample_num, False)
                out = renderer.apply(
                    params, que_depth, q, ref_c, False, False,
                    method=NeurayRenderer._render_by_depth)
                return {k: v for k, v in out.items() if k in keep_keys}

            outs = jax.lax.map(render_one, chunks)
            return jax.tree.map(
                lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                    x.shape[1], -1, *x.shape[3:])[None], outs)

        outs = jax.shard_map(
            render_shard, mesh=mesh,
            in_specs=P(axis), out_specs=P(axis),
            check_vma=False)(coords)
        outs = jax.tree.map(
            lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                x.shape[1], -1, *x.shape[3:])[:, :rn], outs)
        return outs

    fn = jax.jit(impl)
    _SHARDED_RENDER_CACHE[key] = fn
    return fn


def make_sharded_fine_render_fn(renderer: NeurayRenderer, mesh: Mesh,
                                keep_keys=("pixel_colors_nr_fine",)):
    """Sharded FINE-ONLY pass (renderer.render_chunk_fine) — the kept
    leg of the exact two-phase gate: (params, ref_c, que_kept,
    hit_prob_kept) -> fine outputs [qn, rn_kept, ...]. The kept-ray
    compaction stays host-side (render_frame_skip_empty); this just
    spreads the compacted rays over the mesh."""
    key = (renderer.cfg, tuple(keep_keys), mesh.shape_tuple, "fine")
    if key in _SHARDED_RENDER_CACHE:
        return _SHARDED_RENDER_CACHE[key]

    c = renderer.cfg
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def impl(params, ref_c, que, hit_prob):
        qn, rn, _ = que["coords"].shape
        per_dev = -(-rn // (n_dev * c.ray_batch_num)) * c.ray_batch_num
        pad = n_dev * per_dev - rn
        coords = jnp.pad(que["coords"], ((0, 0), (0, pad), (0, 0)),
                         mode="edge")
        coords = coords.reshape(qn, n_dev, per_dev, 2).transpose(1, 0, 2, 3)
        hp = jnp.pad(hit_prob, ((0, 0), (0, pad), (0, 0)), mode="edge")
        hp = hp.reshape(qn, n_dev, per_dev, -1).transpose(1, 0, 2, 3)
        que_base = {k: v for k, v in que.items() if k != "coords"}

        def render_shard(coords_shard, hp_shard):
            chunks, _ = chunk_coords(coords_shard[0], c.ray_batch_num)
            n_chunks = chunks.shape[0]
            hp_chunks = hp_shard[0].reshape(
                qn, n_chunks, c.ray_batch_num, -1).transpose(1, 0, 2, 3)

            def render_one(args):
                cc, hpc = args
                q = dict(que_base)
                q["coords"] = cc
                out = renderer.apply(
                    params, ref_c, q, hpc,
                    method=NeurayRenderer.render_chunk_fine)
                return {k: v for k, v in out.items() if k in keep_keys}

            outs = jax.lax.map(render_one, (chunks, hp_chunks))
            return jax.tree.map(
                lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                    x.shape[1], -1, *x.shape[3:])[None], outs)

        outs = jax.shard_map(
            render_shard, mesh=mesh,
            in_specs=(P(axis), P(axis)), out_specs=P(axis),
            check_vma=False)(coords, hp)
        outs = jax.tree.map(
            lambda x: x.transpose(1, 0, *range(2, x.ndim)).reshape(
                x.shape[1], -1, *x.shape[3:])[:, :rn], outs)
        return outs

    fn = jax.jit(impl)
    _SHARDED_RENDER_CACHE[key] = fn
    return fn


# ------------------------- DP training step -------------------------


def unreplicate(tree):
    """Take device-0's copy of a pmap-replicated pytree."""
    return jax.tree.map(lambda x: x[0], tree)


class DpTrainStep:
    """Scene-level data-parallel train step via pmap.

    pmap compiles the per-device program directly — measured 4.6x
    faster than the same step under jax.shard_map's manual-partitioning
    region on v5e (2441ms -> 527ms/step at gen-training shapes), and
    vmap+GSPMD is worse still (batched gathers lower catastrophically).

    Call as step(params, opt_state, batch, rng): ``batch`` carries a
    leading device axis of size n_devices; params/opt_state may be
    passed unreplicated on the first call (they are replicated here and
    returned/kept replicated — use ``unreplicate`` for checkpointing or
    evaluation). Grads are pmean-averaged over the mesh.
    """

    def __init__(self, renderer: NeurayRenderer, optimizer,
                 loss_fn: Callable[[Dict, Dict], Dict], mesh: Mesh):
        self.devices = list(mesh.devices.flat)
        self.n = len(self.devices)
        axis = mesh.axis_names[0]

        def local_loss(params, batch_elem, rng):
            outputs = renderer.apply(
                params, batch_elem["ref"], batch_elem["que"], True,
                batch_elem.get("depth_loss_coords"),
                batch_elem.get("src"), rngs={"sample": rng})
            losses = loss_fn(outputs, batch_elem)
            total = sum(jnp.mean(v) for k, v in losses.items()
                        if k.startswith("loss"))
            return total, losses

        def step_one(params, opt_state, batch_elem, rng):
            (total, losses), grads = jax.value_and_grad(
                local_loss, has_aux=True)(params, batch_elem, rng)
            grads = jax.lax.pmean(grads, axis)
            total = jax.lax.pmean(total, axis)
            losses = jax.lax.pmean(jax.tree.map(jnp.mean, losses), axis)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, {**losses, "loss_total": total}

        self._pstep = jax.pmap(step_one, axis_name=axis,
                               devices=self.devices,
                               donate_argnums=(0, 1))
        self._replicated = False

    def _replicate(self, tree):
        # pmap layout (leading device axis, one copy per device) via the
        # modern device_put-with-sharding API (device_put_replicated is
        # deprecated). np.broadcast_to is a zero-copy host view; the
        # sharded device_put materializes one shard per device.
        mesh = Mesh(np.asarray(self.devices), ("dp",))
        sharding = jax.sharding.NamedSharding(mesh, P("dp"))
        return jax.tree.map(
            lambda x: jax.device_put(
                np.broadcast_to(np.asarray(x)[None],
                                (self.n,) + np.shape(x)), sharding),
            jax.device_get(tree))

    def __call__(self, params, opt_state, batch, rng):
        if not self._replicated:
            params = self._replicate(params)
            opt_state = self._replicate(opt_state)
            self._replicated = True
        rngs = jax.random.split(rng, self.n)
        params, opt_state, metrics = self._pstep(
            params, opt_state, batch, rngs)
        return params, opt_state, unreplicate(metrics)


def make_dp_train_step(renderer: NeurayRenderer, optimizer,
                       loss_fn: Callable[[Dict, Dict], Dict],
                       mesh: Mesh) -> DpTrainStep:
    """loss_fn(outputs, batch_elem) -> dict of scalar losses (summed for
    the total). See DpTrainStep for calling conventions."""
    return DpTrainStep(renderer, optimizer, loss_fn, mesh)
