"""Multi-device tests on the 8-device virtual CPU mesh: sharded render
equals unsharded render; DP train step runs, syncs, and learns."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neuray_tpu.models.renderer import NeurayRenderer, RenderConfig, \
    render_full
from neuray_tpu.parallel.sharding import (
    make_mesh, make_sharded_render_fn, make_dp_train_step)
from neuray_tpu.train.losses import build_losses
from neuray_tpu.data.synthetic import make_sphere_scene, make_query

CFG = RenderConfig(use_hierarchical_sampling=True, depth_sample_num=8,
                   fine_depth_sample_num=8, ray_batch_num=16,
                   use_vis=False, fine_use_vis=False, ray_mask_point_num=4,
                   use_depth_loss=True)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    ref = jax.tree.map(jnp.asarray, make_sphere_scene(rng, 3, 32, 32))
    que_np = make_query(rng, 32, 32, 64)
    que = jax.tree.map(jnp.asarray, que_np)
    renderer = NeurayRenderer(CFG)
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, que, True)
    return renderer, params, ref, que


def test_sharded_render_matches_unsharded(setup):
    renderer, params, ref, que = setup
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    que_eval = {k: v for k, v in que.items() if k != "imgs"}
    sharded = make_sharded_render_fn(renderer, mesh)(
        params, ref, que_eval)
    plain = render_full(renderer, params, ref, que_eval)
    np.testing.assert_allclose(
        np.asarray(sharded["pixel_colors_nr_fine"]),
        np.asarray(plain["pixel_colors_nr_fine"]), rtol=1e-4, atol=1e-5)


def test_dp_train_step_learns(setup):
    renderer, params, ref, que = setup
    mesh = make_mesh(8)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    loss_fn = build_losses({"loss": ["render", "depth"],
                            "use_ray_mask": True,
                            "use_nr_fine_loss": True})
    step_fn = make_dp_train_step(renderer, optimizer, loss_fn, mesh)

    def one_scene(seed):
        r = np.random.RandomState(seed)
        sref = make_sphere_scene(r, 3, 32, 32)
        sref["true_depth"] = sref["depth"]
        sque = make_query(r, 32, 32, 64)
        coords = (r.rand(3, 8, 2) * 31).astype(np.float32)
        return {"ref": sref, "que": sque, "depth_loss_coords": coords,
                "is_gso": np.zeros([], np.float32)}

    batch = jax.tree.map(lambda *xs: jnp.stack(xs),
                         *[one_scene(i) for i in range(8)])
    losses = []
    for i in range(3):
        params, opt_state, metrics = step_fn(
            params, opt_state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss_total"]))
    assert np.isfinite(losses).all()
    # same batch 3x with adam at 1e-3: loss must drop
    assert losses[-1] < losses[0]


def test_sharded_segmented_preencoded_matches_plain(setup):
    """bench.py's multi-chip composition: encode once, render ray
    SEGMENTS through the pre_encoded sharded fn, concatenate — must
    equal the plain single-program render (VERDICT r2 next #9)."""
    from neuray_tpu.models.renderer import make_scene_encode_fn
    renderer, params, ref, que = setup
    mesh = make_mesh(8)
    que_eval = {k: v for k, v in que.items() if k != "imgs"}

    encode_fn = make_scene_encode_fn(renderer)
    ref_c = encode_fn(params, ref)
    sharded = make_sharded_render_fn(
        renderer, mesh, keep_keys=("pixel_colors_nr_fine",),
        pre_encoded=True)

    rn = que_eval["coords"].shape[1]
    seg = 32
    outs = []
    for i in range(0, rn, seg):
        q = dict(que_eval, coords=que_eval["coords"][:, i:i + seg])
        outs.append(np.asarray(
            sharded(params, ref_c, q)["pixel_colors_nr_fine"]))
    got = np.concatenate(outs, axis=1)

    plain = render_full(renderer, params, ref, que_eval,
                        keep_keys=("pixel_colors_nr_fine",))
    np.testing.assert_allclose(
        got, np.asarray(plain["pixel_colors_nr_fine"]),
        rtol=1e-4, atol=1e-5)


def test_sharded_probe_skip_matches_unsharded(setup):
    """The three-phase probe-skip with mesh= shards the probe and the
    kept phase over 8 devices: scores and outputs must match the
    single-device driver at the same threshold."""
    from neuray_tpu.models.renderer import (
        make_scene_encode_fn, make_probe_fn, render_frame_probe_skip)
    from neuray_tpu.parallel.sharding import make_sharded_probe_fn
    renderer, params, ref, que = setup
    mesh = make_mesh(8)
    rng = np.random.RandomState(3)
    que_np = make_query(rng, 32, 32, rn=0, full_image=True)
    que_full = {k: jnp.asarray(v) for k, v in que_np.items()
                if k != "imgs"}

    ref_c = make_scene_encode_fn(renderer)(params, ref)
    score_plain = np.asarray(make_probe_fn(renderer)(
        params, ref_c, que_full))
    score_shard = np.asarray(make_sharded_probe_fn(renderer, mesh)(
        params, ref_c, que_full))
    np.testing.assert_allclose(score_shard, score_plain,
                               rtol=1e-4, atol=1e-5)

    # threshold at the widest score gap around the middle, so last-ulp
    # shard/plain differences cannot flip any keep decision
    s = np.sort(score_plain[0])
    lo, hi = len(s) // 4, 3 * len(s) // 4
    gaps = np.diff(s[lo:hi])
    gi = lo + int(np.argmax(gaps))
    th = float((s[gi] + s[gi + 1]) / 2)
    out_plain = render_frame_probe_skip(renderer, params, ref_c,
                                        que_full, threshold=th)
    out_shard = render_frame_probe_skip(renderer, params, ref_c,
                                        que_full, threshold=th,
                                        mesh=mesh)
    assert out_shard["kept_rays"] == out_plain["kept_rays"]
    np.testing.assert_allclose(
        out_shard["pixel_colors_nr_fine"],
        out_plain["pixel_colors_nr_fine"], rtol=1e-4, atol=1e-5)


def test_sharded_two_phase_matches_unsharded(setup):
    """The EXACT two-phase gate with mesh=: the coarse scoring pass and
    the kept fine pass shard the ray axis (host-side compaction
    unchanged) — kept set and outputs must equal the single-device
    driver at the same threshold (VERDICT r4 next #6)."""
    from neuray_tpu.models.renderer import (
        make_scene_encode_fn, make_coarse_render_fn,
        render_frame_skip_empty)
    renderer, params, ref, que = setup
    mesh = make_mesh(8)
    rng = np.random.RandomState(7)
    que_np = make_query(rng, 32, 32, rn=0, full_image=True)
    que_full = {k: jnp.asarray(v) for k, v in que_np.items()
                if k != "imgs"}

    ref_c = make_scene_encode_fn(renderer)(params, ref)
    # threshold at the widest mid-range score gap so last-ulp
    # shard/plain differences cannot flip any keep decision
    hp = np.asarray(make_coarse_render_fn(
        renderer, keep_keys=("hit_prob_nr",))(
            params, ref_c, que_full)["hit_prob_nr"])
    s = np.sort(hp[0].sum(-1))
    lo, hi = len(s) // 4, 3 * len(s) // 4
    gi = lo + int(np.argmax(np.diff(s[lo:hi])))
    th = float((s[gi] + s[gi + 1]) / 2)

    out_plain = render_frame_skip_empty(renderer, params, ref_c,
                                        que_full, threshold=th)
    out_shard = render_frame_skip_empty(renderer, params, ref_c,
                                        que_full, threshold=th,
                                        mesh=mesh)
    assert out_shard["kept_rays"] == out_plain["kept_rays"]
    for k in ("pixel_colors_nr", "pixel_colors_nr_fine"):
        np.testing.assert_allclose(out_shard[k], out_plain[k],
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_sharded_focus_matches_unsharded(setup):
    """The probe-FOCUSED multi-chip legs: sharded focus probe returns
    the same (score, near, far) as the plain one, and the sharded
    focused render matches the plain focused render on the same
    windows."""
    from neuray_tpu.models.renderer import (
        make_scene_encode_fn, make_focus_probe_fn, make_focus_render_fn)
    from neuray_tpu.parallel.sharding import (
        make_sharded_focus_probe_fn, make_sharded_focus_render_fn)
    renderer, params, ref, que = setup
    mesh = make_mesh(8)
    rng = np.random.RandomState(5)
    que_np = make_query(rng, 32, 32, rn=0, full_image=True)
    que_full = {k: jnp.asarray(v) for k, v in que_np.items()
                if k != "imgs"}

    ref_c = make_scene_encode_fn(renderer)(params, ref)
    plain = make_focus_probe_fn(renderer)(params, ref_c, que_full)
    shard = make_sharded_focus_probe_fn(renderer, mesh)(
        params, ref_c, que_full)
    for p, s in zip(plain, shard):
        np.testing.assert_allclose(np.asarray(s), np.asarray(p),
                                   rtol=1e-4, atol=1e-5)

    keep = ("pixel_colors_nr", "pixel_colors_nr_fine")
    _, near, far = plain
    out_p = make_focus_render_fn(renderer, keep_keys=keep)(
        params, ref_c, que_full, near, far)
    out_s = make_sharded_focus_render_fn(renderer, mesh, keep_keys=keep)(
        params, ref_c, que_full, near, far)
    np.testing.assert_allclose(
        np.asarray(out_s["pixel_colors_nr_fine"]),
        np.asarray(out_p["pixel_colors_nr_fine"]), rtol=1e-4, atol=1e-5)
