"""Cost-volume init net end-to-end: the renderer with
init_net_type='cost_volume' renders finite images and keeps the frozen
MVSNet out of the gradient path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuray_tpu.models.renderer import NeurayRenderer, RenderConfig
from neuray_tpu.data.synthetic import make_sphere_scene, make_query

CFG = RenderConfig(init_net_type="cost_volume",
                   use_hierarchical_sampling=False, depth_sample_num=8,
                   ray_batch_num=16, use_vis=False, ray_mask_point_num=4)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    rfn, srn, h, w = 3, 4, 32, 32
    ref_np = make_sphere_scene(rng, rfn, h, w)
    src_np = make_sphere_scene(rng, srn, h, w)
    ref_np["nn_ids"] = rng.randint(0, srn, (rfn, 2)).astype(np.int64)
    ref = jax.tree.map(jnp.asarray, ref_np)
    src = {k: jnp.asarray(v) for k, v in src_np.items()
           if k in ("imgs", "poses", "Ks", "depth_range")}
    que = jax.tree.map(jnp.asarray, make_query(rng, h, w, 16))
    renderer = NeurayRenderer(CFG)
    params = renderer.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        ref, que, True, None, src)
    return renderer, params, ref, que, src


def test_cost_volume_forward(setup):
    renderer, params, ref, que, src = setup
    out = renderer.apply(params, ref, que, False, None, src)
    rgb = np.asarray(out["pixel_colors_nr"])
    assert rgb.shape == (1, 16, 3)
    assert np.isfinite(rgb).all()


def test_cost_volume_mvsnet_frozen(setup):
    renderer, params, ref, que, src = setup

    def loss(p):
        out = renderer.apply(p, ref, que, True, None, src,
                             rngs={"sample": jax.random.PRNGKey(0)})
        return jnp.mean((out["pixel_colors_nr"]
                         - out["pixel_colors_gt"]) ** 2)

    grads = jax.grad(loss)(params)
    mv = grads["params"]["init_net"]["mvsnet"]
    assert all(float(np.abs(np.asarray(g)).max()) == 0.0
               for g in jax.tree.leaves(mv)), "MVSNet must stay frozen"
    # but the rest of the init net trains
    rest = {k: v for k, v in grads["params"]["init_net"].items()
            if k != "mvsnet"}
    assert any(float(np.abs(np.asarray(g)).max()) > 0
               for g in jax.tree.leaves(rest))
