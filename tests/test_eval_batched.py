"""Batched SPMD eval vs the sequential path, and tp>1 numerics vs tp=1,
on the virtual 8-device CPU mesh (VERDICT r1 items #6/#8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.slower]
from jax.sharding import NamedSharding, PartitionSpec as P

from mvdfusion_tpu.geometry import look_at_view_transform
from mvdfusion_tpu.nn.viewfusion import ViewFusion, ViewFusionConfig
from mvdfusion_tpu.parallel.mesh import make_mesh, param_shardings
from mvdfusion_tpu.pipeline.eval import eval_scenes
from mvdfusion_tpu.pipeline.sampler import ddim_sample

S = 6
B = 3
N_SCENES = 2


@pytest.fixture(scope="module")
def tiny():
    cfg = ViewFusionConfig().tiny()
    model = ViewFusion(cfg)
    rng = np.random.default_rng(0)
    IMG = cfg.latent_size * 4
    scenes = []
    azim = np.linspace(0, 300, S)
    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=azim + 90)
    for _ in range(N_SCENES):
        scenes.append(
            dict(
                images=jnp.asarray(rng.uniform(size=(S, IMG, IMG, 3)), jnp.float32),
                R=jnp.asarray(R), T=jnp.asarray(T),
                f=jnp.full((S, 2), 2.1875), c=jnp.zeros((S, 2)),
            )
        )
    input_idx = jnp.asarray([0])
    target_idx = jnp.asarray([1, 3, 5])
    sc = scenes[0]
    params = jax.jit(lambda *a: model.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(0), sc["images"], sc["R"], sc["T"], sc["f"], sc["c"],
        input_idx, target_idx, jax.random.PRNGKey(1),
    )
    return model, params, scenes, input_idx, target_idx


def test_eval_scenes_matches_sequential(tiny):
    """The dp-sharded batched eval must reproduce the per-scene sequential
    pipeline bit-for-bit-ish (same fold_in key per scene)."""
    model, params, scenes, input_idx, target_idx = tiny
    base = jax.random.PRNGKey(0)
    keys = jnp.stack([jax.random.fold_in(base, i) for i in range(N_SCENES)])

    stack = {k: jnp.stack([s[k] for s in scenes]) for k in scenes[0]}
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    shard = NamedSharding(mesh, P("dp"))
    stack = {k: jax.device_put(v, shard) for k, v in stack.items()}
    out = eval_scenes(
        params, model, stack["images"], stack["R"], stack["T"], stack["f"], stack["c"],
        input_idx, target_idx, jax.device_put(keys, shard), jnp.asarray(2.5), num_steps=2,
    )

    prep = jax.jit(lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch))
    for i, sc in enumerate(scenes):
        lat, cams, in_lat, in_cams, clip_v = prep(
            params, sc["images"], sc["R"], sc["T"], sc["f"], sc["c"], input_idx, target_idx
        )
        res = ddim_sample(
            params, model, cams, in_lat, in_cams, clip_v,
            jax.random.fold_in(base, i), jnp.asarray(2.5), num_steps=2,
        )
        dec = model.apply(params, res.latents[..., :4], method=ViewFusion.decode_latents_chunked)
        np.testing.assert_allclose(
            np.asarray(out.pred_rgb[i]), np.asarray(dec), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.pred_depth[i]),
            np.clip((np.asarray(res.latents[..., 4:]) + 1) / 2, 0, 1),
            atol=2e-4,
        )


def test_tp2_matches_tp1_numerics(tiny):
    """Megatron-rule tp sharding is a layout annotation, not a math change:
    a tp=2 run must reproduce tp=1 within fp32 collective-reassociation
    noise — this correctness-checks the regex rules in parallel/mesh.py."""
    model, params, scenes, input_idx, target_idx = tiny
    sc = scenes[0]
    prep = jax.jit(lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch))
    _, cams, in_lat, in_cams, clip_v = prep(
        params, sc["images"], sc["R"], sc["T"], sc["f"], sc["c"], input_idx, target_idx
    )

    def sample_with(p, cams, in_lat, in_cams, clip_v):
        return np.asarray(
            ddim_sample(
                p, model, cams, in_lat, in_cams, clip_v,
                jax.random.PRNGKey(7), jnp.asarray(2.5), num_steps=2,
            ).latents
        )

    ref = sample_with(params, cams, in_lat, in_cams, clip_v)
    # dp=2 so the 2-scene loss batch divides the dp axis
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    p_tp = jax.device_put(params, param_shardings(params, mesh))
    # all inputs must live on the same device set as the sharded params
    rep = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(x, rep)
    out = sample_with(
        p_tp, jax.tree.map(put, cams), put(in_lat), jax.tree.map(put, in_cams), put(clip_v)
    )
    np.testing.assert_allclose(out, ref, atol=5e-4)

    # and one training step: tp=2 loss == tp=1 loss
    from mvdfusion_tpu.pipeline.trainer import TrainConfig, scene_batch_loss

    batch = {
        "images": jnp.stack([s["images"] for s in scenes]),
        "R": jnp.stack([s["R"] for s in scenes]),
        "T": jnp.stack([s["T"] for s in scenes]),
        "f": jnp.stack([s["f"] for s in scenes]),
        "c": jnp.stack([s["c"] for s in scenes]),
        "input_idx": jnp.tile(input_idx[None], (N_SCENES, 1)),
        "target_idx": jnp.tile(target_idx[None], (N_SCENES, 1)),
    }
    loss_fn = jax.jit(lambda p, b, r: scene_batch_loss(model, p, b, r))
    l_ref = float(loss_fn(params, batch, jax.random.PRNGKey(3)))
    shard = NamedSharding(mesh, P("dp"))
    batch_sh = {k: jax.device_put(v, shard) for k, v in batch.items()}
    l_tp = float(loss_fn(p_tp, batch_sh, jax.random.PRNGKey(3)))
    assert abs(l_ref - l_tp) < 5e-4 * max(1.0, abs(l_ref)), (l_ref, l_tp)
