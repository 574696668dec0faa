"""Trainable-parameter masking, sharding rules, and the sharded train step
on the virtual 8-device CPU mesh (SURVEY.md §4 distributed strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.slower]

from mvdfusion_tpu.nn.viewfusion import ViewFusion, ViewFusionConfig
from mvdfusion_tpu.parallel.mesh import make_mesh, param_shardings
from mvdfusion_tpu.pipeline.trainer import TrainConfig, trainable_mask


def _abstract_params():
    cfg = ViewFusionConfig().tiny()
    model = ViewFusion(cfg)
    S, IMG = 4, cfg.latent_size * 4
    images = jnp.zeros((S, IMG, IMG, 3))
    R = jnp.tile(jnp.eye(3)[None], (S, 1, 1))
    T = jnp.tile(jnp.asarray([[0.0, 0.0, 1.5]]), (S, 1))
    f = jnp.full((S, 2), 2.1875)
    c = jnp.zeros((S, 2))
    return jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), images, R, T, f, c, jnp.asarray([0]), jnp.asarray([1, 2]),
            jax.random.PRNGKey(1), method=ViewFusion.init_all,
        )
    )


def test_trainable_mask_matches_reference_policy():
    """unet.py:558-576 + viewfusion:399-416: frozen VAE/CLIP/ResBlocks,
    trainable attention stacks / grafts / cc-projection / time-embed."""
    params = _abstract_params()
    mask = trainable_mask(params, TrainConfig())
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    # frozen towers
    assert not any(v for k, v in flat.items() if k.startswith("params/vae"))
    assert not any(v for k, v in flat.items() if k.startswith("params/clip"))
    # frozen UNet backbone (res blocks, conv_in/out, time dense)
    assert not flat["params/unet/conv_in/kernel"]
    assert not any(v for k, v in flat.items() if "/unet/" in k and "_res_" in k)
    # trainable: spatial transformers, grafted view attention, GridAttn,
    # cc projection, aux time embed
    assert all(v for k, v in flat.items() if "/unet/" in k and "attn" in k)
    assert all(v for k, v in flat.items() if k.startswith("params/view_attn"))
    assert all(v for k, v in flat.items() if k.startswith("params/cc_layers"))
    assert flat["params/time_dense1/kernel"]
    # finetune_unet=True flips the whole UNet on
    mask2 = trainable_mask(params, TrainConfig(finetune_unet=True))
    flat2 = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(mask2)[0]
    }
    assert flat2["params/unet/conv_in/kernel"]
    assert not flat2["params/vae/encoder/conv_in/kernel"]


def test_training_rails_clip_and_skip_nonfinite():
    """grad_clip bounds the trainable-set update; skip_nonfinite makes a NaN
    step a no-op instead of poisoning the params (overfit run, step ~7700)."""
    import optax

    from mvdfusion_tpu.pipeline.trainer import make_optimizer

    params = {
        "params": {
            "view_attn": {"w": jnp.ones((4, 4))},
            "vae": {"w": jnp.ones((4, 4))},
        }
    }
    tc = TrainConfig(lr=1e-2, grad_clip=1.0, skip_nonfinite=True)
    opt = make_optimizer(params, tc)
    st = opt.init(params)

    # a NaN gradient step must leave the params bit-identical
    bad = jax.tree_util.tree_map(lambda p: jnp.full_like(p, jnp.nan), params)
    up, st = opt.update(bad, st, params)
    p1 = optax.apply_updates(params, up)
    assert np.array_equal(
        np.asarray(p1["params"]["view_attn"]["w"]), np.ones((4, 4))
    )

    # a huge finite gradient must apply, but clipped (finite, bounded update)
    big = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 1e6), params)
    up, st = opt.update(big, st, p1)
    p2 = optax.apply_updates(p1, up)
    dw = np.asarray(p2["params"]["view_attn"]["w"]) - 1.0
    assert np.all(np.isfinite(dw)) and np.all(np.abs(dw) < 0.1)
    # frozen subtree never moves
    assert np.array_equal(np.asarray(p2["params"]["vae"]["w"]), np.ones((4, 4)))


def test_param_shardings_valid():
    params = _abstract_params()
    mesh = make_mesh(dp=4, tp=2)
    shardings = param_shardings(params, mesh)
    leaves_p = jax.tree.leaves(params)
    leaves_s = jax.tree.leaves(shardings, is_leaf=lambda x: hasattr(x, "spec"))
    n_sharded = 0
    for p, s in zip(leaves_p, leaves_s):
        for dim, axis in enumerate(s.spec):
            if axis is not None:
                assert p.shape[dim] % 2 == 0, (p.shape, s.spec)
                n_sharded += 1
    assert n_sharded > 50  # the big kernels must actually shard


def test_fused_site_weights_replicated():
    """VERDICT r1 weak-#3: the Pallas kernels consume whole weight tensors,
    so tp must NOT shard them (GSPMD would all-gather every step). The
    mesh rules pin the GridAttn subtree and the fuse-eligible transformer
    sites replicated; the never-fused C=1280 sites keep Megatron sharding."""
    from mvdfusion_tpu.parallel.mesh import _FUSED_SITE

    params = _abstract_params()
    mesh = make_mesh(dp=4, tp=2)
    shardings = param_shardings(params, mesh)
    flat_p = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    flat_s = {
        "/".join(str(getattr(k, "key", k)) for k in path): v
        for path, v in jax.tree_util.tree_flatten_with_path(
            shardings, is_leaf=lambda x: hasattr(x, "spec")
        )[0]
    }
    n_checked = 0
    for k, s in flat_s.items():
        if k.startswith("params/view_attn") or (
            _FUSED_SITE.search(k) and len(flat_p[k].shape) == 2
            and min(flat_p[k].shape) <= 768
        ):
            assert all(a is None for a in s.spec), (k, s.spec)
            n_checked += 1
    assert n_checked > 30  # the rule must actually bite


def test_fused_path_under_tp_sharding():
    """The fused-kernel model must compile and run under a tp-sharded jit
    (the partitioner sees pallas_call custom calls with replicated weights)
    and reproduce the unsharded XLA-path numerics. Interpret mode stands in
    for the TPU kernels on the CPU mesh."""
    cfg = ViewFusionConfig().tiny()
    model_xla = ViewFusion(cfg)
    import dataclasses

    model_fused = ViewFusion(dataclasses.replace(cfg, fuse_mode="interpret"))

    S, IMG = 4, cfg.latent_size * 4
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(S, IMG, IMG, 3)), jnp.float32)
    from mvdfusion_tpu.geometry import look_at_view_transform

    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=np.linspace(0, 270, S) + 90)
    f = jnp.full((S, 2), 2.1875)
    c = jnp.zeros((S, 2))
    ii, ti = jnp.asarray([0]), jnp.asarray([1, 2, 3])

    params = jax.jit(lambda *a: model_xla.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(0), images, R, T, f, c, ii, ti, jax.random.PRNGKey(1)
    )
    prep = jax.jit(lambda p, *a: model_xla.apply(p, *a, method=ViewFusion.prepare_batch))
    lat, cams, in_lat, in_cams, clip_v = prep(params, images, R, T, f, c, ii, ti)

    def fwd(m, p, lat, cams, in_lat, in_cams, clip_v):
        B = lat.shape[0]
        noisy = lat  # any latent-shaped tensor works as "noisy" input
        t = jnp.full((B,), 37, jnp.int32)
        return m.apply(
            p, noisy, cams, in_lat, in_cams, clip_v, t, jax.random.PRNGKey(5),
            method=ViewFusion.apply_model,
        )

    ref = np.asarray(jax.jit(lambda *a: fwd(model_xla, *a))(
        params, lat, cams, in_lat, in_cams, clip_v
    ))

    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    p_tp = jax.device_put(params, param_shardings(params, mesh))
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    put = lambda x: jax.device_put(x, rep)
    out = np.asarray(jax.jit(lambda *a: fwd(model_fused, *a))(
        p_tp, put(lat), jax.tree.map(put, cams), put(in_lat),
        jax.tree.map(put, in_cams), put(clip_v)
    ))
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_sp_view_parallel_train_step():
    """3-axis (dp=2, sp=2, tp=2) mesh: scenes shard over dp, the per-scene
    TARGET-VIEW axis over sp (each target view is an independent query batch
    through the UNet; the cross-view coupling lives only in GridAttn's input
    views, which stay replicated — SURVEY §5 long-context axis), tensors over
    tp. The sharded loss must equal the single-device loss on the same data
    and rng."""
    from mvdfusion_tpu.geometry import look_at_view_transform
    from mvdfusion_tpu.pipeline.trainer import (
        TrainConfig, init_train_state, make_train_step, TrainState,
    )

    cfg = ViewFusionConfig().tiny()
    model = ViewFusion(cfg)
    tc = TrainConfig(grad_accum_step=1)

    rng = np.random.default_rng(3)
    S, IMG = 5, cfg.latent_size * 4
    n_scenes = 2

    def scene(i):
        images = jnp.asarray(rng.uniform(size=(S, IMG, IMG, 3)), jnp.float32)
        R, T = look_at_view_transform(
            dist=1.5, elev=30.0, azim=np.linspace(0, 288, S) + 90 + 7 * i
        )
        return images, jnp.asarray(R), jnp.asarray(T), jnp.full((S, 2), 2.1875), jnp.zeros((S, 2))

    scenes = [scene(i) for i in range(n_scenes)]
    batch = {
        "images": jnp.stack([s[0] for s in scenes]),
        "R": jnp.stack([s[1] for s in scenes]),
        "T": jnp.stack([s[2] for s in scenes]),
        "f": jnp.stack([s[3] for s in scenes]),
        "c": jnp.stack([s[4] for s in scenes]),
        "input_idx": jnp.zeros((n_scenes, 1), jnp.int32),
        "target_idx": jnp.tile(jnp.asarray([[1, 2, 3, 4]], jnp.int32), (n_scenes, 1)),
    }

    params = jax.jit(lambda *a: model.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(0),
        batch["images"][0], batch["R"][0], batch["T"][0], batch["f"][0],
        batch["c"][0], batch["input_idx"][0], batch["target_idx"][0],
        jax.random.PRNGKey(1),
    )

    # single-device reference
    state = init_train_state(params, tc)
    _, loss_ref = jax.jit(make_train_step(model, tc))(state, batch, jax.random.PRNGKey(7))
    loss_ref = float(loss_ref)

    # (dp, sp, tp) mesh: scene arrays over dp; target_idx over (dp, sp)
    mesh = make_mesh(dp=2, tp=2, sp=2)
    assert dict(mesh.shape) == {"dp": 2, "sp": 2, "tp": 2}
    from jax.sharding import NamedSharding, PartitionSpec as P

    p_shard = param_shardings(params, mesh)
    data_shard = {
        k: NamedSharding(mesh, P("dp", "sp") if k == "target_idx" else P("dp"))
        for k in batch
    }
    params_s = jax.device_put(params, p_shard)
    state_s = init_train_state(params_s, tc)
    step = jax.jit(
        make_train_step(model, tc),
        in_shardings=(
            TrainState(params=p_shard, opt_state=None, step=None),
            data_shard,
            None,
        ),
    )
    batch_s = {k: jax.device_put(v, data_shard[k]) for k, v in batch.items()}
    _, loss_sp = step(state_s, batch_s, jax.random.PRNGKey(7))
    loss_sp = float(loss_sp)
    assert np.isfinite(loss_sp)
    np.testing.assert_allclose(loss_sp, loss_ref, rtol=2e-5)


def test_dryrun_multichip_8dev(monkeypatch):
    # strict: the 3-axis (dp, sp, tp) path must succeed itself — the driver's
    # graceful (dp, tp) fallback would otherwise mask sp regressions here
    monkeypatch.setenv("MVDF_DRYRUN_STRICT", "1")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_unet_remat_exact_loss_and_grads():
    """unet_remat=True (nn.remat around every UNet block — the train-memory
    feature bench.py --train needs on a 16 GB chip) must be pure
    rematerialization: p_losses value AND gradients bit-match the
    unrematerialized model with the same params/rng."""
    from mvdfusion_tpu.geometry import look_at_view_transform

    cfg = ViewFusionConfig().tiny()
    S, IMG = 4, cfg.latent_size * 4
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(S, IMG, IMG, 3)), jnp.float32)
    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=np.linspace(0, 270, S) + 90)
    f = jnp.full((S, 2), 2.1875)
    c = jnp.zeros((S, 2))
    args = (images, R, T, f, c, jnp.asarray([0]), jnp.asarray([1, 2]), jax.random.PRNGKey(7))

    import dataclasses

    base = ViewFusion(cfg)
    remat = ViewFusion(dataclasses.replace(cfg, unet_remat=True))
    params = jax.jit(lambda *a: base.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(0), *args
    )

    def loss(model, p):
        return model.apply(p, *args, method=ViewFusion.p_losses)

    l0, g0 = jax.jit(jax.value_and_grad(lambda p: loss(base, p)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(lambda p: loss(remat, p)))(params)
    assert float(l0) == float(l1)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frozen_master_dtype_policy():
    """init_train_state's auto policy: frozen >=2-D leaves go bf16 only when
    the model computes in bf16; trainable leaves and 1-D scales/biases stay
    f32 (fp32-island norms read exact parameters); f32-compute models are
    untouched (CPU test configs must keep exact numerics)."""
    import dataclasses

    from mvdfusion_tpu.pipeline.trainer import init_train_state

    params = {
        "params": {
            "vae": {"k": jnp.ones((4, 4)), "scale": jnp.ones((4,))},
            "view_attn": {"k": jnp.ones((4, 4))},
        }
    }
    tc = TrainConfig()
    bf_model = ViewFusion(ViewFusionConfig())  # flagship: dtype=bf16
    f32_model = ViewFusion(ViewFusionConfig().tiny())  # dtype=f32

    st = init_train_state(params, tc, bf_model)
    assert st.params["params"]["vae"]["k"].dtype == jnp.bfloat16
    assert st.params["params"]["vae"]["scale"].dtype == jnp.float32
    assert st.params["params"]["view_attn"]["k"].dtype == jnp.float32

    st = init_train_state(params, tc, f32_model)
    assert st.params["params"]["vae"]["k"].dtype == jnp.float32
    # no model: conservative f32
    st = init_train_state(params, tc)
    assert st.params["params"]["vae"]["k"].dtype == jnp.float32
