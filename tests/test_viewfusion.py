"""End-to-end tiny-model tests: prepare_batch -> apply_model -> DDIM sample,
and the training loss. Runs the full stack with random weights on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mvdfusion_tpu.geometry import look_at_view_transform
from mvdfusion_tpu.nn.viewfusion import ViewFusion, ViewFusionConfig
from mvdfusion_tpu.pipeline.sampler import ddim_sample

S = 8  # scene views
B = 3  # target views
IMG = 64  # image size -> latent 16 with vae_ch_mult (1,2,4)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ViewFusionConfig().tiny()
    model = ViewFusion(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(S, IMG, IMG, 3)), jnp.float32)
    azim = np.linspace(0, 315, S)
    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=azim + 90)
    batch = dict(
        images=images,
        R=jnp.asarray(R),
        T=jnp.asarray(T),
        f=jnp.full((S, 2), 2.1875),
        c=jnp.zeros((S, 2)),
        input_idx=jnp.asarray([0]),
        target_idx=jnp.asarray([2, 4, 6]),
    )
    params = jax.jit(
        lambda *a: model.init(*a, method=ViewFusion.init_all)
    )(
        jax.random.PRNGKey(0),
        batch["images"],
        batch["R"],
        batch["T"],
        batch["f"],
        batch["c"],
        batch["input_idx"],
        batch["target_idx"],
        jax.random.PRNGKey(1),
    )
    return model, params, batch


def test_p_losses_finite(tiny_model):
    model, params, batch = tiny_model
    loss = jax.jit(
        lambda p, *a: model.apply(p, *a, method=ViewFusion.p_losses)
    )(
        params,
        batch["images"],
        batch["R"],
        batch["T"],
        batch["f"],
        batch["c"],
        batch["input_idx"],
        batch["target_idx"],
        jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_p_losses_objectives_and_loss_type(tiny_model):
    """objective='x_start' targets the clean latents (viewfusion:382-387);
    loss_type other than l2 raises, matching the reference NotImplementedError
    (viewfusion:86-88)."""
    import dataclasses

    model, params, batch = tiny_model
    args = (
        batch["images"], batch["R"], batch["T"], batch["f"], batch["c"],
        batch["input_idx"], batch["target_idx"], jax.random.PRNGKey(2),
    )
    m_x0 = ViewFusion(dataclasses.replace(model.cfg, objective="x_start"))
    loss_noise = model.apply(params, *args, method=ViewFusion.p_losses)
    loss_x0 = m_x0.apply(params, *args, method=ViewFusion.p_losses)
    assert np.isfinite(float(loss_x0)) and float(loss_x0) > 0
    # same params + same rng, different target -> different loss
    assert abs(float(loss_x0) - float(loss_noise)) > 1e-6
    m_bad = ViewFusion(dataclasses.replace(model.cfg, loss_type="l1"))
    with pytest.raises(NotImplementedError):
        m_bad.apply(params, *args, method=ViewFusion.p_losses)


def test_prepare_batch_shapes(tiny_model):
    model, params, batch = tiny_model
    latents, cams, in_latents, in_cams, clip_v = jax.jit(
        lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch)
    )(
        params,
        batch["images"],
        batch["R"],
        batch["T"],
        batch["f"],
        batch["c"],
        batch["input_idx"],
        batch["target_idx"],
    )
    ls = model.cfg.latent_size
    assert latents.shape == (B, ls, ls, 5)
    assert in_latents.shape == (1, ls, ls, 5)
    # input-view depth channel force-zeroed (viewfusion:214-215)
    np.testing.assert_allclose(np.asarray(in_latents[..., 4]), 0.0, atol=0)
    assert clip_v.shape == (B, 1, model.cfg.context_dim + 28)
    # relative camera: input view rotation becomes identity
    np.testing.assert_allclose(np.asarray(in_cams.R[0]), np.eye(3), atol=1e-5)


def test_ddim_sample_runs(tiny_model):
    model, params, batch = tiny_model
    _, cams, in_latents, in_cams, clip_v = jax.jit(
        lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch)
    )(
        params,
        batch["images"],
        batch["R"],
        batch["T"],
        batch["f"],
        batch["c"],
        batch["input_idx"],
        batch["target_idx"],
    )
    res = ddim_sample(
        params,
        model,
        cams,
        in_latents,
        in_cams,
        clip_v,
        jax.random.PRNGKey(3),
        jnp.asarray(2.5),
        num_steps=4,
    )
    ls = model.cfg.latent_size
    assert res.latents.shape == (B, ls, ls, 5)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_feed_prev_depth_step0_matches_unbiased_estimate(tiny_model):
    """Reference sampler.py:116: prev_depth starts None, so the FIRST step
    with feed_prev_depth=True must equal the feed_prev_depth=False path
    (GridAttn's unbiased x_t/sqrt(abar) fallback). With >1 steps they must
    diverge (later steps feed pred_x0's depth)."""
    model, params, batch = tiny_model
    # freshly-initialized params zero the UNet's final conv (SD zero_module
    # init), making the whole model constant-zero; perturb every leaf so the
    # sampler actually depends on the attention depth
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)],
    )
    _, cams, in_latents, in_cams, clip_v = jax.jit(
        lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch)
    )(
        params,
        batch["images"], batch["R"], batch["T"], batch["f"], batch["c"],
        batch["input_idx"], batch["target_idx"],
    )
    run = lambda steps, fpd: ddim_sample(
        params, model, cams, in_latents, in_cams, clip_v,
        jax.random.PRNGKey(3), jnp.asarray(2.5), num_steps=steps, feed_prev_depth=fpd,
    ).latents
    one_a, one_b = run(1, True), run(1, False)
    np.testing.assert_allclose(np.asarray(one_a), np.asarray(one_b), atol=1e-5)
    two_a, two_b = run(2, True), run(2, False)
    assert np.abs(np.asarray(two_a) - np.asarray(two_b)).max() > 1e-5


def test_decode_roundtrip_shapes(tiny_model):
    model, params, batch = tiny_model
    z = jnp.zeros((B, model.cfg.latent_size, model.cfg.latent_size, 4))
    img = jax.jit(lambda p, a: model.apply(p, a, method=ViewFusion.decode_latents))(params, z)
    assert img.shape == (B, IMG, IMG, 3)
    assert (np.asarray(img) >= 0).all() and (np.asarray(img) <= 1).all()


def test_ablate_frustum_removes_cross_view_dependence(tiny_model):
    """cfg.ablate_frustum zeros the GridAttn frustum, leaving everything
    else identical. Behavioral pin: apply_model's `batch_cameras` argument
    feeds ONLY GridAttn (the pose conditioning rides clip_v_embed), so the
    ablated model must be invariant to perturbing it while the normal model
    must not be. Used by the consistency ablation (tools/overfit_synthetic)."""
    import dataclasses

    model, params, batch = tiny_model
    # at init the view-aligned sites' proj_out is ZERO (reference zero_module
    # semantics, attention.py:283) so the frustum contributes exactly nothing;
    # un-zero those projections so the mechanism is live for this test
    def unzero(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        hit = ("proj_out" in names and any("view_attn" in n for n in names)) or (
            "conv_out" in names  # the UNet's zero-init final conv: at init
            # the whole UNet returns zeros regardless of input
        )
        if hit and names[-1] == "kernel":
            seed = abs(hash(tuple(names))) % (2**31)
            return jax.random.normal(jax.random.PRNGKey(seed), leaf.shape, leaf.dtype) * 0.05
        return leaf

    params = jax.tree_util.tree_map_with_path(unzero, params)
    prep = jax.jit(lambda p, *a: model.apply(p, *a, method=ViewFusion.prepare_batch))
    latents, cams, in_lat, in_cams, clip_v = prep(
        params, batch["images"], batch["R"], batch["T"], batch["f"], batch["c"],
        batch["input_idx"], batch["target_idx"],
    )
    ablated = ViewFusion(dataclasses.replace(model.cfg, ablate_frustum=True))
    t = jnp.full((B,), 117, jnp.int32)
    rng = jax.random.PRNGKey(5)
    # perturb the cameras GridAttn unprojects/gathers with (NB: Cameras
    # overrides __len__ as the batch size, which breaks namedtuple._replace)
    cams2 = type(cams)(cams.R, cams.T + 0.25, cams.focal_length, cams.principal_point)

    def run(m, cc):
        return m.apply(
            params, latents, cc, in_lat, in_cams, clip_v, t, rng,
            method=ViewFusion.apply_model,
        )

    out_n1, out_n2 = run(model, cams), run(model, cams2)
    out_a1, out_a2 = run(ablated, cams), run(ablated, cams2)
    assert float(jnp.max(jnp.abs(out_n1 - out_n2))) > 1e-5, "normal model ignores cameras?"
    np.testing.assert_allclose(np.asarray(out_a1), np.asarray(out_a2), atol=1e-6)
    assert float(jnp.max(jnp.abs(out_n1 - out_a1))) > 1e-5, "ablation is a no-op?"
