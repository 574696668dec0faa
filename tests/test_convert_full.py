"""Converter end-to-end proof (VERDICT round-1 item #3).

Synthesizes FULL reference-layout checkpoints from the torch replicas in
tests/torch_ref.py (exact reference state-dict naming: the
unet_model.unet_model. double prefix, post-param_mapper graft positions,
cc_projection.{0,2,4}, clip_image_encoder.model.visual.*, scheduler buffers,
dead view_attn.t_embedder) and proves the mapping tables land every tensor:

  * load_viewfusion: 0 missing table rows on either side, 0 untouched flax
    params, unused torch keys limited to the documented dead set.
  * load_zero123_unet: a PRE-surgery zero123-style checkpoint (stock UNet,
    8-in/4-out convs, model.diffusion_model. prefix, pre-insertion block
    positions) passes key surgery and covers everything except the grafted
    view-attn rows and the shape-changed convs (reference unet.py:70-93,
    viewfusion_zero_depth_rgb.py:69).

A single wrong mapping row fails these tests.
"""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

import jax
import jax.numpy as jnp

from mvdfusion_tpu.convert.mapping import unet_mapping, viewfusion_mapping
from mvdfusion_tpu.convert.surgery import ZERO123_PARAM_MAPPER, ZERO123_REMOVE_KEYS, apply_surgery
from mvdfusion_tpu.convert.torch_to_flax import apply_mapping
from mvdfusion_tpu.nn.viewfusion import ViewFusion, ViewFusionConfig

import torch_ref


def structural_config() -> ViewFusionConfig:
    """Reference STRUCTURE (channel_mult / res blocks / attention resolutions
    identical to configs/mvd_gso.yaml, so all index bookkeeping in the mapping
    tables is exercised) at small widths."""
    return dataclasses.replace(
        ViewFusionConfig(),
        latent_size=32,
        viewattn_hidden=32,
        viewattn_layers=2,
        viewattn_heads=4,
        unet_model_channels=32,
        unet_num_heads=4,
        context_dim=64,
        vae_ch=32,
        clip_width=64,
        clip_layers=2,
        clip_heads=4,
        time_embed_dim=32,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def flax_params():
    cfg = structural_config()
    model = ViewFusion(cfg)
    from mvdfusion_tpu.geometry import look_at_view_transform

    S, IMG = 4, 256
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(S, IMG, IMG, 3)), jnp.float32)
    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=np.linspace(0, 270, S) + 90)
    params = jax.jit(lambda *a: model.init(*a, method=ViewFusion.init_all))(
        jax.random.PRNGKey(0), images, jnp.asarray(R), jnp.asarray(T),
        jnp.full((S, 2), 2.1875), jnp.zeros((S, 2)),
        jnp.asarray([0]), jnp.asarray([1, 2, 3]), jax.random.PRNGKey(1),
    )
    return cfg, jax.device_get(params)


# keys a real mvdfusion_sep23.pt carries that the converter intentionally
# drops: scheduler buffers, GridAttn's dead t_embedder, CLIP text leftovers
EXPECTED_DEAD_PREFIXES = (
    "scheduler.",
    "view_attn.t_embedder.",
    "clip_image_encoder.model.token_embedding",
    "clip_image_encoder.model.positional_embedding",
    "clip_image_encoder.model.ln_final",
    "clip_image_encoder.model.text_projection",
    "clip_image_encoder.model.logit_scale",
)


def test_full_viewfusion_checkpoint_round_trip(flax_params):
    cfg, params = flax_params
    tmodel = torch_ref.randomize_(torch_ref.ViewFusion(
        mc=cfg.unet_model_channels, context_dim=cfg.context_dim,
        va_hidden=cfg.viewattn_hidden, va_layers=cfg.viewattn_layers,
        va_heads=cfg.viewattn_heads, vae_ch=cfg.vae_ch,
        clip_width=cfg.clip_width, clip_layers=cfg.clip_layers,
        clip_heads=cfg.clip_heads, time_embed_dim=cfg.time_embed_dim,
        image_size=cfg.latent_size,
    ))
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    table = viewfusion_mapping(cfg)

    new_params, stats = apply_mapping(
        params, state, table, verbose=False, strict=True, return_stats=True
    )
    # every table row landed
    assert stats.missing_flax == [], stats.missing_flax[:10]
    assert stats.missing_torch == [], stats.missing_torch[:10]
    # every flax param is covered by the table — nothing silently keeps init
    assert stats.untouched_flax == [], stats.untouched_flax[:10]
    # unused torch keys are exactly the documented dead set
    stray = [k for k in stats.unused_torch if not k.startswith(EXPECTED_DEAD_PREFIXES)]
    assert stray == [], stray[:10]
    # and there IS a dead set (the synthetic ckpt carries it like a real one)
    assert any(k.startswith("scheduler.") for k in stats.unused_torch)

    # spot value checks through the trickiest rows: the double-prefix UNet
    # graft and a deep output block
    flat = {
        "/".join(str(getattr(kk, "key", kk)) for kk in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(new_params)[0]
    }
    np.testing.assert_allclose(
        flat["params/unet/mid_view_attn/proj_in/kernel"],
        state["unet_model.unet_model.middle_block.2.aligned_attn_proj_in.weight"].T,
        atol=0,
    )
    np.testing.assert_allclose(
        flat["params/unet/up_0_view_attn_2/block_0/attn2/to_k/kernel"],
        state[
            "unet_model.unet_model.output_blocks.11.2.aligned_attn_transformer_blocks.0.attn2.to_k.weight"
        ].T,
        atol=0,
    )
    np.testing.assert_allclose(
        flat["params/cc_layers_2/kernel"], state["cc_projection.4.weight"].T, atol=0
    )
    # conversion actually changed the values (init can't satisfy the asserts
    # above by accident given randomize_, but belt-and-braces)
    old_flat = {
        "/".join(str(getattr(kk, "key", kk)) for kk in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    changed = sum(
        not np.array_equal(flat[k], old_flat[k]) for k in flat
    )
    assert changed == len(flat), f"only {changed}/{len(flat)} params changed"


def test_full_apply_model_cfg_parity(flax_params):
    """The whole denoising core — GridAttn -> cc_projection -> volume
    pyramid -> grafted UNet with CFG — against a torch composition of the
    reference semantics, through converted weights and a shared depth-jitter
    stream. This is the 'full apply_model' golden test SURVEY.md §4 calls
    for (reference viewfusion_zero_depth_rgb.py:282-345 + unet.py:166-209)."""
    import torch

    from mvdfusion_tpu.geometry import look_at_view_transform
    from mvdfusion_tpu.geometry.cameras import make_cameras

    cfg, params = flax_params
    tm = torch_ref.randomize_(torch_ref.ViewFusion(
        mc=cfg.unet_model_channels, context_dim=cfg.context_dim,
        va_hidden=cfg.viewattn_hidden, va_layers=cfg.viewattn_layers,
        va_heads=cfg.viewattn_heads, vae_ch=cfg.vae_ch,
        clip_width=cfg.clip_width, clip_layers=cfg.clip_layers,
        clip_heads=cfg.clip_heads, time_embed_dim=cfg.time_embed_dim,
        image_size=cfg.latent_size,
    ), std=0.04, seed=11).eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = apply_mapping(params, state, viewfusion_mapping(cfg), verbose=False, strict=True)

    model = ViewFusion(cfg)
    B = 3
    H = cfg.latent_size
    rng = np.random.default_rng(4)
    azim = np.linspace(0, 360 * (B - 1) / B, B)
    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=azim + 90)
    f = np.full((B, 2), 2.1875, np.float32)
    c = np.zeros((B, 2), np.float32)
    noisy = rng.normal(size=(B, H, H, 5)).astype(np.float32) * 0.5
    in_lat = rng.normal(size=(1, H, H, 5)).astype(np.float32) * 0.5
    clip_v = rng.normal(size=(B, 1, cfg.context_dim + 28)).astype(np.float32)
    t = np.full((B,), 500, np.int64)
    jitter = rng.normal(size=(B, H, H, 1)).astype(np.float32)
    scale = 2.5

    ours = np.asarray(model.apply(
        params, jnp.asarray(noisy), make_cameras(R, T, f, c), jnp.asarray(in_lat),
        make_cameras(R[:1], T[:1], f[:1], c[:1]), jnp.asarray(clip_v),
        jnp.asarray(t, jnp.int32), jax.random.PRNGKey(0), jnp.asarray(scale),
        attn_jitter_noise=jnp.asarray(jitter),
        method=ViewFusion.apply_model_cfg,
    ))

    rs = torch_ref.ReferenceSampler(
        tm,
        tuple(torch.from_numpy(a) for a in (R, T, f, c)),
        torch.from_numpy(in_lat).permute(0, 3, 1, 2),
        tuple(torch.from_numpy(a[:1]) for a in (R, T, f, c)),
        torch.from_numpy(clip_v),
        time_embed_dim=cfg.time_embed_dim,
        z_scale_factor=cfg.z_scale_factor,
        timesteps=cfg.timesteps,
    )
    ref = rs.apply_model_cfg(
        torch.from_numpy(noisy).permute(0, 3, 1, 2),
        torch.from_numpy(t),
        torch.from_numpy(jitter).permute(0, 3, 1, 2),
        scale,
    ).permute(0, 2, 3, 1).numpy()

    assert ours.shape == ref.shape == (B, H, H, 5)
    np.testing.assert_allclose(ours, ref, atol=2e-3)
    assert np.abs(ours - ref).max() < 1e-3, np.abs(ours - ref).max()


def test_full_ddim_trajectory_parity(flax_params):
    """End-to-end shared-noise DDIM trajectory parity (BASELINE.md north
    star, reference sampler.py:90-148): 4 steps of the full CFG denoising
    loop with feed_prev_depth=True. The init latent, per-step DDIM z draws
    and per-step GridAttn jitter are injected identically into our
    lax.scan-compiled sampler and the torch reference loop; the pred_x0
    trajectory and final latents must match. This exercises the scan index
    order, the +1 DDIM timestep offset, eta=1 sigma tables, the step-0
    unbiased-depth fallback and the prev_depth feed in composition."""
    import torch

    from mvdfusion_tpu.geometry import look_at_view_transform
    from mvdfusion_tpu.geometry.cameras import make_cameras
    from mvdfusion_tpu.pipeline.sampler import ddim_sample

    cfg, params = flax_params
    tm = torch_ref.randomize_(torch_ref.ViewFusion(
        mc=cfg.unet_model_channels, context_dim=cfg.context_dim,
        va_hidden=cfg.viewattn_hidden, va_layers=cfg.viewattn_layers,
        va_heads=cfg.viewattn_heads, vae_ch=cfg.vae_ch,
        clip_width=cfg.clip_width, clip_layers=cfg.clip_layers,
        clip_heads=cfg.clip_heads, time_embed_dim=cfg.time_embed_dim,
        image_size=cfg.latent_size,
    ), std=0.04, seed=11).eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = apply_mapping(params, state, viewfusion_mapping(cfg), verbose=False, strict=True)

    model = ViewFusion(cfg)
    B, S = 3, 4
    H = cfg.latent_size
    rng = np.random.default_rng(7)
    azim = np.linspace(0, 360 * (B - 1) / B, B)
    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=azim + 90)
    f = np.full((B, 2), 2.1875, np.float32)
    c = np.zeros((B, 2), np.float32)
    in_lat = (rng.normal(size=(1, H, H, 5)) * 0.5).astype(np.float32)
    clip_v = (rng.normal(size=(B, 1, cfg.context_dim + 28)) * 0.3).astype(np.float32)
    init = rng.normal(size=(B, H, H, 5)).astype(np.float32)
    zstep = rng.normal(size=(S, B, H, H, 5)).astype(np.float32)
    jitter = rng.normal(size=(S, B, H, H, 1)).astype(np.float32)
    scale = 2.5

    res = ddim_sample(
        params, model, make_cameras(R, T, f, c), jnp.asarray(in_lat),
        make_cameras(R[:1], T[:1], f[:1], c[:1]), jnp.asarray(clip_v),
        jax.random.PRNGKey(0), jnp.asarray(scale), num_steps=S,
        feed_prev_depth=True, return_trajectory=True,
        init_noise=jnp.asarray(init), step_noise=jnp.asarray(zstep),
        jitter_noise=jnp.asarray(jitter),
    )
    ours_final = np.asarray(res.latents)
    ours_traj = np.asarray(res.pred_x0_trajectory)

    rs = torch_ref.ReferenceSampler(
        tm,
        tuple(torch.from_numpy(a) for a in (R, T, f, c)),
        torch.from_numpy(in_lat).permute(0, 3, 1, 2),
        tuple(torch.from_numpy(a[:1]) for a in (R, T, f, c)),
        torch.from_numpy(clip_v),
        time_embed_dim=cfg.time_embed_dim,
        z_scale_factor=cfg.z_scale_factor,
        timesteps=cfg.timesteps,
    )
    ref_final, ref_traj = rs.ddim_sample(
        torch.from_numpy(init).permute(0, 3, 1, 2),
        torch.from_numpy(zstep).permute(0, 1, 4, 2, 3),
        torch.from_numpy(jitter).permute(0, 1, 4, 2, 3),
        scale, S, feed_prev_depth=True,
    )
    ref_final = ref_final.permute(0, 2, 3, 1).numpy()
    ref_traj = ref_traj.permute(0, 1, 3, 4, 2).numpy()

    assert ours_traj.shape == ref_traj.shape == (S, B, H, H, 5)
    np.testing.assert_allclose(ours_traj, ref_traj, atol=6e-3)
    np.testing.assert_allclose(ours_final, ref_final, atol=6e-3)


def test_zero123_unet_surgery_round_trip(flax_params):
    """Pre-surgery zero123 layout -> surgery -> mapping. The stock UNet has
    no grafted layers and 8-in/4-out convs; after key surgery every UNet row
    must land EXCEPT the view-attn rows and the removed shape-changed convs."""
    cfg, params = flax_params
    stock = torch_ref.randomize_(torch_ref.UNetModel(
        in_channels=8, model_channels=cfg.unet_model_channels, out_channels=4,
        num_heads=cfg.unet_num_heads, context_dim=cfg.context_dim,
        image_size=cfg.latent_size, grafts=False,
    ), seed=7)
    state = {
        "model.diffusion_model." + k: v.detach().numpy()
        for k, v in stock.state_dict().items()
    }
    # sanity: the pre-surgery positions exist (middle_block.2 = 2nd ResBlock,
    # output_blocks.5.2 / 8.2 = Upsample convs)
    assert "model.diffusion_model.middle_block.2.in_layers.0.weight" in state
    assert "model.diffusion_model.output_blocks.5.2.conv.weight" in state

    surgered = apply_surgery(
        state,
        replace_key=("model.diffusion_model.", ""),
        param_mapper=ZERO123_PARAM_MAPPER,
        remove_keys=ZERO123_REMOVE_KEYS,
        ignore_keys=("aligned_attn_",),
    )
    # post-surgery positions
    assert "middle_block.3.in_layers.0.weight" in surgered
    assert "output_blocks.5.3.conv.weight" in surgered
    assert "input_blocks.0.0.weight" not in surgered

    table = {("unet",) + k: v for k, v in unet_mapping(cfg).items()}
    new_params, stats = apply_mapping(
        params, surgered, table, verbose=False, return_stats=True
    )
    assert stats.missing_flax == [], stats.missing_flax[:10]
    # the ONLY rows allowed to miss: grafted view-attn params + the removed
    # shape-changed convs (kept at init, exactly the reference behavior)
    allowed = lambda k: "aligned_attn_" in k or k in (
        "input_blocks.0.0.weight", "out.2.weight", "out.2.bias",
    )
    stray = [k for k in stats.missing_torch if not allowed(k)]
    assert stray == [], stray[:10]
    assert any("aligned_attn_" in k for k in stats.missing_torch)
    # every surgered torch key was consumed
    assert stats.unused_torch == [], stats.unused_torch[:10]
