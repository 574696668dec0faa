"""ViewFusion: the top-level multi-view RGB-D latent diffusion model.

Independent Flax re-design of mvdfusion/viewfusion_zero_depth_rgb.py:19-417.
Owns the UNet, VAE, CLIP tower, GridAttn, cc-projection and the auxiliary
time-embed MLP; exposes pure methods that pipeline/ jits:

  prepare_batch  (:165-273)  — view split, VAE encode, depth channels,
                               relative cameras, CLIP + camera-pose embed
  apply_model    (:282-345)  — GridAttn -> cc_projection -> UNet (CFG as a
                               single batched 2B forward, not 2 passes)
  p_losses       (:362-392)  — shared-t noise-prediction L2

Stochasticity is explicit: every random draw (view permutation, t, noise,
depth jitter, CFG dropout) consumes a caller-provided PRNG key.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvdfusion_tpu.core.schedule import DDPMSchedule, make_ddpm_schedule, q_sample
from mvdfusion_tpu.geometry.cameras import Cameras, camera_slice, make_cameras, relative_cameras
from mvdfusion_tpu.nn.clip import FrozenCLIPImageEmbedder
from mvdfusion_tpu.nn.layers import Dtype, timestep_embedding
from mvdfusion_tpu.nn.unet import UNetModel, volume_pyramid
from mvdfusion_tpu.nn.vae import AutoencoderKL
from mvdfusion_tpu.nn.viewattn import GridAttn
from mvdfusion_tpu.ops.image import area_downsample
from mvdfusion_tpu.utils.common import normalize, unnormalize


@dataclasses.dataclass(frozen=True)
class ViewFusionConfig:
    """Static model hyperparameters (configs/mvd_gso.yaml `model.params`)."""

    # top level (viewfusion_zero_depth_rgb.py:21-55)
    z_scale_factor: float = 0.18215
    embed_camera_pose: bool = True
    drop_conditions: bool = False
    objective: str = "noise"  # 'noise' | 'x_start' (viewfusion:382-387)
    loss_type: str = "l2"  # only l2 exists in the reference (viewfusion:86-88)
    feed_prev_depth: bool = False  # viewfusion:39,92,375-379
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    time_embed_dim: int = 256
    latent_size: int = 32
    # view_attn_config (configs/mvd_gso.yaml:20-28)
    viewattn_hidden: int = 256
    viewattn_layers: int = 3
    viewattn_heads: int = 8
    viewattn_mlp_ratio: float = 2.0
    n_pts_per_ray: int = 1
    keep_top_k_views: bool = False
    top_k: int = 4
    # unet_config (configs/mvd_gso.yaml:30-46)
    unet_in_channels: int = 10
    unet_out_channels: int = 5
    unet_model_channels: int = 320
    unet_num_res_blocks: int = 2
    unet_attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    unet_channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    unet_num_heads: int = 8
    unet_transformer_depth: int = 1
    context_dim: int = 768
    # vae_config (configs/mvd_gso.yaml:53-74)
    vae_embed_dim: int = 4
    vae_ch: int = 128
    vae_ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    vae_num_res_blocks: int = 2
    # clip tower
    clip_width: int = 1024
    clip_layers: int = 24
    clip_heads: int = 16
    # compute dtype for the heavy towers
    dtype: Any = jnp.bfloat16
    # Pallas dispatch for the UNet transformer sites + GridAttn crossview:
    # "auto" (fuse on TPU when shapes qualify) | "never" | "interpret"
    # (force the kernels in interpreter mode — CPU parity/sharding tests)
    fuse_mode: str = "auto"
    # ablation switch: zero the GridAttn frustum before the UNet, leaving
    # everything else (params, CFG, concat/CLIP conditioning) identical —
    # used to demonstrate the cross-view mechanism is load-bearing for the
    # consistency metric (reference claim README.md:11-12, mechanism
    # view_attn_efficient2.py:413-442). Static: zero cost when False.
    ablate_frustum: bool = False
    # per-block UNet rematerialization for training memory (see
    # nn/unet.py::UNetModel.remat); identical math, parity-tested
    unet_remat: bool = False

    def tiny(self) -> "ViewFusionConfig":
        """A scaled-down config for tests and CPU dryruns."""
        return dataclasses.replace(
            self,
            latent_size=16,
            viewattn_hidden=32,
            viewattn_layers=2,
            viewattn_heads=4,
            unet_model_channels=32,
            unet_num_res_blocks=1,
            unet_num_heads=4,
            context_dim=64,
            vae_ch=32,
            vae_ch_mult=(1, 2, 4),
            vae_num_res_blocks=1,
            clip_width=64,
            clip_layers=2,
            clip_heads=2,
            time_embed_dim=32,
            dtype=jnp.float32,
        )


class ViewFusion(nn.Module):
    cfg: ViewFusionConfig

    def setup(self):
        c = self.cfg
        self.unet = UNetModel(
            in_channels=c.unet_in_channels,
            model_channels=c.unet_model_channels,
            out_channels=c.unet_out_channels,
            num_res_blocks=c.unet_num_res_blocks,
            attention_resolutions=c.unet_attention_resolutions,
            channel_mult=c.unet_channel_mult,
            num_heads=c.unet_num_heads,
            transformer_depth=c.unet_transformer_depth,
            context_dim=c.context_dim,
            dtype=c.dtype,
            fuse_mode=c.fuse_mode,
            remat=c.unet_remat,
        )
        self.vae = AutoencoderKL(
            embed_dim=c.vae_embed_dim,
            ch=c.vae_ch,
            ch_mult=c.vae_ch_mult,
            num_res_blocks=c.vae_num_res_blocks,
            dtype=c.dtype,
        )
        self.clip = FrozenCLIPImageEmbedder(
            width=c.clip_width,
            layers=c.clip_layers,
            heads=c.clip_heads,
            output_dim=c.context_dim,
            dtype=c.dtype,
        )
        self.view_attn = GridAttn(
            input_size=c.latent_size,
            in_channels=5,
            hidden_size=c.viewattn_hidden,
            output_dim=c.context_dim,
            num_heads=c.viewattn_heads,
            mlp_ratio=c.viewattn_mlp_ratio,
            num_layers=c.viewattn_layers,
            n_pts_per_ray=c.n_pts_per_ray,
            keep_top_k_views=c.keep_top_k_views,
            top_k=c.top_k,
            dtype=c.dtype,
            crossview_kernel=c.fuse_mode,
        )
        # cc_projection: 3-layer MLP over [clip 768 | cam embed 28] with
        # eye/zero init of the first layer (viewfusion:107-115)
        def eye_init(key, shape, dtype=jnp.float32):
            del key
            k = jnp.zeros(shape, dtype)
            d = min(self.cfg.context_dim, shape[0])
            return k.at[:d, :d].set(jnp.eye(d, dtype=dtype))

        if c.embed_camera_pose:
            self.cc_layers = [
                nn.Dense(c.context_dim, kernel_init=eye_init, bias_init=nn.initializers.zeros),
                nn.Dense(c.context_dim),
                nn.Dense(c.context_dim),
            ]
        else:
            self.cc_layers = [
                nn.Dense(c.context_dim, kernel_init=eye_init, bias_init=nn.initializers.zeros)
            ]
        # auxiliary time-embed MLP feeding GridAttn (viewfusion:126-132)
        self.time_dense1 = nn.Dense(c.time_embed_dim)
        self.time_dense2 = nn.Dense(c.time_embed_dim)
        self.sched: DDPMSchedule = make_ddpm_schedule(c.timesteps, c.linear_start, c.linear_end)

    # ------------------------------------------------------------------ VAE
    def encode_images(self, images: jnp.ndarray) -> jnp.ndarray:
        """[0,1] NHWC images -> scaled latents (viewfusion:158-159)."""
        z = self.vae.encode_mode(normalize(images))
        return z.astype(jnp.float32) * self.cfg.z_scale_factor

    def decode_latents(self, z: jnp.ndarray) -> jnp.ndarray:
        """latents -> [0,1] NHWC images (viewfusion:161-163)."""
        x = self.vae.decode(z / self.cfg.z_scale_factor)
        return unnormalize(x.astype(jnp.float32))

    def decode_latents_chunked(self, z: jnp.ndarray, max_batch: int = 8) -> jnp.ndarray:
        """Memory-bounded decode in max_batch chunks via lax.map. The
        reference declares vae_max_batch=8 but never chunks (viewfusion:46,
        SURVEY.md §3.5); at 512^2-class outputs chunking is required."""
        B = z.shape[0]
        if B <= max_batch:
            return self.decode_latents(z)
        pad = (-B) % max_batch
        zp = jnp.concatenate([z, jnp.zeros((pad,) + z.shape[1:], z.dtype)]) if pad else z
        chunks = zp.reshape(-1, max_batch, *z.shape[1:])
        out = jax.lax.map(self.decode_latents, chunks)
        return out.reshape(-1, *out.shape[2:])[:B]

    def encode_clip(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.clip(images)

    # ----------------------------------------------------------------- time
    def embed_time(self, t: jnp.ndarray) -> jnp.ndarray:
        h = timestep_embedding(t, self.cfg.time_embed_dim)
        h = self.time_dense1(h)
        return self.time_dense2(nn.silu(h))

    def cc_projection(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, layer in enumerate(self.cc_layers):
            x = layer(x)
            if i + 1 < len(self.cc_layers):
                x = nn.silu(x)
        return x

    # ------------------------------------------------------------ data prep
    def prepare_batch(
        self,
        images: jnp.ndarray,  # (S, H, W, 3) in [0,1]
        R: jnp.ndarray,  # (S, 3, 3)
        T: jnp.ndarray,  # (S, 3)
        f: jnp.ndarray,  # (S, 2)
        c: jnp.ndarray,  # (S, 2)
        input_idx: jnp.ndarray,  # (1,) selected input view
        target_idx: jnp.ndarray,  # (B,) selected target views
        depths: Optional[jnp.ndarray] = None,  # (S, H, W, 1) in [0,1]
        azimuth: Optional[jnp.ndarray] = None,  # (S,) rad — legacy path only
        elevation: Optional[jnp.ndarray] = None,  # (S,) rad — legacy path only
    ):
        """viewfusion:165-273. View selection indices are provided by the
        caller (pipeline handles random/linspace selection so this stays
        shape-static under jit)."""
        S, H, W, _ = images.shape
        B = target_idx.shape[0]
        factor = H // self.cfg.latent_size  # 0.125 area interp (:212)

        sel = jnp.concatenate([input_idx, target_idx])
        latents = self.encode_images(images[sel])
        input_latents, batch_latents = latents[:1], latents[1:]

        if depths is not None:
            d = normalize(depths[sel])
            d = area_downsample(d, factor)
        else:
            d = jnp.zeros((1 + B, self.cfg.latent_size, self.cfg.latent_size, 1))
        # input-view depth is force-zeroed (:214-215)
        input_latents = jnp.concatenate([input_latents, jnp.zeros_like(d[:1])], axis=-1)
        batch_latents = jnp.concatenate([batch_latents, d[1:]], axis=-1)

        cams = make_cameras(R, T, f, c)
        cams = relative_cameras(cams, input_idx)
        input_cameras = camera_slice(cams, input_idx)
        batch_cameras = camera_slice(cams, target_idx)

        clip_embed = self.encode_clip(images[input_idx])  # (1, 1, 768)
        clip_embed = jnp.broadcast_to(clip_embed, (B,) + clip_embed.shape[1:])

        if self.cfg.embed_camera_pose:
            # R 9 + T 3 + f 2 = 14 dims per view, input ++ target (:247-258)
            def cam_vec(cc: Cameras) -> jnp.ndarray:
                return jnp.concatenate(
                    [cc.R.reshape(len(cc), 1, 9), cc.T[:, None, :], cc.focal_length[:, None, :]], -1
                )

            input_embed = jnp.broadcast_to(cam_vec(input_cameras), (B, 1, 14))
            cam_embed = jnp.concatenate([input_embed, cam_vec(batch_cameras)], axis=-1)
            clip_v_embed = jnp.concatenate([clip_embed, cam_embed], axis=-1)
        else:
            # legacy zero123 delta-pose embedding (viewfusion:261-270):
            # [d_elev, sin(d_azim), cos(d_azim), 0] — note the reference
            # negates elevations before differencing
            assert azimuth is not None and elevation is not None
            d_a = azimuth[target_idx] - azimuth[input_idx]
            d_e = (-elevation[target_idx]) - (-elevation[input_idx])
            v = jnp.stack([d_e, jnp.sin(d_a), jnp.cos(d_a), jnp.zeros_like(d_a)], axis=-1)
            clip_v_embed = jnp.concatenate([clip_embed, v[:, None, :]], axis=-1)

        return batch_latents, batch_cameras, input_latents, input_cameras, clip_v_embed

    # ------------------------------------------------------------ the model
    def _unet_inputs(self, noisy_latents, input_latents, frustum):
        """Concat conditioning with the zero123 scale quirk (unet.py:153-158):
        the RGB latent channels of the concat conditioning are divided by the
        VAE scale factor; the depth channel is not."""
        B = noisy_latents.shape[0]
        x_concat = jnp.broadcast_to(input_latents, (B,) + input_latents.shape[1:])
        x_concat = jnp.concatenate(
            [x_concat[..., :4] / self.cfg.z_scale_factor, x_concat[..., 4:]], axis=-1
        )
        x = jnp.concatenate([noisy_latents, x_concat], axis=-1)
        # pyramid in the tower compute dtype: the UNet casts every level to
        # cfg.dtype at use anyway, and on the fused crossview path the
        # frustum's values ARE bf16 (the kernel's output dtype), so the
        # pre-pyramid cast is value-preserving there — this halves the
        # pyramid's HBM traffic (f32 reduces were ~0.14 ms/step of tail)
        levels = volume_pyramid(
            frustum.astype(self.cfg.dtype), len(self.cfg.unet_channel_mult)
        )
        return x, levels

    def apply_model(
        self,
        noisy_latents: jnp.ndarray,  # (B, h, w, 5)
        batch_cameras: Cameras,
        input_latents: jnp.ndarray,  # (1, h, w, 5)
        input_cameras: Cameras,
        clip_v_embed: jnp.ndarray,  # (B, 1, 768+28)
        t: jnp.ndarray,  # (B,)
        rng: jax.Array,
        prev_depth: Optional[jnp.ndarray] = None,
        cond_drop_rng: Optional[jax.Array] = None,
        attn_jitter_noise: Optional[jnp.ndarray] = None,  # parity harness hook
    ) -> jnp.ndarray:
        """Single conditional pass (training / cfg_scale == 1)."""
        B = noisy_latents.shape[0]
        t_embed = self.embed_time(t)
        frustum = self.view_attn(
            noisy_latents,
            batch_cameras,
            jnp.ones((B,)),
            t_embed,
            t,
            self.sched,
            input_latents,
            input_cameras,
            rng,
            overwrite_attn_depth=prev_depth,
            jitter_noise=attn_jitter_noise,
        )
        if self.cfg.ablate_frustum:
            frustum = jnp.zeros_like(frustum)
        clip_embed = self.cc_projection(clip_v_embed)
        x, levels = self._unet_inputs(noisy_latents, input_latents, frustum)

        if cond_drop_rng is not None and self.cfg.drop_conditions:
            # per-sample condition dropout (unet.py:118-151): disjoint 5%
            # bands of a single uniform draw
            r = jax.random.uniform(cond_drop_rng, (B,))
            drop_clip = (r > 0.15) & (r <= 0.2)
            drop_volume = (r > 0.1) & (r <= 0.15)
            drop_concat = (r > 0.05) & (r <= 0.1)
            drop_all = r <= 0.05
            keep = lambda m: (1.0 - m.astype(jnp.float32))
            clip_embed = clip_embed * keep(drop_clip | drop_all)[:, None, None]
            levels = [v * keep(drop_volume | drop_all)[:, None, None, None, None] for v in levels]
            cmask = keep(drop_concat | drop_all)[:, None, None, None]
            x = jnp.concatenate([x[..., :5], x[..., 5:] * cmask], axis=-1)

        return self.unet(x, t, clip_embed, levels)

    def apply_model_cfg(
        self,
        noisy_latents: jnp.ndarray,
        batch_cameras: Cameras,
        input_latents: jnp.ndarray,
        input_cameras: Cameras,
        clip_v_embed: jnp.ndarray,
        t: jnp.ndarray,
        rng: jax.Array,
        cfg_scale: jnp.ndarray,
        prev_depth: Optional[jnp.ndarray] = None,
        attn_jitter_noise: Optional[jnp.ndarray] = None,  # parity harness hook
    ) -> jnp.ndarray:
        """Classifier-free-guided pass (unet.py:166-196), batched.

        The reference runs two sequential UNet calls (cond, uncond); here the
        null condition (zero clip, zero concat, zero frustum) rides the same
        batch: one 2B forward, one weight fetch from HBM.
        """
        B = noisy_latents.shape[0]
        t_embed = self.embed_time(t)
        frustum = self.view_attn(
            noisy_latents,
            batch_cameras,
            jnp.ones((B,)),
            t_embed,
            t,
            self.sched,
            input_latents,
            input_cameras,
            rng,
            overwrite_attn_depth=prev_depth,
            jitter_noise=attn_jitter_noise,
        )
        if self.cfg.ablate_frustum:
            frustum = jnp.zeros_like(frustum)
        clip_embed = self.cc_projection(clip_v_embed)
        x_cond, levels = self._unet_inputs(noisy_latents, input_latents, frustum)
        x_null = jnp.concatenate([noisy_latents, jnp.zeros_like(x_cond[..., 5:])], axis=-1)

        x2 = jnp.concatenate([x_cond, x_null], axis=0)
        ctx2 = jnp.concatenate([clip_embed, jnp.zeros_like(clip_embed)], axis=0)
        levels2 = [jnp.concatenate([v, jnp.zeros_like(v)], axis=0) for v in levels]
        t2 = jnp.concatenate([t, t], axis=0)
        pred = self.unet(x2, t2, ctx2, levels2)
        s, s_uc = pred[:B], pred[B:]
        return s_uc + cfg_scale * (s - s_uc)

    # ------------------------------------------------------------- training
    def init_all(
        self,
        images: jnp.ndarray,
        R: jnp.ndarray,
        T: jnp.ndarray,
        f: jnp.ndarray,
        c: jnp.ndarray,
        input_idx: jnp.ndarray,
        target_idx: jnp.ndarray,
        rng: jax.Array,
        depths: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Initialization entry point: touches every submodule's parameters
        (p_losses covers encoder/CLIP/GridAttn/UNet; decode covers the VAE
        decoder, which no training path otherwise executes)."""
        loss = self.p_losses(images, R, T, f, c, input_idx, target_idx, rng, depths=depths)
        ls = self.cfg.latent_size
        img = self.decode_latents(jnp.zeros((1, ls, ls, self.cfg.vae_embed_dim)))
        return loss + 0.0 * jnp.sum(img)

    def p_losses(
        self,
        images: jnp.ndarray,
        R: jnp.ndarray,
        T: jnp.ndarray,
        f: jnp.ndarray,
        c: jnp.ndarray,
        input_idx: jnp.ndarray,
        target_idx: jnp.ndarray,
        rng: jax.Array,
        depths: Optional[jnp.ndarray] = None,
        feed_prev_depth: Optional[bool] = None,
    ) -> jnp.ndarray:
        """Shared-t L2 on the configured objective (viewfusion:362-392)."""
        if self.cfg.loss_type != "l2":  # matches reference viewfusion:86-88
            raise NotImplementedError(f"loss_type {self.cfg.loss_type!r}")
        if feed_prev_depth is None:
            feed_prev_depth = self.cfg.feed_prev_depth
        batch_latents, batch_cams, input_latents, input_cams, clip_v = self.prepare_batch(
            images, R, T, f, c, input_idx, target_idx, depths=depths
        )
        # encode/encode_clip run under no_grad in the reference
        # (viewfusion:153-163): VAE and CLIP are frozen feature extractors.
        batch_latents, input_latents, clip_v = jax.lax.stop_gradient(
            (batch_latents, input_latents, clip_v)
        )
        B = batch_latents.shape[0]
        rng_t, rng_noise, rng_attn, rng_drop = jax.random.split(rng, 4)
        t0 = jax.random.randint(rng_t, (), 0, self.cfg.timesteps)
        t = jnp.full((B,), t0, jnp.int32)  # share_t=True (scheduler.py:40-50)
        noise = jax.random.normal(rng_noise, batch_latents.shape)
        noisy = q_sample(self.sched, batch_latents, t, noise)
        # feed_prev_depth trains GridAttn on the input latent's depth channel
        # instead of the unbiased estimate (viewfusion:375-379)
        prev_depth = (
            jnp.broadcast_to(input_latents[..., 4:5], noisy[..., 4:5].shape)
            if feed_prev_depth
            else None
        )
        pred = self.apply_model(
            noisy, batch_cams, input_latents, input_cams, clip_v, t, rng_attn,
            prev_depth=prev_depth, cond_drop_rng=rng_drop,
        )
        if self.cfg.objective == "noise":
            target = noise
        elif self.cfg.objective == "x_start":
            target = batch_latents
        else:  # matches reference viewfusion:387
            raise NotImplementedError(f"objective {self.cfg.objective!r}")
        return jnp.mean((target - pred) ** 2)
