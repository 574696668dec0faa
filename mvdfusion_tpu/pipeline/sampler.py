"""Jitted DDIM sampling loop.

Replaces the reference's Python-loop sampler (mvdfusion/sampler.py:90-148,
tqdm over 50 steps with a host round-trip per step) with a single
`lax.scan`-compiled program: the latent buffer is donated through the scan
carry, PRNG keys are threaded functionally, and the whole 50-step trajectory
compiles to one XLA executable.

Reference semantics: eta=1.0 stochastic DDIM, shared timestep across views,
`prev_depth` (pred_x0's depth channel) optionally fed to the next step's
GridAttn (sampler.py:139-140, feed_prev_depth). On the FIRST step the
reference has no prev_depth yet (starts None, sampler.py:116) and GridAttn
falls back to the unbiased noisy-depth estimate x_t[depth]/sqrt(abar_t)
(view_attn_efficient2.py:417-425); here that fallback is reproduced
branch-free with a jnp.where on the step counter.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mvdfusion_tpu.core.schedule import DDIMSchedule, ddim_step, make_ddim_schedule
from mvdfusion_tpu.geometry.cameras import Cameras
from mvdfusion_tpu.nn.viewfusion import ViewFusion


class SampleResult(NamedTuple):
    latents: jnp.ndarray  # (B, H, W, C) final x_0-level sample
    pred_x0_trajectory: jnp.ndarray  # (S, B, H, W, C)


@functools.partial(
    jax.jit,
    static_argnames=("model", "num_steps", "eta", "feed_prev_depth", "return_trajectory"),
)
def ddim_sample(
    params,
    model: ViewFusion,
    batch_cameras: Cameras,
    input_latents: jnp.ndarray,  # (1, h, w, 5)
    input_cameras: Cameras,
    clip_v_embed: jnp.ndarray,  # (B, 1, ctx+28)
    rng: jax.Array,
    cfg_scale: jnp.ndarray,
    num_steps: int = 50,
    eta: float = 1.0,
    feed_prev_depth: bool = False,
    return_trajectory: bool = False,
    init_noise: Optional[jnp.ndarray] = None,  # (B, H, W, C)
    step_noise: Optional[jnp.ndarray] = None,  # (S, B, H, W, C) DDIM z draws
    jitter_noise: Optional[jnp.ndarray] = None,  # (S, B, H, W, D) GridAttn jitter
    x_clip: Optional[jnp.ndarray] = None,  # scalar latent bound (stability rail)
) -> SampleResult:
    """Generate B views of 5-channel (RGB-D) latents.

    The three *_noise arguments override the internal PRNG draws (the
    reference's torch.randn at sampler.py:104, torch.randn at sampler.py:64
    and torch.normal at view_attn_efficient2.py:431) so parity harnesses can
    drive both implementations from one shared noise stream.

    `x_clip` (default None = exact reference semantics; the reference sampler
    has no clipping, mvdfusion/sampler.py:43-66) clamps the latent carry to
    [-x_clip, x_clip] after every DDIM update. With a generous bound it is
    the identity on healthy trajectories and only arrests the exponential
    blow-up a short-trained from-scratch model can hit late in the eta=1.0
    stochastic trajectory (used by tools/overfit_synthetic.py)."""
    cfg = model.cfg
    B = clip_v_embed.shape[0]
    H = W = cfg.latent_size
    C = cfg.unet_out_channels

    # endpoints from the model config so a custom beta schedule stays in sync
    # (tables rebuilt host-side: trace-time jnp constants can't re-enter numpy)
    ddim: DDIMSchedule = make_ddim_schedule(
        cfg.timesteps, num_steps, eta=eta,
        linear_start=cfg.linear_start, linear_end=cfg.linear_end,
    )

    rng, init_rng, z_rng, jit_rng = jax.random.split(rng, 4)
    x = jax.random.normal(init_rng, (B, H, W, C)) if init_noise is None else init_noise
    prev_depth0 = jnp.zeros((B, H, W, 1))

    # All stochastic draws for the trajectory are generated in ONE fused RNG
    # op each, before the scan — 50 small in-scan threefry expansions cost
    # ~3 ms/step of launch/fusion-boundary overhead (round-1 step trace);
    # one (S, B, H, W, C) draw is bandwidth-trivial (<10 MB) and free inside
    # the loop. Explicit step_noise/jitter_noise still override for parity
    # harnesses (shared-noise trajectories).
    if step_noise is None:
        step_noise = jax.random.normal(z_rng, (num_steps, B, H, W, C))
    if jitter_noise is None:
        D = cfg.n_pts_per_ray
        jitter_noise = jax.random.normal(jit_rng, (num_steps, B, H, W, D))

    def step(carry, inputs):
        i, z, jit_z = inputs
        x, prev_depth = carry
        index = num_steps - 1 - i
        tstep = ddim.timesteps[index]
        t = jnp.full((B,), tstep, jnp.int32)
        if feed_prev_depth:
            # step 0 has no prev_depth yet: use the unbiased estimate
            # x_t[depth]/sqrt(abar_t) — exactly GridAttn's None branch
            # (reference sampler.py:116 -> view_attn_efficient2.py:417-425)
            unbiased = x[..., 4:5] / jnp.sqrt(ddim.alphas[index])
            attn_depth = jnp.where(i == 0, unbiased, prev_depth)
        else:
            attn_depth = None
        noise_pred = model.apply(
            params,
            x,
            batch_cameras,
            input_latents,
            input_cameras,
            clip_v_embed,
            t,
            rng,  # unused: jitter noise is always supplied explicitly
            cfg_scale,
            prev_depth=attn_depth,
            attn_jitter_noise=jit_z,
            method=ViewFusion.apply_model_cfg,
        )
        x_prev, pred_x0 = ddim_step(ddim, x, noise_pred, index, z)
        if x_clip is not None:
            x_prev = jnp.clip(x_prev, -x_clip, x_clip)
        new_depth = pred_x0[..., 4:5]
        out = pred_x0 if return_trajectory else jnp.zeros((), x.dtype)
        return (x_prev, new_depth), out

    (x, _), traj = jax.lax.scan(
        step, (x, prev_depth0), (jnp.arange(num_steps), step_noise, jitter_noise)
    )
    return SampleResult(latents=x, pred_x0_trajectory=traj)
