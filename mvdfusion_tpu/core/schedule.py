"""Diffusion noise schedules as pure functions / immutable tables.

Reproduces the Stable-Diffusion-compatible DDPM schedule and the DDIM
sub-schedule of the reference (mvdfusion/scheduler.py:9-74 and
mvdfusion/sampler.py:25-39 + external/sd1/ldm/modules/diffusionmodules/
util.py:46-61 — note the +1 timestep offset at util.py:58), but as plain
jnp arrays bundled in NamedTuples so they can be closed over by jitted
functions with zero host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DDPMSchedule(NamedTuple):
    """Per-timestep DDPM tables (all shape (T,), float32)."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_ddpm_schedule(
    timesteps: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.0120,
) -> DDPMSchedule:
    """SD linear-sqrt beta schedule: linspace(s^0.5, e^0.5, T)^2.

    Matches mvdfusion/scheduler.py:15-36 (fp64 intermediate math, fp32 tables).
    """
    betas = np.linspace(linear_start**0.5, linear_end**0.5, timesteps, dtype=np.float64) ** 2
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([np.ones(1, dtype=np.float64), alphas_cumprod[:-1]])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_var = np.log(np.clip(posterior_variance, 1e-20, None))
    posterior_log_var = np.clip(posterior_log_var, -10, None)
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DDPMSchedule(
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_cumprod=f32(alphas_cumprod),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_var),
    )


def _bcast(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather table[t] and reshape to (B, 1, 1, ...) for broadcasting."""
    vals = table[t]
    return vals.reshape(vals.shape[0], *([1] * (ndim - 1)))


def q_sample(sched: DDPMSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Forward noising x_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps.

    Matches mvdfusion/scheduler.py:55-64 but takes noise explicitly
    (functional PRNG discipline).
    """
    a = _bcast(sched.sqrt_alphas_cumprod, t, x_start.ndim)
    s = _bcast(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
    return a * x_start + s * noise


def predict_start_from_noise(
    sched: DDPMSchedule, x_noisy: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """x0 = sqrt(1/abar) x_t - sqrt(1/abar - 1) eps (scheduler.py:66-74)."""
    ra = _bcast(sched.sqrt_recip_alphas_cumprod, t, x_noisy.ndim)
    rm = _bcast(sched.sqrt_recipm1_alphas_cumprod, t, x_noisy.ndim)
    return ra * x_noisy - rm * eps


class DDIMSchedule(NamedTuple):
    """DDIM sub-schedule tables (all shape (S,), float32).

    `timesteps[i]` is the DDPM t used at DDIM index i (ascending); the
    sampling loop walks i = S-1 .. 0.
    """

    timesteps: jnp.ndarray  # int32 (S,)
    alphas: jnp.ndarray  # abar at each ddim step
    alphas_prev: jnp.ndarray
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_ddim_timesteps(num_ddim_steps: int, num_ddpm_steps: int, method: str = "uniform") -> np.ndarray:
    """Uniform/quad DDIM timestep selection with the SD +1 offset.

    Matches external/sd1/ldm/modules/diffusionmodules/util.py:46-61: uniform
    strides of T//S starting at 0, then +1 ("to get the final alpha values
    right").
    """
    if method == "uniform":
        c = num_ddpm_steps // num_ddim_steps
        steps = np.arange(0, num_ddpm_steps, c)
    elif method == "quad":
        steps = (np.linspace(0, np.sqrt(num_ddpm_steps * 0.8), num_ddim_steps) ** 2).astype(int)
    else:
        raise NotImplementedError(f"unknown ddim discretization {method!r}")
    return steps + 1


def make_ddim_schedule(
    sched,
    num_steps: int = 50,
    eta: float = 1.0,
    method: str = "uniform",
    linear_start: float = 0.00085,
    linear_end: float = 0.0120,
) -> DDIMSchedule:
    """Build the DDIM alpha/sigma tables (mvdfusion/sampler.py:25-39).

    `sched` is a DDPMSchedule (whose alphas_cumprod table is used directly,
    so a non-default beta schedule stays in sync) or an int timestep count
    (tables rebuilt from the default SD endpoints). DDPMSchedule tables are
    concrete constants (built host-side by make_ddpm_schedule), so reading
    them back into numpy here is safe even at trace time.
    """
    if isinstance(sched, DDPMSchedule):
        ddpm_T = sched.num_timesteps
        try:
            abar = np.asarray(sched.alphas_cumprod, dtype=np.float64)
        except jax.errors.TracerArrayConversionError as e:  # pragma: no cover
            raise TypeError(
                "make_ddim_schedule(DDPMSchedule) needs a concrete schedule; "
                "under jit pass (timesteps, linear_start, linear_end) instead"
            ) from e
    else:
        ddpm_T = int(sched)
        betas = np.linspace(linear_start**0.5, linear_end**0.5, ddpm_T, dtype=np.float64) ** 2
        abar = np.cumprod(1.0 - betas)
    ts = make_ddim_timesteps(num_steps, ddpm_T, method)
    alphas = abar[ts]
    alphas_prev = np.concatenate([abar[0:1], abar[ts[:-1]]])
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DDIMSchedule(
        timesteps=jnp.asarray(ts, dtype=jnp.int32),
        alphas=f32(alphas),
        alphas_prev=f32(alphas_prev),
        sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
        sigmas=f32(sigmas),
    )


def ddim_step(
    ddim: DDIMSchedule,
    x_t: jnp.ndarray,
    noise_pred: jnp.ndarray,
    index: jnp.ndarray,
    z: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One DDIM update (mvdfusion/sampler.py:43-66).

    x_prev = sqrt(abar_prev) x0 + sqrt(1 - abar_prev - sigma^2) eps + sigma z,
    with the noise term suppressed at index 0 (is_step0). `z` must be a
    standard-normal sample of x_t's shape; `index` is a scalar int.

    Returns (x_prev, pred_x0).
    """
    a_t = ddim.alphas[index]
    a_prev = ddim.alphas_prev[index]
    sqrt_one_minus_at = ddim.sqrt_one_minus_alphas[index]
    sigma_t = ddim.sigmas[index]

    pred_x0 = (x_t - sqrt_one_minus_at * noise_pred) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma_t**2, 1e-7, None)) * noise_pred
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
    # index==0 is the final step: no stochastic noise (sampler.py:63-65)
    x_prev = x_prev + jnp.where(index == 0, 0.0, sigma_t) * z
    return x_prev, pred_x0
