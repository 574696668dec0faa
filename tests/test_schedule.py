"""Schedule tables vs closed form (SURVEY.md §4 unit-test plan)."""

import numpy as np
import jax.numpy as jnp

from mvdfusion_tpu.core import (
    ddim_step,
    make_ddim_schedule,
    make_ddim_timesteps,
    make_ddpm_schedule,
    predict_start_from_noise,
    q_sample,
)


def test_betas_closed_form():
    s = make_ddpm_schedule(1000)
    betas = np.linspace(0.00085**0.5, 0.0120**0.5, 1000) ** 2
    np.testing.assert_allclose(np.asarray(s.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5)
    assert s.num_timesteps == 1000


def test_derived_tables_consistent():
    s = make_ddpm_schedule(100)
    betas = np.linspace(0.00085**0.5, 0.0120**0.5, 100) ** 2
    ac = np.cumprod(1 - betas)  # float64 ground truth
    np.testing.assert_allclose(np.asarray(s.sqrt_alphas_cumprod), np.sqrt(ac), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.sqrt_one_minus_alphas_cumprod), np.sqrt(1 - ac), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.sqrt_recip_alphas_cumprod), np.sqrt(1 / ac), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.sqrt_recipm1_alphas_cumprod), np.sqrt(1 / ac - 1), rtol=1e-5)


def test_ddim_timesteps_plus_one_offset():
    # util.py:58 — uniform strides then +1
    ts = make_ddim_timesteps(50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[1] == 21 and ts[-1] == 981
    np.testing.assert_array_equal(ts, np.arange(0, 1000, 20) + 1)


def test_ddim_sigma_formula_eta1():
    s = make_ddpm_schedule(1000)
    d = make_ddim_schedule(s, 50, eta=1.0)
    ac = np.asarray(s.alphas_cumprod, dtype=np.float64)
    ts = np.arange(0, 1000, 20) + 1
    alphas = ac[ts]
    alphas_prev = np.concatenate([ac[0:1], ac[ts[:-1]]])
    sigmas = np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    np.testing.assert_allclose(np.asarray(d.sigmas), sigmas, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d.alphas_prev), alphas_prev, rtol=1e-6)


def test_ddim_schedule_derives_from_custom_ddpm():
    """A non-default beta schedule must flow into the DDIM tables (the DDIM
    builder reads the passed DDPMSchedule's alphas_cumprod, not hardcoded SD
    endpoints)."""
    s_custom = make_ddpm_schedule(1000, linear_start=0.002, linear_end=0.02)
    d_custom = make_ddim_schedule(s_custom, 50, eta=1.0)
    ts = np.arange(0, 1000, 20) + 1
    ac = np.asarray(s_custom.alphas_cumprod, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(d_custom.alphas), ac[ts], rtol=1e-6)
    # and it must differ from the default-endpoint tables
    d_default = make_ddim_schedule(1000, 50, eta=1.0)
    assert np.abs(np.asarray(d_custom.alphas) - np.asarray(d_default.alphas)).max() > 1e-3


def test_q_sample_predict_start_roundtrip(rng):
    s = make_ddpm_schedule(1000)
    x0 = jnp.asarray(rng.normal(size=(4, 8, 8, 5)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
    t = jnp.asarray([500, 500, 500, 500])
    xt = q_sample(s, x0, t, noise)
    x0_rec = predict_start_from_noise(s, xt, noise, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_ddim_step_deterministic_at_index0(rng):
    s = make_ddpm_schedule(1000)
    d = make_ddim_schedule(s, 50, eta=1.0)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 5)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    z = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    # at index 0 the sigma*z term must vanish (sampler.py:63-65)
    x_a, _ = ddim_step(d, x, eps, jnp.asarray(0), z)
    x_b, _ = ddim_step(d, x, eps, jnp.asarray(0), jnp.zeros_like(z))
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_b), atol=0)
    # at a later index it must not
    x_c, _ = ddim_step(d, x, eps, jnp.asarray(10), z)
    x_d, _ = ddim_step(d, x, eps, jnp.asarray(10), jnp.zeros_like(z))
    assert np.abs(np.asarray(x_c) - np.asarray(x_d)).max() > 1e-4


def test_ddim_step_matches_reference_update(rng):
    s = make_ddpm_schedule(1000)
    d = make_ddim_schedule(s, 50, eta=1.0)
    x = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    eps = rng.normal(size=x.shape).astype(np.float32)
    idx = 7
    a_t = float(d.alphas[idx])
    a_prev = float(d.alphas_prev[idx])
    s1m = float(d.sqrt_one_minus_alphas[idx])
    sig = float(d.sigmas[idx])
    pred_x0 = (x - s1m * eps) / np.sqrt(a_t)
    x_prev_ref = np.sqrt(a_prev) * pred_x0 + np.sqrt(max(1 - a_prev - sig**2, 1e-7)) * eps
    x_prev, px0 = ddim_step(d, jnp.asarray(x), jnp.asarray(eps), jnp.asarray(idx), jnp.zeros_like(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(px0), pred_x0, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_prev), x_prev_ref, rtol=2e-5, atol=1e-5)
