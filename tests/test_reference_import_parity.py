"""Parity against the reference's OWN code, imported from /root/reference.

Round-1 weakness: every end-to-end parity test compared our stack against
`tests/torch_ref.py`, a replica written by the same author — a shared
misreading would pass. The pure-torch pieces of the reference that import
cleanly without PyTorch3D (mvdfusion/scheduler.py, the DDIM schedule/update
in mvdfusion/sampler.py, external/sd1/ldm/modules/diffusionmodules/util.py)
are imported here DIRECTLY and asserted against our tables and functions.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REF = "/root/reference"
if _REF not in sys.path:
    sys.path.insert(0, _REF)

from mvdfusion_tpu.core.schedule import (
    ddim_step,
    make_ddim_schedule,
    make_ddim_timesteps,
    make_ddpm_schedule,
    predict_start_from_noise,
    q_sample,
)
from mvdfusion_tpu.nn.layers import timestep_embedding as our_timestep_embedding


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules; skip if the tree isn't present."""
    try:
        from external.sd1.ldm.modules.diffusionmodules.util import (
            make_ddim_timesteps as ref_make_ddim_timesteps,
        )
        from external.sd1.ldm.modules.diffusionmodules.util import (
            timestep_embedding as ref_timestep_embedding,
        )
        from mvdfusion.sampler import DDIMSampler
        from mvdfusion.scheduler import DDPMScheduler
    except Exception as e:  # pragma: no cover - reference tree missing
        pytest.skip(f"reference not importable: {e}")
    return {
        "DDPMScheduler": DDPMScheduler,
        "DDIMSampler": DDIMSampler,
        "make_ddim_timesteps": ref_make_ddim_timesteps,
        "timestep_embedding": ref_timestep_embedding,
    }


def _ref_sampler(ref, steps=50, eta=1.0, T=1000):
    """Reference DDIMSampler over a stub model exposing only .scheduler
    (all _make_schedule needs, mvdfusion/sampler.py:25-39)."""
    stub = type("Stub", (), {})()
    stub.scheduler = ref["DDPMScheduler"](T)
    return ref["DDIMSampler"](stub, ddim_num_steps=steps, ddim_eta=eta)


def test_ddpm_tables_match_reference(ref):
    sched_ref = ref["DDPMScheduler"](1000)
    ours = make_ddpm_schedule(1000)
    for name in (
        "betas",
        "alphas",
        "alphas_cumprod",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod",
        "posterior_variance",
        "posterior_log_variance_clipped",
    ):
        theirs = getattr(sched_ref, name).detach().cpu().numpy().astype(np.float32)
        # the reference's linspace is fp32 (scheduler.py:17) with mixed
        # fp32/fp64 downstream; ours is fp64 throughout — agreement is
        # bounded by fp32 rounding of the tables (~1e-5 relative), far
        # below the bf16 resolution the model runs at
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)), theirs, rtol=3e-5, atol=1e-6, err_msg=name
        )


def test_ddim_timesteps_match_reference(ref):
    for s in (4, 8, 50):
        theirs = ref["make_ddim_timesteps"]("uniform", s, 1000, verbose=False)
        np.testing.assert_array_equal(make_ddim_timesteps(s, 1000), theirs)


def test_ddim_tables_match_reference(ref):
    samp = _ref_sampler(ref, steps=50, eta=1.0)
    ours = make_ddim_schedule(make_ddpm_schedule(1000), num_steps=50, eta=1.0)
    np.testing.assert_array_equal(np.asarray(ours.timesteps), samp.ddim_timesteps)
    for our_name, ref_name in (
        ("alphas", "ddim_alphas"),
        ("alphas_prev", "ddim_alphas_prev"),
        ("sqrt_one_minus_alphas", "ddim_sqrt_one_minus_alphas"),
        ("sigmas", "ddim_sigmas"),
    ):
        theirs = getattr(samp, ref_name).detach().cpu().numpy().astype(np.float32)
        # fp32-linspace rounding, same bound as the DDPM-table test above
        np.testing.assert_allclose(
            np.asarray(getattr(ours, our_name)), theirs, rtol=3e-5, atol=1e-6, err_msg=ref_name
        )


def test_ddim_update_matches_reference(ref):
    """Our ddim_step vs the reference's denoise_apply_impl (sampler.py:43-66),
    deterministic part (z=0 on our side, is_step0=True on theirs)."""
    import jax.numpy as jnp

    samp = _ref_sampler(ref, steps=8, eta=1.0)
    ours = make_ddim_schedule(make_ddpm_schedule(1000), num_steps=8, eta=1.0)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    eps = rng.normal(size=(2, 5, 8, 8)).astype(np.float32)
    for index in (0, 3, 7):
        x_prev_t, x0_t = samp.denoise_apply_impl(
            torch.from_numpy(x), index, torch.from_numpy(eps), is_step0=True
        )
        x_prev_j, x0_j = ddim_step(
            ours, jnp.asarray(x), jnp.asarray(eps), jnp.asarray(index), jnp.zeros_like(jnp.asarray(x))
        )
        np.testing.assert_allclose(np.asarray(x0_j), x0_t.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(x_prev_j), x_prev_t.numpy(), rtol=1e-5, atol=1e-5)


def test_q_sample_and_predict_start_match_reference(ref):
    import jax.numpy as jnp

    sched_ref = ref["DDPMScheduler"](1000)
    ours = make_ddpm_schedule(1000)
    rng = np.random.default_rng(5)
    x0 = rng.normal(size=(3, 5, 4, 4)).astype(np.float32)
    t = np.asarray([7, 500, 999])
    # reference q_sample draws its own noise and returns it (scheduler.py:57);
    # feed that exact noise through our functional q_sample
    xt_ref_t, noise_t = sched_ref.q_sample(torch.from_numpy(x0), torch.from_numpy(t))
    xt_ref, eps = xt_ref_t.numpy(), noise_t.numpy()
    xt_ours = np.asarray(q_sample(ours, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(eps)))
    np.testing.assert_allclose(xt_ours, xt_ref, rtol=3e-5, atol=1e-5)

    x0_ref = sched_ref.predict_start_from_noise(
        torch.from_numpy(xt_ref), torch.from_numpy(eps), torch.from_numpy(t)
    ).numpy()
    x0_ours = np.asarray(
        predict_start_from_noise(ours, jnp.asarray(xt_ref), jnp.asarray(eps), jnp.asarray(t))
    )
    np.testing.assert_allclose(x0_ours, x0_ref, rtol=3e-5, atol=1e-4)


def test_timestep_embedding_matches_reference(ref):
    t = np.asarray([0.0, 1.0, 47.5, 999.0], np.float32)
    for dim in (256, 320, 321):
        theirs = ref["timestep_embedding"](torch.from_numpy(t), dim).numpy()
        import jax.numpy as jnp

        # fp32 sin/cos of large args (t=999 * freq) differ by a few ulp
        # between XLA and torch libm; bound well below bf16 resolution
        np.testing.assert_allclose(
            np.asarray(our_timestep_embedding(jnp.asarray(t), dim)), theirs, rtol=1e-4, atol=5e-5
        )


def test_harmonic_embedding_matches_reference(rng):
    """utils/common_utils.py:161-271 HarmonicEmbedding (the PyTorch3D fork)
    vs geometry/harmonics.harmonic_embed — the GridAttn token build depends
    on the exact [sin(all) | cos(all) | x] layout and per-dim frequency
    interleaving (n=7, omega0=0.1, append_input=True at
    view_attn_efficient2.py:148-151)."""
    try:
        from utils.common_utils import HarmonicEmbedding
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    import jax.numpy as jnp

    from mvdfusion_tpu.geometry.harmonics import harmonic_embed

    x = rng.normal(size=(3, 5, 6)).astype(np.float32)
    for n, omega0, append in [(7, 0.1, True), (4, 1.0, False)]:
        ref_mod = HarmonicEmbedding(
            n_harmonic_functions=n, omega_0=omega0, append_input=append
        )
        want = ref_mod(torch.from_numpy(x)).numpy()
        ours = np.asarray(harmonic_embed(jnp.asarray(x), n, omega0, append))
        np.testing.assert_allclose(ours, want, atol=1e-6)


def test_normalize_split_list_match_reference(rng):
    """utils/common_utils.py:60-83 normalize/unnormalize ([0,1]<->[-1,1])
    and split_list (eval data-parallel sharding, demo.py:63-65)."""
    try:
        from utils.common_utils import normalize, split_list, unnormalize
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    import jax.numpy as jnp

    from mvdfusion_tpu.utils.common import normalize as our_normalize
    from mvdfusion_tpu.utils.common import split_list as our_split_list
    from mvdfusion_tpu.utils.common import unnormalize as our_unnormalize

    x = rng.uniform(size=(4, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(our_normalize(jnp.asarray(x))),
        normalize(torch.from_numpy(x)).numpy(), atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(our_unnormalize(our_normalize(jnp.asarray(x)))), x, atol=1e-6
    )
    y = normalize(torch.from_numpy(x))
    np.testing.assert_allclose(
        np.asarray(our_unnormalize(jnp.asarray(y.numpy()))),
        unnormalize(y).numpy(), atol=1e-7,
    )
    for n, k in [(10, 3), (7, 7), (5, 2)]:
        assert our_split_list(list(range(n)), k) == split_list(list(range(n)), k)
