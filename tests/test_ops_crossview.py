"""Fused cross-view Pallas kernel vs the XLA GridAttn path (interpret mode
on CPU, VERDICT r1 item #1 'done' criterion): identical params + identical
jitter noise through both paths, outputs must agree to <=1e-3 (fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvdfusion_tpu.core.schedule import make_ddpm_schedule
from mvdfusion_tpu.geometry import look_at_view_transform
from mvdfusion_tpu.geometry.cameras import make_cameras
from mvdfusion_tpu.nn.viewattn import GridAttn


def _inputs(rng, V, H, D, hidden):
    azim = np.linspace(0, 360 * (V - 1) / V, V)
    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=azim + 90)
    cams = make_cameras(R, T, np.full((V, 2), 2.1875), np.zeros((V, 2)))
    in_cams = make_cameras(R[:1], T[:1], np.full((1, 2), 2.1875), np.zeros((1, 2)))
    sched = make_ddpm_schedule(1000)
    return dict(
        noisy=jnp.asarray(rng.normal(size=(V, H, H, 5)), jnp.float32) * 0.5,
        cams=cams,
        mask=jnp.ones((V,)),
        t_embed=jnp.asarray(rng.normal(size=(V, hidden)), jnp.float32),
        t=jnp.full((V,), 500, jnp.int32),
        sched=sched,
        in_lat=jnp.asarray(rng.normal(size=(1, H, H, 5)), jnp.float32) * 0.5,
        in_cams=in_cams,
        jitter=jnp.asarray(rng.normal(size=(V, H, H, D)), jnp.float32),
    )


@pytest.mark.parametrize("V,H,D", [(3, 8, 1), (4, 8, 3)])
def test_crossview_kernel_matches_xla_path(rng, V, H, D):
    hidden, heads, layers, out_dim = 32, 4, 2, 48
    kw = dict(
        input_size=H, in_channels=5, hidden_size=hidden, output_dim=out_dim,
        num_heads=heads, num_layers=layers, n_pts_per_ray=D,
    )
    xla_mod = GridAttn(crossview_kernel="never", **kw)
    ker_mod = GridAttn(crossview_kernel="interpret", **kw)
    i = _inputs(rng, V, H, D, hidden)
    args = (
        i["noisy"], i["cams"], i["mask"], i["t_embed"], i["t"], i["sched"],
        i["in_lat"], i["in_cams"], jax.random.PRNGKey(1),
    )
    params = xla_mod.init(jax.random.PRNGKey(0), *args, jitter_noise=i["jitter"])
    ref = np.asarray(xla_mod.apply(params, *args, jitter_noise=i["jitter"]))
    out = np.asarray(ker_mod.apply(params, *args, jitter_noise=i["jitter"]))
    assert out.shape == ref.shape == (V, H, H, D, out_dim)
    np.testing.assert_allclose(out, ref, atol=1e-3)
    # and they should agree far tighter than the 1e-3 bar in fp32
    assert np.abs(out - ref).max() < 2e-4, np.abs(out - ref).max()


@pytest.mark.parametrize("V,H,D", [(3, 8, 1), (4, 8, 3)])
def test_crossview_two_phase_matches_xla_path(rng, monkeypatch, V, H, D):
    """The stretch path (gather kernel + DiT kernel, token round-trip) must
    match the XLA path too; forced by shrinking the maps-resident budget so
    even the tiny test shape takes the two-phase branch."""
    from mvdfusion_tpu.ops import crossview as cv

    monkeypatch.setattr(cv, "_SINGLE_KERNEL_MAPS_BYTES", 0)
    hidden, heads, layers, out_dim = 32, 4, 2, 48
    kw = dict(
        input_size=H, in_channels=5, hidden_size=hidden, output_dim=out_dim,
        num_heads=heads, num_layers=layers, n_pts_per_ray=D,
    )
    xla_mod = GridAttn(crossview_kernel="never", **kw)
    ker_mod = GridAttn(crossview_kernel="interpret", **kw)
    i = _inputs(rng, V, H, D, hidden)
    args = (
        i["noisy"], i["cams"], i["mask"], i["t_embed"], i["t"], i["sched"],
        i["in_lat"], i["in_cams"], jax.random.PRNGKey(1),
    )
    params = xla_mod.init(jax.random.PRNGKey(0), *args, jitter_noise=i["jitter"])
    ref = np.asarray(xla_mod.apply(params, *args, jitter_noise=i["jitter"]))
    out = np.asarray(ker_mod.apply(params, *args, jitter_noise=i["jitter"]))
    assert out.shape == ref.shape == (V, H, H, D, out_dim)
    np.testing.assert_allclose(out, ref, atol=1e-3)


@pytest.mark.parametrize("mode", ["merged", "hilo", "bf16"])
def test_crossview_dit_variant_matches_xla(rng, monkeypatch, mode):
    """MVDF_CV_DIT variants ("merged": single wide bf16-hi/lo segment dots
    per layer; "hilo": the baseline's narrow per-view segment dots as bf16
    hi/lo pairs — ops/crossview._dit_pool) must reproduce the XLA path as
    tightly as the baseline form — the hi/lo split is exact to ~2^-17
    relative. "bf16" (single-cast bf16 q/k products + segment dots) is NOT
    exact: its envelope vs the f32 twin is the attention-logit bf16
    rounding (~2^-8 relative per input), pinned here at the 1e-3 module
    tolerance the fp32 paths also meet — the DiT's residual structure keeps
    the logit rounding from amplifying."""
    monkeypatch.setenv("MVDF_CV_DIT", mode)
    V, H, D = 4, 8, 1
    hidden, heads, layers, out_dim = 32, 4, 2, 48
    kw = dict(
        input_size=H, in_channels=5, hidden_size=hidden, output_dim=out_dim,
        num_heads=heads, num_layers=layers, n_pts_per_ray=D,
    )
    xla_mod = GridAttn(crossview_kernel="never", **kw)
    ker_mod = GridAttn(crossview_kernel="interpret", **kw)
    i = _inputs(rng, V, H, D, hidden)
    args = (
        i["noisy"], i["cams"], i["mask"], i["t_embed"], i["t"], i["sched"],
        i["in_lat"], i["in_cams"], jax.random.PRNGKey(1),
    )
    params = xla_mod.init(jax.random.PRNGKey(0), *args, jitter_noise=i["jitter"])
    ref = np.asarray(xla_mod.apply(params, *args, jitter_noise=i["jitter"]))
    out = np.asarray(ker_mod.apply(params, *args, jitter_noise=i["jitter"]))
    np.testing.assert_allclose(out, ref, atol=1e-3)
    if mode != "bf16":  # the hi/lo modes are exact-to-rounding
        assert np.abs(out - ref).max() < 2e-4, np.abs(out - ref).max()


def test_crossview_kernel_grads_match_xla(rng):
    """The custom VJP (rematerialized XLA twin) must produce the same
    gradients as differentiating the XLA path directly."""
    V, H, D = 3, 8, 1
    hidden, heads, layers, out_dim = 32, 4, 2, 48
    kw = dict(
        input_size=H, in_channels=5, hidden_size=hidden, output_dim=out_dim,
        num_heads=heads, num_layers=layers, n_pts_per_ray=D,
    )
    xla_mod = GridAttn(crossview_kernel="never", **kw)
    ker_mod = GridAttn(crossview_kernel="interpret", **kw)
    i = _inputs(rng, V, H, D, hidden)
    args = (
        i["cams"], i["mask"], i["t_embed"], i["t"], i["sched"],
        i["in_lat"], i["in_cams"], jax.random.PRNGKey(1),
    )
    params = xla_mod.init(
        jax.random.PRNGKey(0), i["noisy"], *args, jitter_noise=i["jitter"]
    )

    def loss(mod):
        return lambda p, noisy: jnp.sum(
            mod.apply(p, noisy, *args, jitter_noise=i["jitter"]) ** 2
        )

    g_ref = jax.grad(loss(xla_mod), argnums=(0, 1))(params, i["noisy"])
    g_ker = jax.grad(loss(ker_mod), argnums=(0, 1))(params, i["noisy"])
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ker)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3)
