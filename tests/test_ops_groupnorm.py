"""Fused Pallas GroupNorm(+SiLU) vs XLA and torch (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvdfusion_tpu.ops.groupnorm import _xla_gn, group_norm_act


@pytest.mark.parametrize(
    "B,N,C,G,act",
    [
        (3, 1024, 320, 32, "silu"),  # UNet ds=1 ResBlock norm+silu
        (2, 64, 1280, 32, "none"),   # UNet ds=4
        (1, 256, 192, 32, "silu"),   # C/G = 6, awkward group width
    ],
)
def test_groupnorm_kernel_matches_xla(rng, B, N, C, G, act):
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 2 + 0.3, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(C,)) * 0.5 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)) * 0.2, jnp.float32)
    ref = _xla_gn(x, scale, bias, G, 1e-5, act)
    out = group_norm_act(x, scale, bias, G, 1e-5, act, True)  # interpret
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_groupnorm_kernel_matches_torch(rng):
    import torch

    B, N, C, G = 2, 256, 320, 32
    x = rng.normal(size=(B, N, C)).astype(np.float32)
    scale = rng.normal(size=(C,)).astype(np.float32) * 0.5 + 1.0
    bias = rng.normal(size=(C,)).astype(np.float32) * 0.2
    with torch.no_grad():
        gn = torch.nn.GroupNorm(G, C, eps=1e-5)
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        # torch GroupNorm is NCL
        ref = gn(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    out = group_norm_act(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), G, 1e-5, "none", True
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_groupnorm_bf16_and_grad(rng):
    B, N, C, G = 2, 128, 64, 32
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    ref = _xla_gn(x, scale, bias, G, 1e-5, "silu")
    out = group_norm_act(x, scale, bias, G, 1e-5, "silu", True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
    # custom VJP recomputes through the XLA twin
    xf = x.astype(jnp.float32)
    g1 = jax.grad(lambda a: jnp.sum(group_norm_act(a, scale, bias, G, 1e-5, "silu", True) ** 2))(xf)
    g2 = jax.grad(lambda a: jnp.sum(_xla_gn(a, scale, bias, G, 1e-5, "silu") ** 2))(xf)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


@pytest.mark.parametrize(
    "B,N,C,dtype",
    [
        (2, 4096, 512, jnp.float32),   # VAE decoder 64^2 map (tiled path)
        (1, 16384, 256, jnp.bfloat16), # VAE decoder 128^2 map
    ],
)
def test_groupnorm_tiled_matches_xla(rng, B, N, C, dtype):
    from mvdfusion_tpu.ops.groupnorm import _MAX_SLICE_ELEMS, _pick_tile

    assert N * C > _MAX_SLICE_ELEMS  # actually exercises the tiled dispatch
    assert _pick_tile(N, C) is not None
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 1.5 - 0.2, dtype)
    scale = jnp.asarray(rng.normal(size=(C,)) * 0.5 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)) * 0.2, jnp.float32)
    ref = _xla_gn(x, scale, bias, 32, 1e-6, "silu")
    out = group_norm_act(x, scale, bias, 32, 1e-6, "silu", True)  # interpret
    atol = 3e-2 if dtype == jnp.bfloat16 else 3e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_pick_tile():
    from mvdfusion_tpu.ops.groupnorm import _TILE_ELEMS, _pick_tile

    assert _pick_tile(4096, 512) == 1024
    assert _pick_tile(65536, 128) == 4096
    t = _pick_tile(16384, 256)
    assert t is not None and 16384 % t == 0 and t * 256 <= _TILE_ELEMS
    assert _pick_tile(3, 99999999) is None  # nothing divides -> XLA fallback


def test_should_fuse_gn_gate_excludes_tiled_by_default(monkeypatch):
    """The tiled form is a measured net loss end-to-end (the GN custom-calls
    force relayouts around the VAE's 3x3 convs — ops/groupnorm.py gate
    docstring); it must be opt-in via MVDF_GN_TILED, while the VMEM-resident
    single-slice form stays on. CPU backend always gates off, so assert
    through the size logic with the backend check monkeypatched away."""
    import mvdfusion_tpu.ops.groupnorm as gn

    monkeypatch.setattr(gn.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("MVDF_GN_TILED", raising=False)
    monkeypatch.delenv("MVDF_DISABLE_PALLAS", raising=False)
    assert gn.should_fuse_gn((16, 32, 32, 320), 32)       # UNet slice: on
    assert not gn.should_fuse_gn((8, 256, 256, 128), 32)  # VAE 256^2: off
    monkeypatch.setenv("MVDF_GN_TILED", "1")
    assert gn.should_fuse_gn((8, 256, 256, 128), 32)      # opt-in A/B
