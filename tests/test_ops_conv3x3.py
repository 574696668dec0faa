"""Fused GN+SiLU+conv3x3 kernel (ops/conv3x3.py) vs its plain-XLA twin in
interpret mode on CPU: halo DMA edges, x-edge tap masking, the folded-GN
affine + SiLU prologue (incl. the silu(b)!=0 zero-pad subtlety), temb row
add, residual add, and the gn_fold_affine stats fold."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvdfusion_tpu.ops.conv3x3 import (
    _fwd_impl,
    _xla_twin,
    gn_fold_affine,
    gn_silu_conv3x3,
    should_fuse_conv3x3,
)


def _mk(rng, B, H, W, Cin, Cout):
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)) * 0.8 + 0.1, jnp.float32)
    a = jnp.asarray(rng.normal(size=(B, Cin)) * 0.3 + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, Cin)) * 0.2, jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, Cin, Cout)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(Cout,)) * 0.1, jnp.float32)
    row = jnp.asarray(rng.normal(size=(B, Cout)) * 0.1, jnp.float32)
    return x, a, b, w, bias, row


@pytest.mark.parametrize(
    "B,H,W,Cin,Cout",
    [
        (2, 16, 16, 8, 16),   # multi-tile when 4096//W floors (single here)
        (1, 64, 32, 8, 8),    # several row tiles (T = 4064//32*32... 2 tiles)
        (2, 8, 8, 16, 8),     # tiny single-tile map
    ],
)
def test_conv3x3_matches_xla(rng, B, H, W, Cin, Cout):
    x, a, b, w, bias, row = _mk(rng, B, H, W, Cin, Cout)
    ref = _xla_twin(x, a, b, w, bias, row, None, "silu")
    out = gn_silu_conv3x3(x, a, b, w, bias, row, None, "silu", True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_conv3x3_multi_tile_edges(rng):
    """Force nt > 1 so the first/interior/last DMA branches all run; halo
    rows crossing tile boundaries must be exact."""
    B, H, W, Cin, Cout = 1, 96, 48, 8, 8
    x, a, b, w, bias, row = _mk(rng, B, H, W, Cin, Cout)
    # tr = 4096//48 = 85 -> stepped down to a divisor of 96 (48): nt = 2
    ref = _xla_twin(x, a, b, w, bias, row, None, "silu")
    out = gn_silu_conv3x3(x, a, b, w, bias, row, None, "silu", True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_conv3x3_residual_and_identity_prologue(rng):
    B, H, W, Cin, Cout = 2, 16, 16, 8, 8
    x, a, b, w, bias, row = _mk(rng, B, H, W, Cin, Cout)
    res = jnp.asarray(rng.normal(size=(B, H, W, Cout)), jnp.float32)
    ref = _xla_twin(x, a, b, w, bias, row, res, "silu")
    out = gn_silu_conv3x3(x, a, b, w, bias, row, res, "silu", True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # act="none" with identity affine = plain conv + bias
    ones = jnp.ones_like(a)
    zeros = jnp.zeros_like(b)
    ref2 = _xla_twin(x, ones, zeros, w, bias, jnp.zeros_like(row), None, "none")
    out2 = gn_silu_conv3x3(x, ones, zeros, w, bias, jnp.zeros_like(row), None, "none", True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=2e-5)


def test_gn_fold_affine_matches_groupnorm(rng):
    """x*a+b must equal GroupNorm(x)*scale+bias (the VAE ResBlock's GN32)."""
    B, N, C, G = 2, 64, 32, 8
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 1.3 + 0.2, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(C,)) * 0.4 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(C,)) * 0.2, jnp.float32)
    a, b = gn_fold_affine(x, scale, bias, G, 1e-6, interpret=True)
    got = x * a[:, None, :] + b[:, None, :]
    xs = x.reshape(B, N, G, C // G)
    mu = jnp.mean(xs, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xs), axis=(1, 3), keepdims=True) - jnp.square(mu)
    ref = ((xs - mu) * jax.lax.rsqrt(var + 1e-6)).reshape(B, N, C) * scale + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_conv3x3_grads_match_xla(rng):
    B, H, W, Cin, Cout = 1, 8, 8, 8, 8
    x, a, b, w, bias, row = _mk(rng, B, H, W, Cin, Cout)

    def f_ker(x, w):
        return jnp.sum(gn_silu_conv3x3(x, a, b, w, bias, row, None, "silu", True) ** 2)

    def f_ref(x, w):
        return jnp.sum(_xla_twin(x, a, b, w, bias, row, None, "silu") ** 2)

    gx1, gw1 = jax.grad(f_ker, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-4)


def test_should_fuse_gate(monkeypatch):
    import mvdfusion_tpu.ops.conv3x3 as c3

    monkeypatch.setattr(c3.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("MVDF_DISABLE_PALLAS", raising=False)
    # off by default (measured net loss on v5e — module docstring)
    monkeypatch.delenv("MVDF_CONV3X3", raising=False)
    assert not should_fuse_conv3x3((8, 256, 256, 128))
    monkeypatch.setenv("MVDF_CONV3X3", "1")
    assert should_fuse_conv3x3((8, 256, 256, 128))
    assert should_fuse_conv3x3((8, 64, 64, 512))
    assert not should_fuse_conv3x3((16, 32, 32, 320))  # UNet latents: XLA
    assert not should_fuse_conv3x3((8, 256, 256, 130))  # lane-misaligned C
    monkeypatch.setenv("MVDF_DISABLE_PALLAS", "1")
    assert not should_fuse_conv3x3((8, 256, 256, 128))


def test_vae_resnet_block_fused_path_matches(rng, monkeypatch):
    """VAEResnetBlock's fused conv3x3 path (gn_fold_affine + two kernel
    calls + shortcut) must match the standard GroupNorm32+nn.Conv chain,
    including the channel-changing nin_shortcut case."""
    import flax.linen as nn  # noqa: F401

    import mvdfusion_tpu.ops.conv3x3 as c3
    from mvdfusion_tpu.nn.vae import VAEResnetBlock

    real_conv = c3.gn_silu_conv3x3
    real_fold = c3.gn_fold_affine
    monkeypatch.setattr(
        c3, "should_fuse_conv3x3", lambda s, groups=32: s[-1] % 8 == 0
    )
    monkeypatch.setattr(
        c3, "gn_silu_conv3x3",
        lambda x, a, b, w, bias, row, res, act="silu", interpret=False: real_conv(
            x, a, b, w, bias, row, res, act, True
        ),
    )
    monkeypatch.setattr(
        c3, "gn_fold_affine",
        lambda x, s, bb, g, eps, interpret=False: real_fold(x, s, bb, g, eps, True),
    )
    for in_ch, out_ch in ((32, 32), (32, 64)):
        x = jnp.asarray(rng.normal(size=(2, 8, 8, in_ch)) * 0.7, jnp.float32)
        mod = VAEResnetBlock(out_ch)
        params = mod.init(jax.random.PRNGKey(0), x)
        # randomize so scale/bias/convs are not at init trivials
        params = jax.tree_util.tree_map(
            lambda p: p + 0.1 * jnp.asarray(rng.normal(size=p.shape), p.dtype), params
        )
        # reference: the unfused branch, forced via the gate
        monkeypatch.setattr(c3, "should_fuse_conv3x3", lambda s, groups=32: False)
        ref = np.asarray(mod.apply(params, x))
        monkeypatch.setattr(c3, "should_fuse_conv3x3", lambda s, groups=32: True)
        out = np.asarray(mod.apply(params, x))
        np.testing.assert_allclose(out, ref, atol=5e-5)
