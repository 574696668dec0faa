"""Fused Pallas attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvdfusion_tpu.ops.attention import _xla_attention, fused_attention


@pytest.mark.parametrize(
    "B,Nq,Nk,H,dh",
    [
        (2, 256, 256, 4, 40),   # UNet ds=1 shape class (native dh=40)
        (1, 256, 128, 2, 64),   # cross-attention, uneven kv
        (2, 512, 512, 1, 512),  # VAE bottleneck single-head class
        (1, 257, 257, 4, 64),   # CLIP tower: prime token count, whole-dim block
    ],
)
def test_fused_attention_matches_xla(rng, B, Nq, Nk, H, dh):
    q = jnp.asarray(rng.normal(size=(B, Nq, H, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Nk, H, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Nk, H, dh)), jnp.float32)
    scale = dh**-0.5
    ref = _xla_attention(q, k, v, scale)
    out = fused_attention(q, k, v, scale, True)  # interpret=True on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_bf16(rng):
    B, N, H, dh = 2, 256, 4, 40
    q = jnp.asarray(rng.normal(size=(B, N, H, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, H, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, H, dh)), jnp.bfloat16)
    ref = _xla_attention(q, k, v, dh**-0.5)
    out = fused_attention(q, k, v, dh**-0.5, True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


@pytest.mark.parametrize("norm", ["pv", "probs"])
@pytest.mark.parametrize("orient", ["0", "1"])
@pytest.mark.parametrize(
    "B,Nq,Nk,H,dh",
    [
        (2, 256, 256, 2, 40),  # stretch attn1 class: lane-limited dh
        (1, 384, 128, 2, 20),  # dh_p padding path (20 -> 24 sublane round-up)
        (1, 512, 256, 1, 64),  # uneven kv
    ],
)
def test_fused_attention_both_orientations(rng, monkeypatch, norm, orient, B, Nq, Nk, H, dh):
    """Forced natural (0) vs forced transposed (1) kernel, in BOTH softmax
    normalization modes (MVDF_ATTN_NORM, read at trace time), all vs XLA —
    pins parity for whatever combination the gates pick on TPU."""
    monkeypatch.setenv("MVDF_ATTN_T", orient)
    monkeypatch.setenv("MVDF_ATTN_NORM", norm)
    q = jnp.asarray(rng.normal(size=(B, Nq, H, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Nk, H, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Nk, H, dh)), jnp.float32)
    scale = dh**-0.5
    ref = _xla_attention(q, k, v, scale)
    out = fused_attention(q, k, v, scale, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_grad_matches_xla(rng):
    """The custom VJP (XLA rematerialization) must match XLA end-to-end."""
    B, N, H, dh = 1, 256, 2, 32
    q = jnp.asarray(rng.normal(size=(B, N, H, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, H, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H, dh)), jnp.float32)
    s = dh**-0.5
    g_ref = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(_xla_attention(q, k, v, s))), (0, 1, 2))(q, k, v)
    g_out = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(fused_attention(q, k, v, s, True))), (0, 1, 2))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_routing_gates(monkeypatch):
    """Pin the measured routing decisions (tools/attn_tune.py, v5e):
    with the round-5 deferred-normalization softmax, transposed wins every
    lane-limited (dh<128) tile-aligned shape — stretch attn1 8.34 vs
    natural 9.79 ms, skinny Nk=128 1.16 vs 1.87 — so auto routes all of
    them; should_fuse sends the VAE mid-attention at decode batch (B>=2,
    dh=512) to XLA (measured 1.85 vs 2.32 ms) while keeping B=1 fused."""
    import jax

    from mvdfusion_tpu.ops import attention as A

    monkeypatch.delenv("MVDF_ATTN_T", raising=False)
    assert A._use_transposed(4096, 4096, 40)  # stretch attn1: transposed wins (r5)
    assert A._use_transposed(4096, 128, 40)  # skinny kv: transposed wins
    assert not A._use_transposed(4096, 128, 128)  # lane-full dh: natural
    assert not A._use_transposed(4100, 128, 40)  # unclean Nq
    assert not A._use_transposed(257, 257, 64)  # CLIP tokens: unclean -> natural
    monkeypatch.setenv("MVDF_ATTN_T", "0")
    assert not A._use_transposed(4096, 4096, 40)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("MVDF_DISABLE_PALLAS", raising=False)
    z = lambda b, n, d: jax.ShapeDtypeStruct((b, n, 1, d), jax.numpy.bfloat16)
    assert A.should_fuse(z(1, 1024, 512), z(1, 1024, 512))  # VAE mid B=1: fused
    assert not A.should_fuse(z(8, 1024, 512), z(8, 1024, 512))  # decode batch: XLA
    assert A.should_fuse(z(16, 4096, 40), z(16, 4096, 40))  # stretch attn1: fused
    assert not A.should_fuse(z(1, 4096, 512), z(1, 4096, 512))  # VMEM gate
