"""Fused transformer-block Pallas kernel (ops/block.py) vs the XLA module
path, interpret mode on CPU: same params through SpatialTransformer /
ViewAlignedFeatureTransformer with fuse_mode never vs interpret."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvdfusion_tpu.nn.unet import SpatialTransformer, ViewAlignedFeatureTransformer


def _randomize(params, rng, scale=0.05):
    """Replace every param (incl. zero-init proj_out — otherwise the site is
    the identity and the test is vacuous) with small random values."""
    leaves, treedef = jax.tree.flatten(params)
    new = [jnp.asarray(rng.normal(size=l.shape) * scale, l.dtype) for l in leaves]
    return jax.tree.unflatten(treedef, new)


def test_spatial_fused_matches_xla(rng):
    B, H, W, C, heads = 2, 8, 8, 32, 4
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 1, 48)), jnp.float32)
    ref_mod = SpatialTransformer(heads, C // heads, fuse_mode="never")
    fus_mod = SpatialTransformer(heads, C // heads, fuse_mode="interpret")
    params = _randomize(ref_mod.init(jax.random.PRNGKey(0), x, ctx), rng)
    ref = np.asarray(ref_mod.apply(params, x, ctx))
    out = np.asarray(fus_mod.apply(params, x, ctx))
    assert out.shape == ref.shape == (B, H, W, C)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_spatial_fused_grads_match(rng):
    B, H, W, C, heads = 2, 4, 4, 32, 4
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 1, 24)), jnp.float32)
    ref_mod = SpatialTransformer(heads, C // heads, fuse_mode="never")
    fus_mod = SpatialTransformer(heads, C // heads, fuse_mode="interpret")
    params = _randomize(ref_mod.init(jax.random.PRNGKey(0), x, ctx), rng)
    g_ref = jax.grad(lambda p, x: jnp.sum(ref_mod.apply(p, x, ctx) ** 2), argnums=(0, 1))(
        params, x
    )
    g_fus = jax.grad(lambda p, x: jnp.sum(fus_mod.apply(p, x, ctx) ** 2), argnums=(0, 1))(
        params, x
    )
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)


def test_view_aligned_fused_matches_xla(rng):
    B, H, W, C, heads, Cc = 2, 8, 8, 32, 4, 48
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    vol = jnp.asarray(rng.normal(size=(B, H, W, 1, Cc)), jnp.float32)
    ref_mod = ViewAlignedFeatureTransformer(heads, C // heads, fuse_mode="never")
    fus_mod = ViewAlignedFeatureTransformer(heads, C // heads, fuse_mode="interpret")
    params = _randomize(ref_mod.init(jax.random.PRNGKey(0), x, vol), rng)
    ref = np.asarray(ref_mod.apply(params, x, vol))
    out = np.asarray(fus_mod.apply(params, x, vol))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_split_form_matches_single(rng, monkeypatch):
    """The split attn/FF form is the DEFAULT (benched faster on v5e); force
    the legacy single-kernel form via a huge weight-residency budget so both
    gated paths stay parity-covered against the XLA reference."""
    import mvdfusion_tpu.ops.block as blk

    monkeypatch.setattr(blk, "_SINGLE_KERNEL_WEIGHT_BYTES", 1 << 40)
    B, H, W, C, heads = 2, 8, 8, 32, 4
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 1, 48)), jnp.float32)
    ref_mod = SpatialTransformer(heads, C // heads, fuse_mode="never")
    fus_mod = SpatialTransformer(heads, C // heads, fuse_mode="interpret")
    params = _randomize(ref_mod.init(jax.random.PRNGKey(0), x, ctx), rng)
    ref = np.asarray(ref_mod.apply(params, x, ctx))
    out = np.asarray(fus_mod.apply(params, x, ctx))
    np.testing.assert_allclose(out, ref, atol=2e-4)


@pytest.mark.parametrize("mode", ["v2", "exp2", "bf16"])
def test_softmax_variants_match_xla(rng, monkeypatch, mode):
    """Every MVDF_BLOCK_SOFTMAX variant must reproduce the XLA softmax.
    v2/exp2 are exact reformulations; bf16 rounds the exp argument to bf16
    (worst-case prob error ~|logit-max|*2^-9 relative), hence its looser
    tolerance."""
    import mvdfusion_tpu.ops.block as blk

    monkeypatch.setattr(blk, "_SOFTMAX_MODE", mode)
    B, H, W, C, heads = 2, 8, 8, 32, 4
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 1, 48)), jnp.float32)
    ref_mod = SpatialTransformer(heads, C // heads, fuse_mode="never")
    fus_mod = SpatialTransformer(heads, C // heads, fuse_mode="interpret")
    params = _randomize(ref_mod.init(jax.random.PRNGKey(0), x, ctx), rng)
    ref = np.asarray(ref_mod.apply(params, x, ctx))
    out = np.asarray(fus_mod.apply(params, x, ctx))
    np.testing.assert_allclose(out, ref, atol=2e-4 if mode != "bf16" else 2e-3)


@pytest.mark.parametrize("single,nb", [(False, 2), (True, 2), (False, 8)])
def test_batch_tiling_matches_xla(rng, monkeypatch, single, nb):
    """MVDF_BLOCK_NB packs batch elements per grid step; GN stats and
    attention keys must stay per sub-batch (spatial site: the per-batch a2
    row rides as (C, nb) columns, expanded in-kernel). Covers split
    (default) and single kernel forms; nb=8 > B exercises the clamp-to-
    divisor path (runs as nb=4 with a trace-time warning)."""
    import mvdfusion_tpu.ops.block as blk

    monkeypatch.setattr(blk, "_BATCH_TILE", nb)
    if single:
        monkeypatch.setattr(blk, "_SINGLE_KERNEL_WEIGHT_BYTES", 1 << 40)
    B, H, W, C, heads = 4, 8, 8, 32, 4
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 1, 48)), jnp.float32)
    ref_mod = SpatialTransformer(heads, C // heads, fuse_mode="never")
    fus_mod = SpatialTransformer(heads, C // heads, fuse_mode="interpret")
    params = _randomize(ref_mod.init(jax.random.PRNGKey(0), x, ctx), rng)
    ref = np.asarray(ref_mod.apply(params, x, ctx))
    out = np.asarray(fus_mod.apply(params, x, ctx))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_batch_tiling_view_aligned(rng, monkeypatch):
    """Per-token a2 (ViewAligned site) through the packed-lane path."""
    import mvdfusion_tpu.ops.block as blk

    monkeypatch.setattr(blk, "_BATCH_TILE", 2)
    B, H, W, C, heads, Cc = 4, 8, 8, 32, 4, 48
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    vol = jnp.asarray(rng.normal(size=(B, H, W, 1, Cc)), jnp.float32)
    ref_mod = ViewAlignedFeatureTransformer(heads, C // heads, fuse_mode="never")
    fus_mod = ViewAlignedFeatureTransformer(heads, C // heads, fuse_mode="interpret")
    params = _randomize(ref_mod.init(jax.random.PRNGKey(0), x, vol), rng)
    ref = np.asarray(ref_mod.apply(params, x, vol))
    out = np.asarray(fus_mod.apply(params, x, vol))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_view_aligned_d3_falls_back(rng):
    """D>1 per-pixel attention depends on x mid-block — must use XLA path."""
    B, H, W, C, heads, Cc = 2, 4, 4, 32, 4, 24
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    vol = jnp.asarray(rng.normal(size=(B, H, W, 3, Cc)), jnp.float32)
    ref_mod = ViewAlignedFeatureTransformer(heads, C // heads, fuse_mode="never")
    fus_mod = ViewAlignedFeatureTransformer(heads, C // heads, fuse_mode="interpret")
    params = _randomize(ref_mod.init(jax.random.PRNGKey(0), x, vol), rng)
    ref = np.asarray(ref_mod.apply(params, x, vol))
    out = np.asarray(fus_mod.apply(params, x, vol))
    np.testing.assert_allclose(out, ref, atol=0.0)  # same (XLA) path bitwise


@pytest.mark.parametrize("hw", [8, 4])
def test_big_c_form_matches_xla(rng, monkeypatch, hw):
    """Big-C form (the 8^2/4^2 C=1280 sites): 3 kernels — GN/proj_in/LN1,
    masked packed attention (block-diagonal bias instead of lane slices),
    inner-dim-STREAMED GEGLU FF with fp32 VMEM accumulation. Forced at a
    CPU-friendly width by dropping _BIG_C_MIN; hw=8 packs nb=2, hw=4 packs
    nb=8 (the middle-block shape)."""
    import mvdfusion_tpu.ops.block as blk

    monkeypatch.setattr(blk, "_BIG_C_MIN", 16)
    B, C, heads = 16, 32, 4
    x = jnp.asarray(rng.normal(size=(B, hw, hw, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 1, 48)), jnp.float32)
    ref_mod = SpatialTransformer(heads, C // heads, fuse_mode="never")
    fus_mod = SpatialTransformer(heads, C // heads, fuse_mode="interpret")
    params = _randomize(ref_mod.init(jax.random.PRNGKey(0), x, ctx), rng)
    ref = np.asarray(ref_mod.apply(params, x, ctx))
    out = np.asarray(fus_mod.apply(params, x, ctx))
    assert out.shape == ref.shape == (B, hw, hw, C)
    np.testing.assert_allclose(out, ref, atol=3e-4)


def test_big_c_form_view_aligned(rng, monkeypatch):
    """Big-C form with the per-token a2 (ViewAligned grafted site at 8^2)."""
    import mvdfusion_tpu.ops.block as blk

    monkeypatch.setattr(blk, "_BIG_C_MIN", 16)
    B, H, W, C, heads, Cc = 4, 8, 8, 32, 4, 48
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    vol = jnp.asarray(rng.normal(size=(B, H, W, 1, Cc)), jnp.float32)
    ref_mod = ViewAlignedFeatureTransformer(heads, C // heads, fuse_mode="never")
    fus_mod = ViewAlignedFeatureTransformer(heads, C // heads, fuse_mode="interpret")
    params = _randomize(ref_mod.init(jax.random.PRNGKey(0), x, vol), rng)
    ref = np.asarray(ref_mod.apply(params, x, vol))
    out = np.asarray(fus_mod.apply(params, x, vol))
    np.testing.assert_allclose(out, ref, atol=3e-4)


def test_big_c_odd_batch_still_packs(rng, monkeypatch):
    """An odd B packs to a smaller divisor (nb=3 at B=3) instead of falling
    back — parity must hold through the non-power-of-two packing."""
    import mvdfusion_tpu.ops.block as blk

    monkeypatch.setattr(blk, "_BIG_C_MIN", 16)
    B, H, W, C, heads = 3, 4, 4, 32, 4
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 1, 48)), jnp.float32)
    ref_mod = SpatialTransformer(heads, C // heads, fuse_mode="never")
    fus_mod = SpatialTransformer(heads, C // heads, fuse_mode="interpret")
    params = _randomize(ref_mod.init(jax.random.PRNGKey(0), x, ctx), rng)
    ref = np.asarray(ref_mod.apply(params, x, ctx))
    out = np.asarray(fus_mod.apply(params, x, ctx))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_pick_big_nb():
    """Lane packing for the big-C form: as many batch elements as fit 512
    lanes (weight-refetch count B//nb is the dominant cost), stepped down to
    a divisor of B; on hardware the packed lanes must hit the 128 tile."""
    from mvdfusion_tpu.ops.block import _pick_big_nb

    assert _pick_big_nb(16, 64, False) == 8     # flagship 8^2: 512 lanes, 2 groups
    assert _pick_big_nb(16, 16, False) == 16    # 4^2 middle: 256 lanes, 1 group
    assert _pick_big_nb(16, 256, False) == 2    # stretch 16^2: 512 lanes
    assert _pick_big_nb(12, 64, False) == 6     # stepped to a divisor, 384 lanes
    assert _pick_big_nb(1, 64, False) is None   # 64 lanes: no 128 tile -> XLA
    assert _pick_big_nb(1, 64, True) == 1       # interpret: any width
    assert _pick_big_nb(3, 16, True) == 3       # odd B packs in interpret
