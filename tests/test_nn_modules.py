"""Shape/sanity tests for the Flax towers on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvdfusion_tpu.core import make_ddpm_schedule
from mvdfusion_tpu.geometry import look_at_view_transform, make_cameras
from mvdfusion_tpu.nn.unet import UNetModel, volume_pyramid
from mvdfusion_tpu.nn.vae import AutoencoderKL
from mvdfusion_tpu.nn.clip import CLIPImageTower, clip_preprocess
from mvdfusion_tpu.nn.viewattn import GridAttn


def _cams(n, dist=1.5):
    azim = np.linspace(0, 337.5, n)
    R, T = look_at_view_transform(dist=dist, elev=30.0, azim=azim + 90.0)
    return make_cameras(R, T, focal_length=(2.1875, 2.1875))


def test_unet_tiny_shapes():
    model = UNetModel(
        in_channels=10, model_channels=32, out_channels=5, num_res_blocks=1,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4), num_heads=4, context_dim=96,
    )
    B, H = 2, 16
    x = jnp.zeros((B, H, H, 10))
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 1, 96))
    vol = jnp.zeros((B, H, H, 1, 96))
    levels = volume_pyramid(vol, 4)
    assert [v.shape[1] for v in levels] == [16, 8, 4, 2]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, ctx, levels)
    out = jax.jit(model.apply)(params, x, t, ctx, levels)
    assert out.shape == (B, H, H, 5)
    # zero-init final conv + zero input -> zero output
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_unet_param_count_full_size():
    """Full-size UNet should land near SD1's ~860M + grafted layers."""
    model = UNetModel()
    x = jnp.zeros((1, 32, 32, 10))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 1, 768))
    levels = volume_pyramid(jnp.zeros((1, 32, 32, 1, 768)), 4)
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, t, ctx, levels))
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    assert 0.9e9 < n < 1.3e9, n  # 860M SD1 + ~200M aligned-attn grafts


def test_vae_tiny_roundtrip_shapes():
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    x = jnp.zeros((2, 32, 32, 3))
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), x)
    z = jax.jit(lambda p, a: vae.apply(p, a, method=AutoencoderKL.encode_mode))(params, x)
    assert z.shape == (2, 16, 16, 4)
    y = jax.jit(lambda p, a: vae.apply(p, a, method=AutoencoderKL.decode))(params, z)
    assert y.shape == (2, 32, 32, 3)


def test_clip_tower_tiny():
    tower = CLIPImageTower(width=64, layers=2, heads=2, patch_size=14, output_dim=48)
    x = jnp.zeros((2, 224, 224, 3))
    params = jax.jit(tower.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(tower.apply)(params, x)
    assert out.shape == (2, 48)


def test_clip_preprocess_range():
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    y = clip_preprocess(x)
    assert y.shape == (1, 224, 224, 3)
    # 0.5 input -> (0.5+1)/2 = 0.75 -> (0.75 - mean)/std
    np.testing.assert_allclose(
        np.asarray(y[0, 100, 100]), (0.75 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array([0.26862954, 0.26130258, 0.27577711]), atol=1e-5
    )


@pytest.mark.parametrize("n_pts", [1, 2])
def test_gridattn_shapes(n_pts):
    B, H = 4, 8
    ga = GridAttn(input_size=H, hidden_size=32, output_dim=48, num_heads=4, num_layers=2, n_pts_per_ray=n_pts)
    sched = make_ddpm_schedule(100)
    cams = _cams(B)
    in_cam = _cams(1)
    noisy = jnp.zeros((B, H, H, 5))
    inp = jnp.zeros((1, H, H, 5))
    t = jnp.full((B,), 50, jnp.int32)
    t_embed = jnp.zeros((B, 32))
    rng = jax.random.PRNGKey(0)
    params = jax.jit(ga.init)(
        jax.random.PRNGKey(1), noisy, cams, jnp.ones((B,)), t_embed, t, sched, inp, in_cam, rng
    )
    out = jax.jit(ga.apply)(params, noisy, cams, jnp.ones((B,)), t_embed, t, sched, inp, in_cam, rng)
    assert out.shape == (B, H, H, n_pts, 48)


def test_gridattn_topk():
    B, H = 6, 4
    ga = GridAttn(
        input_size=H, hidden_size=32, output_dim=16, num_heads=4, num_layers=1,
        n_pts_per_ray=1, keep_top_k_views=True, top_k=4,
    )
    sched = make_ddpm_schedule(100)
    cams = _cams(B)
    in_cam = _cams(1)
    noisy = jnp.zeros((B, H, H, 5))
    inp = jnp.zeros((1, H, H, 5))
    t = jnp.full((B,), 50, jnp.int32)
    t_embed = jnp.zeros((B, 32))
    rng = jax.random.PRNGKey(0)
    params = jax.jit(ga.init)(jax.random.PRNGKey(1), noisy, cams, jnp.ones((B,)), t_embed, t, sched, inp, in_cam, rng)
    out = jax.jit(ga.apply)(params, noisy, cams, jnp.ones((B,)), t_embed, t, sched, inp, in_cam, rng)
    assert out.shape == (B, H, H, 1, 16)


def test_factorized_token_projector_equals_concat(rng):
    """Linear-of-concat == sum-of-linears with the same (723-ish) kernel."""
    from mvdfusion_tpu.nn.viewattn import FactorizedTokenProjector

    dims = (16, 16, 9, 5, 9, 5, 1)
    V, N, hid = 3, 11, 8
    parts = [rng.normal(size=((V if i in (0, 2, 3, 6) else 1), N, d)).astype(np.float32)
             for i, d in enumerate(dims)]
    proj = FactorizedTokenProjector(hidden=hid, dims=dims)
    v_parts = {i: jnp.asarray(parts[i]) for i in (0, 2, 3, 6)}
    b_parts = {i: jnp.asarray(parts[i]) for i in (1, 4, 5)}
    params = proj.init(jax.random.PRNGKey(0), v_parts, b_parts)
    acc_v, acc_b = proj.apply(params, v_parts, b_parts)
    ours = np.asarray(acc_v + acc_b)
    kernel = np.asarray(params["params"]["kernel"])
    bias = np.asarray(params["params"]["bias"])
    concat = np.concatenate([np.broadcast_to(p, (V, N, p.shape[-1])) for p in parts], axis=-1)
    ref = concat @ kernel + bias
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_split_skip_resblock_matches_concat(monkeypatch):
    """The split-skip ResBlock form (GN/conv1/skip computed per concat piece,
    nn/unet.py ResBlock docstring) must reproduce the materialized-concat
    form with the SAME parameters, for aligned and non-aligned widths."""
    from mvdfusion_tpu.nn.unet import ResBlock

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(2, 64)), jnp.float32)
    # (C_h, C_skip): 32+32 is seam-aligned (gw=2 divides C1); 64+32 and
    # 80+16 (C=96, gw=3, C1%3!=0) have groups STRADDLING the seam — the
    # same pattern as the flagship's 640+320 (gw 30) and 1280+640 (gw 60)
    # up-path sites; 33+31 (C%32!=0) must fall back to concat in every mode.
    for C_h, C_skip in [(32, 32), (64, 32), (80, 16), (33, 31)]:
        block = ResBlock(out_channels=32)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, C_h)), jnp.float32)
        skip = jnp.asarray(rng.normal(size=(2, 8, 8, C_skip)), jnp.float32)
        params = block.init(jax.random.PRNGKey(1), x, emb, skip)
        monkeypatch.setenv("MVDF_SPLIT_SKIP", "0")
        concat = block.apply(params, x, emb, skip)
        for mode in ("1", "auto"):
            monkeypatch.setenv("MVDF_SPLIT_SKIP", mode)
            split = block.apply(params, x, emb, skip)
            assert split.shape == concat.shape == (2, 8, 8, 32)
            np.testing.assert_allclose(
                np.asarray(split), np.asarray(concat), rtol=2e-5, atol=2e-5,
                err_msg=f"mode={mode} C={C_h}+{C_skip}",
            )
        monkeypatch.delenv("MVDF_SPLIT_SKIP")


def test_folded_upsample_conv_matches_naive(monkeypatch):
    """layers.UpsampleConv: the 4 phase-folded 2x2 convs at low resolution
    must equal conv3x3(nearest_upsample2x(x)) exactly (up to one f32 add
    reassociation), including at odd spatial sizes, and its param tree/init
    must be bit-identical to the nn.Conv it replaced (checkpoint compat,
    unet.py Upsample / vae.py VAEUpsample)."""
    import flax.linen as nn

    from mvdfusion_tpu.nn.layers import UpsampleConv
    from mvdfusion_tpu.ops.image import nearest_upsample2x

    rng = np.random.default_rng(0)
    for B, H, W, Cin, Co in [(2, 5, 7, 6, 10), (1, 8, 8, 4, 4)]:
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)

        class WrapNew(nn.Module):
            @nn.compact
            def __call__(self, x):
                return UpsampleConv(Co, name="conv")(x)

        class WrapOld(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(Co, (3, 3), name="conv")(nearest_upsample2x(x))

        params = WrapNew().init(jax.random.PRNGKey(3), x)
        monkeypatch.setenv("MVDF_UPSAMPLE_FOLD", "0")
        naive = WrapNew().apply(params, x)
        monkeypatch.delenv("MVDF_UPSAMPLE_FOLD")
        folded = WrapNew().apply(params, x)
        ref = WrapOld().apply(params, x)
        assert folded.shape == (B, 2 * H, 2 * W, Co)
        np.testing.assert_allclose(np.asarray(folded), np.asarray(naive), atol=1e-5)
        np.testing.assert_allclose(np.asarray(folded), np.asarray(ref), atol=1e-5)
        # init parity: same param names, shapes, and RNG draws as nn.Conv
        p2 = WrapOld().init(jax.random.PRNGKey(3), x)
        for k in ("kernel", "bias"):
            a, b = params["params"]["conv"][k], p2["params"]["conv"][k]
            assert a.shape == b.shape
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_folded_upsample_conv_bf16_envelope(monkeypatch):
    """Pin the bf16 divergence of the folded path on the real inference
    dtype: folded sums taps in f32 PARAM dtype before casting to bf16,
    while naive casts the full 3x3 kernel to bf16 first — so the two paths
    differ by more than the one-add f32 reassociation the f32 test allows.
    The envelope must stay within bf16 rounding of the activations."""
    import flax.linen as nn

    from mvdfusion_tpu.nn.layers import UpsampleConv

    rng = np.random.default_rng(1)
    B, H, W, Cin, Co = 2, 6, 6, 8, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    mod = UpsampleConv(Co, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(5), x)
    monkeypatch.setenv("MVDF_UPSAMPLE_FOLD", "0")
    naive = np.asarray(mod.apply(params, x), np.float32)
    monkeypatch.delenv("MVDF_UPSAMPLE_FOLD")
    folded = np.asarray(mod.apply(params, x), np.float32)
    assert folded.dtype == naive.dtype
    # bf16 has ~8 mantissa bits; allow a few ulp of the activation scale
    scale = np.abs(naive).max()
    assert np.abs(folded - naive).max() <= 4e-2 * max(scale, 1.0)
