"""Module-level parity against the reference's OWN nn blocks.

Extends tests/test_reference_import_parity.py (schedule/DDIM/timestep math)
to the torch MODULES that import cleanly without PyTorch3D/timm/lightning:
the live SD1 block library (external/sd1/ldm/modules/attention.py,
openaimodel.py, model.py, distributions.py) and the grafted
mvdfusion/attention.py ViewAlignedFeatureTransformer. Each test instantiates
the reference's own class, randomizes its weights, converts the state_dict
through our real mapping tables (convert/mapping.py — the same tables the
checkpoint converter uses), and asserts our Flax module matches. This
removes the same-author-replica risk for every block these tables cover.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REF = "/root/reference"
if _REF not in sys.path:
    sys.path.insert(0, _REF)

import jax
import jax.numpy as jnp

import torch_ref  # tests/: randomize_ only (no replica modules used here)
from mvdfusion_tpu.convert.mapping import (
    TRANSFORMS,
    _cross_attention,
    _res_block,
    _spatial_transformer,
    _view_aligned_transformer,
    vae_mapping,
)
from mvdfusion_tpu.nn import layers as L
from mvdfusion_tpu.nn import unet as U
from mvdfusion_tpu.nn.vae import AutoencoderKL

ATOL = 3e-4


@pytest.fixture(scope="module")
def ref():
    try:
        from external.sd1.ldm.modules import attention as ldm_attention
        from external.sd1.ldm.modules.diffusionmodules import model as ldm_model
        from external.sd1.ldm.modules.diffusionmodules import (
            openaimodel as ldm_openaimodel,
        )
        from external.sd1.ldm.modules.distributions import (
            distributions as ldm_distributions,
        )
        from mvdfusion import attention as mvd_attention
    except Exception as e:  # pragma: no cover - reference tree missing
        pytest.skip(f"reference not importable: {e}")
    return {
        "attention": ldm_attention,
        "model": ldm_model,
        "openaimodel": ldm_openaimodel,
        "distributions": ldm_distributions,
        "mvd_attention": mvd_attention,
    }


def convert(flax_params, torch_module, table):
    """Write the reference module's weights into flax params via a mapping
    table (same plumbing as tests/test_torch_parity.py)."""
    state = {k: v.detach().numpy() for k, v in torch_module.state_dict().items()}
    flat = {
        tuple(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(flax_params)[0]
    }
    for fpath, (tkey, tf) in table.items():
        full = ("params",) + fpath
        assert full in flat, f"no flax param {full}"
        assert tkey in state, f"no torch key {tkey!r}; have {sorted(state)[:10]}"
        w = TRANSFORMS[tf](state[tkey]).astype(np.float32)
        assert w.shape == flat[full].shape, (full, w.shape, flat[full].shape)
        flat[full] = jnp.asarray(w)
    paths, treedef = jax.tree_util.tree_flatten_with_path(flax_params)
    leaves = [flat[tuple(str(getattr(k, "key", k)) for k in p)] for p, _ in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_ref_cross_attention(ref, rng):
    """attention.py:152-193 — einsum QK^T softmax, heads folded into batch."""
    heads, dh, dim, ctx_dim = 4, 8, 32, 24
    tmod = ref["attention"].CrossAttention(
        query_dim=dim, context_dim=ctx_dim, heads=heads, dim_head=dh
    ).eval()
    torch_ref.randomize_(tmod, std=0.05, seed=1)
    fmod = L.CrossAttention(heads, dh)
    x = rng.normal(size=(2, 10, dim)).astype(np.float32)
    ctx = rng.normal(size=(2, 7, ctx_dim)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx))
    table = {}
    _cross_attention(table, (), "")
    table = {k: (tk.lstrip("."), tf) for k, (tk, tf) in table.items()}
    params = convert(params, tmod, table)
    ours = np.asarray(fmod.apply(params, jnp.asarray(x), jnp.asarray(ctx)))
    with torch.no_grad():
        want = tmod(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()
    np.testing.assert_allclose(ours, want, atol=ATOL)


def test_ref_spatial_transformer(ref, rng):
    """attention.py:225-287 — GN -> 1x1 conv proj -> block -> zero proj_out
    + residual, against the reference's own SpatialTransformer."""
    heads, dh, ch, ctx_dim = 4, 8, 32, 24
    tmod = ref["attention"].SpatialTransformer(
        ch, heads, dh, depth=1, context_dim=ctx_dim
    ).eval()
    torch_ref.randomize_(tmod, std=0.05, seed=2)
    fmod = U.SpatialTransformer(heads, dh, depth=1)
    x = rng.normal(size=(2, 8, 8, ch)).astype(np.float32)
    ctx = rng.normal(size=(2, 5, ctx_dim)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx))
    table = {}
    _spatial_transformer(table, (), "self", depth=1)
    table = {k: (tk.replace("self.", ""), tf) for k, (tk, tf) in table.items()}
    params = convert(params, tmod, table)
    ours = np.asarray(fmod.apply(params, jnp.asarray(x), jnp.asarray(ctx)))
    with torch.no_grad():
        want = tmod(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(ctx))
        want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, want, atol=ATOL)


def test_ref_resblock(ref, rng):
    """openaimodel.py:163-276 — GN+SiLU+conv, t-emb add, zero out conv,
    1x1 skip for channel change."""
    ch_in, ch_out, emb = 32, 64, 48
    tmod = ref["openaimodel"].ResBlock(
        ch_in, emb, dropout=0.0, out_channels=ch_out
    ).eval()
    torch_ref.randomize_(tmod, std=0.05, seed=3)
    fmod = U.ResBlock(out_channels=ch_out)
    x = rng.normal(size=(2, 8, 8, ch_in)).astype(np.float32)
    e = rng.normal(size=(2, emb)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(e))
    table = {}
    _res_block(table, (), "self", has_skip=True)
    table = {k: (tk.replace("self.", ""), tf) for k, (tk, tf) in table.items()}
    params = convert(params, tmod, table)
    ours = np.asarray(fmod.apply(params, jnp.asarray(x), jnp.asarray(e)))
    with torch.no_grad():
        want = tmod(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(e))
        want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, want, atol=ATOL)


def test_ref_view_aligned_transformer(ref, rng):
    """mvdfusion/attention.py:72-145 — the grafted layer itself: per-view
    spatial self-attn, per-pixel 1xD frustum cross-attn, GEGLU FF, with the
    reference's use_linear=True projections and aligned_attn_* naming."""
    heads, dh, ch, ctx_dim, D, H = 4, 8, 32, 32, 2, 8
    tmod = ref["mvd_attention"].ViewAlignedFeatureTransformer(
        ch, heads, dh, depth=1, context_dim=ctx_dim, image_size=H
    ).eval()
    torch_ref.randomize_(tmod, std=0.05, seed=4)
    fmod = U.ViewAlignedFeatureTransformer(heads, dh, depth=1, fuse_mode="never")
    x = rng.normal(size=(2, H, H, ch)).astype(np.float32)
    vol = rng.normal(size=(2, H, H, D, ctx_dim)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(vol))
    table = {}
    _view_aligned_transformer(table, (), "self", depth=1)
    table = {k: (tk.replace("self.", ""), tf) for k, (tk, tf) in table.items()}
    params = convert(params, tmod, table)
    ours = np.asarray(fmod.apply(params, jnp.asarray(x), jnp.asarray(vol)))
    with torch.no_grad():
        want = tmod(
            torch.from_numpy(x).permute(0, 3, 1, 2), [torch.from_numpy(vol)]
        )
        want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, want, atol=ATOL)


class _RefVAE(torch.nn.Module):
    """autoencoder.py:286-341 assembled from the reference's own Encoder /
    Decoder / DiagonalGaussianDistribution (the AutoencoderKL class itself
    only adds a pytorch_lightning harness, unavailable offline). Key names
    match vae_mapping (encoder.*, decoder.*, quant_conv, post_quant_conv)."""

    def __init__(self, ref, ch, ch_mult, num_res_blocks, z=4, resolution=32):
        super().__init__()
        kw = dict(
            ch=ch, out_ch=3, ch_mult=ch_mult, num_res_blocks=num_res_blocks,
            attn_resolutions=[], dropout=0.0, in_channels=3,
            resolution=resolution, z_channels=z,
        )
        self.encoder = ref["model"].Encoder(double_z=True, **kw)
        self.decoder = ref["model"].Decoder(**kw)
        self.quant_conv = torch.nn.Conv2d(2 * z, 2 * z, 1)
        self.post_quant_conv = torch.nn.Conv2d(z, z, 1)
        self._dist = ref["distributions"].DiagonalGaussianDistribution

    def encode_mode(self, x):
        return self._dist(self.quant_conv(self.encoder(x))).mode()

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


def test_ref_vae_towers(ref, rng):
    """Full encode(mode)/decode through the reference's own Encoder/Decoder
    (model.py:368-577) with converted weights."""
    B, IMG = 2, 32
    ch, ch_mult, nrb = 32, (1, 2), 1
    tmod = _RefVAE(ref, ch, ch_mult, nrb, resolution=IMG).eval()
    torch_ref.randomize_(tmod, std=0.04, seed=5)
    fmod = AutoencoderKL(embed_dim=4, ch=ch, ch_mult=ch_mult, num_res_blocks=nrb)

    class _Cfg:
        vae_ch = ch
        vae_ch_mult = ch_mult
        vae_num_res_blocks = nrb

    x = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert(params, tmod, vae_mapping(_Cfg()))
    z_ours = np.asarray(
        fmod.apply(params, jnp.asarray(x), method=AutoencoderKL.encode_mode)
    )
    with torch.no_grad():
        z_ref = tmod.encode_mode(torch.from_numpy(x).permute(0, 3, 1, 2))
        z_ref = z_ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(z_ours, z_ref, atol=5e-4)
    scale = IMG // 2 ** (len(ch_mult) - 1)
    z = rng.normal(size=(B, scale, scale, 4)).astype(np.float32)
    d_ours = np.asarray(fmod.apply(params, jnp.asarray(z), method=AutoencoderKL.decode))
    with torch.no_grad():
        d_ref = tmod.decode(torch.from_numpy(z).permute(0, 3, 1, 2))
        d_ref = d_ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(d_ours, d_ref, atol=5e-4)


def test_ref_diagonal_gaussian_mode(ref, rng):
    """distributions.py:24-62 — mode() is the mean half of the moments."""
    m = rng.normal(size=(2, 8, 4, 4)).astype(np.float32)
    dist = ref["distributions"].DiagonalGaussianDistribution(torch.from_numpy(m))
    np.testing.assert_allclose(dist.mode().numpy(), m[:, :4], atol=0)


@pytest.mark.slow
def test_ref_full_grafted_unet(ref, rng):
    """The WHOLE modified UNet against the reference's own UNetModel
    (mvdfusion/unet.py:215-556): stock input blocks, ViewAligned grafts
    after the SpatialTransformer in the middle block and every
    attention-bearing output block, skip threading, timestep embedding.
    omegaconf (only used for an isinstance check in __init__,
    unet.py:279-281) is stubbed."""
    import types

    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")
        lc.ListConfig = type("ListConfig", (), {})
        om.listconfig = lc
        om.OmegaConf = type("OmegaConf", (), {})
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    try:
        from mvdfusion.unet import UNetModel as RefUNetModel
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference UNetModel not importable: {e}")

    from mvdfusion_tpu.convert.mapping import unet_mapping

    B, H, ctx_dim, D = 2, 32, 64, 1
    tmod = RefUNetModel(
        image_size=H, in_channels=10, model_channels=32, out_channels=5,
        num_res_blocks=2, attention_resolutions=(4, 2, 1), dropout=0.0,
        channel_mult=(1, 2, 4, 4), num_heads=4, transformer_depth=1,
        context_dim=ctx_dim,
    ).eval()
    torch_ref.randomize_(tmod, std=0.04, seed=6)
    fmod = U.UNetModel(
        in_channels=10, model_channels=32, out_channels=5, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4), num_heads=4,
        transformer_depth=1, context_dim=ctx_dim,
    )

    class _Cfg:
        unet_model_channels = 32
        unet_channel_mult = (1, 2, 4, 4)
        unet_num_res_blocks = 2
        unet_transformer_depth = 1
        unet_attention_resolutions = (4, 2, 1)

    x = rng.normal(size=(B, H, H, 10)).astype(np.float32)
    t = np.asarray([500, 137], np.int64)
    context = rng.normal(size=(B, 1, ctx_dim)).astype(np.float32)
    vols = [
        rng.normal(size=(B, H // 2**i, H // 2**i, D, ctx_dim)).astype(np.float32)
        for i in range(4)
    ]
    params = fmod.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(context),
        [jnp.asarray(v) for v in vols],
    )
    params = convert(params, tmod, unet_mapping(_Cfg()))
    ours = np.asarray(
        jax.jit(fmod.apply)(params, jnp.asarray(x), jnp.asarray(t),
                            jnp.asarray(context), [jnp.asarray(v) for v in vols])
    )
    with torch.no_grad():
        want = tmod(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t),
            torch.from_numpy(context), volume_feats=[torch.from_numpy(v) for v in vols],
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, want, atol=5e-4)
