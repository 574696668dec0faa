"""Full-tower numeric parity vs torch replicas (VERDICT round-1 item #4).

Composition-level parity — weights flow through the REAL mapping tables, so
an index-plumbing bug anywhere (output-block idx/sub bookkeeping in
convert/mapping.py, token ordering in nn/viewattn.py, skip-connection order
in nn/unet.py) fails these tests even though every block passes its own
parity test.

Towers covered: grafted UNetModel (10 ViewAligned sites), GridAttn
(rays -> reprojection -> gather -> DiT -> pool, incl. n_pts_per_ray>1 and
top-k), AutoencoderKL encode/decode, CLIP visual tower.
"""

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.slower]
import torch

import jax
import jax.numpy as jnp

from mvdfusion_tpu.convert.mapping import (
    TRANSFORMS,
    clip_mapping,
    unet_mapping,
    vae_mapping,
    viewattn_mapping,
)
from mvdfusion_tpu.core.schedule import make_ddpm_schedule
from mvdfusion_tpu.geometry import look_at_view_transform
from mvdfusion_tpu.geometry.cameras import make_cameras
from mvdfusion_tpu.nn.clip import CLIPImageTower
from mvdfusion_tpu.nn.unet import UNetModel
from mvdfusion_tpu.nn.vae import AutoencoderKL
from mvdfusion_tpu.nn.viewattn import GridAttn

import torch_ref


def convert(flax_params, torch_module, table, strip_prefix=""):
    state = {k: v.detach().numpy() for k, v in torch_module.state_dict().items()}
    flat = {
        tuple(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(flax_params)[0]
    }
    n = 0
    for fpath, (tkey, tf) in table.items():
        tkey = tkey[len(strip_prefix):] if tkey.startswith(strip_prefix) else tkey
        full = ("params",) + fpath
        assert full in flat, f"no flax param {'/'.join(full)}"
        assert tkey in state, f"no torch key {tkey}"
        w = TRANSFORMS[tf](state[tkey]).astype(np.float32)
        assert w.shape == flat[full].shape, (full, w.shape, flat[full].shape)
        flat[full] = jnp.asarray(w)
        n += 1
    assert n == len(table)
    paths, treedef = jax.tree_util.tree_flatten_with_path(flax_params)
    leaves = [flat[tuple(str(getattr(k, "key", k)) for k in p)] for p, _ in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class _Cfg:
    """unet_mapping only reads these fields."""

    unet_model_channels = 32
    unet_channel_mult = (1, 2, 4, 4)
    unet_num_res_blocks = 2
    unet_transformer_depth = 1
    unet_attention_resolutions = (4, 2, 1)
    viewattn_layers = 2
    vae_ch = 32
    vae_ch_mult = (1, 2, 4, 4)
    vae_num_res_blocks = 2
    clip_layers = 2


def test_full_grafted_unet_parity(rng):
    B, H, ctx_dim, D = 2, 32, 64, 1
    tmod = torch_ref.randomize_(torch_ref.UNetModel(
        in_channels=10, model_channels=32, out_channels=5, num_heads=4,
        context_dim=ctx_dim, image_size=H, grafts=True,
    ), std=0.04)
    fmod = UNetModel(
        in_channels=10, model_channels=32, out_channels=5, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4), num_heads=4,
        transformer_depth=1, context_dim=ctx_dim,
    )
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
        jax.jit(fmod.apply)(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(context),
                            [jnp.asarray(v) for v in vols])
    )
    with torch.no_grad():
        ref = tmod(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t),
            torch.from_numpy(context), [torch.from_numpy(v) for v in vols],
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def _gridattn_pair(rng, V, H, D, top_k=None):
    hidden, heads, layers, out_dim = 32, 4, 2, 48
    tmod = torch_ref.randomize_(torch_ref.GridAttn(
        input_size=H, in_channels=5, hidden_size=hidden, output_dim=out_dim,
        num_heads=heads, num_layers=layers, n_pts_per_ray=D,
        keep_top_k_views=top_k is not None, top_k=top_k or 4,
    ), std=0.04, seed=3)
    fmod = GridAttn(
        input_size=H, in_channels=5, hidden_size=hidden, output_dim=out_dim,
        num_heads=heads, num_layers=layers, n_pts_per_ray=D,
        keep_top_k_views=top_k is not None, top_k=top_k or 4,
    )
    return tmod, fmod


@pytest.mark.parametrize("topk", [None, 2])
def test_full_gridattn_parity(rng, topk):
    V, H, D = 5, 8, 2
    tmod, fmod = _gridattn_pair(rng, V, H, D, top_k=topk)
    sched = make_ddpm_schedule(1000)

    azim = np.linspace(0, 360 * (V - 1) / V, V)
    R, T = look_at_view_transform(dist=1.5, elev=30.0, azim=azim + 90)
    f = np.full((V, 2), 2.1875, np.float32)
    c = np.zeros((V, 2), np.float32)
    Ri, Ti = R[:1], T[:1]

    noisy = rng.normal(size=(V, H, H, 5)).astype(np.float32) * 0.5
    in_lat = rng.normal(size=(1, H, H, 5)).astype(np.float32) * 0.5
    t = np.full((V,), 500, np.int64)
    t_embed = rng.normal(size=(V, 32)).astype(np.float32)
    jitter = rng.normal(size=(V, H, H, D)).astype(np.float32)
    mask = np.ones((V,), np.float32)

    cams = make_cameras(R, T, f, c)
    in_cams = make_cameras(Ri, Ti, f[:1], c[:1])
    params = fmod.init(
        jax.random.PRNGKey(0), jnp.asarray(noisy), cams, jnp.asarray(mask),
        jnp.asarray(t_embed), jnp.asarray(t), sched, jnp.asarray(in_lat), in_cams,
        jax.random.PRNGKey(1), jitter_noise=jnp.asarray(jitter),
    )
    params = convert(params, tmod, viewattn_mapping(_Cfg()))
    ours = np.asarray(fmod.apply(
        params, jnp.asarray(noisy), cams, jnp.asarray(mask), jnp.asarray(t_embed),
        jnp.asarray(t), sched, jnp.asarray(in_lat), in_cams, jax.random.PRNGKey(1),
        jitter_noise=jnp.asarray(jitter),
    ))
    with torch.no_grad():
        ref = tmod(
            torch.from_numpy(noisy).permute(0, 3, 1, 2),
            (torch.from_numpy(R), torch.from_numpy(T), torch.from_numpy(f), torch.from_numpy(c)),
            torch.from_numpy(mask), torch.from_numpy(t_embed), torch.from_numpy(t),
            torch.from_numpy(np.asarray(sched.sqrt_alphas_cumprod)),
            torch.from_numpy(np.asarray(sched.sqrt_one_minus_alphas_cumprod)),
            torch.from_numpy(in_lat).permute(0, 3, 1, 2),
            (torch.from_numpy(Ri), torch.from_numpy(Ti), torch.from_numpy(f[:1]), torch.from_numpy(c[:1])),
            torch.from_numpy(jitter).permute(0, 3, 1, 2),
        ).numpy()
    assert ours.shape == ref.shape == (V, H, H, D, 48)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_full_vae_parity(rng):
    B, IMG = 2, 64
    tmod = torch_ref.randomize_(torch_ref.AutoencoderKL(ch=32, ch_mult=(1, 2, 4, 4)), std=0.04, seed=5)
    fmod = AutoencoderKL(embed_dim=4, ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=2)
    x = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert(params, tmod, vae_mapping(_Cfg()))
    z_ours = np.asarray(fmod.apply(params, jnp.asarray(x), method=AutoencoderKL.encode_mode))
    with torch.no_grad():
        z_ref = tmod.encode_mode(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(z_ours, z_ref, atol=5e-4)
    z = rng.normal(size=(B, IMG // 8, IMG // 8, 4)).astype(np.float32)
    d_ours = np.asarray(fmod.apply(params, jnp.asarray(z), method=AutoencoderKL.decode))
    with torch.no_grad():
        d_ref = tmod.decode(torch.from_numpy(z).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(d_ours, d_ref, atol=5e-4)


def test_full_clip_tower_parity(rng):
    B, width, layers, heads, out_dim = 2, 64, 2, 4, 48
    tmod = torch_ref.randomize_(
        torch_ref.CLIPVisual(width=width, layers=layers, heads=heads, output_dim=out_dim),
        std=0.04, seed=9,
    )
    fmod = CLIPImageTower(width=width, layers=layers, heads=heads, output_dim=out_dim)
    x = rng.normal(size=(B, 224, 224, 3)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))

    class _C:
        clip_layers = layers

    table = {k[1:]: v for k, v in clip_mapping(_C()).items()}  # drop ("visual",)
    params = convert(params, tmod, table, strip_prefix="visual.")
    ours = np.asarray(fmod.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-4)
