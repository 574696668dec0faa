"""Numeric parity of the Flax towers against torch implementations of the
reference block semantics, through the weight-conversion mapping tables.

Each test builds a small torch module with the reference's exact structure
and naming (so the converter mapping is exercised on realistic state-dict
keys), converts its weights into the Flax module, and asserts the outputs
match. This is the golden-file strategy of SURVEY.md §4 with the fixtures
generated in-process (torch-cpu is available; PyTorch3D is not, so camera
math is covered separately in test_geometry.py).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mvdfusion_tpu.convert.mapping import TRANSFORMS
from mvdfusion_tpu.nn import layers as L
from mvdfusion_tpu.nn import unet as U
from mvdfusion_tpu.nn import vae as V
from mvdfusion_tpu.nn import clip as C
from mvdfusion_tpu.nn import viewattn as VA

ATOL = 2e-4


def convert(flax_params, torch_module, table):
    """Write torch weights into flax params via a mapping table."""
    state = {k: v.detach().numpy() for k, v in torch_module.state_dict().items()}
    flat = {
        tuple(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(flax_params)[0]
    }
    for fpath, (tkey, tf) in table.items():
        full = ("params",) + fpath
        assert full in flat, f"no flax param {full}; have {sorted(flat)[:8]}"
        assert tkey in state, f"no torch key {tkey}; have {sorted(state)[:8]}"
        w = TRANSFORMS[tf](state[tkey]).astype(np.float32)
        assert w.shape == flat[full].shape, (full, w.shape, flat[full].shape)
        flat[full] = jnp.asarray(w)
    paths, treedef = jax.tree_util.tree_flatten_with_path(flax_params)
    leaves = [flat[tuple(str(getattr(k, "key", k)) for k in p)] for p, _ in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)


# --- torch blocks mirroring the reference structure (names must match the
# reference state-dict layout for the mapping tables to apply) -------------


class TorchGEGLUFF(tnn.Module):
    """LDM FeedForward with GEGLU (attention.py:37-64)."""

    def __init__(self, dim, mult=4):
        super().__init__()
        proj = tnn.Linear(dim, dim * mult * 2)
        self.net = tnn.Sequential(
            tnn.Sequential(proj) if False else _GEGLUWrap(proj),
            tnn.Dropout(0.0),
            tnn.Linear(dim * mult, dim),
        )

    def forward(self, x):
        return self.net(x)


class _GEGLUWrap(tnn.Module):
    def __init__(self, proj):
        super().__init__()
        self.proj = proj

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class TorchCrossAttention(tnn.Module):
    """attention.py:152-193 semantics."""

    def __init__(self, query_dim, context_dim=None, heads=4, dim_head=8):
        super().__init__()
        inner = heads * dim_head
        context_dim = context_dim or query_dim
        self.heads = heads
        self.scale = dim_head**-0.5
        self.to_q = tnn.Linear(query_dim, inner, bias=False)
        self.to_k = tnn.Linear(context_dim, inner, bias=False)
        self.to_v = tnn.Linear(context_dim, inner, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, query_dim), tnn.Dropout(0.0))

    def forward(self, x, context=None):
        context = x if context is None else context
        B, N, _ = x.shape
        M = context.shape[1]
        h = self.heads
        q = self.to_q(x).view(B, N, h, -1).transpose(1, 2)
        k = self.to_k(context).view(B, M, h, -1).transpose(1, 2)
        v = self.to_v(context).view(B, M, h, -1).transpose(1, 2)
        attn = (q @ k.transpose(-1, -2) * self.scale).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, -1)
        return self.to_out(out)


class TorchBasicBlock(tnn.Module):
    """attention.py:195-223."""

    def __init__(self, dim, heads, dim_head, context_dim):
        super().__init__()
        self.attn1 = TorchCrossAttention(dim, None, heads, dim_head)
        self.ff = TorchGEGLUFF(dim)
        self.attn2 = TorchCrossAttention(dim, context_dim, heads, dim_head)
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.norm3 = tnn.LayerNorm(dim)

    def forward(self, x, context):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        x = self.ff(self.norm3(x)) + x
        return x


def test_cross_attention_parity(rng):
    heads, dh, dim, ctx_dim = 4, 8, 32, 24
    tmod = TorchCrossAttention(dim, ctx_dim, heads, dh).eval()
    fmod = L.CrossAttention(heads, dh)
    x = rng.normal(size=(2, 10, dim)).astype(np.float32)
    ctx = rng.normal(size=(2, 7, ctx_dim)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx))
    table = {}
    from mvdfusion_tpu.convert.mapping import _cross_attention

    _cross_attention(table, (), "")
    table = {k: (tk.lstrip("."), tf) for k, (tk, tf) in table.items()}
    # torch Sequential names to_out.0
    params = convert(params, tmod, table)
    ours = np.asarray(fmod.apply(params, jnp.asarray(x), jnp.asarray(ctx)))
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_spatial_transformer_parity(rng):
    """Full SpatialTransformer (attention.py:225-287): GN -> 1x1 conv ->
    block -> zero/nonzero 1x1 conv out + residual."""
    heads, dh, ch, ctx_dim = 4, 8, 32, 24

    class TorchSpatial(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm = tnn.GroupNorm(32, ch, eps=1e-6)
            self.proj_in = tnn.Conv2d(ch, heads * dh, 1)
            self.transformer_blocks = tnn.ModuleList([TorchBasicBlock(heads * dh, heads, dh, ctx_dim)])
            self.proj_out = tnn.Conv2d(heads * dh, ch, 1)

        def forward(self, x, context):
            b, c, h, w = x.shape
            xi = x
            x = self.proj_in(self.norm(x))
            x = x.flatten(2).transpose(1, 2)
            for blk in self.transformer_blocks:
                x = blk(x, context)
            x = x.transpose(1, 2).view(b, -1, h, w)
            return self.proj_out(x) + xi

    tmod = TorchSpatial().eval()
    fmod = U.SpatialTransformer(heads, dh, depth=1)
    x = rng.normal(size=(2, 8, 8, ch)).astype(np.float32)
    ctx = rng.normal(size=(2, 5, ctx_dim)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(ctx))
    from mvdfusion_tpu.convert.mapping import _spatial_transformer

    table = {}
    _spatial_transformer(table, (), "self", depth=1)
    table = {k: (tk.replace("self.", ""), tf) for k, (tk, tf) in table.items()}
    params = convert(params, tmod, table)
    ours = np.asarray(fmod.apply(params, jnp.asarray(x), jnp.asarray(ctx)))
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(ctx))
        ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_resblock_parity(rng):
    """openaimodel.py:163-276 ResBlock (no scale-shift)."""
    ch_in, ch_out, emb = 32, 64, 48

    class TorchRes(tnn.Module):
        def __init__(self):
            super().__init__()
            self.in_layers = tnn.Sequential(
                tnn.GroupNorm(32, ch_in), tnn.SiLU(), tnn.Conv2d(ch_in, ch_out, 3, padding=1)
            )
            self.emb_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(emb, ch_out))
            self.out_layers = tnn.Sequential(
                tnn.GroupNorm(32, ch_out), tnn.SiLU(), tnn.Dropout(0.0),
                tnn.Conv2d(ch_out, ch_out, 3, padding=1),
            )
            self.skip_connection = tnn.Conv2d(ch_in, ch_out, 1)

        def forward(self, x, e):
            h = self.in_layers(x)
            h = h + self.emb_layers(e)[:, :, None, None]
            h = self.out_layers(h)
            return self.skip_connection(x) + h

    tmod = TorchRes().eval()
    fmod = U.ResBlock(ch_out)
    x = rng.normal(size=(2, 8, 8, ch_in)).astype(np.float32)
    e = rng.normal(size=(2, emb)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(e))
    from mvdfusion_tpu.convert.mapping import _res_block

    table = {}
    _res_block(table, (), "self", has_skip=True)
    table = {k: (tk.replace("self.", ""), tf) for k, (tk, tf) in table.items()}
    params = convert(params, tmod, table)
    ours = np.asarray(fmod.apply(params, jnp.asarray(x), jnp.asarray(e)))
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(e))
        ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_vae_attn_block_parity(rng):
    """model.py:150-204 single-head attention block."""
    ch = 32

    class TorchAttn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm = tnn.GroupNorm(32, ch, eps=1e-6)
            self.q = tnn.Conv2d(ch, ch, 1)
            self.k = tnn.Conv2d(ch, ch, 1)
            self.v = tnn.Conv2d(ch, ch, 1)
            self.proj_out = tnn.Conv2d(ch, ch, 1)

        def forward(self, x):
            h = self.norm(x)
            q, k, v = self.q(h), self.k(h), self.v(h)
            b, c, hh, ww = q.shape
            q = q.reshape(b, c, hh * ww).permute(0, 2, 1)
            k = k.reshape(b, c, hh * ww)
            w = torch.softmax(torch.bmm(q, k) * c**-0.5, dim=2)
            v = v.reshape(b, c, hh * ww)
            h = torch.bmm(v, w.permute(0, 2, 1)).reshape(b, c, hh, ww)
            return x + self.proj_out(h)

    tmod = TorchAttn().eval()
    fmod = V.VAEAttnBlock()
    x = rng.normal(size=(2, 6, 6, ch)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    from mvdfusion_tpu.convert.mapping import _vae_attn

    table = {}
    _vae_attn(table, (), "self")
    table = {k: (tk.replace("self.", ""), tf) for k, (tk, tf) in table.items()}
    params = convert(params, tmod, table)
    ours = np.asarray(fmod.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_clip_block_parity(rng):
    """CLIP residual block with fused-qkv nn.MultiheadAttention + QuickGELU."""
    width, heads = 32, 4

    class TorchCLIPBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attn = tnn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_1 = tnn.LayerNorm(width)
            self.mlp = tnn.ModuleDict(
                {"c_fc": tnn.Linear(width, width * 4), "c_proj": tnn.Linear(width * 4, width)}
            )
            self.ln_2 = tnn.LayerNorm(width)

        def forward(self, x):
            h = self.ln_1(x)
            x = x + self.attn(h, h, h, need_weights=False)[0]
            h = self.ln_2(x)
            h = self.mlp["c_fc"](h)
            h = h * torch.sigmoid(1.702 * h)
            return x + self.mlp["c_proj"](h)

    tmod = TorchCLIPBlock().eval()
    fmod = C.CLIPBlock(heads)
    x = rng.normal(size=(2, 9, width)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    table = {}
    for which in ("q", "k", "v"):
        table[("attn", f"{which}_proj", "kernel")] = ("attn.in_proj_weight", f"qkv_{which}")
        table[("attn", f"{which}_proj", "bias")] = ("attn.in_proj_bias", f"qkvb_{which}")
    table[("attn", "out_proj", "kernel")] = ("attn.out_proj.weight", "linear")
    table[("attn", "out_proj", "bias")] = ("attn.out_proj.bias", "none")
    for ln in ("ln_1", "ln_2"):
        table[(ln, "LayerNorm_0", "scale")] = (f"{ln}.weight", "none")
        table[(ln, "LayerNorm_0", "bias")] = (f"{ln}.bias", "none")
    table[("mlp_fc", "kernel")] = ("mlp.c_fc.weight", "linear")
    table[("mlp_fc", "bias")] = ("mlp.c_fc.bias", "none")
    table[("mlp_proj", "kernel")] = ("mlp.c_proj.weight", "linear")
    table[("mlp_proj", "bias")] = ("mlp.c_proj.bias", "none")
    params = convert(params, tmod, table)
    ours = np.asarray(fmod.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_dit_block_parity(rng):
    """adaLN-Zero DiT block (view_attn_efficient2.py:42-67) with timm-style
    fused-qkv attention."""
    dim, heads = 32, 4

    class TorchTimmAttn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = tnn.Linear(dim, dim * 3)
            self.proj = tnn.Linear(dim, dim)

        def forward(self, x):
            B, N, _ = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1) * (dim // heads) ** -0.5).softmax(-1)
            return self.proj((attn @ v).transpose(1, 2).reshape(B, N, dim))

    class TorchDiT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
            self.attn = TorchTimmAttn()
            self.norm2 = tnn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
            self.mlp = tnn.ModuleDict(
                {"fc1": tnn.Linear(dim, dim * 2), "fc2": tnn.Linear(dim * 2, dim)}
            )
            self.adaLN_modulation = tnn.Sequential(tnn.SiLU(), tnn.Linear(dim, 6 * dim))

        def forward(self, x, c):
            mods = self.adaLN_modulation(c).chunk(6, dim=1)
            sa, ca, ga, sm, cm, gm = mods
            mod = lambda t, sh, sc: t * (1 + sc.unsqueeze(1)) + sh.unsqueeze(1)
            x = x + ga.unsqueeze(1) * self.attn(mod(self.norm1(x), sa, ca))
            h = self.mlp["fc1"](mod(self.norm2(x), sm, cm))
            h = F.gelu(h)
            x = x + gm.unsqueeze(1) * self.mlp["fc2"](h)
            return x

    tmod = TorchDiT().eval()
    # make adaLN nontrivial (reference zero-inits it; here we test math)
    for p in tmod.adaLN_modulation[1].parameters():
        tnn.init.normal_(p, std=0.1)
    fmod = VA.DiTBlock(heads, mlp_ratio=2.0)
    x = rng.normal(size=(3, 6, dim)).astype(np.float32)
    c = rng.normal(size=(1, dim)).astype(np.float32)
    params = fmod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(c))
    table = {
        ("attn", "qkv", "kernel"): ("attn.qkv.weight", "linear"),
        ("attn", "qkv", "bias"): ("attn.qkv.bias", "none"),
        ("attn", "proj", "kernel"): ("attn.proj.weight", "linear"),
        ("attn", "proj", "bias"): ("attn.proj.bias", "none"),
        ("mlp", "fc1", "kernel"): ("mlp.fc1.weight", "linear"),
        ("mlp", "fc1", "bias"): ("mlp.fc1.bias", "none"),
        ("mlp", "fc2", "kernel"): ("mlp.fc2.weight", "linear"),
        ("mlp", "fc2", "bias"): ("mlp.fc2.bias", "none"),
        ("adaLN", "kernel"): ("adaLN_modulation.1.weight", "linear"),
        ("adaLN", "bias"): ("adaLN_modulation.1.bias", "none"),
    }
    params = convert(params, tmod, table)
    ours = np.asarray(fmod.apply(params, jnp.asarray(x), jnp.asarray(c)))
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x), torch.from_numpy(c)).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)
