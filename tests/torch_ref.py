"""Torch replicas of the reference module tree — test support ONLY.

Independent torch implementations of the reference's documented semantics
and state-dict naming (mvdfusion/unet.py:215-576, mvdfusion/attention.py:
16-145, mvdfusion/view_attn_efficient2.py:96-442, external/sd1 blocks,
viewfusion_zero_depth_rgb.py:19-163). Used to

  (a) synthesize full reference-layout checkpoints so the converter's
      mapping tables are proven end-to-end (tests/test_convert_full.py), and
  (b) provide full-tower numeric parity targets for the Flax towers
      (tests/test_full_tower_parity.py).

Camera math is reimplemented in torch from the same formulas as
mvdfusion_tpu/geometry (PyTorch3D is not available in this image).
"""

from __future__ import annotations

import math

import numpy as np

import torch
import torch.nn as nn
import torch.nn.functional as F

# --------------------------------------------------------------------------
# LDM building blocks (external/sd1/ldm/modules/attention.py, openaimodel.py)
# --------------------------------------------------------------------------


class GEGLUProj(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class FeedForward(nn.Module):
    """attention.py:47-64 (glu=True): net.0.proj, net.2."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.Sequential(GEGLUProj(dim, dim * mult), nn.Dropout(0.0), nn.Linear(dim * mult, dim))

    def forward(self, x):
        return self.net(x)


class CrossAttention(nn.Module):
    """attention.py:152-193: biasless qkv, to_out.0 with bias."""

    def __init__(self, query_dim, context_dim=None, heads=8, dim_head=64):
        super().__init__()
        inner = heads * dim_head
        context_dim = context_dim or query_dim
        self.heads = heads
        self.scale = dim_head**-0.5
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, query_dim), nn.Dropout(0.0))

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


class BasicTransformerBlock(nn.Module):
    """attention.py:195-223."""

    def __init__(self, dim, n_heads, d_head, context_dim):
        super().__init__()
        self.attn1 = CrossAttention(dim, None, n_heads, d_head)
        self.ff = FeedForward(dim)
        self.attn2 = CrossAttention(dim, context_dim, n_heads, d_head)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, context):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        x = self.ff(self.norm3(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """attention.py:225-287 (use_linear=False: 1x1-conv projections)."""

    def __init__(self, in_channels, n_heads, d_head, depth=1, context_dim=None):
        super().__init__()
        inner = n_heads * d_head
        self.norm = nn.GroupNorm(32, in_channels, eps=1e-6)
        self.proj_in = nn.Conv2d(in_channels, inner, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, n_heads, d_head, context_dim) for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(inner, in_channels, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        x_in = x
        x = self.proj_in(self.norm(x))
        x = x.flatten(2).transpose(1, 2)
        for blk in self.transformer_blocks:
            x = blk(x, context)
        x = x.transpose(1, 2).view(b, -1, h, w)
        return self.proj_out(x) + x_in


class DualAttnetionBlock(nn.Module):
    """mvdfusion/attention.py:16-66 (sic: reference typo kept in class name).

    Per-view spatial self-attn over HW tokens, then per-pixel 1-query x D-key
    cross-attn into the frustum, then GEGLU FF.
    """

    def __init__(self, dim, n_heads, d_head, context_dim):
        super().__init__()
        self.attn1 = CrossAttention(dim, None, n_heads, d_head)
        self.ff = FeedForward(dim)
        self.attn2 = CrossAttention(dim, context_dim, n_heads, d_head)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, context, shape):
        b, c, h, w = shape
        x = self.attn1(self.norm1(x)) + x  # (B, HW, C)
        x = x.reshape(b * h * w, 1, -1)
        context = context.reshape(b * h * w, context.shape[2], context.shape[3])
        x = self.attn2(self.norm2(x), context) + x
        x = x[:, 0].reshape(b, h * w, -1)
        x = self.ff(self.norm3(x)) + x
        return x


class ViewAlignedFeatureTransformer(nn.Module):
    """mvdfusion/attention.py:72-145 (use_linear=True path)."""

    def __init__(self, in_channels, n_heads, d_head, depth=1, context_dim=None, image_size=32):
        super().__init__()
        inner = n_heads * d_head
        self.aligned_attn_norm = nn.GroupNorm(32, in_channels, eps=1e-6)
        self.aligned_attn_proj_in = nn.Linear(in_channels, inner)
        self.aligned_attn_transformer_blocks = nn.ModuleList(
            [DualAttnetionBlock(inner, n_heads, d_head, context_dim) for _ in range(depth)]
        )
        self.aligned_attn_proj_out = nn.Linear(in_channels, inner)
        self.level_mapper = {image_size: 0, image_size // 2: 1, image_size // 4: 2, image_size // 8: 3}

    def forward(self, x, volume_levels):
        shape = x.shape
        b, c, h, w = shape
        ctx = volume_levels[self.level_mapper[h]]  # (B, H, W, D, C)
        ctx = ctx.reshape(b, h * w, ctx.shape[3], ctx.shape[4])
        x_in = x
        x = self.aligned_attn_norm(x)
        x = x.flatten(2).transpose(1, 2)
        x = self.aligned_attn_proj_in(x)
        for blk in self.aligned_attn_transformer_blocks:
            x = blk(x, ctx, shape)
        x = self.aligned_attn_proj_out(x)
        x = x.transpose(1, 2).view(b, c, h, w)
        return x + x_in


class ResBlock(nn.Module):
    """openaimodel.py:163-276 (no scale-shift, no up/down)."""

    def __init__(self, channels, emb_channels, out_channels=None):
        super().__init__()
        out_channels = out_channels or channels
        self.in_layers = nn.Sequential(
            nn.GroupNorm(32, channels), nn.SiLU(), nn.Conv2d(channels, out_channels, 3, padding=1)
        )
        self.emb_layers = nn.Sequential(nn.SiLU(), nn.Linear(emb_channels, out_channels))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(32, out_channels), nn.SiLU(), nn.Dropout(0.0),
            nn.Conv2d(out_channels, out_channels, 3, padding=1),
        )
        if channels != out_channels:
            self.skip_connection = nn.Conv2d(channels, out_channels, 1)
        else:
            self.skip_connection = nn.Identity()

    def forward(self, x, emb):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[:, :, None, None]
        h = self.out_layers(h)
        return self.skip_connection(x) + h


class Downsample(nn.Module):
    """openaimodel.py:134-161 (conv named `op`)."""

    def __init__(self, channels):
        super().__init__()
        self.op = nn.Conv2d(channels, channels, 3, stride=2, padding=1)

    def forward(self, x):
        return self.op(x)


class Upsample(nn.Module):
    """openaimodel.py:91-132 (nearest 2x + conv named `conv`)."""

    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class Seq(nn.Sequential):
    """TimestepEmbedSequential (mvdfusion/unet.py:36-52): dispatch on type."""

    def forward(self, x, emb, context, volume_levels):
        for layer in self:
            if isinstance(layer, ResBlock):
                x = layer(x, emb)
            elif isinstance(layer, SpatialTransformer):
                x = layer(x, context)
            elif isinstance(layer, ViewAlignedFeatureTransformer):
                x = layer(x, volume_levels)
            else:
                x = layer(x)
        return x


def timestep_embedding(t, dim, max_period=10000):
    """SD sinusoidal embedding, [cos | sin] (util.py:152-173)."""
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    if dim % 2:
        emb = torch.cat([emb, torch.zeros_like(emb[:, :1])], dim=-1)
    return emb


class UNetModel(nn.Module):
    """The grafted SD1 UNet (mvdfusion/unet.py:215-556), reference naming.

    grafts=True inserts the ViewAlignedFeatureTransformer layers (post-surgery
    positions); grafts=False builds the STOCK zero123/SD layout, used to
    synthesize pre-surgery zero123 checkpoints.
    """

    def __init__(self, in_channels=10, model_channels=32, out_channels=5, num_res_blocks=2,
                 attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4), num_heads=4,
                 transformer_depth=1, context_dim=64, image_size=32, grafts=True):
        super().__init__()
        mc = model_channels
        ted = mc * 4
        self.model_channels = mc
        self.time_embed = nn.Sequential(nn.Linear(mc, ted), nn.SiLU(), nn.Linear(ted, ted))

        def spatial(ch):
            return SpatialTransformer(ch, num_heads, ch // num_heads, transformer_depth, context_dim)

        def view_attn(ch):
            return ViewAlignedFeatureTransformer(
                ch, num_heads, ch // num_heads, transformer_depth, context_dim, image_size
            )

        self.input_blocks = nn.ModuleList([Seq(nn.Conv2d(in_channels, mc, 3, padding=1))])
        ch = mc
        ds = 1
        chans = [mc]
        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                layers = [ResBlock(ch, ted, mult * mc)]
                ch = mult * mc
                if ds in attention_resolutions:
                    layers.append(spatial(ch))
                self.input_blocks.append(Seq(*layers))
                chans.append(ch)
            if level != len(channel_mult) - 1:
                self.input_blocks.append(Seq(Downsample(ch)))
                chans.append(ch)
                ds *= 2

        mid = [ResBlock(ch, ted), spatial(ch)]
        if grafts:
            mid.append(view_attn(ch))
        mid.append(ResBlock(ch, ted))
        self.middle_block = Seq(*mid)

        self.output_blocks = nn.ModuleList([])
        for level, mult in reversed(list(enumerate(channel_mult))):
            for i in range(num_res_blocks + 1):
                ich = chans.pop()
                layers = [ResBlock(ch + ich, ted, mult * mc)]
                ch = mult * mc
                if ds in attention_resolutions:
                    layers.append(spatial(ch))
                    if grafts:
                        layers.append(view_attn(ch))
                if level and i == num_res_blocks:
                    layers.append(Upsample(ch))
                    ds //= 2
                self.output_blocks.append(Seq(*layers))

        self.out = nn.Sequential(
            nn.GroupNorm(32, ch), nn.SiLU(), nn.Conv2d(mc, out_channels, 3, padding=1)
        )

    def forward(self, x, t, context, volume_levels):
        emb = self.time_embed(timestep_embedding(t, self.model_channels))
        hs = []
        h = x
        for blk in self.input_blocks:
            h = blk(h, emb, context, volume_levels)
            hs.append(h)
        h = self.middle_block(h, emb, context, volume_levels)
        for blk in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            h = blk(h, emb, context, volume_levels)
        return self.out(h)


# --------------------------------------------------------------------------
# GridAttn (mvdfusion/view_attn_efficient2.py) + torch camera math
# --------------------------------------------------------------------------


def harmonic_embed(x, n_harmonic=7, omega0=0.1):
    """common_utils.py:161-271 (logspace, append_input)."""
    freqs = (2.0 ** torch.arange(n_harmonic, dtype=torch.float32)) * omega0
    xf = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    return torch.cat([xf.sin(), xf.cos(), x], dim=-1)


def camera_center(R, T):
    return -torch.einsum("bj,bkj->bk", T, R)


def transform_points_ndc(R, T, f, c, pts):
    """pts (1 or B, N, 3) -> (B, N, 3) = (x_ndc, y_ndc, 1/z)."""
    if pts.shape[0] == 1 and R.shape[0] != 1:
        pts = pts.expand(R.shape[0], -1, -1)
    xv = torch.einsum("bnj,bjk->bnk", pts, R) + T[:, None]
    z = xv[..., 2:3]
    xy = f[:, None] * xv[..., :2] / z + c[:, None]
    return torch.cat([xy, 1.0 / z], dim=-1)


def unproject_points(R, T, f, c, xy_depth):
    xy = xy_depth[..., :2]
    z = xy_depth[..., 2:3]
    xy_view = (xy - c[:, None]) * z / f[:, None]
    view = torch.cat([xy_view, z], dim=-1)
    return torch.einsum("bnj,bkj->bnk", view - T[:, None], R)


def pixel_rays(R, T, f, c, H, W):
    """Flipped-sign NDC grid rays (ray_utils.py:128-212 reduction)."""
    hx, hy = 1.0 / W, 1.0 / H
    xs = torch.linspace(1.0 - hx, -1.0 + hx, W)
    ys = torch.linspace(1.0 - hy, -1.0 + hy, H)
    y, x = torch.meshgrid(ys, xs, indexing="ij")
    xy = torch.stack([x, y], dim=-1).reshape(1, H * W, 2).expand(R.shape[0], -1, -1)
    p1 = unproject_points(R, T, f, c, torch.cat([xy, torch.ones_like(xy[..., :1])], -1))
    p2 = unproject_points(R, T, f, c, torch.cat([xy, 2 * torch.ones_like(xy[..., :1])], -1))
    dirs = p2 - p1
    origins = p1 - dirs
    B = R.shape[0]
    return origins.reshape(B, H, W, 3), dirs.reshape(B, H, W, 3)


class TimmAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1) * (C // h) ** -0.5).softmax(-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))


class TimmMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class DiTBlock(nn.Module):
    """view_attn_efficient2.py:42-67 adaLN-Zero."""

    def __init__(self, hidden, heads, mlp_ratio=2.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)
        self.attn = TimmAttention(hidden, heads)
        self.norm2 = nn.LayerNorm(hidden, elementwise_affine=False, eps=1e-6)
        self.mlp = TimmMlp(hidden, int(hidden * mlp_ratio))
        self.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(hidden, 6 * hidden))

    def forward(self, x, cond):
        sa, ca, ga, sm, cm, gm = self.adaLN_modulation(cond).chunk(6, dim=1)
        mod = lambda t, sh, sc: t * (1 + sc.unsqueeze(1)) + sh.unsqueeze(1)
        x = x + ga.unsqueeze(1) * self.attn(mod(self.norm1(x), sa, ca))
        x = x + gm.unsqueeze(1) * self.mlp(mod(self.norm2(x), sm, cm))
        return x


class AggregationTransformer(nn.Module):
    def __init__(self, hidden, num_layers=3, heads=8, mlp_ratio=2.0):
        super().__init__()
        self.layer_list = nn.ModuleList([DiTBlock(hidden, heads, mlp_ratio) for _ in range(num_layers)])
        self.weight_layer = nn.Linear(hidden, 1)

    def forward(self, x, cond):
        for layer in self.layer_list:
            x = layer(x, cond)
        return x, self.weight_layer(x)


class DeadTimestepEmbedder(nn.Module):
    """GridAttn's unused t_embedder (embedder.py:73-110) — present in real
    checkpoints, so the replica carries its keys too."""

    def __init__(self, hidden, freq=256):
        super().__init__()
        self.mlp = nn.Sequential(nn.Linear(freq, hidden), nn.SiLU(), nn.Linear(hidden, hidden))


class GridAttn(nn.Module):
    """view_attn_efficient2.py:96-442 with explicit jitter noise (the
    reference's torch.normal draw, :431, is taken as an argument so both
    implementations can consume the same stream)."""

    def __init__(self, input_size=32, in_channels=5, hidden_size=256, output_dim=768,
                 num_heads=8, mlp_ratio=2.0, num_layers=3, depth_scale=2.0, depth_shift=0.5,
                 n_pts_per_ray=1, keep_top_k_views=False, top_k=4):
        super().__init__()
        self.input_size = input_size
        self.depth_scale = depth_scale
        self.depth_shift = depth_shift
        self.n_pts_per_ray = n_pts_per_ray
        self.keep_top_k_views = keep_top_k_views
        self.top_k = top_k
        self.z_embedder = nn.Sequential(nn.Linear(in_channels, hidden_size), nn.GELU())
        self.t_embedder = DeadTimestepEmbedder(hidden_size)
        plucker_dim, depth_dim = 90, 15
        self.pre_layer_b = nn.Sequential(
            nn.Linear(hidden_size * 2 + plucker_dim * 2 + depth_dim * 2 + 1, hidden_size), nn.GELU()
        )
        self.aggregation_transformer = AggregationTransformer(hidden_size, num_layers, num_heads, mlp_ratio)
        self.final_layer_b = nn.Linear(hidden_size, output_dim)

    def forward(self, noisy_latents, cams, predict_mask, t_embed, t,
                sqrt_alphas_cumprod, sqrt_one_minus_alphas_cumprod,
                input_latents, input_cams, jitter_noise, overwrite_attn_depth=None):
        """noisy_latents (B, 5, H, W) NCHW; cams/input_cams = (R, T, f, c)."""
        R, T, f, c = cams
        Ri, Ti, fi, ci = input_cams
        B, _, H, W = noisy_latents.shape
        D = self.n_pts_per_ray
        V = B

        sqrt_acp = sqrt_alphas_cumprod[t]
        depth_std = (sqrt_one_minus_alphas_cumprod[t] / sqrt_acp / 10.0)[:, None, None, None]
        if overwrite_attn_depth is None:
            depth = noisy_latents[:, 4:5] / sqrt_acp[:, None, None, None]
        else:
            depth = overwrite_attn_depth
        depth = depth.expand(-1, D, -1, -1)  # (B, D, H, W)
        depth = depth + depth_std * jitter_noise
        depth = torch.clamp((depth + 1.0) * 0.5, 0.0, 1.0) * self.depth_scale + self.depth_shift
        depth = depth.permute(0, 2, 3, 1)  # (B, H, W, D)

        origins, dirs = pixel_rays(R, T, f, c, H, W)
        pts = origins[..., None, :] + dirs[..., None, :] * depth[..., None]  # (B,H,W,D,3)
        pts_flat = pts.reshape(1, B * H * W * D, 3)
        N = B * H * W * D

        feat = self.z_embedder(noisy_latents.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        in_feat = self.z_embedder(input_latents.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

        def gsample(maps, xy):
            # maps (V, C, H, W); xy (V, N, 2) NDC -> negated per reference
            out = F.grid_sample(maps, -xy.unsqueeze(2), align_corners=True,
                                mode="bilinear", padding_mode="border")
            return out[..., 0].permute(0, 2, 1)  # (V, N, C)

        ndc = transform_points_ndc(R, T, f, c, pts_flat)
        ref_feats = gsample(feat, ndc[..., :2])
        ndc_in = transform_points_ndc(Ri, Ti, fi, ci, pts_flat)
        in_feats = gsample(in_feat, ndc_in[..., :2]).expand(V, -1, -1)

        centers = camera_center(R, T)  # (V, 3)
        ref_dir = pts_flat.expand(V, -1, -1) - centers[:, None]
        ref_depth = torch.linalg.norm(ref_dir, dim=-1, keepdim=True)
        ref_depth_e = harmonic_embed(ref_depth)
        ref_dir = F.normalize(ref_dir, dim=-1)
        ref_plucker = harmonic_embed(
            torch.cat([ref_dir, torch.cross(centers[:, None].expand_as(ref_dir), ref_dir, dim=-1)], -1)
        )

        q_dir = F.normalize(dirs, dim=-1)  # (B, H, W, 3)
        q_dir = q_dir[:, :, :, None, :].expand(B, H, W, D, 3).reshape(1, N, 3)
        q_origin = centers[:, None, None, None, :].expand(B, H, W, D, 3).reshape(1, N, 3)
        q_plucker = harmonic_embed(
            torch.cat([q_dir, torch.cross(q_origin, q_dir, dim=-1)], -1)
        ).expand(V, -1, -1)
        q_depth_e = harmonic_embed(depth.reshape(1, N, 1)).expand(V, -1, -1)

        mask = predict_mask[:, None, None].expand(V, N, 1)
        z = torch.cat([ref_feats, in_feats, ref_plucker, ref_depth_e, q_plucker, q_depth_e, mask], -1)

        if self.keep_top_k_views:
            offs = torch.arange(-(self.top_k // 2), self.top_k // 2 + 1)
            view_of_token = torch.arange(N) // (H * W * D)
            idx = (view_of_token[None] + offs[:, None]) % V  # (K+1, N)
            z = torch.gather(z, 0, idx[:, :, None].expand(-1, -1, z.shape[-1]))

        tokens = self.pre_layer_b(z.transpose(0, 1))  # (N, V', hid)
        out, w = self.aggregation_transformer(tokens, t_embed[:1])
        w = torch.softmax(w, dim=-2)
        pooled = (out * w).sum(dim=-2)
        frustum = self.final_layer_b(pooled)
        return frustum.reshape(B, H, W, D, -1)


# --------------------------------------------------------------------------
# VAE (external/sd1/ldm/modules/diffusionmodules/model.py:368-577)
# --------------------------------------------------------------------------


def swish(x):
    return x * torch.sigmoid(x)


class VAEResnetBlock(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.nin_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x):
        h = self.conv1(swish(self.norm1(x)))
        h = self.conv2(swish(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class VAEAttnBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.q = nn.Conv2d(ch, ch, 1)
        self.k = nn.Conv2d(ch, ch, 1)
        self.v = nn.Conv2d(ch, ch, 1)
        self.proj_out = nn.Conv2d(ch, ch, 1)

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


class _VAEDown(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class _VAEUp(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _Level(nn.Module):
    def __init__(self):
        super().__init__()
        self.block = nn.ModuleList()


class VAEEncoder(nn.Module):
    def __init__(self, ch=32, ch_mult=(1, 2, 4, 4), nrb=2, z_ch=4):
        super().__init__()
        self.conv_in = nn.Conv2d(3, ch, 3, padding=1)
        self.down = nn.ModuleList()
        block_in = ch
        for level, m in enumerate(ch_mult):
            lev = _Level()
            for _ in range(nrb):
                lev.block.append(VAEResnetBlock(block_in, ch * m))
                block_in = ch * m
            if level != len(ch_mult) - 1:
                lev.downsample = _VAEDown(block_in)
            self.down.append(lev)
        self.mid = nn.Module()
        self.mid.block_1 = VAEResnetBlock(block_in, block_in)
        self.mid.attn_1 = VAEAttnBlock(block_in)
        self.mid.block_2 = VAEResnetBlock(block_in, block_in)
        self.norm_out = nn.GroupNorm(32, block_in, eps=1e-6)
        self.conv_out = nn.Conv2d(block_in, 2 * z_ch, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for level, lev in enumerate(self.down):
            for blk in lev.block:
                h = blk(h)
            if hasattr(lev, "downsample"):
                h = lev.downsample(h)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        return self.conv_out(swish(self.norm_out(h)))


class VAEDecoder(nn.Module):
    def __init__(self, ch=32, ch_mult=(1, 2, 4, 4), nrb=2, z_ch=4, out_ch=3):
        super().__init__()
        block_in = ch * ch_mult[-1]
        self.conv_in = nn.Conv2d(z_ch, block_in, 3, padding=1)
        self.mid = nn.Module()
        self.mid.block_1 = VAEResnetBlock(block_in, block_in)
        self.mid.attn_1 = VAEAttnBlock(block_in)
        self.mid.block_2 = VAEResnetBlock(block_in, block_in)
        self.up = nn.ModuleList([_Level() for _ in ch_mult])
        for level in reversed(range(len(ch_mult))):
            lev = self.up[level]
            for _ in range(nrb + 1):
                lev.block.append(VAEResnetBlock(block_in, ch * ch_mult[level]))
                block_in = ch * ch_mult[level]
            if level != 0:
                lev.upsample = _VAEUp(block_in)
        self.norm_out = nn.GroupNorm(32, block_in, eps=1e-6)
        self.conv_out = nn.Conv2d(block_in, out_ch, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        for level in reversed(range(len(self.up))):
            lev = self.up[level]
            for blk in lev.block:
                h = blk(h)
            if hasattr(lev, "upsample"):
                h = lev.upsample(h)
        return self.conv_out(swish(self.norm_out(h)))


class AutoencoderKL(nn.Module):
    def __init__(self, ch=32, ch_mult=(1, 2, 4, 4), nrb=2, embed_dim=4, z_ch=4):
        super().__init__()
        self.encoder = VAEEncoder(ch, ch_mult, nrb, z_ch)
        self.decoder = VAEDecoder(ch, ch_mult, nrb, z_ch)
        self.quant_conv = nn.Conv2d(2 * z_ch, 2 * embed_dim, 1)
        self.post_quant_conv = nn.Conv2d(embed_dim, z_ch, 1)
        self.embed_dim = embed_dim

    def encode_mode(self, x):
        moments = self.quant_conv(self.encoder(x))
        return moments[:, : self.embed_dim]

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


# --------------------------------------------------------------------------
# CLIP visual tower (OpenAI clip ViT layout)
# --------------------------------------------------------------------------


class CLIPResblock(nn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_1 = nn.LayerNorm(width)
        self.mlp = nn.ModuleDict({"c_fc": nn.Linear(width, width * 4), "c_proj": nn.Linear(width * 4, width)})
        self.ln_2 = nn.LayerNorm(width)

    def forward(self, x):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        h = self.mlp["c_fc"](self.ln_2(x))
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        return x + self.mlp["c_proj"](h)


class CLIPVisual(nn.Module):
    def __init__(self, width=64, layers=2, heads=4, patch=14, image=224, output_dim=64):
        super().__init__()
        n_patches = (image // patch) ** 2
        self.conv1 = nn.Conv2d(3, width, patch, stride=patch, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(width) * width**-0.5)
        self.positional_embedding = nn.Parameter(torch.randn(n_patches + 1, width) * 0.01)
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList([CLIPResblock(width, heads) for _ in range(layers)])
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(torch.randn(width, output_dim) * width**-0.5)

    def forward(self, x):
        h = self.conv1(x)  # (B, width, g, g)
        B = h.shape[0]
        h = h.flatten(2).transpose(1, 2)
        cls = self.class_embedding[None, None].expand(B, 1, -1)
        h = torch.cat([cls, h], dim=1) + self.positional_embedding[None]
        h = self.ln_pre(h)
        for blk in self.transformer.resblocks:
            h = blk(h)
        return self.ln_post(h[:, 0]) @ self.proj


class CLIPModelStub(nn.Module):
    """clip.load()'s model with the text transformer deleted
    (modules.py:414-415): visual + leftover text-side tensors that real
    checkpoints still carry."""

    def __init__(self, width=64, layers=2, heads=4, output_dim=64):
        super().__init__()
        self.visual = CLIPVisual(width, layers, heads, output_dim=output_dim)
        self.token_embedding = nn.Embedding(16, width)
        self.positional_embedding = nn.Parameter(torch.zeros(8, width))
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(torch.zeros(width, output_dim))
        self.logit_scale = nn.Parameter(torch.ones(()))


class FrozenCLIPImageEmbedderStub(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.model = CLIPModelStub(**kw)


# --------------------------------------------------------------------------
# ViewFusion top level (viewfusion_zero_depth_rgb.py:19-163 naming)
# --------------------------------------------------------------------------


class DDPMSchedulerBuffers(nn.Module):
    """The reference scheduler's registered buffers (scheduler.py:28-36) —
    present in full checkpoints, consumed by nothing in the converter."""

    def __init__(self, timesteps=1000):
        super().__init__()
        betas = torch.linspace(0.00085**0.5, 0.0120**0.5, timesteps) ** 2
        ac = torch.cumprod(1 - betas, dim=0)
        acp = torch.cat([torch.ones(1), ac[:-1]])
        pv = betas * (1 - acp) / (1 - ac)
        self.register_buffer("betas", betas)
        self.register_buffer("alphas", 1 - betas)
        self.register_buffer("alphas_cumprod", ac)
        self.register_buffer("sqrt_alphas_cumprod", ac.sqrt())
        self.register_buffer("sqrt_one_minus_alphas_cumprod", (1 - ac).sqrt())
        self.register_buffer("sqrt_recip_alphas_cumprod", (1 / ac).sqrt())
        self.register_buffer("sqrt_recipm1_alphas_cumprod", (1 / ac - 1).sqrt())
        self.register_buffer("posterior_variance", pv)
        self.register_buffer("posterior_log_variance_clipped", pv.clamp(min=1e-20).log().clamp(min=-10))


class UNetWrapperStub(nn.Module):
    def __init__(self, unet):
        super().__init__()
        self.unet_model = unet


class ViewFusion(nn.Module):
    """Full reference state-dict layout for the weights/mvdfusion_sep23.pt
    artifact (demo.py:161-169): every parameter/buffer key a real checkpoint
    carries, at configurable (small) widths."""

    def __init__(self, mc=32, context_dim=64, va_hidden=32, va_layers=2, va_heads=4,
                 vae_ch=32, vae_mult=(1, 2, 4, 4), clip_width=64, clip_layers=2, clip_heads=4,
                 time_embed_dim=32, image_size=32, n_pts_per_ray=1):
        super().__init__()
        self.view_attn = GridAttn(
            input_size=image_size, hidden_size=va_hidden, output_dim=context_dim,
            num_heads=va_heads, num_layers=va_layers, n_pts_per_ray=n_pts_per_ray,
        )
        self.unet_model = UNetWrapperStub(
            UNetModel(model_channels=mc, context_dim=context_dim, image_size=image_size)
        )
        self.scheduler = DDPMSchedulerBuffers()
        self.vae = AutoencoderKL(ch=vae_ch, ch_mult=vae_mult)
        self.clip_image_encoder = FrozenCLIPImageEmbedderStub(
            width=clip_width, layers=clip_layers, heads=clip_heads, output_dim=context_dim
        )
        self.cc_projection = nn.Sequential(
            nn.Linear(context_dim + 28, context_dim), nn.SiLU(True),
            nn.Linear(context_dim, context_dim), nn.SiLU(True),
            nn.Linear(context_dim, context_dim),
        )
        self.time_embed = nn.Sequential(
            nn.Linear(time_embed_dim, time_embed_dim), nn.SiLU(True),
            nn.Linear(time_embed_dim, time_embed_dim),
        )


def randomize_(module, std=0.05, seed=0):
    """Fill every param with distinct random values so identity-mapped inits
    can't mask a wrong mapping row."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * std)
    return module


class ReferenceSampler:
    """The reference's denoising core + DDIM loop over the torch replica,
    with every stochastic draw injected.

    Composes apply_model (viewfusion_zero_depth_rgb.py:282-345: time embed ->
    GridAttn -> cc_projection -> volume pyramid -> grafted UNet), CFG as two
    sequential passes combined s_uc + scale*(s - s_uc) (unet.py:166-196), and
    the eta-DDIM loop with the +1 timestep offset (sampler.py:25-66,90-148,
    util.py:46-61). Conditions (cameras, input latent, clip embedding) are
    scene-fixed at construction.
    """

    def __init__(self, tm, cams, in_lat, in_cams, clip_v, time_embed_dim,
                 z_scale_factor=0.18215, timesteps=1000,
                 linear_start=0.00085, linear_end=0.0120, n_levels=4):
        self.tm = tm
        self.cams = cams  # (R, T, f, c) torch tensors, target views
        self.in_lat = in_lat  # (1, 5, H, W)
        self.in_cams = in_cams
        self.clip_v = clip_v  # (B, 1, ctx+28)
        self.time_embed_dim = time_embed_dim
        self.z_scale_factor = z_scale_factor
        self.n_levels = n_levels
        betas = np.linspace(linear_start**0.5, linear_end**0.5, timesteps,
                            dtype=np.float64) ** 2
        self.abar = np.cumprod(1.0 - betas)
        self.sqrt_acp = torch.from_numpy(np.sqrt(self.abar).astype(np.float32))
        self.sqrt_1macp = torch.from_numpy(np.sqrt(1.0 - self.abar).astype(np.float32))
        self.timesteps = timesteps

    @torch.no_grad()
    def apply_model_cfg(self, x, t, jitter, scale, prev_depth=None):
        """x (B,5,H,W); t (B,) long; jitter (B,D,H,W); returns eps (B,5,H,W)."""
        tm = self.tm
        B, _, H, W = x.shape
        t_embed = tm.time_embed(timestep_embedding(t, self.time_embed_dim))
        frustum = tm.view_attn(
            x, self.cams, torch.ones(B), t_embed, t,
            self.sqrt_acp, self.sqrt_1macp,
            self.in_lat, self.in_cams, jitter, overwrite_attn_depth=prev_depth,
        )  # (B, H, W, D, C)
        ctx = tm.cc_projection(self.clip_v)
        D, C = frustum.shape[3], frustum.shape[4]
        fr = frustum.permute(0, 3, 4, 1, 2).reshape(B, D * C, H, W)
        vols = [
            F.avg_pool2d(fr, 2**i).reshape(B, D, C, H // 2**i, W // 2**i)
            .permute(0, 3, 4, 1, 2) if i else frustum
            for i in range(self.n_levels)
        ]
        in_t = self.in_lat.expand(B, -1, -1, -1)
        # zero123 scale quirk: RGB latent un-scaled before concat (unet.py:153-158)
        x_cat = torch.cat([in_t[:, :4] / self.z_scale_factor, in_t[:, 4:]], 1)
        unet = tm.unet_model.unet_model
        s = unet(torch.cat([x, x_cat], 1), t, ctx, vols)
        s_uc = unet(torch.cat([x, torch.zeros_like(x_cat)], 1), t,
                    torch.zeros_like(ctx), [torch.zeros_like(v) for v in vols])
        return s_uc + scale * (s - s_uc)

    @torch.no_grad()
    def ddim_sample(self, init_noise, step_noise, jitter_noise, scale,
                    num_steps, eta=1.0, feed_prev_depth=False):
        """DDIM loop, noise in scan order: step_noise[k]/jitter_noise[k] are
        consumed by the k-th APPLIED step (k=0 is the highest timestep).
        Returns (final x, pred_x0 trajectory in scan order)."""
        S = num_steps
        ts = np.arange(0, self.timesteps, self.timesteps // S) + 1
        a_t = self.abar[ts]
        a_prev = np.concatenate([self.abar[0:1], a_t[:-1]])
        sigmas = eta * np.sqrt((1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev))

        B = self.clip_v.shape[0]
        x = init_noise.clone()
        prev_depth = None
        traj = []
        for k in range(S):
            index = S - 1 - k
            t = torch.full((B,), int(ts[index]), dtype=torch.long)
            pd = None
            if feed_prev_depth:
                pd = (x[:, 4:5] / np.sqrt(a_t[index])) if k == 0 else prev_depth
            eps = self.apply_model_cfg(x, t, jitter_noise[k], scale, prev_depth=pd)
            pred_x0 = (x - float(np.sqrt(1 - a_t[index])) * eps) / float(np.sqrt(a_t[index]))
            dir_xt = float(np.sqrt(max(1 - a_prev[index] - sigmas[index] ** 2, 1e-7))) * eps
            x = float(np.sqrt(a_prev[index])) * pred_x0 + dir_xt
            if index != 0:  # final step adds no noise (sampler.py:63-65)
                x = x + float(sigmas[index]) * step_noise[k]
            prev_depth = pred_x0[:, 4:5]
            traj.append(pred_x0)
        return x, torch.stack(traj)
