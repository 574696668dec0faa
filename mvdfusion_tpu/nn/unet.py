"""The MVD-Fusion UNet: SD-v1 backbone + grafted view-aligned attention.

Independent Flax/NHWC re-design of the reference UNet
(mvdfusion/unet.py:215-576 over external/sd1 blocks openaimodel.py:91-276 and
attention.py:195-287), with the two architectural modifications the reference
makes to stock SD1 (unet.py:409-418, 463-474):

  * a `ViewAlignedFeatureTransformer` after the SpatialTransformer in the
    middle block, and
  * one in every attention-bearing output block,

both cross-attending each pixel to its D view-aligned frustum features
(mvdfusion/attention.py:16-145).

TPU-first choices:
  * NHWC everywhere; 1x1 convs as Dense; convs 3x3 via nn.Conv (XLA:TPU
    native conv).
  * bf16 compute / fp32 params; GroupNorm + softmax in fp32 islands.
  * Classifier-free guidance is run as ONE batched forward of 2B rather than
    the reference's two sequential passes (unet.py:192-193) — better MXU
    utilisation and half the weight traffic from HBM.
  * The frustum pyramid (unet.py:198-209) is exact average pooling.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _split_skip_mode() -> str:
    """Split-skip ResBlock policy (MVDF_SPLIT_SKIP):
      "0"    — never split (concat-then-ResBlock).
      "1"    — split every up-path skip site.
      "auto" — split only seam-UNALIGNED sites (a GroupNorm group straddles
               the concat seam: C1 % (C/32) != 0), i.e. the 960- and
               1920-channel sites.
    History: the round-2 split form required seam alignment for exactness,
    so "1" silently concat-fell-back at the unaligned sites — which are
    exactly the profile's conv-emitter outliers (up_0_res_0 0.69 ms vs
    ~0.46 roofline) — and the aligned 640=320+320 splits measured slightly
    SLOWER; the recorded "wash" never tested the sites that mattered. The
    round-5 GroupNorm32 piece path is exact for any seam, and "auto"
    measured a clear WIN on the full v5e bench: 5.054 views/s vs 4.956
    (+1.7%, per-DDIM-step 31.4 -> 30.9 ms) — now the default. Caveat for
    re-running the "1" A/B: split sites now normalize via _norm_pieces
    (pure-XLA two-stage moments), not round-4's per-piece fusable GN, so a
    "1"-vs-"auto" delta measures the aligned SPLIT + that GN-path change
    together — the round-4 "aligned splits slightly slower" record is not
    directly reproducible on current code."""
    return os.environ.get("MVDF_SPLIT_SKIP", "auto")

from mvdfusion_tpu.nn.layers import (
    CrossAttention,
    Dtype,
    FeedForward,
    GroupNorm32,
    LayerNormFp32,
    timestep_embedding,
)
from mvdfusion_tpu.ops.block import BlockWeights, should_fuse_block, transformer_block
from mvdfusion_tpu.ops.image import area_downsample


def _fused_block_weights(norm, proj_in, proj_out, block) -> BlockWeights:
    """Collect a transformer site's params into ops/block.py's transposed
    layout. `norm`/`block` etc. are the (uncalled) site modules; params
    exist because init runs the XLA path."""
    gn = norm.variables["params"]["GroupNorm_0"]
    pi = proj_in.variables["params"]
    po = proj_out.variables["params"]
    bv = block.variables["params"]
    a1 = bv["attn1"]
    ff = bv["ff"]
    return BlockWeights(
        gn_g=gn["scale"], gn_b=gn["bias"],
        pi_k=pi["kernel"].T, pi_b=pi["bias"],
        ln1_g=bv["norm1"]["LayerNorm_0"]["scale"], ln1_b=bv["norm1"]["LayerNorm_0"]["bias"],
        qkv_k=jnp.concatenate(
            [a1["to_q"]["kernel"].T, a1["to_k"]["kernel"].T, a1["to_v"]["kernel"].T], axis=0
        ),
        out_k=a1["to_out"]["kernel"].T, out_b=a1["to_out"]["bias"],
        ln3_g=bv["norm3"]["LayerNorm_0"]["scale"], ln3_b=bv["norm3"]["LayerNorm_0"]["bias"],
        g_k=ff["geglu"]["proj"]["kernel"].T, g_b=ff["geglu"]["proj"]["bias"],
        f_k=ff["out"]["kernel"].T, f_b=ff["out"]["bias"],
        po_k=po["kernel"].T, po_b=po["bias"],
    )


def _attn2_contribution(block, ctx, dtype):
    """to_out(to_v(ctx)) — the exact attn2 output for a 1-key context
    (softmax over one key == 1; see nn/layers.CrossAttention fast path).
    ctx: (B, Cc) -> (B, C) or (B, N, Cc) -> (B, N, C)."""
    av = block.variables["params"]["attn2"]
    v = ctx.astype(dtype) @ av["to_v"]["kernel"].astype(dtype)
    return v @ av["to_out"]["kernel"].astype(dtype) + av["to_out"]["bias"].astype(dtype)


class _SplitConv3x3(nn.Module):
    """One 3x3 conv whose (kh, kw, C1+C2, out) kernel is applied to two
    inputs as conv(a, k[:, :, :C1]) + conv(b, k[:, :, C1:]) + bias — the
    exact linear split of conv(concat(a, b)). Parameter names/shapes match
    nn.Conv so checkpoints are layout-identical. Built to test whether the
    up-path concat relayouts were the conv-emitter excess; measured a wash
    on v5e (the overhead is per-conv, not concat-induced — ARCHITECTURE.md
    §5), so it's env-gated off by default.
    """

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        C1, C2 = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, C1 + C2, self.out_channels),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype),
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        y = conv(a, kernel[:, :, :C1]) + conv(b, kernel[:, :, C1:])
        return y + bias.astype(y.dtype)


class ResBlock(nn.Module):
    """openaimodel.py:163-276 ResBlock (no scale-shift, no up/down).

    `skip` (up-path skip connection, unet.py:544-545's torch.cat) is taken
    as a SEPARATE input: under the MVDF_SPLIT_SKIP policy the whole
    GN -> SiLU -> conv1 chain and the residual Dense are computed per piece
    and summed — mathematically identical to concat-then-ResBlock but
    without ever materializing the concat. Groups straddling the concat
    seam are exact too (GroupNorm32._norm_pieces combines per-channel
    moments across pieces). Parameters are identical in both forms.
    """

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, emb: jnp.ndarray, skip: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        if skip is not None:
            C = x.shape[-1] + skip.shape[-1]
            mode = _split_skip_mode()
            aligned = C % 32 == 0 and x.shape[-1] % (C // 32) == 0
            split = C % 32 == 0 and (
                mode == "1" or (mode == "auto" and not aligned)
            )
            if not split:
                x = jnp.concatenate([x, skip], axis=-1)
                skip = None
        in_ch = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        if skip is None:
            h = GroupNorm32(act="silu", name="norm1")(x)
            h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        else:
            ha, hb = GroupNorm32(act="silu", name="norm1")(x, skip)
            h = _SplitConv3x3(self.out_channels, dtype=self.dtype, name="conv1")(ha, hb)
        e = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :].astype(h.dtype)
        h = GroupNorm32(act="silu", name="norm2")(h)
        h = nn.Conv(
            self.out_channels, (3, 3), dtype=self.dtype, kernel_init=nn.initializers.zeros, name="conv2"
        )(h)
        if in_ch != self.out_channels:
            if skip is None:
                x = nn.Dense(self.out_channels, dtype=self.dtype, name="skip")(x)
            else:
                # Dense(concat(x, skip)) == x @ k[:C1] + skip @ k[C1:] + b
                x = _SplitDense(self.out_channels, dtype=self.dtype, name="skip")(x, skip)
        elif skip is not None:  # pragma: no cover - up-path concats always widen
            x = jnp.concatenate([x, skip], axis=-1)
        return x + h


class _SplitDense(nn.Module):
    """Dense over a virtual concat: x @ k[:C1] + y @ k[C1:] + b. Same param
    names/shapes as nn.Dense."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        C1, C2 = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (C1 + C2, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = a.astype(self.dtype) @ kernel[:C1].astype(self.dtype)
        y = y + b.astype(self.dtype) @ kernel[C1:].astype(self.dtype)
        return y + bias.astype(y.dtype)


class BasicTransformerBlock(nn.Module):
    """attention.py:195-223: self-attn, cross-attn(context), GEGLU FF."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        x = x + CrossAttention(self.heads, self.dim_head, dtype=self.dtype, name="attn1")(
            LayerNormFp32(name="norm1")(x)
        )
        x = x + CrossAttention(self.heads, self.dim_head, dtype=self.dtype, name="attn2")(
            LayerNormFp32(name="norm2")(x), context
        )
        x = x + FeedForward(dim, dtype=self.dtype, name="ff")(LayerNormFp32(name="norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    """attention.py:225-287 (use_linear=False: 1x1-conv projections)."""

    heads: int
    dim_head: int
    depth: int = 1
    dtype: Dtype = jnp.float32
    fuse_mode: str = "auto"  # auto | never | interpret (interpret: tests)

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x_in = x
        norm = GroupNorm32(epsilon=1e-6, name="norm")
        proj_in = nn.Dense(self.heads * self.dim_head, dtype=self.dtype, name="proj_in")
        proj_out = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="proj_out")
        blocks = [
            BasicTransformerBlock(self.heads, self.dim_head, dtype=self.dtype, name=f"block_{d}")
            for d in range(self.depth)
        ]
        if (
            not self.is_initializing()
            and self.depth == 1
            and context.shape[1] == 1
            and self.heads * self.dim_head == C
            and (
                self.fuse_mode == "interpret"
                or (self.fuse_mode == "auto" and should_fuse_block(C, H * W, self.heads))
            )
        ):
            # fused whole-site Pallas kernel (ops/block.py): GN -> proj_in ->
            # attn1 -> attn2(1-token ctx) -> FF -> proj_out -> +x_in
            a2 = _attn2_contribution(blocks[0], context[:, 0], self.dtype)  # (B, C)
            w = _fused_block_weights(norm, proj_in, proj_out, blocks[0])
            # positional call: custom_vjp + nondiff_argnums
            out = transformer_block(
                x_in.reshape(B, H * W, C).astype(self.dtype),
                a2, w, self.heads, self.fuse_mode == "interpret",
            )
            # match the fallback's `h + x_in` promotion so both gated paths
            # return the same dtype (e.g. fp32 input with bf16 compute)
            return out.reshape(B, H, W, C).astype(jnp.promote_types(x_in.dtype, self.dtype))
        h = proj_in(norm(x))
        h = h.reshape(B, H * W, -1)
        for blk in blocks:
            h = blk(h, context)
        h = h.reshape(B, H, W, -1)
        h = proj_out(h)
        return h + x_in


class DualAttentionBlock(nn.Module):
    """mvdfusion/attention.py:16-66: per-view spatial self-attention, then
    per-pixel 1-query x D-key cross-attention into the frustum, then FF."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        """x: (B, HW, C); context: (B, HW, D, Cc)."""
        B, N, C = x.shape
        D = context.shape[2]
        x = x + CrossAttention(self.heads, self.dim_head, dtype=self.dtype, name="attn1")(
            LayerNormFp32(name="norm1")(x)
        )
        # per-pixel cross-attention: fold HW into batch (attention.py:56-62)
        q = LayerNormFp32(name="norm2")(x).reshape(B * N, 1, C)
        ctx = context.reshape(B * N, D, context.shape[-1])
        x = x + CrossAttention(self.heads, self.dim_head, dtype=self.dtype, name="attn2")(q, ctx).reshape(
            B, N, C
        )
        x = x + FeedForward(C, dtype=self.dtype, name="ff")(LayerNormFp32(name="norm3")(x))
        return x


class ViewAlignedFeatureTransformer(nn.Module):
    """mvdfusion/attention.py:72-145 (use_linear=True path).

    The reference names every parameter `aligned_attn_*` so checkpoint
    surgery can isolate the grafted layers; here the module name itself
    (`view_attn`) carries that role for the optimizer masks.
    """

    heads: int
    dim_head: int
    depth: int = 1
    dtype: Dtype = jnp.float32
    fuse_mode: str = "auto"  # auto | never | interpret (interpret: tests)

    @nn.compact
    def __call__(self, x: jnp.ndarray, volume: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C); volume: (B, H, W, D, Cc) frustum at this level."""
        B, H, W, C = x.shape
        D = volume.shape[3]
        x_in = x
        norm = GroupNorm32(epsilon=1e-6, name="norm")
        proj_in = nn.Dense(self.heads * self.dim_head, dtype=self.dtype, name="proj_in")
        proj_out = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="proj_out")
        blocks = [
            DualAttentionBlock(self.heads, self.dim_head, dtype=self.dtype, name=f"block_{d}")
            for d in range(self.depth)
        ]
        if (
            not self.is_initializing()
            and self.depth == 1
            and D == 1
            and self.heads * self.dim_head == C
            and (
                self.fuse_mode == "interpret"
                or (self.fuse_mode == "auto" and should_fuse_block(C, H * W, self.heads))
            )
        ):
            # fused site kernel; the per-pixel D=1 frustum cross-attention is
            # exactly to_out(to_v(frustum)) per pixel (attention.py:56-62
            # with one key), precomputed as one clean (B*HW, Cc) matmul pair
            ctx = volume.reshape(B, H * W, volume.shape[4])
            a2 = _attn2_contribution(blocks[0], ctx, self.dtype)  # (B, HW, C)
            w = _fused_block_weights(norm, proj_in, proj_out, blocks[0])
            # positional call: custom_vjp + nondiff_argnums
            out = transformer_block(
                x_in.reshape(B, H * W, C).astype(self.dtype),
                a2, w, self.heads, self.fuse_mode == "interpret",
            )
            # match the fallback's `h + x_in` promotion so both gated paths
            # return the same dtype (e.g. fp32 input with bf16 compute)
            return out.reshape(B, H, W, C).astype(jnp.promote_types(x_in.dtype, self.dtype))
        ctx = volume.reshape(B, H * W, volume.shape[3], volume.shape[4])
        h = proj_in(norm(x).reshape(B, H * W, C))
        for blk in blocks:
            h = blk(h, ctx)
        h = proj_out(h)
        return h.reshape(B, H, W, C) + x_in


class Downsample(nn.Module):
    """openaimodel.py:134-161: stride-2 3x3 conv."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch Conv2d(stride=2, padding=1) pads symmetrically; XLA 'SAME'
        # would pad (0,1) here, shifting the grid — pin it explicitly.
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv"
        )(x)


class Upsample(nn.Module):
    """openaimodel.py:91-132: nearest 2x + 3x3 conv — computed exactly at
    low resolution via phase-folded 2x2 convs (layers.UpsampleConv)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from mvdfusion_tpu.nn.layers import UpsampleConv

        return UpsampleConv(self.out_channels, dtype=self.dtype, name="conv")(x)


def volume_pyramid(volume: jnp.ndarray, num_levels: int) -> list[jnp.ndarray]:
    """Area-downsample the frustum to each UNet resolution (unet.py:198-209).

    volume: (B, H, W, D, C) -> [same, /2, /4, ..., /2^(L-1)].

    Built successively (each level from the previous, not each from full
    res): mean-of-2x2-means == mean-of-the-4x4-block up to f32 reassociation
    (area_downsample accumulates in f32), and the full-res tensor is read
    once instead of num_levels times — the pyramid was a measured
    ~0.14 ms/step of the flagship step's data-format tail when computed
    f32-from-full-res every level (round-5 step trace).
    """
    B, H, W, D, C = volume.shape
    flat = volume.reshape(B, H, W, D * C)
    levels = [flat]
    for _ in range(num_levels - 1):
        levels.append(area_downsample(levels[-1], 2))
    return [
        lv.reshape(B, H // 2**i, W // 2**i, D, C) for i, lv in enumerate(levels)
    ]


class UNetModel(nn.Module):
    """View-conditioned SD1 UNet (mvdfusion/unet.py:215-556).

    __call__(x, t, context, volume_levels):
      x:             (B, H, W, in_channels)  — noisy RGBD latent ++ concat cond
      t:             (B,) DDPM timesteps
      context:       (B, M, context_dim) CLIP+pose tokens
      volume_levels: list of (B, H/2^i, W/2^i, D, context_dim) frusta
    Returns (B, H, W, out_channels).
    """

    in_channels: int = 10
    model_channels: int = 320
    out_channels: int = 5
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    dtype: Dtype = jnp.float32
    fuse_mode: str = "auto"  # auto | never | interpret (see SpatialTransformer)
    # Per-block rematerialization (jax.checkpoint via nn.remat around every
    # ResBlock / SpatialTransformer / ViewAlignedFeatureTransformer):
    # backward stores only block-boundary activations and recomputes each
    # block's interior, trading ~one extra forward of FLOPs for the
    # activation footprint. Needed because the flagship TRAIN step does not
    # otherwise fit one 16 GB v5e chip (f32 masters + AdamW moments are
    # ~13.3 GB before a single activation; the reference trains on 40 GB
    # A100s and never faces this, train.py:27-214). Identical math —
    # parity-tested against the unrematerialized forward AND gradients.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        context: jnp.ndarray,
        volume_levels: Sequence[jnp.ndarray],
    ) -> jnp.ndarray:
        mc = self.model_channels
        ds_to_level = {1: 0, 2: 1, 4: 2, 8: 3}
        Res = nn.remat(ResBlock) if self.remat else ResBlock
        Spatial = nn.remat(SpatialTransformer) if self.remat else SpatialTransformer
        ViewAligned = (
            nn.remat(ViewAlignedFeatureTransformer) if self.remat
            else ViewAlignedFeatureTransformer
        )

        t_emb = timestep_embedding(t, mc)
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_dense1")(t_emb.astype(self.dtype))
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_dense2")(nn.silu(emb))

        x = x.astype(self.dtype)
        context = context.astype(self.dtype)
        volume_levels = [v.astype(self.dtype) for v in volume_levels]

        def spatial(name, ch):
            return Spatial(
                self.num_heads, ch // self.num_heads, self.transformer_depth,
                dtype=self.dtype, fuse_mode=self.fuse_mode, name=name
            )

        def view_attn(name, ch):
            return ViewAligned(
                self.num_heads, ch // self.num_heads, self.transformer_depth,
                dtype=self.dtype, fuse_mode=self.fuse_mode, name=name
            )

        # ---- input blocks (stock SD1; no view attention on the way down) --
        h = nn.Conv(mc, (3, 3), dtype=self.dtype, name="conv_in")(x)
        hs = [h]
        ch = mc
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = mult * mc
                h = Res(ch, dtype=self.dtype, name=f"down_{level}_res_{i}")(h, emb)
                if ds in self.attention_resolutions:
                    h = spatial(f"down_{level}_attn_{i}", ch)(h, context)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(ch, dtype=self.dtype, name=f"down_{level}_downsample")(h)
                hs.append(h)
                ds *= 2

        # ---- middle block: Res, Spatial, ViewAligned (graft), Res ---------
        h = Res(ch, dtype=self.dtype, name="mid_res_0")(h, emb)
        h = spatial("mid_attn", ch)(h, context)
        h = view_attn("mid_view_attn", ch)(h, volume_levels[ds_to_level[ds]])
        h = Res(ch, dtype=self.dtype, name="mid_res_1")(h, emb)

        # ---- output blocks: Res [+ Spatial + ViewAligned graft] [+ Up] ----
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                # skip passed separately: ResBlock computes the GN/conv1/skip
                # chain per piece where exact (no concat materialized)
                skip = hs.pop()
                ch = mult * mc
                h = Res(ch, dtype=self.dtype, name=f"up_{level}_res_{i}")(h, emb, skip)
                if ds in self.attention_resolutions:
                    h = spatial(f"up_{level}_attn_{i}", ch)(h, context)
                    h = view_attn(f"up_{level}_view_attn_{i}", ch)(h, volume_levels[ds_to_level[ds]])
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, dtype=self.dtype, name=f"up_{level}_upsample")(h)
                    ds //= 2

        h = GroupNorm32(act="silu", name="norm_out")(h)
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="conv_out",
        )(h)
        return h.astype(jnp.float32)
