"""SD v1 AutoencoderKL in Flax/NHWC.

Re-design of external/sd1/ldm/models/autoencoder.py:286-399 over the conv
backbone in external/sd1/ldm/modules/diffusionmodules/model.py:368-577
(Encoder/Decoder, ResnetBlock :82-143, AttnBlock :150-204).

Reference semantics preserved:
  * encode: Encoder -> quant_conv -> DiagonalGaussian; ViewFusion always
    takes `.mode()` (the mean half) and scales by 0.18215
    (viewfusion_zero_depth_rgb.py:158-159) — `encode_mode` returns the mean.
  * decode: post_quant_conv -> Decoder. The reference decoder carries a
    straight-through fp16 GroupNorm hack at model.py:563-570 that is exactly
    GroupNorm at inference; we implement plain fp32 GroupNorm.
  * the VAE downsample uses asymmetric (0,1,0,1) padding (model.py:100-106).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from mvdfusion_tpu.nn.layers import Dtype, GroupNorm32, dot_attention


class VAEResnetBlock(nn.Module):
    """model.py:82-143 (temb_channels=0 path).

    A fused GN+SiLU+conv3x3 halo-DMA kernel path exists behind
    `MVDF_CONV3X3=1` (ops/conv3x3.py) but is OFF by default: measured net
    loss vs the plain XLA chain at every decoder shape once the tiled-GN
    custom-calls stopped pinning layouts (tools/conv3x3_tune.py: weighted
    decode convs 36.0 ms XLA vs 53.3 ms fused)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from mvdfusion_tpu.ops.conv3x3 import (
            gn_fold_affine, gn_silu_conv3x3, should_fuse_conv3x3,
        )

        in_ch = x.shape[-1]
        norm1 = GroupNorm32(epsilon=1e-6, act="silu", name="norm1")
        conv1 = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")
        norm2 = GroupNorm32(epsilon=1e-6, act="silu", name="norm2")
        conv2 = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")
        nin = (
            nn.Dense(self.out_channels, dtype=self.dtype, name="nin_shortcut")
            if in_ch != self.out_channels
            else None
        )
        B, H, W, _ = x.shape
        fused = (
            not self.is_initializing()
            and should_fuse_conv3x3(x.shape)
            and should_fuse_conv3x3((B, H, W, self.out_channels))
        )
        if not fused:
            h = norm1(x)
            h = conv1(h)
            h = norm2(h)
            h = conv2(h)
            return (nin(x) if nin is not None else x) + h

        dt = self.dtype
        zrow = jnp.zeros((B, self.out_channels), jnp.float32)

        def gn_ab(norm, h):
            v = norm.variables["params"]["GroupNorm_0"]
            return gn_fold_affine(h.reshape(B, H * W, -1), v["scale"], v["bias"], 32, 1e-6)

        cv = lambda c: (
            c.variables["params"]["kernel"].astype(dt),
            c.variables["params"]["bias"],
        )
        a1, b1 = gn_ab(norm1, x)
        w1, c1b = cv(conv1)
        h = gn_silu_conv3x3(x.astype(dt), a1, b1, w1, c1b, zrow, None)
        a2, b2 = gn_ab(norm2, h)
        w2, c2b = cv(conv2)
        res = nin(x) if nin is not None else x.astype(dt)
        return gn_silu_conv3x3(h, a2, b2, w2, c2b, zrow, res)


class VAEAttnBlock(nn.Module):
    """Single-head bottleneck self-attention (model.py:150-204)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        h = GroupNorm32(epsilon=1e-6, name="norm")(x)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h).reshape(B, H * W, 1, C)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h).reshape(B, H * W, 1, C)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h).reshape(B, H * W, 1, C)
        out = dot_attention(q, k, v, C**-0.5).reshape(B, H, W, C)
        return x + nn.Dense(C, dtype=self.dtype, name="proj_out")(out)


class VAEDownsample(nn.Module):
    """Stride-2 conv with torch's explicit (0,1,0,1) pad (model.py:100-106)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(C, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv")(x)


class VAEUpsample(nn.Module):
    """Nearest 2x + conv (model.py:73-87)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from mvdfusion_tpu.nn.layers import UpsampleConv

        return UpsampleConv(x.shape[-1], dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    """model.py:368-461."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        for level, mult in enumerate(self.ch_mult):
            for i in range(self.num_res_blocks):
                h = VAEResnetBlock(self.ch * mult, dtype=self.dtype, name=f"down_{level}_block_{i}")(h)
            if level != len(self.ch_mult) - 1:
                h = VAEDownsample(dtype=self.dtype, name=f"down_{level}_downsample")(h)
        h = VAEResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(epsilon=1e-6, act="silu", name="norm_out")(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """model.py:462-577 (plain GroupNorm in place of the fp16 ST hack)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), dtype=self.dtype, name="conv_in")(z.astype(self.dtype))
        h = VAEResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for level in reversed(range(len(self.ch_mult))):
            for i in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(self.ch * self.ch_mult[level], dtype=self.dtype, name=f"up_{level}_block_{i}")(h)
            if level != 0:
                h = VAEUpsample(dtype=self.dtype, name=f"up_{level}_upsample")(h)
        h = GroupNorm32(epsilon=1e-6, act="silu", name="norm_out")(h)
        return nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """autoencoder.py:286-341 (deterministic-mode paths only; the GAN/KL
    training losses are dead in the reference: lossconfig = Identity,
    configs/mvd_gso.yaml:73-74)."""

    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch,
            ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            z_channels=self.z_channels,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks, dtype=self.dtype
        )
        self.quant_conv = nn.Dense(2 * self.embed_dim, dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.z_channels, dtype=self.dtype)

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        """[-1,1] NHWC image -> (B, h, w, 2*embed_dim) mean|logvar."""
        return self.quant_conv(self.encoder(x))

    def encode_mode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Deterministic latent = posterior mean (distributions.py:61-62)."""
        return self.encode_moments(x)[..., : self.embed_dim]

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode_mode(x))
