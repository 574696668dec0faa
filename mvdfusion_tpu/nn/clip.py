"""OpenAI CLIP ViT-L/14 image tower in Flax/NHWC.

Replaces the reference's `clip.load()` torchscript model wrapped by
FrozenCLIPImageEmbedder (external/sd1/ldm/modules/encoders/modules.py:401-441).
Only the visual tower is needed (the text transformer is deleted at :415).

Preprocessing quirk chain reproduced exactly (modules.py:421-428 + the fact
that callers pass [0,1] images, viewfusion_zero_depth_rgb.py:153-155):
bicubic align_corners resize to 224 -> (x+1)/2 -> CLIP mean/std normalize.

Architecture (ViT-L/14): patch 14, width 1024, 24 layers, 16 heads, QuickGELU
MLP, pre-LN transformer, ln_post on the CLS token, linear projection to 768.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mvdfusion_tpu.nn.layers import Dtype, LayerNormFp32, dot_attention
from mvdfusion_tpu.ops.image import bicubic_resize

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) images in [0,1] -> normalized (B, 224, 224, 3).

    NOTE the reference feeds [0,1] images into a preprocessor written for
    [-1,1] (SURVEY.md §2.4 quirk): the (x+1)/2 shift lands inputs in
    [0.5, 1.0] before mean/std normalization. Reproduced for weight parity.
    """
    x = bicubic_resize(images, 224, 224)
    x = (x + 1.0) / 2.0
    return (x - CLIP_MEAN) / CLIP_STD


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent (qkv + out proj, all biased)."""

    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        dh = C // self.heads
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(x).reshape(B, N, self.heads, dh)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(x).reshape(B, N, self.heads, dh)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(x).reshape(B, N, self.heads, dh)
        out = dot_attention(q, k, v, dh**-0.5).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class CLIPBlock(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        x = x + CLIPAttention(self.heads, dtype=self.dtype, name="attn")(LayerNormFp32(name="ln_1")(x))
        h = LayerNormFp32(name="ln_2")(x)
        h = nn.Dense(4 * C, dtype=self.dtype, name="mlp_fc")(h)
        h = QuickGELU()(h)
        x = x + nn.Dense(C, dtype=self.dtype, name="mlp_proj")(h)
        return x


class CLIPImageTower(nn.Module):
    """Visual transformer; returns the projected CLS embedding (B, 768)."""

    width: int = 1024
    layers: int = 24
    heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    output_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        n_patches = (self.image_size // self.patch_size) ** 2
        h = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embed",
        )(x.astype(self.dtype))
        h = h.reshape(B, n_patches, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(self.width**-0.5), (self.width,))
        h = jnp.concatenate([jnp.broadcast_to(cls.astype(h.dtype), (B, 1, self.width)), h], axis=1)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (n_patches + 1, self.width)
        )
        h = h + pos.astype(h.dtype)
        h = LayerNormFp32(name="ln_pre")(h)
        for i in range(self.layers):
            h = CLIPBlock(self.heads, dtype=self.dtype, name=f"block_{i}")(h)
        cls_out = LayerNormFp32(name="ln_post")(h[:, 0])
        proj = self.param("proj", nn.initializers.normal(self.width**-0.5), (self.width, self.output_dim))
        return (cls_out @ proj.astype(cls_out.dtype)).astype(jnp.float32)


class FrozenCLIPImageEmbedder(nn.Module):
    """encode(): [0,1] NHWC images -> (B, 1, output_dim) (modules.py:439-441)."""

    width: int = 1024
    layers: int = 24
    heads: int = 16
    output_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        x = clip_preprocess(images)
        emb = CLIPImageTower(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            output_dim=self.output_dim,
            dtype=self.dtype,
            name="visual",
        )(x)
        return emb[:, None, :]
