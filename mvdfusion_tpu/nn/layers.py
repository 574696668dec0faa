"""Shared Flax building blocks for the SD1-family modules.

TPU conventions used throughout the nn/ package:
  * NHWC activation layout (XLA:TPU-native conv layout).
  * Parameters are fp32; compute dtype is configurable (bf16 on TPU).
  * GroupNorm / LayerNorm / softmax run in fp32 islands and cast back
    (the reference's GroupNorm32, external/sd1/.../util.py:218-220).
  * 1x1 convs are expressed as Dense over the channel axis (identical math,
    better XLA fusion).

Reference counterparts are cited per class; the implementations are
independent JAX designs.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """SD sinusoidal timestep embedding, [cos | sin] order.

    Matches external/sd1/.../util.py:152-173 (and mvdfusion/embedder.py:114).
    t: (B,) float or int -> (B, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class _ScaleBias(nn.Module):
    """Bare scale/bias params, named to match nn.GroupNorm's pytree slot so
    the checkpoint mapping tables stay valid."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32, output cast back to input dtype.

    `act="silu"` fuses the x*sigmoid(x) that follows nearly every GroupNorm
    in the SD towers. On TPU this routes to the fused Pallas kernel
    (ops/groupnorm.py) — the C/G=10..40 lane-strided group statistics are
    XLA:TPU's worst-fused pattern (~13% of the profiled denoising step);
    elsewhere an equivalent fp32 XLA path runs (flax.linen.GroupNorm
    variance semantics: E[x^2] - E[x]^2)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    act: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, x2: Optional[jnp.ndarray] = None):
        """GroupNorm over x, or — with `x2` — over the *virtual concat*
        [x ‖ x2] without materializing it: parameters are sized C1+C2,
        per-channel spatial moments are computed per piece and combined
        into group statistics at the tiny (B, C) level, so the result is
        EXACT for any split — including groups that straddle the seam
        (earlier rounds' split form required seam alignment, which silently
        excluded exactly the unaligned 960/1920-channel up-path sites the
        profile flags as conv-emitter outliers). Returns (y1, y2). Used by
        the split-skip ResBlock to keep up-path skip concats out of the
        conv input path."""
        C1 = x.shape[-1]
        C = C1 + (x2.shape[-1] if x2 is not None else 0)
        scale, bias = _ScaleBias(C, name="GroupNorm_0")()
        if x2 is not None:
            return self._norm_pieces((x, x2), scale, bias)
        return self._norm_one(x, scale, bias, self.num_groups)

    def _norm_pieces(self, pieces, scale, bias):
        """Exact GroupNorm over the virtual concat of `pieces` (along the
        channel axis) without materializing it; any seam position."""
        C = sum(p.shape[-1] for p in pieces)
        G = self.num_groups
        assert C % G == 0, (C, G)
        Cg = C // G
        B = pieces[0].shape[0]
        p32 = [p.astype(jnp.float32) for p in pieces]
        sp = tuple(range(1, p32[0].ndim - 1))
        s1 = jnp.concatenate([jnp.mean(p, axis=sp) for p in p32], axis=-1)  # (B, C)
        s2 = jnp.concatenate(
            [jnp.mean(jnp.square(p), axis=sp) for p in p32], axis=-1
        )
        mu_g = s1.reshape(B, G, Cg).mean(-1)
        var_g = jnp.maximum(s2.reshape(B, G, Cg).mean(-1) - jnp.square(mu_g), 0.0)
        mu_c = jnp.repeat(mu_g, Cg, axis=-1)  # (B, C) per-channel broadcast
        inv_c = jnp.repeat(jax.lax.rsqrt(var_g + self.epsilon), Cg, axis=-1)
        outs = []
        off = 0
        for orig, p in zip(pieces, p32):
            Ck = p.shape[-1]
            bshape = (B,) + (1,) * (p.ndim - 2) + (Ck,)
            y = (p - mu_c[:, off : off + Ck].reshape(bshape)) * inv_c[
                :, off : off + Ck
            ].reshape(bshape)
            y = y * scale[off : off + Ck].astype(jnp.float32) + bias[
                off : off + Ck
            ].astype(jnp.float32)
            if self.act == "silu":
                y = y * jax.nn.sigmoid(y)
            outs.append(y.astype(orig.dtype))
            off += Ck
        return tuple(outs)

    def _norm_one(self, x, scale, bias, num_groups: int) -> jnp.ndarray:
        from mvdfusion_tpu.ops.groupnorm import group_norm_act, should_fuse_gn

        C = x.shape[-1]
        if not self.is_initializing() and should_fuse_gn(x.shape, num_groups):
            y = group_norm_act(
                x.reshape(x.shape[0], -1, C), scale, bias,
                num_groups, self.epsilon, self.act,
            )
            return y.reshape(x.shape)
        # Stats in two stages: per-CHANNEL spatial moments first (reduces
        # only the major/sublane spatial axes at full lane width — XLA:TPU
        # lowers a reduce over a minor-split (G, C/G) reshape as a
        # lane-strided pass at ~37 GB/s; the 256^2 VAE-decoder GN stats
        # alone were ~6 ms of the 37 ms decode, round-5 trace), then the
        # per-group combine on the tiny (B, C) moment tensors. Same mean /
        # E[x^2]-mu^2 math, f32 accumulation throughout, equal counts per
        # channel -> identical up to f32 reassociation.
        B = x.shape[0]
        Cg = C // num_groups
        x32 = x.astype(jnp.float32)
        sp = tuple(range(1, x32.ndim - 1))
        s1 = jnp.mean(x32, axis=sp)  # (B, C)
        s2 = jnp.mean(jnp.square(x32), axis=sp)  # (B, C)
        mu_g = s1.reshape(B, num_groups, Cg).mean(-1)  # (B, G)
        # clamp: E[x^2]-mu^2 can go (slightly) negative under f32
        # cancellation at large activations -> rsqrt(neg) -> NaN poisons the
        # whole sample (observed once per ~16 eta=1.0 from-scratch
        # trajectories, always at the final t=1 step); exact when var >= 0
        var_g = jnp.maximum(
            s2.reshape(B, num_groups, Cg).mean(-1) - jnp.square(mu_g), 0.0
        )
        bshape = (B,) + (1,) * (x32.ndim - 2) + (C,)
        mu = jnp.repeat(mu_g, Cg, axis=-1).reshape(bshape)
        inv = jnp.repeat(
            jax.lax.rsqrt(var_g + self.epsilon), Cg, axis=-1
        ).reshape(bshape)
        y = (x32 - mu) * inv
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        if self.act == "silu":
            y = y * jax.nn.sigmoid(y)
        return y.astype(x.dtype)


class LayerNormFp32(nn.Module):
    """LayerNorm in fp32 (optionally affine-free, for adaLN)."""

    use_scale_bias: bool = True
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        y = nn.LayerNorm(
            epsilon=self.epsilon,
            use_bias=self.use_scale_bias,
            use_scale=self.use_scale_bias,
            dtype=jnp.float32,
            # fast variance is SAFE here: flax already clamps it at 0
            # (normalization.py `var = jnp.maximum(0.0, mu2 - _abs_sq(mu))`)
            # so the rsqrt(negative)->NaN failure the repo's own norms
            # needed clamping for (GroupNorm32, ops/block.py, groupnorm.py)
            # cannot occur. Round 4 briefly switched to two-pass variance
            # (use_fast_variance=False); that doubled the LN activation
            # residuals through the train-step backward and OOM'd the
            # 16 GB chip on `bench.py --train` — reverted.
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


def zeros_init():
    return nn.initializers.zeros


class GEGLU(nn.Module):
    """x W1 * gelu(x W2) (external/sd1/ldm/modules/attention.py:37-44)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        y, gate = jnp.split(h, 2, axis=-1)
        return y * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """LDM FeedForward with GEGLU gate (attention.py:47-64, glu=True)."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = int(self.dim * self.mult)
        x = GEGLU(inner, dtype=self.dtype, name="geglu")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(x)


def dot_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Multi-head attention core with fp32 softmax.

    q: (B, Nq, H, D), k/v: (B, Nk, H, D) -> (B, Nq, H, D).
    On TPU the large-token sites route to the fused Pallas kernel
    (ops/attention.py) which keeps the fp32 logits in VMEM; elsewhere (CPU,
    tiny sequences) the plain XLA einsum path runs. Both compute a
    stabilized fp32 softmax with bf16-matmul operands — identical math.
    """
    from mvdfusion_tpu.ops.attention import fused_attention, should_fuse

    if should_fuse(q, k):
        return fused_attention(q, k, v, scale)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class CrossAttention(nn.Module):
    """LDM CrossAttention (attention.py:152-193): q from x, kv from context,
    no qkv bias, output projection with bias; self-attention when context is
    None."""

    heads: int
    dim_head: int
    context_dim: Optional[int] = None  # informational; kv dims come from input
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        is_self = context is None
        context = x if context is None else context
        inner = self.heads * self.dim_head
        if not is_self and context.shape[1] == 1:
            # 1-key attention (reference attention.py:152-193 with a 1-token
            # context — always the case for attn2 here: the CLIP+pose
            # conditioning is a single token, and the D=1 per-pixel frustum
            # case of attention.py:56-62 folds HW into batch): softmax over
            # a single key is exactly 1 (and its gradient w.r.t. q/k exactly
            # 0), so out == to_out(to_v(ctx)) broadcast over the queries.
            # Skips to_q, the (B,H,Nq,1) logits and the softmax at all 16
            # UNet attn2 sites — bit-identical output.
            if self.is_initializing():  # params must still exist for ckpts
                nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
                nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
            out = nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(v)
            return jnp.broadcast_to(out, x.shape[:2] + (out.shape[-1],))
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = q.reshape(B, Nq, self.heads, self.dim_head)
        k = k.reshape(B, Nk, self.heads, self.dim_head)
        v = v.reshape(B, Nk, self.heads, self.dim_head)
        out = dot_attention(q, k, v, self.dim_head**-0.5)
        out = out.reshape(B, Nq, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class TimmAttention(nn.Module):
    """timm ViT attention (qkv fused with bias) used by the DiT blocks
    (view_attn_efficient2.py:6,52)."""

    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        dim_head = C // self.heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, self.heads, dim_head)
        k = k.reshape(B, N, self.heads, dim_head)
        v = v.reshape(B, N, self.heads, dim_head)
        out = dot_attention(q, k, v, dim_head**-0.5).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    """timm Mlp: Dense -> GELU -> Dense (view_attn_efficient2.py:57)."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32
    act: Callable = lambda x: nn.gelu(x, approximate=False)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class UpsampleConv(nn.Module):
    """3x3 conv of a nearest-2x-upsampled input, computed exactly at LOW
    resolution as 4 phase-folded 2x2 convs.

    The reference's Upsample (openaimodel.py:91-132, diffusionmodules/
    model.py Upsample) materializes the 2x-duplicated map and convolves it:
    every 3x3 window then sees each low-res pixel 1-4 times, so the conv is
    algebraically a 2x2 conv per output PHASE (output row 2r+p, col 2c+q)
    with row/col-folded taps:

        row-even (p=0): taps x[r-1], x[r]   with [W0, W1+W2]
        row-odd  (p=1): taps x[r],   x[r+1] with [W0+W1, W2]

    (same fold on columns), i.e. 16 MACs per low-res pixel instead of 36 —
    2.25x fewer FLOPs, no 4x upsampled intermediate, bit-equal math up to
    one f32 add reassociation (W1+W2 pre-summed). Zero padding of the
    original conv maps to pad (1-p, p) x (1-q, q) per phase.

    Parameter tree ('kernel' (3,3,Cin,Cout) + 'bias') and init RNG draws
    are identical to nn.Conv(out_channels, (3,3)), so checkpoints and the
    torch converter are unaffected. MVDF_UPSAMPLE_FOLD=0 selects the naive
    upsample-then-conv path for A/B. Like every MVDF_* gate, the env var is
    read at TRACE time: a jitted apply captures the value at first compile,
    and later toggles have no effect until retrace (repo-wide convention).
    """

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        from mvdfusion_tpu.ops.image import nearest_upsample2x

        Cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, Cin, self.out_channels)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        if os.environ.get("MVDF_UPSAMPLE_FOLD", "1") == "0":
            y, k, b = nn.dtypes.promote_dtype(
                nearest_upsample2x(x), kernel, bias, dtype=self.dtype
            )
            y = jax.lax.conv_general_dilated(
                y, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + b

        # fold in the param dtype (f32) before the compute-dtype cast
        k = kernel
        r0 = jnp.stack([k[0], k[1] + k[2]], axis=0)  # (2,3,Cin,Cout) row-even
        r1 = jnp.stack([k[0] + k[1], k[2]], axis=0)  # row-odd

        def foldc(kr):
            return (
                jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], axis=1),
                jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], axis=1),
            )

        k00, k01 = foldc(r0)
        k10, k11 = foldc(r1)
        x, k00, k01, k10, k11, b = nn.dtypes.promote_dtype(
            x, k00, k01, k10, k11, bias, dtype=self.dtype
        )

        def phase(kpq, p, q):
            return jax.lax.conv_general_dilated(
                x, kpq, (1, 1), ((1 - p, p), (1 - q, q)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        B, H, W, _ = x.shape
        Co = self.out_channels
        # Assembly A/B record (round 4, full 50-step bench, decode trace):
        # the trace shows ~2.5 ms/decode of passes around this interleave at
        # the 256^2 x 256 site (4-phase assembly 0.82 + interleave copy 0.82
        # + bias broadcast_add 0.83). BOTH restructures lost: (a) lane-axis
        # concat assembly (same buffer as the stack, free reshape, fusable)
        # — 4.925 vs 4.941 views/s, the concat consumer changed the phase
        # convs' output layouts and slowed the convs more than the saved
        # pass; (b) bias folded into each phase conv's epilogue with the
        # stack kept — 4.922, decode +2.5 ms. XLA's layout assignment around
        # the interleave is a local optimum; keep the round-3 form.
        t = jnp.stack(
            [phase(k00, 0, 0), phase(k01, 0, 1), phase(k10, 1, 0), phase(k11, 1, 1)],
            axis=3,
        )  # (B, H, W, [pq], Co)
        t = t.reshape(B, H, W, 2, 2, Co).transpose(0, 1, 3, 2, 4, 5)
        return t.reshape(B, 2 * H, 2 * W, Co) + b
