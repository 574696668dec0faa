"""Fused GroupNorm(+SiLU) as a Pallas TPU kernel.

Why: GroupNorm32 with NHWC activations and C/G = 10..40 channels per group
is the single worst-fused op family in the UNet tower. The group axis is a
*minor-dim stride* (channels c with c//(C/G) equal share a group), so XLA
lowers the fp32 statistics as strided converts + segmented reduces — the
profiled 256^2 flagship step spends ~5.2 ms (13%) in `convert_reduce_fusion`
GN-statistics ops alone, at ~75 GB/s effective bandwidth.

This kernel reads each (HW, C) batch-slice once: fp32 sum / sum-of-squares
over rows on the VPU, the group aggregation as one (C, G) 0/1 segment-matrix
matmul (the lane-dim group structure never needs a reshape or a strided
reduce), broadcast back through the transposed segment matrix, then
normalize + affine + optional SiLU in the same pass. One HBM read + one HBM
write per element — nothing else.

Reference semantics: GroupNorm32 computed in fp32 (external/sd1/ldm/modules/
diffusionmodules/util.py:218-220), variance as E[x^2] - E[x]^2 exactly like
flax.linen.GroupNorm so the XLA fallback and the kernel agree bitwise-ish
(<= fp32 rounding).

Gate: TPU only, full (HW, C) slice + fp32 temporaries must fit VMEM
(HW*C <= 2^20 elements covers every UNet level of the 256^2 flagship
and the 512^2 stretch shape at ds>=2; larger slices — e.g. VAE towers at
image resolution — fall back to the XLA path, which runs once per scene,
not once per step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_SLICE_ELEMS = 1 << 20
# row-tile element budget for the TILED path (big maps, e.g. the VAE decoder
# at 64^2..256^2): each (T, C) x-tile plus its fp32 temporaries must fit VMEM
# alongside the double-buffered next tile
_TILE_ELEMS = 1 << 19


def _pick_tile(N: int, C: int):
    """Largest row-tile T dividing N with T*C <= _TILE_ELEMS (halving from N
    covers the power-of-two map sizes these towers use)."""
    t = N
    while t * C > _TILE_ELEMS and t % 2 == 0:
        t //= 2
    return t if (t * C <= _TILE_ELEMS and t % 8 == 0) else None


def _gn_kernel(x_ref, g_ref, b_ref, o_ref, *, groups: int, eps: float, act: str):
    x = x_ref[0]  # (N, C)
    N, C = x.shape
    cg = C // groups
    f32 = jnp.float32
    xs = x.astype(f32)
    s1 = jnp.sum(xs, axis=0, keepdims=True)  # (1, C)
    s2 = jnp.sum(xs * xs, axis=0, keepdims=True)
    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0) // cg
        == jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    ).astype(f32)
    cnt = float(N * cg)
    mu = jnp.dot(s1, seg, preferred_element_type=f32) / cnt  # (1, G)
    ex2 = jnp.dot(s2, seg, preferred_element_type=f32) / cnt
    rstd = jax.lax.rsqrt(jnp.maximum(ex2 - mu * mu, 0.0) + eps)
    mu_c = jnp.dot(mu, seg.T, preferred_element_type=f32)  # (1, C)
    rstd_c = jnp.dot(rstd, seg.T, preferred_element_type=f32)
    y = (xs - mu_c) * (rstd_c * g_ref[...].astype(f32)) + b_ref[...].astype(f32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_stats_kernel(x_ref, o_ref):
    """Accumulate per-channel fp32 [sum; sum-of-squares] over row tiles."""
    xs = x_ref[0].astype(jnp.float32)  # (T, C)
    s1 = jnp.sum(xs, axis=0, keepdims=True)  # (1, C)
    s2 = jnp.sum(xs * xs, axis=0, keepdims=True)
    part = jnp.concatenate([s1, s2], axis=0)  # (2, C)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[0] = part

    @pl.when(pl.program_id(1) > 0)
    def _acc():
        o_ref[0] += part


def _gn_apply_kernel(x_ref, a_ref, b_ref, o_ref, *, act: str):
    """y = x*a + b with the affine pre-folded into per-(batch, channel) rows
    (a = rstd*scale, b = bias - mu*rstd*scale), optional SiLU."""
    xs = x_ref[0].astype(jnp.float32)  # (T, C)
    y = xs * a_ref[0] + b_ref[0]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_tiled_impl(x, scale, bias, groups, eps, act, tile, interpret):
    """Two-pass tiled GroupNorm for maps too big for one VMEM-resident slice
    (the VAE towers at 64^2..256^2: XLA lowers their lane-strided group
    statistics as strided converts + segmented reduces at a fraction of HBM
    bandwidth, and they run on every decode). Pass 1 accumulates per-channel
    fp32 sums over row tiles; the (B, G) moments + folded affine are computed
    as trivially small XLA ops; pass 2 applies normalize(+SiLU) per tile.
    HBM traffic: 2 reads + 1 write of x."""
    B, N, C = x.shape
    f32 = jnp.float32
    nt = N // tile
    stats = pl.pallas_call(
        _gn_stats_kernel,
        grid=(B, nt),
        in_specs=[pl.BlockSpec((1, tile, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), f32),
        cost_estimate=pl.CostEstimate(
            flops=3 * B * N * C,
            bytes_accessed=x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)
    cg = C // groups
    s1 = jnp.sum(stats[:, 0].reshape(B, groups, cg), axis=-1)  # (B, G)
    s2 = jnp.sum(stats[:, 1].reshape(B, groups, cg), axis=-1)
    cnt = float(N * cg)
    mu = s1 / cnt
    rstd = jax.lax.rsqrt(jnp.maximum(s2 / cnt - mu * mu, 0.0) + eps)
    mu_c = jnp.repeat(mu, cg, axis=-1)  # (B, C)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)
    a = rstd_c * scale.astype(f32)  # (B, C)
    b = bias.astype(f32) - mu_c * a
    return pl.pallas_call(
        functools.partial(_gn_apply_kernel, act=act),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=7 * B * N * C,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=B * N * C if act == "silu" else 0,
        ),
        interpret=interpret,
    )(x, a.reshape(B, 1, C), b.reshape(B, 1, C))


def _xla_gn(x, scale, bias, groups: int, eps: float, act: str):
    """The same math in plain XLA — differentiable twin for the custom VJP
    (and the CPU/oversize fallback semantics in nn/layers.GroupNorm32)."""
    B, N, C = x.shape
    xs = x.astype(jnp.float32).reshape(B, N, groups, C // groups)
    mu = jnp.mean(xs, axis=(1, 3), keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xs), axis=(1, 3), keepdims=True) - jnp.square(mu), 0.0
    )
    y = ((xs - mu) * jax.lax.rsqrt(var + eps)).reshape(B, N, C)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def group_norm_act(
    x: jnp.ndarray,  # (B, N, C)
    scale: jnp.ndarray,  # (C,)
    bias: jnp.ndarray,  # (C,)
    groups: int,
    eps: float,
    act: str = "none",
    interpret: bool = False,
) -> jnp.ndarray:
    return _gn_fwd_impl(x, scale, bias, groups, eps, act, interpret)


def _gn_fwd(x, scale, bias, groups, eps, act, interpret):
    return _gn_fwd_impl(x, scale, bias, groups, eps, act, interpret), (x, scale, bias)


def _gn_bwd(groups, eps, act, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: _xla_gn(x, s, b, groups, eps, act), x, scale, bias)
    return vjp(g)


group_norm_act.defvjp(_gn_fwd, _gn_bwd)


def _gn_fwd_impl(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    eps: float,
    act: str = "none",
    interpret: bool = False,
) -> jnp.ndarray:
    B, N, C = x.shape
    if N * C > _MAX_SLICE_ELEMS:
        tile = _pick_tile(N, C)
        if tile is None:  # direct caller outside the should_fuse_gn gate
            return _xla_gn(x, scale, bias, groups, eps, act)
        return _gn_tiled_impl(x, scale, bias, groups, eps, act, tile, interpret)
    kern = functools.partial(_gn_kernel, groups=groups, eps=eps, act=act)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * N * C,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=B * N * C if act == "silu" else 0,
        ),
        interpret=interpret,
    )(x, scale.reshape(1, C), bias.reshape(1, C))


def should_fuse_gn(shape, groups: int) -> bool:
    """Kernel applicability: TPU, group-divisible C, and the whole (HW, C)
    slice fits VMEM (single-kernel form — the UNet slices, a measured win).

    The tiled two-pass form for bigger maps (the VAE towers at 64^2..256^2)
    is a measured NET LOSS end-to-end and is gated OFF by default: the GN
    custom-calls pin flat descending layouts on the activation path, and XLA
    then lowers the neighboring 3x3 convs through a transposed input read
    (plus an explicit relayout copy on the output side). On v5e the full
    8-view 256^2 VAE decode measures 40.9 ms all-XLA vs 46.9 ms with the
    tiled GN kernels — the standalone GN win (~2x on the statistics) is
    smaller than the ~2.5x conv slowdown it induces at Cin=128/256^2
    (tools/conv_microbench.py standalone convs: 216-259 TFLOP/s vs 35-45%
    of that in-graph next to the custom-calls). MVDF_GN_TILED=1 re-enables
    it for A/B. MVDF_DISABLE_PALLAS=1 forces the XLA path everywhere."""
    import os

    if jax.default_backend() != "tpu" or os.environ.get("MVDF_DISABLE_PALLAS"):
        return False
    n = 1
    for d in shape[1:-1]:
        n *= d
    C = shape[-1]
    if C % groups:
        return False
    if n * C <= _MAX_SLICE_ELEMS:
        return True
    return bool(os.environ.get("MVDF_GN_TILED")) and _pick_tile(n, C) is not None
