"""Fused GroupNorm+SiLU -> 3x3 conv (stride 1, SAME) as a Pallas TPU kernel.

STATUS: measured NET LOSS on v5e — gated OFF by default (`MVDF_CONV3X3=1`
re-enables). The motivating diagnosis (VAE-tower convs at ~35-45% of their
standalone rate next to GN custom-calls) described the graph with the TILED
GroupNorm kernel's custom-calls pinning layouts; once that kernel was gated
off, the plain XLA GroupNorm+SiLU+conv chain reaches 132-176 TFLOP/s at
every decoder shape, and this kernel reaches only 71-138 (weighted decode
total 36.0 ms XLA vs 53.3 ms fused — `tools/conv3x3_tune.py`, sequential
-scan protocol). The nine shifted-matmul taps re-read the halo'd VMEM tile
9x through the MXU's LHS port at K=Cin per tap, where XLA's conv emitter
gets K=9*Cin im2col-style reuse. Kept (parity- and grad-tested) as the
working halo-DMA pattern: row-tile grid over a flat (tokens, C) map with a
one-row manual-DMA halo, on-chip folded-GN affine + SiLU prologue, static
x-edge tap masks — with optional per-(batch, channel) row add (the UNet
ResBlock's time-embedding) and optional residual-tile add (the skip join).

GroupNorm statistics are a separate tiny pass (one fp32 read of x,
`gn_fold_affine`, reusing ops/groupnorm's stats kernel), because the conv
needs the WHOLE image's moments before its first output token; the affine
fold (a = rstd*scale, b = bias - mu*a) turns normalize+scale+shift into one
fused multiply-add inside the conv kernel.

Round-3 addendum: also measured at the UNet up-path ResBlock shapes
(B=16 CFG batch, 32^2/16^2 maps, the step_trace's worst conv outliers) via
`tools/conv3x3_tune.py --unet`: weighted 0.96x vs the XLA chain (win only
at (16,16,16,640,640): 1.40x; loss at (16,16,1280,640): 0.73x) — and the
XLA chain runs at 160-280 TFLOP/s STANDALONE at these shapes, i.e. the
in-graph "emitter excess" seen by step_trace is layout context around the
conv, not the conv op itself, so no conv kernel can recover it. Also: the
channel-dim VMEM slicing requires Cin % 128 == 0, which excludes the
960- and 320-Cin up-path convs outright (Mosaic tiling-alignment error).

Semantics fused (reference): VAE ResnetBlock model.py:82-143 (GroupNorm32
eps 1e-6 + swish + conv) and the OpenAI-UNet ResBlock
openaimodel.py:163-276 (GroupNorm32 eps 1e-5 + SiLU + conv, + temb row).

Layout: tokens (H*W rows) in sublanes, channels in lanes — the natural
flat descending layout, so no relayouts at the kernel boundary. Row shifts
of +-1 (dx) and +-W (dy) address the halo'd scratch at STATIC offsets; the
x-edge taps are masked by a static iota-%W pattern (tile height is a whole
number of image rows); image top/bottom zero-padding is a dynamic row mask
applied AFTER the SiLU (zero-padding applies to the conv INPUT silu(gn(x)),
and silu(b) != 0 — padding x itself would be wrong).

Backward: custom VJP through the plain-XLA twin (the decode runs once per
scene; training gradients take the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def gn_fold_affine(x_flat, scale, bias, groups: int, eps: float, interpret: bool = False):
    """Per-(batch, channel) folded GroupNorm affine from one fp32 stats pass:
    returns (a, b) with normalize(x)*scale+bias == x*a + b. x_flat: (B, N, C).
    """
    from mvdfusion_tpu.ops.groupnorm import _gn_stats_kernel, _pick_tile

    B, N, C = x_flat.shape
    f32 = jnp.float32
    tile = _pick_tile(N, C) or N
    stats = pl.pallas_call(
        _gn_stats_kernel,
        grid=(B, N // tile),
        in_specs=[pl.BlockSpec((1, tile, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), f32),
        cost_estimate=pl.CostEstimate(
            flops=3 * B * N * C,
            bytes_accessed=x_flat.size * x_flat.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_flat)
    cg = C // groups
    s1 = jnp.sum(stats[:, 0].reshape(B, groups, cg), axis=-1)
    s2 = jnp.sum(stats[:, 1].reshape(B, groups, cg), axis=-1)
    cnt = float(N * cg)
    mu = s1 / cnt
    rstd = jax.lax.rsqrt(s2 / cnt - mu * mu + eps)
    a = jnp.repeat(rstd, cg, axis=-1) * scale.astype(f32)  # (B, C)
    b = bias.astype(f32) - jnp.repeat(mu, cg, axis=-1) * a
    return a, b


def _conv_kernel(
    a_ref,  # (1, 1, Cin) folded GN scale (or ones)
    b_ref,  # (1, 1, Cin) folded GN shift (or zeros)
    w_ref,  # (9*Cin, Cout) taps stacked [dy,dx]-major
    bias_ref,  # (1, Cout)
    row_ref,  # (1, 1, Cout) per-batch output row add (temb), or zeros
    x_any,  # (B, HW, Cin) in ANY/HBM — manually DMA'd with halo
    res_ref,  # (1, T, Cout) residual tile or a (1, 1, Cout) dummy
    o_ref,  # (1, T, Cout)
    xs_scr,  # (T + 2*Hl, Cin) halo'd input scratch
    sem,
    *,
    W: int,
    T: int,
    Hl: int,
    HW: int,
    nt: int,
    act: str,
    use_res: bool,
):
    f32 = jnp.float32
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    dt = xs_scr.dtype

    # ---- halo DMA: rows [t*T - Hl, t*T + T + Hl) of the UNPADDED map; edge
    # tiles zero the out-of-image halo and fetch only the valid span --------
    if nt == 1:
        xs_scr[0:Hl, :] = jnp.zeros((Hl, xs_scr.shape[1]), dt)
        xs_scr[Hl + HW :, :] = jnp.zeros((Hl, xs_scr.shape[1]), dt)
        cp = pltpu.make_async_copy(
            x_any.at[bidx, pl.ds(0, HW), :], xs_scr.at[pl.ds(Hl, HW), :], sem
        )
        cp.start()
        cp.wait()
    else:

        @pl.when(t == 0)
        def _first():
            xs_scr[0:Hl, :] = jnp.zeros((Hl, xs_scr.shape[1]), dt)
            cp = pltpu.make_async_copy(
                x_any.at[bidx, pl.ds(0, T + Hl), :], xs_scr.at[pl.ds(Hl, T + Hl), :], sem
            )
            cp.start()
            cp.wait()

        @pl.when(t == nt - 1)
        def _last():
            xs_scr[T + Hl :, :] = jnp.zeros((Hl, xs_scr.shape[1]), dt)
            cp = pltpu.make_async_copy(
                x_any.at[bidx, pl.ds(HW - T - Hl, T + Hl), :],
                xs_scr.at[pl.ds(0, T + Hl), :],
                sem,
            )
            cp.start()
            cp.wait()

        @pl.when((t > 0) & (t < nt - 1))
        def _interior():
            # T and Hl are both multiples of 8 (W % 8 == 0, Hl = W + 8), so
            # the dynamic row offset is 8-aligned — assert it for Mosaic,
            # whose divisibility analysis can't prove it through the subtract.
            off = pl.multiple_of(t * T - Hl, 8)
            cp = pltpu.make_async_copy(
                x_any.at[bidx, pl.ds(off, T + 2 * Hl), :], xs_scr, sem
            )
            cp.start()
            cp.wait()

    # ---- folded GN affine + SiLU on the halo'd tile ------------------------
    s = xs_scr[...].astype(f32) * a_ref[0].astype(f32) + b_ref[0].astype(f32)
    if act == "silu":
        s = s * jax.nn.sigmoid(s)
    # SAME zero-padding applies to the conv INPUT silu(x*a+b), and
    # silu(b) != 0 — re-zero the out-of-image halo rows after the prologue.
    # Scratch row i holds x token (t*T - Hl + i); valid iff in [0, HW).
    tok = (
        jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0)
        + t * T - Hl
    )
    s = jnp.where((tok >= 0) & (tok < HW), s, 0.0).astype(dt)

    # ---- nine shifted-matmul taps -----------------------------------------
    Cin = xs_scr.shape[1]
    colm = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) % W  # static (T % W == 0)
    acc = jnp.broadcast_to(
        bias_ref[...].astype(f32) + row_ref[0].astype(f32), (T, o_ref.shape[2])
    )
    for k, (dy, dx) in enumerate(_TAPS):
        base = Hl + dy * W + dx
        sl = jax.lax.slice_in_dim(s, base, base + T, axis=0)
        # SAME zero-padding in x: drop the wrapped column
        if dx == -1:
            sl = jnp.where(colm != 0, sl, 0)
        elif dx == 1:
            sl = jnp.where(colm != W - 1, sl, 0)
        acc = acc + jnp.dot(
            sl, w_ref[k * Cin : (k + 1) * Cin, :], preferred_element_type=f32
        )
    if use_res:
        acc = acc + res_ref[0].astype(f32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _xla_twin(x, a, b, w, bias, row, res, act: str):
    """Same math in plain XLA: conv3x3(silu(x*a+b)) + bias + row [+ res]."""
    f32 = jnp.float32
    s = x.astype(f32) * a[:, None, None, :] + b[:, None, None, :]
    if act == "silu":
        s = s * jax.nn.sigmoid(s)
    y = jax.lax.conv_general_dilated(
        s.astype(x.dtype), w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=f32,
    )
    y = y + bias.astype(f32) + row[:, None, None, :].astype(f32)
    if res is not None:
        y = y + res.astype(f32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def gn_silu_conv3x3(
    x: jnp.ndarray,  # (B, H, W, Cin)
    a: jnp.ndarray,  # (B, Cin) folded GN scale (ones = no norm)
    b: jnp.ndarray,  # (B, Cin) folded GN shift (zeros = no norm)
    w: jnp.ndarray,  # (3, 3, Cin, Cout)
    bias: jnp.ndarray,  # (Cout,)
    row: jnp.ndarray,  # (B, Cout) per-batch output add (temb; zeros = none)
    res,  # None | (B, H, W, Cout) residual added to the output
    act: str = "silu",
    interpret: bool = False,
) -> jnp.ndarray:
    return _fwd_impl(x, a, b, w, bias, row, res, act, interpret)


def _fwd_impl(x, a, b, w, bias, row, res, act, interpret):
    B, H, W_, Cin = x.shape
    Cout = w.shape[-1]
    dt = x.dtype
    HW = H * W_
    # whole image rows per tile, ~4096 tokens per step
    tr = max(1, min(H, 4096 // W_))
    while H % tr:
        tr -= 1
    T = tr * W_
    nt = HW // T
    Hl = W_ + 8  # one halo row + one token each side, sublane-aligned
    if T < Hl and nt > 1:  # degenerate tiny maps: one tile
        T, nt = HW, 1

    use_res = res is not None
    res_in = (
        jnp.reshape(res, (B, HW, Cout))
        if use_res
        else jnp.zeros((B, 1, Cout), dt)
    )
    kern = functools.partial(
        _conv_kernel, W=W_, T=T, Hl=Hl, HW=HW, nt=nt, act=act, use_res=use_res
    )
    vm = lambda shape, im: pl.BlockSpec(shape, im, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B, nt),
        in_specs=[
            vm((1, 1, Cin), lambda bi, t: (bi, 0, 0)),
            vm((1, 1, Cin), lambda bi, t: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w9 resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            vm((1, 1, Cout), lambda bi, t: (bi, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # x, manually DMA'd
            (
                vm((1, T, Cout), lambda bi, t: (bi, t, 0))
                if use_res
                else vm((1, 1, Cout), lambda bi, t: (bi, 0, 0))
            ),
        ],
        out_specs=vm((1, T, Cout), lambda bi, t: (bi, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HW, Cout), dt),
        scratch_shapes=[
            pltpu.VMEM((T + 2 * Hl, Cin), dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * HW * 9 * Cin * Cout,
            bytes_accessed=(x.size + B * HW * Cout) * jnp.dtype(dt).itemsize,
            transcendentals=B * HW * Cin if act == "silu" else 0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * (1 << 20)),
        interpret=interpret,
    )(
        a.reshape(B, 1, Cin).astype(jnp.float32),
        b.reshape(B, 1, Cin).astype(jnp.float32),
        w.astype(dt).reshape(9 * Cin, Cout),  # tap-major [dy, dx] = _TAPS order
        bias.reshape(1, Cout).astype(jnp.float32),
        row.reshape(B, 1, Cout).astype(jnp.float32),
        x.reshape(B, HW, Cin),
        res_in,
    )
    return out.reshape(B, H, W_, Cout)


def _fwd(x, a, b, w, bias, row, res, act, interpret):
    return _fwd_impl(x, a, b, w, bias, row, res, act, interpret), (
        x, a, b, w, bias, row, res,
    )


def _bwd(act, interpret, resids, g):
    x, a, b, w, bias, row, res = resids
    if res is None:
        _, vjp = jax.vjp(
            lambda x, a, b, w, bias, row: _xla_twin(x, a, b, w, bias, row, None, act),
            x, a, b, w, bias, row,
        )
        return vjp(g) + (None,)
    _, vjp = jax.vjp(
        lambda x, a, b, w, bias, row, res: _xla_twin(x, a, b, w, bias, row, res, act),
        x, a, b, w, bias, row, res,
    )
    return vjp(g)


gn_silu_conv3x3.defvjp(_fwd, _bwd)


def should_fuse_conv3x3(shape, groups: int = 32) -> bool:
    """OFF by default: measured net loss vs the plain XLA chain at every
    VAE decoder shape (module docstring; tools/conv3x3_tune.py). Set
    MVDF_CONV3X3=1 to A/B it; MVDF_DISABLE_PALLAS=1 forces XLA anyway."""
    import os

    if not os.environ.get("MVDF_CONV3X3"):
        return False
    if jax.default_backend() != "tpu" or os.environ.get("MVDF_DISABLE_PALLAS"):
        return False
    B, H, W, C = shape
    if C % 128 or C % groups or W % 8:
        return False
    # the halo/tiling layout needs at least a couple of rows per tile
    return H * W >= 4096 and H >= 2
