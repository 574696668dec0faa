"""Fused UNet transformer block as a single Pallas TPU kernel.

Covers the whole SpatialTransformer / ViewAlignedFeatureTransformer interior
between the GroupNorm and the residual join (reference
external/sd1/ldm/modules/attention.py:195-287 and mvdfusion/attention.py:16-145):

    proj_in -> [LN1 -> multi-head self-attn -> +res
                -> (attn2 contribution, precomputed) -> +res
                -> LN3 -> GEGLU FF -> +res] -> proj_out -> + x_in

Why: the profiled flagship step (tools/step_trace.py) spends ~14 ms of a
44 ms denoising step in the 8 transformer sites at 32^2 — not in their
matmul FLOPs (~0.6 ms/site of MXU work) but in XLA's lowering: the token
matmuls around the Pallas attention custom-call get batch-in-lanes conv
emitters running 5-20x below the plain-GEMM path, plus layout copies and a
dozen HBM round-trips per site (flattening the dots to 2-D does not change
the emitter choice — measured). This kernel keeps the entire block interior
in VMEM: x is read once and written once per site.

Layout strategy (the part that makes Mosaic happy on v5e):
  * Everything is computed TRANSPOSED — channels along sublanes, tokens
    along lanes. A (C, N) tile with C=320, N=1024.
  * Head slicing of the fused qkv is then a SUBLANE slice at dh=40 rows —
    a multiple of the fp32/bf16 sublane tile (8), i.e. free; a lane slice
    at 40 would relayout. dh stays native (no 128-padding).
  * QK^T contracts over the sublane dim ((dh,N)x(dh,N) -> (N,N)), PV over
    the lane dim ((dh,N)x(N,N) -> (dh,N)) — both plain MXU forms.
  * LayerNorm statistics are sublane reductions; weights arrive
    pre-transposed (out, in) so every projection is dot(W_T, h_T).
  * GEGLU's (2*inner, N) intermediate never materializes: the FF runs in
    token chunks of 256 lanes.

The attn2 (context cross-attention) term is an INPUT, not in-kernel work:
with a 1-token context (always, here — CLIP+pose is one token) or the D=1
per-pixel frustum, softmax over one key is exactly 1, so its output
`to_out(to_v(ctx))` is independent of x and precomputed by the caller as a
per-batch row (spatial sites) or per-token map (view-aligned sites).

Backward: custom VJP that rematerializes the plain-XLA twin (training steps
are not bound by these sites the way the 50-step sampler is).

Gate (should_fuse_block): TPU, C <= 768, N <= 1024 — the 32^2 sites run as
ONE kernel (C=320: ~3.6 MB of weights resident); the 16^2 sites (C=640,
~14.7 MB of weights) split into an attention kernel + an FF kernel so each
half's weights fit VMEM, with h2 round-tripping HBM once. The 8^2/4^2
C=1280 sites (attention weights alone ~16 MB) and the 512^2 stretch shape
(N=4096 logits) stay on the XLA path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvdfusion_tpu.ops.crossview import _gelu

_LN_EPS = 1e-5
_FF_CHUNK = 256
# softmax strategy (A/B'd on-chip with tools/block_tune.py):
#   v1:   scale -> max-shift -> exp -> divide -> cast -> PV
#   v2:   max-shift and scale fused into the exp chain, normalization applied
#         AFTER PV to the (dh, N) output instead of the (N, N) probability
#         tile — removes an N^2 fp32 divide per head, exact same math.
#   exp2: v2 with exp(x) written as exp2(x * log2 e) — if Mosaic lowers exp
#         as exp2 + a separate multiply pass, this folds the multiply into
#         the existing shift/scale pass (one fewer VPU sweep over N^2 fp32).
#   bf16: v2 with the exp argument cast to bf16 first — the transcendental
#         runs on half-width vectors (2x lanes/pass IF the VPU keeps bf16
#         packed through exp). Worst-case prob error ~|logit-max|*2^-9
#         relative, i.e. exact near the max and ~1% on e^-10-class weights;
#         p was already cast to bf16 for the PV matmul in every variant.
# v1 vs v2 measured on v5e (2 runs x 50 chained iters): no reliable
# difference — site time swings +-25% run-to-run and v2's sign flips with
# it. bf16 measured on the FULL 50-step bench (the only stable timing on
# this box): 4.795 vs 4.78 views/s — a wash; the softmax exp chain is NOT
# the sites' bottleneck at these shapes (it pipelines behind the MXU
# projections). v1 stays the default.
import os as _os

_SOFTMAX_MODE = _os.environ.get("MVDF_BLOCK_SOFTMAX", "v1")
# batch tiling: process NB batch elements per grid step — the projections
# (proj_in/qkv/out/GEGLU/FF/proj_out) then run at NB*N lanes (fewer, larger
# MXU ops) and the grid has B/NB steps (fewer pipeline bubbles); attention
# and GroupNorm stay exactly per-batch via lane-slice loops / segment
# matmuls. NB=1 is the round-1 kernel unchanged. VMEM grows ~NB x on the
# activation tiles: NB=2 at the 32^2 site is ~15 MB — at the scoped limit;
# gate NB>2 behind measurement.
_BATCH_TILE = int(_os.environ.get("MVDF_BLOCK_NB", "1"))
_BATCH_TILE_SET = "MVDF_BLOCK_NB" in _os.environ
# single-kernel weight-residency budget; above it the site splits into an
# attention kernel + an FF kernel. Default 0 = ALWAYS split: benched on v5e
# (full 50-step flagship run, the only stable timing on this box), the
# split form is ~1 ms/step faster even at 32^2 where the single kernel's
# weights fit VMEM — the smaller kernels' lower VMEM/register pressure
# beats saving the h2 HBM round-trip (~26 us of bandwidth at 32^2):
# 4.505 vs 4.386 views/s. MVDF_BLOCK_SINGLE=1 restores the old gate for
# A/B; tests monkeypatch the budget to exercise both forms.
_SINGLE_KERNEL_WEIGHT_BYTES = (
    8 * 1024 * 1024 if _os.environ.get("MVDF_BLOCK_SINGLE") else 0
)
# channel width above which the big-C form is used (3 kernels + streamed FF;
# the C=1280 8^2/4^2 sites). Tests monkeypatch this down to exercise the big
# form at CPU-friendly widths.
_BIG_C_MIN = 768


class BlockWeights(NamedTuple):
    """All weights transposed to (out_features, in_features)."""

    gn_g: jnp.ndarray  # (C,) site GroupNorm scale (fp32)
    gn_b: jnp.ndarray  # (C,)
    pi_k: jnp.ndarray  # (C, C)   proj_in
    pi_b: jnp.ndarray  # (C,)
    ln1_g: jnp.ndarray  # (C,) fp32
    ln1_b: jnp.ndarray  # (C,)
    qkv_k: jnp.ndarray  # (3C, C) rows [Wq^T; Wk^T; Wv^T] (no bias in LDM attn)
    out_k: jnp.ndarray  # (C, C)   attn to_out
    out_b: jnp.ndarray  # (C,)
    ln3_g: jnp.ndarray  # (C,)
    ln3_b: jnp.ndarray  # (C,)
    g_k: jnp.ndarray  # (2*inner, C) GEGLU proj
    g_b: jnp.ndarray  # (2*inner,)
    f_k: jnp.ndarray  # (C, inner)   FF out
    f_b: jnp.ndarray  # (C,)
    po_k: jnp.ndarray  # (C, C)   proj_out
    po_b: jnp.ndarray  # (C,)


def _ln_t(h, g_ref, b_ref):
    """LayerNorm over channels of a transposed (C, N) tile, fp32 stats."""
    f32 = jnp.float32
    hf = h.astype(f32)
    mu = jnp.mean(hf, axis=0, keepdims=True)  # (1, N)
    # clamped: f32 cancellation can push E[x^2]-mu^2 slightly negative at
    # large activations -> rsqrt(neg) NaN (see layers.GroupNorm32)
    var = jnp.maximum(jnp.mean(hf * hf, axis=0, keepdims=True) - mu * mu, 0.0)
    y = (hf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    return (y * g_ref[...].astype(f32) + b_ref[...].astype(f32)).astype(h.dtype)


_GN_GROUPS = 32
_GN_EPS = 1e-6  # the SpatialTransformer/ViewAligned site GN (attention.py:254)


def _segN(N: int, nb: int):
    """(N, nb) 0/1 lane-segment matrix: column b marks batch b's lane block."""
    npr = N // nb
    return (
        jax.lax.broadcasted_iota(jnp.int32, (N, nb), 0) // npr
        == jax.lax.broadcasted_iota(jnp.int32, (N, nb), 1)
    ).astype(jnp.float32)


def _gn_t(x, g_ref, b_ref, nb: int = 1):
    """GroupNorm(32) of a transposed (C, N) batch tile, fp32 stats — same
    E[x^2]-E[x]^2 semantics as ops/groupnorm.py / nn.layers.GroupNorm32.
    Group aggregation over the contiguous C/G sublane bands via a 0/1
    segment matmul (no sublane-splitting reshapes). With nb > 1 the lane
    axis packs nb batch elements (nb contiguous blocks of N/nb tokens) and
    the statistics are kept per sub-batch via a second lane-segment matmul."""
    f32 = jnp.float32
    C, N = x.shape
    cg = C // _GN_GROUPS
    xf = x.astype(f32)
    segG = (
        jax.lax.broadcasted_iota(jnp.int32, (_GN_GROUPS, C), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (_GN_GROUPS, C), 1) // cg
    ).astype(f32)
    if nb == 1:
        s1 = jnp.sum(xf, axis=1, keepdims=True)  # (C, 1)
        s2 = jnp.sum(xf * xf, axis=1, keepdims=True)
        cnt = float(cg * N)
        mu = jnp.dot(segG, s1, preferred_element_type=f32) / cnt  # (G, 1)
        ex2 = jnp.dot(segG, s2, preferred_element_type=f32) / cnt
        rstd = jax.lax.rsqrt(jnp.maximum(ex2 - mu * mu, 0.0) + _GN_EPS)
        mu_c = jnp.dot(segG.T, mu, preferred_element_type=f32)  # (C, 1)
        rstd_c = jnp.dot(segG.T, rstd, preferred_element_type=f32)
    else:
        npr = N // nb
        segN = _segN(N, nb)  # (N, nb)
        s1 = jnp.dot(xf, segN, preferred_element_type=f32)  # (C, nb)
        s2 = jnp.dot(xf * xf, segN, preferred_element_type=f32)
        cnt = float(cg * npr)
        mu = jnp.dot(segG, s1, preferred_element_type=f32) / cnt  # (G, nb)
        ex2 = jnp.dot(segG, s2, preferred_element_type=f32) / cnt
        rstd = jax.lax.rsqrt(jnp.maximum(ex2 - mu * mu, 0.0) + _GN_EPS)
        # expand back: channels via segG^T, then lanes via segN^T
        mu_c = jnp.dot(
            jnp.dot(segG.T, mu, preferred_element_type=f32), segN.T,
            preferred_element_type=f32,
        )  # (C, N)
        rstd_c = jnp.dot(
            jnp.dot(segG.T, rstd, preferred_element_type=f32), segN.T,
            preferred_element_type=f32,
        )
    y = (xf - mu_c) * (rstd_c * g_ref[...].astype(f32)) + b_ref[...].astype(f32)
    return y.astype(x.dtype)


def _mm(w_ref, h, b_ref=None, dt=None):
    y = jax.lax.dot(w_ref[...], h, preferred_element_type=jnp.float32)
    if b_ref is not None:
        y = y + b_ref[...].astype(jnp.float32)
    return y.astype(dt if dt is not None else h.dtype)


def _attn_part(x_in, a2, gn_g_ref, gn_b_ref, pi_k_ref, pi_b_ref, ln1_g_ref,
               ln1_b_ref, qkv_k_ref, out_k_ref, out_b_ref, heads: int,
               nb: int = 1):
    """site GroupNorm -> proj_in -> LN1 -> self-attn -> +res -> +attn2.

    With nb > 1 the lane axis packs nb batch elements; GN statistics and the
    self-attention key set stay per sub-batch (lane-slice loop), while every
    projection runs once over the full nb*N lanes."""
    f32 = jnp.float32
    C, N = x_in.shape
    npr = N // nb
    dh = C // heads
    dt = x_in.dtype

    xg = _gn_t(x_in, gn_g_ref, gn_b_ref, nb)
    # proj_in (attention.py:253-257, 1x1 conv == per-token dense)
    h0 = _mm(pi_k_ref, xg, pi_b_ref)  # (C, N)
    ln1 = _ln_t(h0, ln1_g_ref, ln1_b_ref)
    qkv = _mm(qkv_k_ref, ln1)  # (3C, N)
    scale = dh ** -0.5
    rows = []
    for h, b in ((h, b) for h in range(heads) for b in range(nb)):
        sl = slice(b * npr, (b + 1) * npr)  # lane slices (npr % 128 == 0)
        qT = qkv[h * dh : (h + 1) * dh, sl]  # sublane slices (dh % 8 == 0)
        kT = qkv[C + h * dh : C + (h + 1) * dh, sl]
        vT = qkv[2 * C + h * dh : 2 * C + (h + 1) * dh, sl]
        logits = jax.lax.dot_general(
            qT, kT, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )  # (Nq, Nk) fp32, unscaled
        m = jnp.max(logits, axis=1, keepdims=True)
        if _SOFTMAX_MODE != "v1":
            # softmax(l*s) == exp((l - max(l)) * s) / sum(...): the shift and
            # temperature ride one fused VPU pass; normalization is applied
            # AFTER PV to the (dh, N) output (identical math, N x fewer
            # divides). The denominator comes from a ones-row MXU dot so it
            # lands in lanes (q-indexed) without a sublane->lane relayout.
            if _SOFTMAX_MODE == "exp2":
                p = jnp.exp2((logits - m) * (scale * 1.4426950408889634)).astype(dt)
            elif _SOFTMAX_MODE == "bf16":
                p = jnp.exp(((logits - m) * scale).astype(jnp.bfloat16)).astype(dt)
            else:  # v2
                p = jnp.exp((logits - m) * scale).astype(dt)
            s = jax.lax.dot_general(
                jnp.ones((1, p.shape[1]), dt), p, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )  # (1, Nq) fp32
            pv = jax.lax.dot_general(
                vT, p, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )  # (dh, Nq) fp32
            rows.append((pv * jax.lax.reciprocal(s)).astype(dt))
        else:
            p = jnp.exp((logits - m) * scale)
            p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(dt)
            rows.append(
                jax.lax.dot_general(
                    vT, p, (((1,), (1,)), ((), ())), preferred_element_type=f32
                ).astype(dt)
            )  # (dh, Nq)
    if nb > 1:  # reassemble (head-major rows, sub-batch-major lanes)
        rows = [jnp.concatenate(rows[h * nb : (h + 1) * nb], axis=1) for h in range(heads)]
    attn = jnp.concatenate(rows, axis=0)  # (C, N)
    h1 = h0 + _mm(out_k_ref, attn, out_b_ref)
    # attn2: precomputed contribution (see module docstring). On the packed
    # path a per-batch a2 row arrives as (C, nb) columns and is expanded to
    # lanes via the segment matrix (vs materializing (B, C, N) in HBM).
    if nb > 1 and a2.shape[-1] == nb:
        a2 = jnp.dot(
            a2.astype(f32), _segN(N, nb).T, preferred_element_type=f32
        )  # (C, N)
    return h1 + jnp.broadcast_to(a2.astype(dt), (C, N))


def _ff_part(h2, xin_ref, ln3_g_ref, ln3_b_ref, g_k_ref, g_b_ref,
             f_k_ref, f_b_ref, po_k_ref, po_b_ref, o_ref, chunk: int = _FF_CHUNK):
    """LN3 -> GEGLU FF -> +res -> proj_out -> + x_in, tiled over tokens."""
    C, N = h2.shape
    inner = f_k_ref.shape[1]
    for c0 in range(0, N, chunk):
        sl = slice(c0, c0 + chunk)
        l3 = _ln_t(h2[:, sl], ln3_g_ref, ln3_b_ref)
        g = _mm(g_k_ref, l3, g_b_ref)  # (2*inner, TN)
        y = g[:inner] * _gelu(g[inner:])
        h3 = h2[:, sl] + _mm(f_k_ref, y, f_b_ref)
        o_ref[0, :, sl] = xin_ref[0][:, sl] + _mm(po_k_ref, h3, po_b_ref)


def _block_kernel(
    xin_ref, a2_ref,
    gn_g_ref, gn_b_ref,
    pi_k_ref, pi_b_ref, ln1_g_ref, ln1_b_ref, qkv_k_ref, out_k_ref, out_b_ref,
    ln3_g_ref, ln3_b_ref, g_k_ref, g_b_ref, f_k_ref, f_b_ref, po_k_ref, po_b_ref,
    o_ref, *, heads: int, nb: int = 1,
):
    h2 = _attn_part(
        xin_ref[0], a2_ref[0], gn_g_ref, gn_b_ref, pi_k_ref, pi_b_ref,
        ln1_g_ref, ln1_b_ref, qkv_k_ref, out_k_ref, out_b_ref, heads, nb,
    )
    _ff_part(
        h2, xin_ref, ln3_g_ref, ln3_b_ref, g_k_ref, g_b_ref,
        f_k_ref, f_b_ref, po_k_ref, po_b_ref, o_ref,
    )


def _attn_kernel(
    xin_ref, a2_ref,
    gn_g_ref, gn_b_ref,
    pi_k_ref, pi_b_ref, ln1_g_ref, ln1_b_ref, qkv_k_ref, out_k_ref, out_b_ref,
    o_ref, *, heads: int, nb: int = 1,
):
    o_ref[0] = _attn_part(
        xin_ref[0], a2_ref[0], gn_g_ref, gn_b_ref, pi_k_ref, pi_b_ref,
        ln1_g_ref, ln1_b_ref, qkv_k_ref, out_k_ref, out_b_ref, heads, nb,
    )


def _ff_kernel(
    h2_ref, xin_ref,
    ln3_g_ref, ln3_b_ref, g_k_ref, g_b_ref, f_k_ref, f_b_ref, po_k_ref, po_b_ref,
    o_ref, *, chunk: int,
):
    _ff_part(
        h2_ref[0], xin_ref, ln3_g_ref, ln3_b_ref, g_k_ref, g_b_ref,
        f_k_ref, f_b_ref, po_k_ref, po_b_ref, o_ref, chunk=chunk,
    )


def _pi_kernel(
    xin_ref, gn_g_ref, gn_b_ref, pi_k_ref, pi_b_ref, ln1_g_ref, ln1_b_ref,
    h0_ref, ln1_ref, *, nb: int,
):
    """Big-C form, kernel 1/3: site GroupNorm -> proj_in -> LN1.

    Split out of the attention kernel so neither kernel's resident weights
    exceed VMEM at C=1280 (pi+qkv+out together are 5C^2 = 16.4 MB bf16)."""
    h0 = _mm(pi_k_ref, _gn_t(xin_ref[0], gn_g_ref, gn_b_ref, nb), pi_b_ref)
    h0_ref[0] = h0
    ln1_ref[0] = _ln_t(h0, ln1_g_ref, ln1_b_ref)


def _pick_big_nb(B: int, N: int, interpret: bool):
    """Lane packing for the big-C form: pack nb batch elements along lanes,
    as MANY as fit a 512-lane working set — the big-C kernels' cost is
    dominated by streaming the site's ~52 MB of weights, so the grid must
    have as FEW batch groups as possible (B//nb weight refetches). The
    round-2 form packed only to 128 lanes (nb = 128//N), re-streaming the
    weights ~8x per site — measured SLOWER than XLA (2.10 vs 1.36 ms at
    8^2); at nb=8 (512 lanes, 2 refetches) the same kernels win.
    Returns nb, or None when the packed lanes can't hit the 128-lane tile
    (hardware requires (nb*N) % 128 == 0; interpret mode exercises the
    packing math at any width)."""
    nb = max(1, min(B, 512 // max(N, 1)))
    while nb > 1 and B % nb:
        nb -= 1
    if not interpret and (nb * N) % 128:
        return None
    return nb


def _bigattn_stream_kernel(ln1_ref, qkv_k_ref, attn_ref, *, nb: int):
    """Big-C form, kernel 2/4: ONE head per grid step — qkv weight rows
    arrive head-major so Mosaic streams the next head's (3dh, C) tile
    HBM->VMEM behind this head's compute, and the full (3C, C) qkv weights
    never need to be VMEM-resident (16 MB more working set at C=1280).

    nb batch elements are packed along lanes. Unlike the small-C split form
    (per-sub-batch LANE SLICES, which need 128-aligned offsets), the
    per-sub-batch key set is enforced with a block-diagonal mask on the full
    (N, N) logits: cross-batch positions get -1e30 and fall out of the
    softmax exactly (exp -> 0). The masked full-width logits waste MXU work
    (only the diagonal blocks are useful) but the attention FLOPs are tiny
    at these token counts — the weight traffic is what matters."""
    f32 = jnp.float32
    ln1 = ln1_ref[0]  # (C, N)
    C, N = ln1.shape
    wt = qkv_k_ref[0]  # (3dh, C) this head's [Wq^T; Wk^T; Wv^T] rows
    dh = wt.shape[0] // 3
    dt = ln1.dtype
    qT = _mm(wt[0:dh], ln1)  # (dh, N)
    kT = _mm(wt[dh : 2 * dh], ln1)
    vT = _mm(wt[2 * dh :], ln1)
    scale = dh ** -0.5
    logits = jax.lax.dot_general(
        qT, kT, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # (Nq, Nk)
    if nb > 1:
        npr = N // nb
        logits = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) // npr
            == jax.lax.broadcasted_iota(jnp.int32, (N, N), 1) // npr,
            logits,
            -1e30,
        )
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp((logits - m) * scale)
    p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(dt)
    attn_ref[0] = jax.lax.dot_general(
        vT, p, (((1,), (1,)), ((), ())), preferred_element_type=f32
    ).astype(dt)


def _h2_kernel(attn_ref, h0_ref, a2_ref, out_k_ref, out_b_ref, o_ref, *, nb: int):
    """Big-C form, kernel 3/4: attn out-projection -> +res -> +attn2.
    Separate from the attention kernel so out_k (3.3 MB at C=1280) is the
    only resident weight here and the streamed qkv tiles are the only ones
    there."""
    f32 = jnp.float32
    attn = attn_ref[0]
    C, N = attn.shape
    dt = attn.dtype
    h1 = h0_ref[0] + _mm(out_k_ref, attn, out_b_ref)
    a2 = a2_ref[0]
    if nb > 1 and a2.shape[-1] == nb:
        a2 = jnp.dot(a2.astype(f32), _segN(N, nb).T, preferred_element_type=f32)
    o_ref[0] = h1 + jnp.broadcast_to(a2.astype(dt), (C, N))


def _ff_stream_kernel(
    h2_ref, xin_ref, ln3_g_ref, ln3_b_ref,
    g1_k_ref, g1_b_ref, g2_k_ref, g2_b_ref, f_k_ref, f_b_ref,
    po_k_ref, po_b_ref, o_ref, l3_scr, acc_scr, *, k_steps: int,
):
    """Big-C form, kernel 3/3: LN3 -> GEGLU FF -> +res -> proj_out -> +x_in,
    STREAMED over the FF inner dimension.

    At C=1280 the GEGLU weights alone are 26 MB bf16 — no token chunking
    makes them resident. Instead the grid's second axis walks inner-dim
    chunks: each step Mosaic pipelines the next (ck, C)/(C, ck) weight
    tiles HBM->VMEM while this step's partial f_k @ (g1 * gelu(g2)) is
    accumulated into an fp32 VMEM scratch; LN3 is computed once at k=0
    into a second scratch. proj_out fires on the last chunk. GEGLU split
    follows the reference (attention.py:37-48): value rows g_k[:inner],
    gate rows g_k[inner:]."""
    f32 = jnp.float32
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        h2 = h2_ref[0]
        l3_scr[...] = _ln_t(h2, ln3_g_ref, ln3_b_ref)
        acc_scr[...] = h2.astype(f32) + f_b_ref[...].astype(f32)

    l3 = l3_scr[...]
    val = _mm(g1_k_ref, l3, g1_b_ref)  # (ck, N)
    gate = _mm(g2_k_ref, l3, g2_b_ref)
    y = val * _gelu(gate)
    acc_scr[...] = acc_scr[...] + jax.lax.dot(
        f_k_ref[...], y, preferred_element_type=f32
    )

    @pl.when(k == k_steps - 1)
    def _fin():
        h3 = acc_scr[...].astype(h2_ref.dtype)
        o_ref[0] = xin_ref[0] + _mm(po_k_ref, h3, po_b_ref)


def _xla_reference(x_in, attn2_add, w: BlockWeights, heads: int):
    """Differentiable plain-XLA twin (natural orientation) used for the
    custom VJP and the kernel's correctness tests. Matches the flax module
    composition in nn/unet.py (SpatialTransformer / ViewAligned interior,
    including the site GroupNorm)."""
    f32 = jnp.float32
    dt = x_in.dtype
    B, N, C = x_in.shape
    dh = C // heads

    def dense(h, k, b=None):  # k is (out, in) transposed
        y = jnp.einsum("bnc,oc->bno", h, k.astype(h.dtype))
        if b is not None:
            y = y + b.astype(h.dtype)
        return y

    def ln(h, g, b):
        hf = h.astype(f32)
        mu = jnp.mean(hf, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(hf * hf, axis=-1, keepdims=True) - mu * mu, 0.0)
        y = (hf - mu) * jax.lax.rsqrt(var + _LN_EPS)
        return (y * g.astype(f32) + b.astype(f32)).astype(h.dtype)

    xs = x_in.astype(f32).reshape(B, N, _GN_GROUPS, C // _GN_GROUPS)
    mu = jnp.mean(xs, axis=(1, 3), keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xs), axis=(1, 3), keepdims=True) - jnp.square(mu), 0.0
    )
    x_gn = ((xs - mu) * jax.lax.rsqrt(var + _GN_EPS)).reshape(B, N, C)
    x_gn = (x_gn * w.gn_g.astype(f32) + w.gn_b.astype(f32)).astype(dt)

    h0 = dense(x_gn, w.pi_k, w.pi_b)
    ln1 = ln(h0, w.ln1_g, w.ln1_b)
    qkv = dense(ln1, w.qkv_k)  # (B, N, 3C)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, N, heads, dh)
    k = k.reshape(B, N, heads, dh)
    v = v.reshape(B, N, heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * dh ** -0.5
    probs = jax.nn.softmax(logits.astype(f32), axis=-1).astype(dt)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, N, C)
    h1 = h0 + dense(attn, w.out_k, w.out_b)
    a2 = attn2_add if attn2_add.ndim == 3 else attn2_add[:, None, :]
    h2 = h1 + a2.astype(dt)
    l3 = ln(h2, w.ln3_g, w.ln3_b)
    g = dense(l3, w.g_k, w.g_b)
    inner = w.f_k.shape[1]
    y = g[..., :inner] * jax.nn.gelu(g[..., inner:].astype(f32), approximate=False).astype(dt)
    h3 = h2 + dense(y, w.f_k, w.f_b)
    return x_in + dense(h3, w.po_k, w.po_b)


def _fwd_impl(x_in, attn2_add, w: BlockWeights, heads: int, interpret: bool):
    B, N, C = x_in.shape
    dt = x_in.dtype
    inner2 = w.g_k.shape[0]

    xinT = jnp.swapaxes(x_in, 1, 2)  # (B, C, N)
    if attn2_add.ndim == 3:
        a2T = jnp.swapaxes(attn2_add, 1, 2)  # (B, C, N)
        Na2 = N
    else:
        a2T = attn2_add[:, :, None]  # (B, C, 1)
        Na2 = 1

    # total bf16 weight bytes resident in VMEM for the single-kernel form:
    # proj_in + attn-out + proj_out (3*C^2) + qkv (3*C^2) + GEGLU + FF down;
    # past the budget (C=640's 14.7 MB) it must split into two kernels
    w_bytes = 2 * (6 * C * C + inner2 * C + C * inner2 // 2)

    # batch tiling (MVDF_BLOCK_NB): pack nb batch elements along lanes.
    # Requires aligned per-batch lane blocks on hardware (N % 128); interpret
    # mode (tests) exercises the packing math at any N. The request is
    # clamped (halving) to a divisor of B and to the measured VMEM envelopes
    # — packed lanes <= 1024 for the single-kernel form, <= 2048 for the
    # split form — with a trace-time warning, instead of compile-crashing
    # the whole model on an oversized request.
    # big-C form (C=1280 8^2/4^2 sites): 4 kernels, masked packed attention
    # with per-head weight streaming, streamed FF. Lane packing is chosen by
    # _pick_big_nb (as many batch elements per grid step as fit 512 lanes —
    # the weight-refetch count B//nb is the dominant cost); an unpackable
    # shape falls back to the XLA path.
    big = C > _BIG_C_MIN
    if big:
        nb = _pick_big_nb(B, N, interpret)
        if nb is None:
            return _xla_reference(x_in, attn2_add, w, heads)
    else:
        # NB=1 everywhere: a full-bench A/B of nb=2 at the 16^2 C=640 sites
        # (the one shape where the standalone harness hinted a win) measured
        # 4.755 vs 4.832 views/s — the packing's VMEM pressure costs more
        # than the halved grid bubbles. MVDF_BLOCK_NB stays as an override.
        nb = _BATCH_TILE
    if nb > 1 and not big:
        req = nb
        cap = 1024 if w_bytes <= _SINGLE_KERNEL_WEIGHT_BYTES else 2048
        while nb > 1 and (B % nb or (not interpret and (N % 128 or nb * N > cap))):
            nb //= 2
        if nb != req:
            import sys

            print(
                f"[ops.block] MVDF_BLOCK_NB={req} not usable at B={B}, N={N}, "
                f"C={C} (divisibility/VMEM envelope); running nb={nb}",
                file=sys.stderr,
            )
    if nb > 1:
        if Na2 == 1:
            # per-batch a2 row -> (B//nb, C, nb) columns, expanded to lanes
            # in-kernel via the segment matrix (no (B, C, N) trip through HBM)
            a2T = a2T.reshape(B // nb, nb, C, 1).transpose(0, 2, 1, 3).reshape(B // nb, C, nb)
            Na2 = nb
        else:
            a2T = a2T.reshape(B // nb, nb, C, N).transpose(0, 2, 1, 3).reshape(B // nb, C, nb * N)
            Na2 = nb * N
        xinT = xinT.reshape(B // nb, nb, C, N).transpose(0, 2, 1, 3).reshape(B // nb, C, nb * N)
        B, N = B // nb, nb * N

    col = lambda x: x.reshape(-1, 1)
    vm = lambda shape, im: pl.BlockSpec(shape, im, memory_space=pltpu.VMEM)
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    io_spec = vm((1, C, N), lambda b: (b, 0, 0))
    attn_w = (
        col(w.gn_g), col(w.gn_b),
        w.pi_k.astype(dt), col(w.pi_b), col(w.ln1_g), col(w.ln1_b),
        w.qkv_k.astype(dt), w.out_k.astype(dt), col(w.out_b),
    )
    ff_w = (
        col(w.ln3_g), col(w.ln3_b),
        w.g_k.astype(dt), col(w.g_b), w.f_k.astype(dt), col(w.f_b),
        w.po_k.astype(dt), col(w.po_b),
    )
    # cost in ORIGINAL dims (B/N here may already be batch-packed; the
    # attention term is per-batch N^2, not packed-lane N^2)
    B0, N0 = B * nb, N // nb
    cost = pl.CostEstimate(
        # qkv+out+proj_in/out + ff + attention, per batch
        flops=2 * B0 * N0 * C * (6 * C + 3 * inner2 // 2) + 4 * B0 * N0 * N0 * C,
        bytes_accessed=3 * B0 * N0 * C * 2,
        transcendentals=B0 * N0 * N0 * heads + B0 * N0 * inner2 // 2,
    )

    if big:
        inner = inner2 // 2
        # FF inner-dim chunk: largest divisor of inner whose streamed weight
        # tiles (double-buffered g1+g2+f = 12*ck*C bytes) PLUS the resident
        # per-group working set (h2/xin/out io tiles, l3 scratch, fp32
        # accumulator = 12*C*N bytes) stay under ~14 MB of the 16 MB scope
        # ck must be a lane-tile multiple: the (C, ck) f_k tile's last dim
        # needs ck % 128 == 0 (Mosaic block rule). The big-C kernels raise
        # the scoped-VMEM limit past the 16 MB default (v5e has 128 MB of
        # physical VMEM): the fp32 accumulator + resident io tiles alone are
        # ~13 MB at 512 packed lanes, measured from Mosaic's own allocation
        # report (17.37 MB at ck=256).
        big_vmem = pltpu.CompilerParams(vmem_limit_bytes=40 * (1 << 20))
        ck = inner
        for cand in (640, 512, 384, 256, 128):
            if inner % cand == 0 and 26 * C * N + 12 * C * cand <= 34 * (1 << 20):
                ck = cand
                break
        k_steps = inner // ck
        h0T, ln1T = pl.pallas_call(
            functools.partial(_pi_kernel, nb=nb),
            grid=(B,),
            in_specs=[io_spec] + [const()] * 6,
            out_specs=(io_spec, io_spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, C, N), dt),
                jax.ShapeDtypeStruct((B, C, N), dt),
            ),
            compiler_params=big_vmem,
            interpret=interpret,
        )(
            xinT, col(w.gn_g), col(w.gn_b), w.pi_k.astype(dt), col(w.pi_b),
            col(w.ln1_g), col(w.ln1_b),
        )
        # head-major qkv rows so one grid step's weight tile is contiguous
        # (a loop-invariant reorder of a parameter: hoisted out of the
        # sampler's scan by XLA, unlike activation-path work)
        dh = C // heads
        qkv_hm = (
            w.qkv_k.astype(dt).reshape(3, heads, dh, C).transpose(1, 0, 2, 3)
            .reshape(heads, 3 * dh, C)
        )
        attnT = pl.pallas_call(
            functools.partial(_bigattn_stream_kernel, nb=nb),
            grid=(B, heads),
            in_specs=[
                vm((1, C, N), lambda b, h: (b, 0, 0)),
                vm((1, 3 * dh, C), lambda b, h: (h, 0, 0)),
            ],
            out_specs=vm((1, dh, N), lambda b, h: (b, h, 0)),
            out_shape=jax.ShapeDtypeStruct((B, C, N), dt),
            cost_estimate=cost,
            compiler_params=big_vmem,
            interpret=interpret,
        )(ln1T, qkv_hm)
        h2T = pl.pallas_call(
            functools.partial(_h2_kernel, nb=nb),
            grid=(B,),
            in_specs=[io_spec, io_spec, vm((1, C, Na2), lambda b: (b, 0, 0))]
            + [const()] * 2,
            out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, N), dt),
            compiler_params=big_vmem,
            interpret=interpret,
        )(attnT, h0T, a2T, w.out_k.astype(dt), col(w.out_b))
        io2 = lambda: vm((1, C, N), lambda b, k: (b, 0, 0))
        row_w = vm((ck, C), lambda b, k: (k, 0))
        row_b = vm((ck, 1), lambda b, k: (k, 0))
        col_w = vm((C, ck), lambda b, k: (0, k))
        outT = pl.pallas_call(
            functools.partial(_ff_stream_kernel, k_steps=k_steps),
            grid=(B, k_steps),
            in_specs=[io2(), io2(), const(), const(), row_w, row_b, row_w,
                      row_b, col_w, const(), const(), const()],
            out_specs=io2(),
            out_shape=jax.ShapeDtypeStruct((B, C, N), dt),
            scratch_shapes=[
                pltpu.VMEM((C, N), dt),
                pltpu.VMEM((C, N), jnp.float32),
            ],
            compiler_params=big_vmem,
            interpret=interpret,
        )(
            h2T, xinT, col(w.ln3_g), col(w.ln3_b),
            w.g_k[:inner].astype(dt), col(w.g_b[:inner]),
            w.g_k[inner:].astype(dt), col(w.g_b[inner:]),
            w.f_k.astype(dt), col(w.f_b), w.po_k.astype(dt), col(w.po_b),
        )
    elif w_bytes <= _SINGLE_KERNEL_WEIGHT_BYTES:
        outT = pl.pallas_call(
            functools.partial(_block_kernel, heads=heads, nb=nb),
            grid=(B,),
            in_specs=[io_spec, vm((1, C, Na2), lambda b: (b, 0, 0))] + [const()] * 17,
            out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, N), dt),
            cost_estimate=cost,
            interpret=interpret,
        )(xinT, a2T, *attn_w, *ff_w)
    else:
        # split form (the C=640 16^2 sites): attention part, then FF part —
        # h2 round-trips HBM once, but each kernel's weights fit VMEM
        h2T = pl.pallas_call(
            functools.partial(_attn_kernel, heads=heads, nb=nb),
            grid=(B,),
            in_specs=[io_spec, vm((1, C, Na2), lambda b: (b, 0, 0))] + [const()] * 9,
            out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, N), dt),
            cost_estimate=cost,
            interpret=interpret,
        )(xinT, a2T, *attn_w)
        # token-chunk size for the GEGLU intermediate: benched on v5e, wider
        # chunks give the MXU full-width dots instead of N=128 slivers
        # (+1.3 ms/step at 32^2 going 128 -> 512; round 4: 512 -> 1024 — one
        # unchunked pass at the 32^2 sites — measured 4.95 vs 4.90 views/s
        # on the full 50-step bench, standalone step 34.3 vs 35.4 ms).
        # Budget: GEGLU weights (C=640: ~10.7 MB) + (2*inner, chunk) bf16
        # intermediate + io tiles must stay under the ~16 MB VMEM scope —
        # C=640 fits chunk 256 (~14.5 MB); C<=384 at chunk 1024 is ~10 MB
        # (5.2 MB intermediate + 2.3 MB weights + io). MVDF_BLOCK_FFC
        # overrides for A/B (esp. with NB>1 where N is the packed lanes).
        ffc = min(N, int(_os.environ.get("MVDF_BLOCK_FFC", "0")) or
                  (1024 if C <= 384 else 256))
        outT = pl.pallas_call(
            functools.partial(_ff_kernel, chunk=ffc),
            grid=(B,),
            in_specs=[io_spec, io_spec] + [const()] * 8,
            out_specs=io_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, N), dt),
            cost_estimate=cost,
            interpret=interpret,
        )(h2T, xinT, *ff_w)
    if nb > 1:  # unpack lanes back to (B0, C, N0)
        outT = (
            outT.reshape(B, C, nb, N0).transpose(0, 2, 1, 3).reshape(B0, C, N0)
        )
    return jnp.swapaxes(outT, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def transformer_block(
    x_in: jnp.ndarray,  # (B, N, C) raw site input (pre-GN); also the residual
    attn2_add: jnp.ndarray,  # (B, C) per-batch row or (B, N, C) per-token
    w: BlockWeights,
    heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """x_in + proj_out(block(proj_in(GN(x_in)))) with the attn2 term injected."""
    return _fwd_impl(x_in, attn2_add, w, heads, interpret)


def _fwd(x_in, attn2_add, w, heads, interpret):
    return _fwd_impl(x_in, attn2_add, w, heads, interpret), (x_in, attn2_add, w)


def _bwd(heads, interpret, res, g):
    x_in, attn2_add, w = res
    _, vjp = jax.vjp(
        lambda a, c, ww: _xla_reference(a, c, ww, heads), x_in, attn2_add, w
    )
    return vjp(g)


transformer_block.defvjp(_fwd, _bwd)


def should_fuse_block(C: int, N: int, heads: int) -> bool:
    """TPU-only; the 32^2 (C=320, single kernel), 16^2 (C=640, split attn/FF
    kernels) and 8^2/4^2 (C=1280, big-C form: pi/attn/streamed-FF kernels
    with batch packing to 128 lanes) sites. VMEM budget: fp32 (N, N) logits
    tile + bf16 weights + (C, N) working set under the ~16 MB scoped limit.
    MVDF_DISABLE_PALLAS=1 forces the XLA path."""
    import os

    if jax.default_backend() != "tpu" or os.environ.get("MVDF_DISABLE_PALLAS"):
        return False
    if C % heads or (C // heads) % 8 or C % _GN_GROUPS:
        return False
    if C > _BIG_C_MIN:
        # big-C form: OFF by default. Measured on v5e (tools/block_tune.py,
        # chained-call harness so dispatch overhead cancels in the A/B):
        # fused 2.10 ms vs XLA 1.36 ms at the 8^2 site, 1.76 vs 1.28 at the
        # 4^2 middle — the (B, K) grid re-streams each site's ~52 MB of
        # weights once per batch group (~450 MB/site vs XLA's one-pass),
        # which swamps the emitter win that pays off at 32^2/16^2. Kept
        # behind MVDF_BLOCK_BIGC=1 (with interpret-mode parity tests) as
        # groundwork for a one-pass-weights decomposition.
        if not _os.environ.get("MVDF_BLOCK_BIGC"):
            return False
        # N >= 64: the 4^2 middle (N=16) loses to XLA in every measured form
        # (4 kernel launches + per-head streaming over 256 lanes of work).
        # N up to 256 covers the 512^2-stretch's C=1280 sites at 16^2.
        return C <= 1280 and 64 <= N <= 256 and (N % 64 == 0)
    if N % 128:
        return False
    # measured VMEM envelopes on v5e: single kernel (C=320, N=1024) ~15 MB;
    # split kernels (C=640, N=256) ~14 MB. The 512^2-stretch's (640, 1024)
    # combination puts the FF kernel at 25.7 MB — excluded.
    return (C <= 384 and N <= 1024) or (C <= 768 and N <= 256)
