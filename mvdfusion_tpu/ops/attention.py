"""Fused multi-head attention as a Pallas TPU kernel.

Why: XLA materializes the (B*heads, N, N) fp32 logits of every softmax
attention in HBM. At this model's flagship shapes (CFG batch 16, 1024 latent
tokens, 8 heads) that is ~0.5 GB of HBM traffic *per attention site per
denoising step* — the single largest bandwidth cost in the UNet
(SpatialTransformer attn1/attn2 and the grafted ViewAligned attn1,
nn/unet.py; reference counterparts external/sd1/ldm/modules/attention.py:
152-193). This kernel keeps the logits block in VMEM: per grid step it loads
one query tile plus the full K/V for that (batch, head), computes
scores -> stabilized fp32 softmax -> PV entirely on-chip, and writes only
the (BQ, dh) output tile.

Scope: non-causal, unmasked, full-row attention with K/V resident in VMEM —
exactly this model's shapes (N <= 4096 even at the 512^2 stretch config,
dh <= 512). Head dims stay NATIVE (dh=40 for the 320ch/8-head UNet sites):
Mosaic pads the lane dim inside VMEM where needed, but HBM traffic and the
XLA-side layout stay unpadded — padding q/k/v to 128 lanes in XLA costs 3.2x
the bandwidth plus pad/copy fusions for zero MXU savings (the MXU pass count
is ceil(dh/128) either way). dh is only rounded up to the fp32 sublane tile
(8) so the pre-transposed K block keeps a legal second-minor dim.

Backward: custom VJP that recomputes the standard XLA attention for
gradients (rematerialization — training steps are not logits-bandwidth
bound the way the 50-step sampler is).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fp32 logits-tile VMEM budget: bq = LOGIT_BUDGET/Nk rows per grid step
# (measured on v5e at (16,1024,8,40): bq=1024 beats 512 beats 256)
_LOGIT_BUDGET = 4 * 1024 * 1024
_SUBLANE = 8

# Softmax normalization placement (MVDF_ATTN_NORM):
#   pv (default): max-shift and temperature fused into ONE exp pass
#       (softmax(s*c) == exp((s-m)*c)/sum for c>0), the row-sum rides the PV
#       matmul as a ones column appended to V (dh=40 pads to 128 MXU lanes
#       anyway — the extra column is free MXU work), and normalization is
#       applied to the (BQ, dh) OUTPUT tile. Removes the N^2 fp32 sum pass
#       AND the N^2 divide pass from the VPU — the §5b stretch attn1 gap.
#   probs: the round-1..4 form (normalize the full probability tile, divide
#       before the cast) kept for A/B and numerics bisection — honored by
#       BOTH orientations, and read at trace time (like MVDF_ATTN_T), so
#       monkeypatch/driver env flips take effect without re-import.
# block.py measured its in-site version of this a wash (softmax pipelines
# behind the site's projection matmuls); HERE the kernel is attention-only,
# so the softmax passes are exposed — measured on v5e (tools/attn_tune.py,
# chained-carry, 30 iters, round 5): stretch attn1 (16,4096,4096,8x40)
# natural 10.10 -> 9.79 ms, transposed 11.12 (round 4, probs) -> 8.34 ms.
# The deferred form is what flips the transposed orientation from loser to
# winner at the big shape — see _use_transposed.
import os as _os


def _norm_mode() -> str:
    return _os.environ.get("MVDF_ATTN_NORM", "pv")


def _attn_kernel(q_ref, kt_ref, v_ref, o_ref, *, scale: float, dh: int):
    q = q_ref[0]  # (BQ, dh_p)
    kt = kt_ref[0]  # (dh_p, N) — pre-transposed so the MXU sees a plain matmul
    v = v_ref[0]  # (N, dv) — column dh holds ones (denominator rides the PV)
    s = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp((s - m) * scale).astype(v.dtype)
    o = jax.lax.dot_general(
        e, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, dv); o[:, dh] == row-sum of e
    o_ref[0] = (o * jax.lax.reciprocal(o[:, dh : dh + 1])).astype(o_ref.dtype)


def _attn_kernel_probs(q_ref, kt_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (BQ, dh)
    kt = kt_ref[0]  # (dh, N)
    v = v_ref[0]  # (N, dh)
    s = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jax.nn.softmax(s * scale, axis=-1)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_kernel_t(qt_ref, kt_ref, vt_ref, o_ref, *, scale: float, dh: int):
    """Fully TRANSPOSED variant for lane-limited head dims (dh < 128).

    The natural-orientation kernel's two matmuls each touch dh lanes:
    QK^T contracts over q's dh lanes and PV emits dh output lanes, so at
    the SD1 sites' dh=40 both run at 40/128 ≈ 31% of MXU peak — the
    stretch shape's measured ceiling (docs/ARCHITECTURE.md §5b). Keeping
    dh on SUBLANES everywhere removes the limit (same trick as
    ops/block.py's site kernels, here tiled for N up to 4096):

      logits^T (Nk, BQ) = dot_g(kT (dh, Nk), qT (dh, BQ))  contract dh=sublanes
      exp-shift over Nk = a SUBLANE-axis reduction; normalization deferred
      out^T   (dh, BQ) = dot_g(vT (dv, Nk), E^T (Nk, BQ))  contract Nk,
                         row dh of vT is ones so o[dh] is the denominator

    Both contractions are full-width MXU forms (dh=40 is 5 sublane tiles,
    no padding); the only lane-underfilled object left is the (dh, BQ)
    output tile's sublanes — free. The fp32 logits tile (Nk, BQ) is the
    VMEM budget, identical to the natural form's."""
    qt = qt_ref[0]  # (dh_p, BQ)
    kt = kt_ref[0]  # (dh_p, Nk)
    vt = vt_ref[0]  # (dv, Nk) — row dh holds ones (denominator rides the PV)
    st = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Nk, BQ)
    m = jnp.max(st, axis=0, keepdims=True)
    e = jnp.exp((st - m) * scale).astype(vt.dtype)
    o = jax.lax.dot_general(
        vt, e, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (dv, BQ); o[dh] == column-sum of e
    o_ref[0] = (o * jax.lax.reciprocal(o[dh : dh + 1, :])).astype(o_ref.dtype)


def _attn_kernel_t_probs(qt_ref, kt_ref, vt_ref, o_ref, *, scale: float):
    """Round-4 transposed form: full-tile normalization before the PV."""
    qt = qt_ref[0]  # (dh_p, BQ)
    kt = kt_ref[0]  # (dh_p, Nk)
    vt = vt_ref[0]  # (dh_p, Nk)
    st = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Nk, BQ)
    st = st * scale
    m = jnp.max(st, axis=0, keepdims=True)
    e = jnp.exp(st - m)
    p = (e / jnp.sum(e, axis=0, keepdims=True)).astype(vt.dtype)
    o = jax.lax.dot_general(
        vt, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (dh_p, BQ)
    o_ref[0] = o.astype(o_ref.dtype)


def _use_transposed(Nq: int, Nk: int, dh: int) -> bool:
    """Route lane-limited head dims to the transposed kernel.

    MVDF_ATTN_T=0/1 forces the orientation. History (tools/attn_tune.py,
    chained-carry timing on v5e): with the round-4 probs-normalized softmax
    the transposed form LOST at the big stretch attn1 shape (B=16, N=4096,
    8x dh=40): 11.12 ms vs natural 10.63 — the (Nk, BQ) fp32 logits tile's
    full-width softmax passes (sum over sublanes + divide) ate the
    lane-occupancy win, so auto routed it only at small-Nk skinny shapes
    (Nk=128: 1.78 vs 2.34 ms). The round-5 deferred normalization (exp
    pass only; denominator from a ones ROW riding the PV matmul, divide on
    the (dh, BQ) output) removes exactly those passes and FLIPS the
    verdict: transposed 8.34 ms vs natural 9.79 (probs-natural 10.10, XLA
    13.38) at the big shape, 1.16 vs 1.87 at Nk=128. auto now routes every
    dh<128 tile-aligned shape to transposed. CLIP's 257-token attention
    (dh=64) stays natural via the %128 guard; dh>=128 (VAE mid) keeps the
    natural orientation where the lane limit never applied."""
    import os

    mode = os.environ.get("MVDF_ATTN_T", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return dh < 128 and Nk <= 4096 and Nq % 128 == 0 and Nk % 128 == 0


def _fused_attention_fwd_impl(q, k, v, scale: float, interpret: bool):
    """q: (B, Nq, H, dh), k/v: (B, Nk, H, dh) -> (B, Nq, H, dh)."""
    B, Nq, H, dh = q.shape
    Nk = k.shape[1]
    dh_p = -(-dh // _SUBLANE) * _SUBLANE
    dv = -(-(dh + 1) // _SUBLANE) * _SUBLANE  # + the PV-matmul ones column
    bq = min(Nq, max(256, _LOGIT_BUDGET // (4 * Nk)))
    while bq > 256 and Nq % bq:
        bq //= 2
    if Nq % bq:  # no clean divisor (e.g. CLIP's 257 tokens): whole-dim block
        bq = Nq

    probs = _norm_mode() == "probs"

    if _use_transposed(Nq, Nk, dh):
        dvt = dh_p if probs else dv

        def fold_t(x, n, dp):
            x = jnp.swapaxes(x, 1, 2).reshape(B * H, n, dh)
            if dp != dh:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, dp - dh)))
            return jnp.swapaxes(x, 1, 2)  # (B*H, dp, n)

        qt, kt = fold_t(q, Nq, dh_p), fold_t(k, Nk, dh_p)
        vt = fold_t(v, Nk, dvt)
        if not probs:
            vt = vt.at[:, dh, :].set(1)
        kern_t = (
            functools.partial(_attn_kernel_t_probs, scale=scale)
            if probs
            else functools.partial(_attn_kernel_t, scale=scale, dh=dh)
        )
        out = pl.pallas_call(
            kern_t,
            grid=(B * H, Nq // bq),
            in_specs=[
                pl.BlockSpec((1, dh_p, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dh_p, Nk), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dvt, Nk), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, dvt, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, dvt, Nq), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * Nq * Nk * dh_p,
                bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
                transcendentals=B * H * Nq * Nk,
            ),
            interpret=interpret,
        )(qt, kt, vt)
        out = out[:, :dh].reshape(B, H, dh, Nq)
        return jnp.transpose(out, (0, 3, 1, 2))

    # The ones column is only free when it rides a partially-filled 128-lane
    # MXU tile (dh=40 -> 48, dh=64 -> 72). At lane-ALIGNED head dims (the VAE
    # mid-attention's dh=512) it would add a whole extra output tile to the
    # PV matmul (+12.5% MXU work) against an unmeasured softmax saving — those
    # shapes keep the round-4 probs-normalized kernel.
    ones_free = -(-dv // 128) == -(-dh_p // 128)
    probs = probs or not ones_free
    dvv = dh_p if probs else dv

    def fold(x, n, dp):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, n, dh)
        if dp != dh:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, dp - dh)))
        return x

    qf, kf, vf = fold(q, Nq, dh_p), fold(k, Nk, dh_p), fold(v, Nk, dvv)
    if not probs:
        vf = vf.at[:, :, dh].set(1)
    kf = jnp.swapaxes(kf, 1, 2)  # (B*H, dh, Nk)
    kern = (
        functools.partial(_attn_kernel_probs, scale=scale)
        if probs
        else functools.partial(_attn_kernel, scale=scale, dh=dh)
    )
    out = pl.pallas_call(
        kern,
        grid=(B * H, Nq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dh_p), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh_p, Nk), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, dvv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dvv), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Nq, dvv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * Nk * dh_p,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = out[..., :dh].reshape(B, H, Nq, dh)
    return jnp.swapaxes(out, 1, 2)


def _xla_attention(q, k, v, scale: float):
    """Reference path (nn/layers.dot_attention numerics)."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, scale: float, interpret: bool = False):
    return _fused_attention_fwd_impl(q, k, v, scale, interpret)


def _fwd(q, k, v, scale, interpret):
    return _fused_attention_fwd_impl(q, k, v, scale, interpret), (q, k, v)


def _bwd(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


def should_fuse(q, k) -> bool:
    """Route to the Pallas kernel on TPU for the large-token sites.

    MVDF_DISABLE_PALLAS=1 forces every site onto the XLA path (debugging /
    on-chip kernel-vs-XLA numerics checks, tools/tpu_numerics_check.py)."""
    import os

    if jax.default_backend() != "tpu" or os.environ.get("MVDF_DISABLE_PALLAS"):
        return False
    Nq, Nk = q.shape[1], k.shape[1]
    if Nq < 256 or Nk < 128:
        return False
    # VAE mid-attention at decode/encode batch (B>=2, single dh=512 head,
    # N=1024): XLA wins — measured 1.85 ms vs fused 2.32 ms at B=8 on v5e
    # (tools/attn_tune.py); at B=1 the fused kernel still wins (1.57 vs
    # 1.84). XLA batches the B heads into one fat GEMM chain the per-(B*H)
    # grid can't match. No other live site has dh > 128 (UNet site heads
    # are dh=40..160 and go through ops/block.py; CLIP is dh=64).
    if q.shape[-1] > 128 and q.shape[0] >= 2:
        return False
    # K/V + logits tile must fit VMEM comfortably. Mosaic double-buffers the
    # grid-varying K/V blocks, so the budget is ~2*(2*Nk*dh) bf16 bytes plus
    # the logits tile. Gate: Nk*dh <= 2^20 elements. Worst allowed case is
    # (Nk=1024, dh=512) — the VAE mid-attention at the flagship 256^2 shape,
    # ~8.5 MB scoped. The excluded (Nk=4096, dh=512) case is the same VAE
    # mid-attention at the 512^2 stretch: it measured 16.5 MB scoped and
    # OOM'd the 16 MB VMEM limit.
    return Nk <= 4096 and q.shape[-1] <= 512 and Nk * q.shape[-1] <= (1 << 20)
