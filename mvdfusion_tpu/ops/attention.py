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


def _attn_kernel(q_ref, kt_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (BQ, dh)
    kt = kt_ref[0]  # (dh, N) — pre-transposed so the MXU sees a plain matmul
    v = v_ref[0]  # (N, dh)
    s = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jax.nn.softmax(s * scale, axis=-1)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_kernel_t(qt_ref, kt_ref, vt_ref, o_ref, *, scale: float):
    """Fully TRANSPOSED variant for lane-limited head dims (dh < 128).

    The natural-orientation kernel's two matmuls each touch dh lanes:
    QK^T contracts over q's dh lanes and PV emits dh output lanes, so at
    the SD1 sites' dh=40 both run at 40/128 ≈ 31% of MXU peak — the
    stretch shape's measured ceiling (docs/ARCHITECTURE.md §5b). Keeping
    dh on SUBLANES everywhere removes the limit (same trick as
    ops/block.py's site kernels, here tiled for N up to 4096):

      logits^T (Nk, BQ) = dot_g(kT (dh, Nk), qT (dh, BQ))  contract dh=sublanes
      softmax over Nk = a SUBLANE-axis reduction
      out^T   (dh, BQ) = dot_g(vT (dh, Nk), P^T (Nk, BQ))  contract Nk

    Both contractions are full-width MXU forms (dh=40 is 5 sublane tiles,
    no padding); the only lane-underfilled object left is the (dh, BQ)
    output tile's sublanes — free. The fp32 logits tile (Nk, BQ) is the
    VMEM budget, identical to the natural form's."""
    qt = qt_ref[0]  # (dh, BQ)
    kt = kt_ref[0]  # (dh, Nk)
    vt = vt_ref[0]  # (dh, Nk)
    st = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Nk, BQ)
    st = st * scale
    m = jnp.max(st, axis=0, keepdims=True)
    e = jnp.exp(st - m)
    p = (e / jnp.sum(e, axis=0, keepdims=True)).astype(vt.dtype)
    o = jax.lax.dot_general(
        vt, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (dh, BQ)
    o_ref[0] = o.astype(o_ref.dtype)


def _use_transposed(Nq: int, Nk: int, dh: int) -> bool:
    """Route lane-limited head dims to the transposed kernel.

    MVDF_ATTN_T=0/1 forces the orientation. Measured on v5e
    (tools/attn_tune.py, chained-carry timing, 20 iters): at the shape the
    transposed form was BUILT for — stretch 64^2 attn1, B=16, N=4096, 8
    heads of dh=40 (docs/ARCHITECTURE.md §5b's ~31%-lane-occupancy
    ceiling) — it LOSES: 11.12 ms vs natural 10.63 ms. The dh-on-sublanes
    matmuls don't pay for the (B*H, dh, N) fold transposes XLA must emit
    around the kernel, and the fp32 (Nk, BQ) logits tile pipelines no
    better. It WINS only at small-Nk skinny shapes (Nq=4096, Nk=128,
    dh=40: 1.78 vs 2.34 ms), where the whole K/V block stays resident and
    the fold is cheap — so auto routes there and nowhere else."""
    import os

    mode = os.environ.get("MVDF_ATTN_T", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return dh < 128 and Nk <= 256 and Nq % 128 == 0 and Nk % 128 == 0


def _fused_attention_fwd_impl(q, k, v, scale: float, interpret: bool):
    """q: (B, Nq, H, dh), k/v: (B, Nk, H, dh) -> (B, Nq, H, dh)."""
    B, Nq, H, dh = q.shape
    Nk = k.shape[1]
    dh_p = -(-dh // _SUBLANE) * _SUBLANE
    bq = min(Nq, max(256, _LOGIT_BUDGET // (4 * Nk)))
    while bq > 256 and Nq % bq:
        bq //= 2
    if Nq % bq:  # no clean divisor (e.g. CLIP's 257 tokens): whole-dim block
        bq = Nq

    if _use_transposed(Nq, Nk, dh):
        def fold_t(x, n):
            x = jnp.swapaxes(x, 1, 2).reshape(B * H, n, dh)
            if dh_p != dh:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, dh_p - dh)))
            return jnp.swapaxes(x, 1, 2)  # (B*H, dh_p, n)

        qt, kt, vt = fold_t(q, Nq), fold_t(k, Nk), fold_t(v, Nk)
        out = pl.pallas_call(
            functools.partial(_attn_kernel_t, scale=scale),
            grid=(B * H, Nq // bq),
            in_specs=[
                pl.BlockSpec((1, dh_p, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dh_p, Nk), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dh_p, Nk), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, dh_p, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, dh_p, Nq), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * Nq * Nk * dh_p,
                bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
                transcendentals=B * H * Nq * Nk,
            ),
            interpret=interpret,
        )(qt, kt, vt)
        out = out[:, :dh].reshape(B, H, dh, Nq)
        return jnp.transpose(out, (0, 3, 1, 2))

    def fold(x, n):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, n, dh)
        if dh_p != dh:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, dh_p - dh)))
        return x

    qf, kf, vf = fold(q, Nq), fold(k, Nk), fold(v, Nk)
    kf = jnp.swapaxes(kf, 1, 2)  # (B*H, dh, Nk)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B * H, Nq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dh_p), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh_p, Nk), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, dh_p), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dh_p), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Nq, dh_p), q.dtype),
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
