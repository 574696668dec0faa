"""Fused cross-view aggregation — the GridAttn hot path as ONE Pallas kernel.

Reference semantics fused (mvdfusion/view_attn_efficient2.py:302-397): per
block of query points, (1) bilinear-gather every view's projected feature
map at the reprojected NDC coordinates, (2) add the projected geometric
embeddings and the view-invariant accumulation, gelu -> (TN, V, hid) tokens,
(3) run the full adaLN-Zero DiT stack across the V view axis, (4) softmax-
weight pool over V and project to the output frustum — all without ever
writing the (N, V, hid) token tensor, the (N, HW) interpolation matrices, or
any DiT intermediate to HBM.

Design notes (TPU):
  * The projected view maps (V, HW, hid) sit in VMEM for the whole grid
    (constant index_map -> fetched once); the bilinear gather is an on-chip
    one-hot matmul per view — MXU work with zero HBM weight traffic.
  * The V-axis attention (V <= 16 tokens) is computed head-by-head with
    broadcast-multiply-reduce on the VPU: at these shapes MXU batched
    matmuls would run at ~2% utilization, and the arithmetic is tiny.
  * adaLN modulation is shared-t (reference :438): the 6 modulation vectors
    per layer are precomputed outside and broadcast in-kernel.
  * Two paths by map size: when all V projected maps fit VMEM together
    (flagship 32^2: 4 MB) everything runs as ONE kernel per token block;
    bigger maps (the 512^2-class stretch: 64^2 latents, 16 MB of maps) run
    TWO phases — a gather kernel with views outer (one view's map resident
    per sweep) writing bf16 tokens, then a DiT+pool kernel over token
    blocks. Gated to HW <= 8192 and top_k off; the XLA path in
    nn/viewattn.py (factorized projector) covers everything else.

The wrapper `crossview_aggregate` takes plain arrays (weights bundled by the
caller — nn/viewattn.py extracts them from the Flax scope) so the kernel is
testable standalone; interpret=True runs it on CPU for the parity test.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class AggregatorWeights(NamedTuple):
    """Stacked DiT weights (leading axis = layer) + pool/output heads."""

    qkv_k: jnp.ndarray  # (L, hid, 3*hid)
    qkv_b: jnp.ndarray  # (L, 3*hid)
    proj_k: jnp.ndarray  # (L, hid, hid)
    proj_b: jnp.ndarray  # (L, hid)
    fc1_k: jnp.ndarray  # (L, hid, mlp)
    fc1_b: jnp.ndarray  # (L, mlp)
    fc2_k: jnp.ndarray  # (L, mlp, hid)
    fc2_b: jnp.ndarray  # (L, hid)
    mods: jnp.ndarray  # (L, 6, hid) precomputed adaLN modulation (shared t)
    wl_k: jnp.ndarray  # (hid, 1)
    wl_b: jnp.ndarray  # (1,)
    fin_k: jnp.ndarray  # (hid, out_dim)
    fin_b: jnp.ndarray  # (out_dim,)


class GeoWeights(NamedTuple):
    """Projection kernels for the geometric token parts, reorganised so the
    kernel can compute the harmonic embedding ON-CHIP from the raw 7-vector
    X = [ray direction (3) | o x d Plücker moment (3) | depth (1)]:

        tok_geo = X_aug^T @ kall + mask * kmask
        X_aug   = [X | sin(f_k X) for k | cos(f_k X) for k]   (7*(1+2*nh), TN)

    This replaces what used to be ~0.7 ms/step of XLA-side prep per
    denoising step (the skinny 7/42-lane plücker + sin/cos + concat tensors
    ran at ~5% lane occupancy; tools/step_trace.py)."""

    kall: jnp.ndarray  # (7*(1+2*nh), hid) rows [raw | sin freq-major | cos]
    kmask: jnp.ndarray  # (1, hid)


def _layernorm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Affine-free LayerNorm in fp32 (DiT adaLN-Zero norm)."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf, |err| <= 1.5e-7 — Mosaic has
    no erf/erfc lowering, and this is far inside the fp32 parity tolerance."""
    a1, a2, a3, a4, a5, p = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429, 0.3275911
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return s * y


def _gelu(x):
    """Exact (erf) gelu, matching jax.nn.gelu(approximate=False)."""
    return x * 0.5 * (1.0 + _erf(x.astype(jnp.float32) * (2.0**-0.5))).astype(x.dtype)


def _geo_aug_t(ptsT, center, freqs):
    """Transposed geometric features for one view: X_aug (7*(1+2nh), TN).

    ptsT: (3, TN) world points, center: (3, 1). Computes ray dir, Plücker
    moment o x d, metric depth, then [raw | sin(f_k X) | cos(f_k X)] —
    everything with channels in SUBLANES so the 3/7-row math runs at full
    lane occupancy (the XLA-side equivalent ran these 7-lane tensors at ~5%
    occupancy)."""
    f32 = jnp.float32
    dirs = ptsT.astype(f32) - center.astype(f32)  # (3, TN)
    depth = jnp.sqrt(jnp.sum(dirs * dirs, axis=0, keepdims=True))  # (1, TN)
    dirn = dirs / jnp.maximum(depth, 1e-12)
    cx, cy, cz = center[0:1], center[1:2], center[2:3]  # (1, 1)
    dx, dy, dz = dirn[0:1], dirn[1:2], dirn[2:3]  # (1, TN)
    mom = jnp.concatenate(
        [cy * dz - cz * dy, cz * dx - cx * dz, cx * dy - cy * dx], axis=0
    )  # (3, TN) o x d
    X = jnp.concatenate([dirn, mom, depth], axis=0)  # (7, TN)
    S = jnp.concatenate([X * f for f in freqs], axis=0)  # (7*nh, TN) freq-major
    return jnp.concatenate([X, jnp.sin(S), jnp.cos(S)], axis=0)


def _kernel(
    xy_ref,  # (V, TN, 2) negated NDC
    ptsT_ref,  # (1, 3, TN) world points, transposed and pre-blocked — the
    # block's last two dims equal the array's, satisfying Mosaic's
    # (8,128)-divisibility-or-whole block rule at any TN
    centers_ref,  # (V, 3, 1) camera centers
    mask_ref,  # (V, 1, 1) predict mask
    bacc_ref,  # (TN, hid) view-invariant accumulation incl. bias
    maps_ref,  # (V, HW, hid) projected view feature maps
    kall_ref,  # (7*(1+2nh), hid) geo projection, rows match _geo_aug_t
    kmask_ref,  # (1, hid)
    qkv_k_ref, qkv_b_ref, proj_k_ref, proj_b_ref,
    fc1_k_ref, fc1_b_ref, fc2_k_ref, fc2_b_ref,
    mods_ref,  # (L, 6, hid)
    wl_k_ref, wl_b_ref, fin_k_ref, fin_b_ref,
    out_ref,  # (TN, out_dim)
    *,
    V: int,
    H: int,
    W: int,
    heads: int,
    layers: int,
    freqs: tuple,
):
    TN = xy_ref.shape[1]
    hid = maps_ref.shape[-1]
    dh = hid // heads
    f32 = jnp.float32
    dt = maps_ref.dtype

    # flat-grid bilinear hat weights: Wm[t, y*W+x'] = relu(1-|x_t-x'|) *
    # relu(1-|y_t-y'|) — exactly the 4-tap one-hot build (incl. the border
    # clamp) in 7 VPU ops instead of 11 + int conversions
    col_x = jax.lax.broadcasted_iota(jnp.int32, (TN, H * W), 1) % W
    col_y = jax.lax.broadcasted_iota(jnp.int32, (TN, H * W), 1) // W
    ptsT = ptsT_ref[0]  # (3, TN)
    toks = []
    for v in range(V):
        xy = xy_ref[v].astype(f32)
        x = jnp.clip((xy[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)[:, None]
        y = jnp.clip((xy[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)[:, None]
        Wm = jnp.maximum(0.0, 1.0 - jnp.abs(x - col_x)) * jnp.maximum(
            0.0, 1.0 - jnp.abs(y - col_y)
        )
        tok = jnp.dot(Wm.astype(dt), maps_ref[v], preferred_element_type=f32)
        aug = _geo_aug_t(ptsT, centers_ref[v], freqs)  # (7*(1+2nh), TN)
        tok = tok + jax.lax.dot_general(
            aug.astype(dt), kall_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        tok = tok + mask_ref[v].astype(f32) * kmask_ref[...].astype(f32)
        toks.append(tok)
    x = jnp.stack(toks, axis=1)  # (TN, V, hid) f32
    x = _gelu(x + bacc_ref[...].astype(f32)[:, None, :])
    _dit_pool(
        x, qkv_k_ref, qkv_b_ref, proj_k_ref, proj_b_ref, fc1_k_ref, fc1_b_ref,
        fc2_k_ref, fc2_b_ref, mods_ref, wl_k_ref, wl_b_ref, fin_k_ref,
        fin_b_ref, out_ref, V=V, heads=heads, layers=layers, dt=dt,
    )


def _dit_pool(
    x,  # (TN, V, hid) f32 gelu'd tokens
    qkv_k_ref, qkv_b_ref, proj_k_ref, proj_b_ref,
    fc1_k_ref, fc1_b_ref, fc2_k_ref, fc2_b_ref,
    mods_ref, wl_k_ref, wl_b_ref, fin_k_ref, fin_b_ref,
    out_ref,  # (TN, out_dim)
    *, V: int, heads: int, layers: int, dt,
):
    """The adaLN-Zero DiT stack over the V axis + softmax pool + output
    projection — shared by the single-kernel path and the two-phase
    (gather, then DiT) stretch path.

    Multi-head structure via 0/1 segment matrices (Mosaic supports neither
    minor-dim-splitting reshapes nor >2D gathers). Logits live PACKED as
    (TN*V, V*heads) — w-major lanes — so the softmax runs at 64/128 lane
    occupancy instead of the heads-minor (TN,V,V,8) form's 8/128, and the
    softmax-over-w group structure is one group-sum matmul.

    MVDF_CV_DIT selects A/B variants that attack the baseline's one
    structural cost: the segment dots are the kernel's only f32 x f32
    matmuls (the MXU runs f32 at a fraction of its bf16 rate). BOTH
    variants measured SLOWER on v5e at the flagship shape (crossview_tune,
    TN=64, null-subtracted): baseline 3.72 ms, merged 4.65 ms, hilo
    4.78 ms — i.e. the kernel is VPU/layout-bound, not f32-MXU-bound; the
    elementwise q*k products and cast traffic around the segment dots cost
    more than the f32 passes they feed. Kept env-gated as the measured
    record. "merged": the variant
    (a) fuses each side's V per-source-view segment dots into ONE wide dot
    (logits: (TN·V, V·hid) @ (V·hid, VH); expand: (TN·V, VH) @ (VH, V·hid)
    then V hid-aligned lane slices), and (b) runs them as bf16 hi/lo split
    pairs — x = hi + lo with hi = bf16(x), lo = bf16(x - hi); against a
    0/1 segment matrix, dot(hi)+dot(lo) in f32 accumulation reproduces the
    f32 dot to ~2^-17 relative, far inside the kernel's parity tolerance —
    so the MXU does 4 bf16 passes per layer instead of 2V f32 ones.
    "hilo": the same bf16 hi/lo exactness trick applied to the baseline's
    narrow per-source-view dots, without the wide-concat restructure.
    """
    import os as _os

    _mode = _os.environ.get("MVDF_CV_DIT", "")
    merged = _mode == "merged"
    # "bf16": single-cast bf16 attention scaffolding. Hypothesis: the
    # baseline's segment dots are the kernel's only f32 x f32 matmuls — at
    # the flagship shape (V=8, heads=8, hid=256, N=8192, L=3) ~103
    # GFLOP/step, ~2.1 ms at the MXU's 1/4-rate f32 throughput, matching
    # the measured 0.93 ms/layer DiT slope. Unlike "hilo" (exact, but 18
    # extra cast sweeps/layer — measured SLOWER), this casts q/k ONCE per
    # layer and P once, then runs products + segment dots in bf16 (~1e-2
    # logit rounding, same numerics policy as the site kernels' QK^T).
    # MEASURED (round 4, full 50-step flagship bench): 4.918 vs 4.941
    # views/s baseline — a WASH inside the ±0.7% run noise. Third strike
    # for restructuring these dots (merged 4.65 ms, hilo 4.78 ms, bf16
    # ~0 vs 3.72 ms standalone baseline): the DiT slope is NOT f32-MXU
    # throughput; the segment dots pipeline behind the VPU work (products,
    # layernorms, softmax, casts) that every variant keeps. Kept env-gated
    # as the measured record; default stays the exact f32 baseline.
    bf16 = _mode == "bf16"
    # "hilo": keep the baseline's narrow per-source-view segment dots (the
    # merged wide-dot restructure measured SLOWER on v5e: 4.65 vs 3.72 ms
    # standalone — the (TN*V, V*hid) concat materialization costs more VPU
    # time than the f32 MXU passes it removes) but run each dot as an exact
    # bf16 hi/lo split pair, turning the kernel's only f32 x f32 matmuls
    # into bf16 ones without the wide-concat overhead.
    hilo = _mode == "hilo"
    TN, _, hid = x.shape
    dh = hid // heads
    f32 = jnp.float32
    VH = V * heads
    seg_w = []  # (hid, VH) per source view: seg at lane block w*heads
    segT_w = []  # (VH, hid) transposed expanders
    d_head = jax.lax.broadcasted_iota(jnp.int32, (hid, VH), 0) // dh
    j_head = jax.lax.broadcasted_iota(jnp.int32, (hid, VH), 1) % heads
    j_view = jax.lax.broadcasted_iota(jnp.int32, (hid, VH), 1) // heads
    dT_head = jax.lax.broadcasted_iota(jnp.int32, (VH, hid), 1) // dh
    jT_head = jax.lax.broadcasted_iota(jnp.int32, (VH, hid), 0) % heads
    jT_view = jax.lax.broadcasted_iota(jnp.int32, (VH, hid), 0) // heads
    for w_i in range(V):
        seg_w.append(((d_head == j_head) & (j_view == w_i)).astype(f32))
        segT_w.append(((dT_head == jT_head) & (jT_view == w_i)).astype(f32))
    # same-head group matrix for the packed softmax denominator
    G = (
        jax.lax.broadcasted_iota(jnp.int32, (VH, VH), 0) % heads
        == jax.lax.broadcasted_iota(jnp.int32, (VH, VH), 1) % heads
    ).astype(f32)

    xf = x.reshape(TN * V, hid)
    scale = dh ** -0.5
    for l in range(layers):
        m = mods_ref[l].astype(f32)  # (6, hid)
        h = _layernorm(xf) * (1.0 + m[1]) + m[0]
        qkv = (
            jnp.dot(h.astype(dt), qkv_k_ref[l], preferred_element_type=f32)
            + qkv_b_ref[l].astype(f32)
        )
        q, k, vv = jnp.split(qkv, 3, axis=-1)  # lane slices at hid multiples
        q3 = (q * scale).reshape(TN, V, hid)  # leading-dim split only
        k3 = k.reshape(TN, V, hid)
        v3 = vv.reshape(TN, V, hid)
        # packed logits L[tv, w*heads+h] = sum_d q[t,v,d] k[t,w,d] seg[d,h]
        if merged:
            prod_all = jnp.concatenate(
                [
                    (q3 * k3[:, w_i : w_i + 1, :]).reshape(TN * V, hid)
                    for w_i in range(V)
                ],
                axis=1,
            )  # (TN*V, V*hid), w-major hid blocks
            seg_all = jnp.concatenate(seg_w, axis=0).astype(jnp.bfloat16)
            hi = prod_all.astype(jnp.bfloat16)
            lo = (prod_all - hi.astype(f32)).astype(jnp.bfloat16)
            L = jnp.dot(hi, seg_all, preferred_element_type=f32) + jnp.dot(
                lo, seg_all, preferred_element_type=f32
            )
        elif bf16:
            q3b = q3.astype(jnp.bfloat16)
            k3b = k3.astype(jnp.bfloat16)
            L = jnp.zeros((TN * V, VH), f32)
            for w_i in range(V):
                prod_w = (q3b * k3b[:, w_i : w_i + 1, :]).reshape(TN * V, hid)
                L = L + jnp.dot(
                    prod_w, seg_w[w_i].astype(jnp.bfloat16),
                    preferred_element_type=f32,
                )
        elif hilo:
            # exact: prod = hi + lo with hi = bf16(prod); against a 0/1
            # segment matrix, dot(hi) + dot(lo) in f32 accumulation
            # reproduces the f32 dot to ~2^-17 relative.
            L = jnp.zeros((TN * V, VH), f32)
            for w_i in range(V):
                prod_w = (q3 * k3[:, w_i : w_i + 1, :]).reshape(TN * V, hid)
                p_hi = prod_w.astype(jnp.bfloat16)
                p_lo = (prod_w - p_hi.astype(f32)).astype(jnp.bfloat16)
                s_bf = seg_w[w_i].astype(jnp.bfloat16)
                L = L + jnp.dot(p_hi, s_bf, preferred_element_type=f32)
                L = L + jnp.dot(p_lo, s_bf, preferred_element_type=f32)
        else:
            L = jnp.zeros((TN * V, VH), f32)
            for w_i in range(V):
                prod_w = (q3 * k3[:, w_i : w_i + 1, :]).reshape(TN * V, hid)
                L = L + jnp.dot(prod_w, seg_w[w_i], preferred_element_type=f32)
        # softmax over w within each head's stride-heads lane group; the
        # shift uses the full-row max (constant per group -> identical math
        # in exact arithmetic). Underflow guard: if one head's logits sit
        # ~87+ below the row max, its whole group's exps flush to 0 and the
        # E@G denominator would be 0/0 -> NaN; the clamp turns that
        # catastrophic case into a zero attention contribution instead.
        M = jnp.max(L, axis=1, keepdims=True)
        E = jnp.exp(L - M)
        P = E / jnp.maximum(jnp.dot(E, G, preferred_element_type=f32), 1e-30)
        if merged:
            # one expansion dot: A[:, w*hid:(w+1)*hid] == P @ segT_w[w].
            # P in [0,1]; hi/lo split keeps the f32-dot numerics (see above)
            segT_all = jnp.concatenate(segT_w, axis=1).astype(jnp.bfloat16)
            Phi = P.astype(jnp.bfloat16)
            Plo = (P - Phi.astype(f32)).astype(jnp.bfloat16)
            A = jnp.dot(Phi, segT_all, preferred_element_type=f32) + jnp.dot(
                Plo, segT_all, preferred_element_type=f32
            )  # (TN*V, V*hid)
            attn = jnp.zeros((TN, V, hid), f32)
            for w_i in range(V):
                a_w = jax.lax.slice_in_dim(A, w_i * hid, (w_i + 1) * hid, axis=1)
                attn = attn + a_w.reshape(TN, V, hid) * v3[:, w_i : w_i + 1, :]
        elif bf16:
            Pb = P.astype(jnp.bfloat16)
            attn = jnp.zeros((TN, V, hid), f32)
            for w_i in range(V):
                p_exp = jnp.dot(
                    Pb, segT_w[w_i].astype(jnp.bfloat16),
                    preferred_element_type=f32,
                )  # (TN*V, hid)
                attn = attn + p_exp.reshape(TN, V, hid) * v3[:, w_i : w_i + 1, :]
        elif hilo:
            # P in [0,1]; same hi/lo exactness argument as the logits
            Phi = P.astype(jnp.bfloat16)
            Plo = (P - Phi.astype(f32)).astype(jnp.bfloat16)
            attn = jnp.zeros((TN, V, hid), f32)
            for w_i in range(V):
                sT_bf = segT_w[w_i].astype(jnp.bfloat16)
                p_exp = jnp.dot(Phi, sT_bf, preferred_element_type=f32) + jnp.dot(
                    Plo, sT_bf, preferred_element_type=f32
                )  # (TN*V, hid)
                attn = attn + p_exp.reshape(TN, V, hid) * v3[:, w_i : w_i + 1, :]
        else:
            attn = jnp.zeros((TN, V, hid), f32)
            for w_i in range(V):
                p_exp = jnp.dot(P, segT_w[w_i], preferred_element_type=f32)  # (TN*V, hid)
                attn = attn + p_exp.reshape(TN, V, hid) * v3[:, w_i : w_i + 1, :]
        attn = attn.reshape(TN * V, hid)
        attn = (
            jnp.dot(attn.astype(dt), proj_k_ref[l], preferred_element_type=f32)
            + proj_b_ref[l].astype(f32)
        )
        xf = xf + m[2] * attn
        h = _layernorm(xf) * (1.0 + m[4]) + m[3]
        h = _gelu(
            jnp.dot(h.astype(dt), fc1_k_ref[l], preferred_element_type=f32)
            + fc1_b_ref[l].astype(f32)
        )
        h = (
            jnp.dot(h.astype(dt), fc2_k_ref[l], preferred_element_type=f32)
            + fc2_b_ref[l].astype(f32)
        )
        xf = xf + m[5] * h

    # ---- softmax pool over V + output projection --------------------------
    w = jnp.dot(xf.astype(dt), wl_k_ref[...], preferred_element_type=f32)
    w = (w + wl_b_ref[...].astype(f32)).reshape(TN, V)
    w = jax.nn.softmax(w, axis=-1)
    pooled = jnp.sum(xf.reshape(TN, V, hid) * w[..., None], axis=1)  # (TN, hid)
    out = (
        jnp.dot(pooled.astype(dt), fin_k_ref[...], preferred_element_type=f32)
        + fin_b_ref[...].astype(f32)
    )
    out_ref[...] = out.astype(out_ref.dtype)


def _gather_kernel(
    xy_ref,  # (1, TN, 2) this view's negated NDC for this token block
    ptsT_ref,  # (1, 3, TN)
    centers_ref,  # (1, 3, 1)
    mask_ref,  # (1, 1, 1)
    maps_ref,  # (1, HW, hid) this view's projected map (resident per view)
    kall_ref, kmask_ref,
    out_ref,  # (1, TN, hid) token block for (view v, block i)
    *, H: int, W: int, freqs: tuple,
):
    """Phase 1 of the stretch path: bilinear hat-gather + on-chip geometric
    embedding for ONE (token block, view) pair. The grid runs views OUTER so
    each view's map is fetched into VMEM once and stays resident across all
    token blocks; the (N, V, hid) token tensor round-trips HBM once in bf16
    (the XLA fallback materialises several same-sized intermediates)."""
    TN = xy_ref.shape[1]
    f32 = jnp.float32
    dt = maps_ref.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (TN, H * W), 1)
    xy = xy_ref[0].astype(f32)
    x = jnp.clip((xy[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1)[:, None]
    y = jnp.clip((xy[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1)[:, None]
    Wm = jnp.maximum(0.0, 1.0 - jnp.abs(x - (col % W).astype(f32))) * jnp.maximum(
        0.0, 1.0 - jnp.abs(y - (col // W).astype(f32))
    )
    tok = jnp.dot(Wm.astype(dt), maps_ref[0], preferred_element_type=f32)
    aug = _geo_aug_t(ptsT_ref[0], centers_ref[0], freqs)
    tok = tok + jax.lax.dot_general(
        aug.astype(dt), kall_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    tok = tok + mask_ref[0].astype(f32) * kmask_ref[...].astype(f32)
    out_ref[0] = tok.astype(out_ref.dtype)


def _dit_kernel(
    toks_ref,  # (V, TN, hid) gathered tokens (phase-1 output, view-major)
    bacc_ref,  # (TN, hid)
    qkv_k_ref, qkv_b_ref, proj_k_ref, proj_b_ref,
    fc1_k_ref, fc1_b_ref, fc2_k_ref, fc2_b_ref,
    mods_ref, wl_k_ref, wl_b_ref, fin_k_ref, fin_b_ref,
    out_ref,  # (TN, out_dim)
    *, V: int, heads: int, layers: int,
):
    """Phase 2 of the stretch path: gelu(tokens + b_acc) -> DiT -> pool.

    The view-major phase-1 layout is re-ordered to (TN, V, hid) with V
    static leading-dim slices (Mosaic has no general 3-D transpose)."""
    f32 = jnp.float32
    x = jnp.stack([toks_ref[v] for v in range(V)], axis=1)  # (TN, V, hid)
    x = _gelu(x.astype(f32) + bacc_ref[...].astype(f32)[:, None, :])
    _dit_pool(
        x, qkv_k_ref, qkv_b_ref, proj_k_ref, proj_b_ref, fc1_k_ref, fc1_b_ref,
        fc2_k_ref, fc2_b_ref, mods_ref, wl_k_ref, wl_b_ref, fin_k_ref,
        fin_b_ref, out_ref, V=V, heads=heads, layers=layers, dt=toks_ref.dtype,
    )


def _geo_aug_xla(pts, centers, freqs):
    """XLA twin of _geo_aug_t (natural orientation): (V, N, 7*(1+2nh))."""
    f32 = jnp.float32
    dirs = pts[None].astype(f32) - centers[:, None].astype(f32)  # (V, N, 3)
    depth = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirn = dirs / jnp.maximum(depth, 1e-12)
    mom = jnp.cross(jnp.broadcast_to(centers[:, None], dirn.shape), dirn)
    X = jnp.concatenate([dirn, mom, depth], axis=-1)  # (V, N, 7)
    S = jnp.concatenate([X * f for f in freqs], axis=-1)  # freq-major
    return jnp.concatenate([X, jnp.sin(S), jnp.cos(S)], axis=-1)


def _xla_reference(xy, pts, centers, mask, b_acc, maps_p, kg: GeoWeights,
                   w: AggregatorWeights, heads: int, freqs: tuple):
    """Same math in plain XLA — the differentiable twin used for the custom
    VJP (the sampler's 50-step loop never needs gradients; training does)."""
    from mvdfusion_tpu.geometry.gridsample import grid_sample_mxu

    V, N, _ = xy.shape
    hid = maps_p.shape[-1]
    L = w.qkv_k.shape[0]
    dt = maps_p.dtype
    f32 = jnp.float32
    gathered = grid_sample_mxu(maps_p, xy.astype(f32))  # (V, N, hid)
    aug = _geo_aug_xla(pts, centers, freqs)
    toks = (
        gathered.astype(f32)
        + jnp.einsum("vng,gh->vnh", aug.astype(dt), kg.kall.astype(dt), preferred_element_type=f32)
        + mask[:, None, None].astype(f32) * kg.kmask.astype(f32)
    )
    x = jax.nn.gelu(
        jnp.swapaxes(toks, 0, 1) + b_acc.astype(f32)[:, None, :], approximate=False
    )  # (N, V, hid)
    dh = hid // heads
    xf = x.reshape(N * V, hid)
    mm = lambda a, k: jnp.dot(a.astype(dt), k.astype(dt), preferred_element_type=f32)
    for l in range(L):
        m = w.mods[l].astype(f32)
        h = _layernorm(xf) * (1 + m[1]) + m[0]
        qkv = mm(h, w.qkv_k[l]) + w.qkv_b[l].astype(f32)
        q, k, vv = [a.reshape(N, V, heads, dh) for a in jnp.split(qkv, 3, -1)]
        logits = jnp.einsum("nvhd,nwhd->nhvw", q, k) * dh**-0.5
        p = jax.nn.softmax(logits, axis=-1)
        att = jnp.einsum("nhvw,nwhd->nvhd", p, vv).reshape(N * V, hid)
        xf = xf + m[2] * (mm(att, w.proj_k[l]) + w.proj_b[l].astype(f32))
        h = _layernorm(xf) * (1 + m[4]) + m[3]
        h = jax.nn.gelu(mm(h, w.fc1_k[l]) + w.fc1_b[l].astype(f32), approximate=False)
        xf = xf + m[5] * (mm(h, w.fc2_k[l]) + w.fc2_b[l].astype(f32))
    ww = (mm(xf, w.wl_k) + w.wl_b.astype(f32)).reshape(N, V)
    ww = jax.nn.softmax(ww, axis=-1)
    pooled = jnp.sum(xf.reshape(N, V, hid) * ww[..., None], axis=1)
    out = mm(pooled, w.fin_k) + w.fin_b.astype(f32)
    return out.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def crossview_aggregate(
    xy: jnp.ndarray,  # (V, N, 2) negated NDC coords
    pts: jnp.ndarray,  # (N, 3) world query points
    centers: jnp.ndarray,  # (V, 3) camera centers
    mask: jnp.ndarray,  # (V,) predict mask
    b_acc: jnp.ndarray,  # (N, hid)
    maps_p: jnp.ndarray,  # (V, H, W, hid) projected feature maps
    kg: GeoWeights,
    w: AggregatorWeights,
    heads: int,
    block_tokens: int = 64,
    interpret: bool = False,
    freqs: tuple = (),
) -> jnp.ndarray:
    """Returns the pooled, projected frustum features (N, out_dim)."""
    return _crossview_fwd_impl(
        xy, pts, centers, mask, b_acc, maps_p, kg, w, heads, block_tokens, interpret, freqs
    )


def _crossview_fwd(xy, pts, centers, mask, b_acc, maps_p, kg, w, heads, block_tokens, interpret, freqs):
    out = _crossview_fwd_impl(
        xy, pts, centers, mask, b_acc, maps_p, kg, w, heads, block_tokens, interpret, freqs
    )
    return out, (xy, pts, centers, mask, b_acc, maps_p, kg, w)


def _crossview_bwd(heads, block_tokens, interpret, freqs, res, g):
    xy, pts, centers, mask, b_acc, maps_p, kg, w = res
    _, vjp = jax.vjp(
        lambda xy, pts, centers, mask, b_acc, maps_p, kg, w: _xla_reference(
            xy, pts, centers, mask, b_acc, maps_p, kg, w, heads, freqs
        ),
        xy, pts, centers, mask, b_acc, maps_p, kg, w,
    )
    return vjp(g)


# All V projected maps stay VMEM-resident in the single-kernel path up to
# this many bytes; above it the two-phase (gather per view, then DiT) path
# keeps only ONE view's map resident and round-trips the token tensor
_SINGLE_KERNEL_MAPS_BYTES = 6 * 1024 * 1024


def _crossview_fwd_impl(
    xy, pts, centers, mask, b_acc, maps_p, kg: GeoWeights, w: AggregatorWeights,
    heads: int, block_tokens: int = 64, interpret: bool = False, freqs: tuple = (),
) -> jnp.ndarray:
    V, N, _ = xy.shape
    _, H, W_, hid = maps_p.shape
    L = w.qkv_k.shape[0]
    G = kg.kall.shape[0]
    out_dim = w.fin_k.shape[-1]
    TN = block_tokens
    while N % TN:
        TN //= 2
    dt = maps_p.dtype

    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    dit_w = (
        w.qkv_k.astype(dt), w.qkv_b.reshape(L, 1, -1).astype(dt),
        w.proj_k.astype(dt), w.proj_b.reshape(L, 1, -1).astype(dt),
        w.fc1_k.astype(dt), w.fc1_b.reshape(L, 1, -1).astype(dt),
        w.fc2_k.astype(dt), w.fc2_b.reshape(L, 1, -1).astype(dt),
        w.mods.astype(jnp.float32),
        w.wl_k.astype(dt), w.wl_b.reshape(1, 1).astype(dt),
        w.fin_k.astype(dt), w.fin_b.reshape(1, -1).astype(dt),
    )
    geo_w = (kg.kall.astype(dt), kg.kmask.reshape(1, hid).astype(jnp.float32))
    itemsize = jnp.dtype(dt).itemsize

    if V * H * W_ * hid * itemsize <= _SINGLE_KERNEL_MAPS_BYTES:
        kern = functools.partial(
            _kernel, V=V, H=H, W=W_, heads=heads, layers=L, freqs=tuple(freqs)
        )
        return pl.pallas_call(
            kern,
            grid=(N // TN,),
            in_specs=[
                pl.BlockSpec((V, TN, 2), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, TN), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                const(), const(),
                pl.BlockSpec((TN, hid), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((V, H * W_, hid), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                const(), const(),
                const(), const(), const(), const(), const(), const(), const(),
                const(), const(), const(), const(), const(), const(),
            ],
            out_specs=pl.BlockSpec((TN, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, out_dim), dt),
            cost_estimate=pl.CostEstimate(
                flops=2 * V * N * (H * W_ + G) * hid + 2 * N * V * L * 8 * hid * hid,
                bytes_accessed=(xy.size + pts.size + b_acc.size + maps_p.size) * 4,
                transcendentals=N * V * (L + 1 + 2 * len(freqs)),
            ),
            interpret=interpret,
        )(
            # xy/pts stay fp32: bilinear coords and geometry need the mantissa
            xy.astype(jnp.float32),
            jnp.swapaxes(pts.reshape(N // TN, TN, 3), 1, 2).astype(jnp.float32),
            centers.reshape(V, 3, 1).astype(jnp.float32),
            mask.reshape(V, 1, 1).astype(jnp.float32),
            b_acc.astype(dt),
            maps_p.reshape(V, H * W_, hid),
            *geo_w,
            *dit_w,
        )

    # ---- two-phase stretch path (maps too big for VMEM together) ---------
    # Phase 1: grid (V, blocks) — views OUTER, so each view's map is fetched
    # once and stays resident while every token block gathers from it.
    TNG = 128
    while N % TNG:
        TNG //= 2
    toks = pl.pallas_call(
        functools.partial(_gather_kernel, H=H, W=W_, freqs=tuple(freqs)),
        grid=(V, N // TNG),
        in_specs=[
            pl.BlockSpec((1, TNG, 2), lambda v, i: (v, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TNG), lambda v, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 1), lambda v, i: (v, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda v, i: (v, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * W_, hid), lambda v, i: (v, 0, 0), memory_space=pltpu.VMEM),
            const(), const(),
        ],
        out_specs=pl.BlockSpec((1, TNG, hid), lambda v, i: (v, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, N, hid), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * V * N * (H * W_ + G) * hid,
            bytes_accessed=maps_p.size * itemsize + V * N * hid * itemsize,
            transcendentals=N * V * 2 * len(freqs),
        ),
        interpret=interpret,
    )(
        xy.astype(jnp.float32),
        jnp.swapaxes(pts.reshape(N // TNG, TNG, 3), 1, 2).astype(jnp.float32),
        centers.reshape(V, 3, 1).astype(jnp.float32),
        mask.reshape(V, 1, 1).astype(jnp.float32),
        maps_p.reshape(V, H * W_, hid),
        *geo_w,
    )
    # Phase 2: DiT + pool over token blocks; weights resident, tokens read
    # back once (bf16 — the XLA fallback accumulates these in bf16 too).
    TND = 128
    while N % TND:
        TND //= 2
    return pl.pallas_call(
        functools.partial(_dit_kernel, V=V, heads=heads, layers=L),
        grid=(N // TND,),
        in_specs=[
            pl.BlockSpec((V, TND, hid), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TND, hid), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const(), const(), const(), const(), const(), const(), const(),
            const(), const(), const(), const(), const(), const(),
        ],
        out_specs=pl.BlockSpec((TND, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, out_dim), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * V * L * 8 * hid * hid,
            bytes_accessed=V * N * hid * itemsize + b_acc.size * itemsize,
            transcendentals=N * V * (L + 1),
        ),
        interpret=interpret,
    )(toks, b_acc.astype(dt), *dit_w)


crossview_aggregate.defvjp(_crossview_fwd, _crossview_bwd)


def should_fuse_crossview(V: int, H: int, W: int, hid: int, top_k: bool) -> bool:
    """Kernel applicability gate; the factorized XLA path covers the rest.
    MVDF_DISABLE_PALLAS=1 forces the XLA path (see ops/attention.should_fuse)."""
    import os

    if jax.default_backend() != "tpu" or os.environ.get("MVDF_DISABLE_PALLAS"):
        return False
    if top_k:
        return False
    # single-kernel: all V maps resident; two-phase (H*W up to 8192): one
    # view's map resident per gather sweep + a bf16 token round-trip. Beyond
    # that a single view's map outgrows VMEM next to the hat-weight tile.
    return V <= 16 and H * W <= 8192 and hid <= 512
